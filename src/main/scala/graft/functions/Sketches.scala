package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * UDAF extension surface (SURVEY §2.10) demonstrated with a mergeable
  * bounded-memory summary.
  *
  * Guarantee: with capacity k, any item whose true frequency exceeds
  * n/(k+1) is present in the final summary, and every reported count
  * undercounts by at most n/(k+1). Counts are order-dependent (the
  * sketch is approximate) — callers rank by the true count via a
  * follow-up exact aggregation over the candidate set when exactness
  * matters; the sketch's job is shrinking the candidate space from
  * |vocabulary| to k per partition.
  *
  * Scale notes: the buffer is a bounded map (≤ k entries), merged
  * pairwise map-side like any partial aggregate — no shuffle of raw
  * items, no driver state. This is the standard first stage of a
  * distributed top-k over a vocabulary too large to hash-aggregate.
  */
final class MisraGries(k: Int)
  extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  require(k > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  private def decrement(m: Map[String, Long], by: Long): Map[String, Long] =
    m.flatMap { case (key, c) =>
      if (c > by) Some(key -> (c - by)) else None
    }

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None => decrement(buf, 1) // classic MG: decrement all counters
    }

  /** Merge = add counts, then shrink back to k by subtracting the
    * (k+1)-th largest count from every entry (the standard mergeable-MG
    * reduction; preserves the undercount bound).
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val threshold = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      decrement(sum, threshold)
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}

object Sketches {
  /** Heavy-hitters column over a string Dataset. */
  def heavyHitters(k: Int): TypedColumn[String, Map[String, Long]] =
    new MisraGries(k).toColumn
}
