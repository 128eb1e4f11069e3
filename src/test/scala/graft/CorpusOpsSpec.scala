package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{KCore, LabelPropagation}
import graft.queries.CorpusOps

/** Semantics pins for the corpus-rewrite operators: LPA's
  * density-over-reachability behavior (vs connected components), a
  * brute-force equivalence law, and the q172 global line-dedup rewrite
  * on a staged mini-corpus with a known duplicate layout.
  */
class CorpusOpsSpec extends SparkSpecBase {

  import spark.implicits._

  /** Undirected edge list → both-direction DataFrame. */
  private def undirected(es: Seq[(Long, Long)]) =
    (es ++ es.map { case (a, b) => (b, a) }).toDF("src", "dst")

  test("LPA keeps bridge-joined cliques separate (components would merge)") {
    val cliqueA = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val cliqueB = for { a <- 11L to 14L; b <- 11L to 14L if a < b } yield (a, b)
    val edges = undirected(cliqueA ++ cliqueB :+ (4L, 11L))
    val got = LabelPropagation.run(edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one label per clique, and the two differ: the bridge never wins
    // a mode vote against 3 in-clique neighbors
    assert((1L to 4L).map(got).toSet.size == 1)
    assert((11L to 14L).map(got).toSet.size == 1)
    assert(got(1L) != got(11L))
  }

  test("LPA equals the brute-force synchronous mode recurrence") {
    val rnd = new scala.util.Random(42)
    val nodes = (1L to 30L).toVector
    val es = (for (_ <- 1 to 60) yield {
      val a = nodes(rnd.nextInt(nodes.size))
      val b = nodes(rnd.nextInt(nodes.size))
      if (a == b) None else Some((math.min(a, b), math.max(a, b)))
    }).flatten.distinct
    val adj: Map[Long, Seq[Long]] =
      (es ++ es.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = adj.map { case (n, nbrs) =>
        val votes = nbrs.map(lbl).groupBy(identity).map { case (l, o) => (l, o.size) }
        n -> votes.toSeq.map { case (l, c) => (-c, l) }.min._2
      }
    }
    val got = LabelPropagation.run(undirected(es), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lbl)
  }

  test("k-core peel cascades: a path dies end-inward, a cycle survives") {
    // path 1-2-3-4: ends have degree 1 < 2, peel; the ex-middle nodes
    // drop to degree 1 and die next round — 2-core = empty
    val path = KCore.run(undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L))), k = 2, rounds = 3)
    assert(path.count() == 0)
    // cycle 1-2-3-4-1: every node keeps degree 2 forever
    val cyc = KCore.run(undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))), k = 2, rounds = 3)
    val got = cyc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("k-core equals the brute-force peel on random graphs") {
    val rnd = new scala.util.Random(7)
    val nodes = (1L to 25L).toVector
    val es = (for (_ <- 1 to 45) yield {
      val a = nodes(rnd.nextInt(nodes.size))
      val b = nodes(rnd.nextInt(nodes.size))
      if (a == b) None else Some((math.min(a, b), math.max(a, b)))
    }).flatten.distinct
    var adj: Map[Long, Set[Long]] =
      (es ++ es.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    for (_ <- 1 to 3) {
      // one peel: nodes below degree 3 die, edges to dead nodes go
      // with them (a survivor left with no edges vanishes, as it does
      // from the operator's edge frame)
      val alive = adj.filter(_._2.size >= 3).keySet
      adj = adj.collect { case (n, nbrs) if alive(n) => n -> (nbrs & alive) }
        .filter(_._2.nonEmpty)
    }
    val expect = adj.map { case (n, nbrs) => n -> nbrs.size.toLong }
    val got = KCore.run(undirected(es), k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("q172 drops every later copy of a line and reassembles in order") {
    val dir = Files.createTempDirectory("graft-corpus").toString
    // 8-token lines: A (shared, first in doc 1), B, C (doc-2-only), and
    // doc 3 repeats A twice more plus its own tail line D of 3 tokens
    val A = (1 to 8).map(i => s"a$i").mkString(" ")
    val B = (1 to 8).map(i => s"b$i").mkString(" ")
    val C = (1 to 8).map(i => s"c$i").mkString(" ")
    val D = "d1 d2 d3"
    Seq(
      (1L, s"$A $B", "en", "s1", 0L),
      (2L, s"$C $A", "en", "s1", 0L),
      (3L, s"$A $A $D", "en", "s2", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusOps.queries("q172_line_dedup_rewrite")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 owns A (first occurrence at (1, 0)) and B; doc 2 keeps C,
    // loses A; doc 3 loses both copies of A, keeps its short tail D
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, s"$A $B"),
      (2L, 2L, 1L, C),
      (3L, 3L, 1L, D),
    ))
  }
}
