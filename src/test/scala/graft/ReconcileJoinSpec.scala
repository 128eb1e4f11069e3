package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import graft.streaming.StreamIngest

/** The emission-complete left-outer interval join composition
  * (StreamIngest.reconcileOuterIntervalJoin): stream INNER-join lane +
  * batch reconciliation == the batch left outer join, bit-for-bit,
  * REGARDLESS of the stream lane's arrival order/batching — the
  * round-9 measured finding (Spark's stream-stream left_outer null
  * emission under multi-batch arrival is arrival-dependent and
  * run-nondeterministic) converted into a shipped operator.
  */
class ReconcileJoinSpec extends SparkSpecBase {

  import spark.implicits._

  // 200 left rows, 150 right rows, shared user keys, partners inside
  // and outside the [0, +10min] window, plus key-less left rows
  private def mkSides(): (DataFrame, DataFrame) = {
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      f"2024-05-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    val l = (0 until 200).map { i =>
      (i.toLong, ts(i % 90), (i % 23).toLong)
    }.toDF("lid", "lts", "user_id")
    val r = (0 until 150).map { i =>
      (1000L + i, ts((i * 7) % 95), (i % 29).toLong)
    }.toDF("rid", "rts", "user_id")
    (l, r)
  }

  private def batchOuter(l: DataFrame, r: DataFrame): Set[Row] = {
    val cond = l("user_id") === r("user_id") &&
      r("rts") >= l("lts") && r("rts") <= l("lts") + expr("INTERVAL 10 minutes")
    l.join(r, cond, "left_outer")
      .select(l("lid"), l("lts"), l("user_id"), r("rid"), r("rts"))
      .collect().toSet
  }

  private def runStreamLane(l: DataFrame, r: DataFrame,
                            layout: String): DataFrame = {
    val stageL = tmpDir(s"rcj_l_$layout")
    val stageR = tmpDir(s"rcj_r_$layout")
    val out = tmpDir(s"rcj_o_$layout")
    def stage(df: DataFrame, tsCol: String, idCol: String, dir: String): Unit =
      layout match {
        case "ordered" => // contiguous time slices, path order = time order
          (0 until 4).foreach { i =>
            df.withColumn("__rk", row_number().over(
              org.apache.spark.sql.expressions.Window.orderBy(col(tsCol), col(idCol))))
              .filter(col("__rk") % 4 === i).drop("__rk")
              .coalesce(1).write.mode("append").parquet(dir)
          }
        case "random" => // hash slices, every slice spans the full range
          (0 until 4).foreach { i =>
            df.filter(pmod(xxhash64(col(idCol)), lit(4)) === i)
              .coalesce(1).write.mode("append").parquet(dir)
          }
      }
    stage(l, "lts", "lid", stageL)
    stage(r, "rts", "rid", stageR)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val joined = StreamIngest.intervalJoin(
        spark.readStream.schema(l.schema).option("maxFilesPerTrigger", "1")
          .parquet(stageL),
        spark.readStream.schema(r.schema).option("maxFilesPerTrigger", "1")
          .parquet(stageR),
        Seq("user_id"), "lts", "rts",
        before = "0 seconds", after = "10 minutes",
        watermark = "30 minutes", joinType = "inner")
      val q = joined.writeStream.outputMode("append")
        .option("checkpointLocation", tmpDir(s"rcj_c_$layout"))
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val sch = org.apache.spark.sql.types.StructType(
      l.schema.fields ++ r.schema.fields.filterNot(_.name == "user_id"))
    spark.read.schema(sch).parquet(out)
  }

  test("reconciled result == batch outer join under ordered AND random " +
    "multi-batch arrival") {
    val (l, r) = mkSides()
    val oracle = batchOuter(l, r)
    for (layout <- Seq("ordered", "random")) {
      val streamMatched = runStreamLane(l, r, layout)
      val got = StreamIngest.reconcileOuterIntervalJoin(
        streamMatched, l, r, Seq("user_id"), "lts", "rts",
        "0 seconds", "10 minutes", "lid", "rid")
        .select("lid", "lts", "user_id", "rid", "rts")
        .collect().toSet
      assert(got == oracle,
        s"$layout: reconciled != batch outer " +
          s"(missing=${(oracle -- got).take(3)}, extra=${(got -- oracle).take(3)})")
    }
  }

  test("reconciliation is robust to a corrupt stream lane: duplicates, " +
    "foreign pairs, and a fully-empty lane all yield the exact result") {
    val (l, r) = mkSides()
    val oracle = batchOuter(l, r)
    val trueMatched = l.as("l").join(r.as("r"),
      col("l.user_id") === col("r.user_id") &&
        col("r.rts") >= col("l.lts") &&
        col("r.rts") <= col("l.lts") + expr("INTERVAL 10 minutes"), "inner")
      .select(col("l.lid"), col("l.lts"), col("l.user_id"),
        col("r.rid"), col("r.rts"))
    assert(trueMatched.count() > 0, "fixture must produce matches")

    val lanes: Seq[(String, DataFrame)] = Seq(
      // half the truth, duplicated 3x — dedup + backfill must repair
      "dup+partial" -> trueMatched.filter(col("lid") % 2 === 0)
        .unionAll(trueMatched.filter(col("lid") % 2 === 0))
        .unionAll(trueMatched.filter(col("lid") % 2 === 0)),
      // a pair that does NOT exist in the settled window must be dropped
      "foreign" -> trueMatched.unionAll(
        Seq((9999L, java.sql.Timestamp.valueOf("2024-05-01 10:00:00"),
          7L, 8888L, java.sql.Timestamp.valueOf("2024-05-01 10:05:00")))
          .toDF("lid", "lts", "user_id", "rid", "rts")),
      // nothing emitted at all (total eviction) — pure backfill
      "empty" -> trueMatched.limit(0))
    for ((tag, lane) <- lanes) {
      val got = StreamIngest.reconcileOuterIntervalJoin(
        lane, l, r, Seq("user_id"), "lts", "rts",
        "0 seconds", "10 minutes", "lid", "rid")
        .select("lid", "lts", "user_id", "rid", "rts")
        .collect().toSet
      assert(got == oracle, s"$tag lane corrupted the reconciled result")
    }
  }

  test("windowed decomposition law: per-horizon reconciliations union " +
    "to exactly the one-shot outer join, with a partial lane") {
    val (l, r) = mkSides()
    val oracle = batchOuter(l, r)
    val trueMatched = l.as("l").join(r.as("r"),
      col("l.user_id") === col("r.user_id") &&
        col("r.rts") >= col("l.lts") &&
        col("r.rts") <= col("l.lts") + expr("INTERVAL 10 minutes"), "inner")
      .select(col("l.lid"), col("l.lts"), col("l.user_id"),
        col("r.rid"), col("r.rts"))
    val half = trueMatched.filter(col("lid") % 2 === 0)
    val b = l.agg(min(expr("unix_micros(lts)")), max(expr("unix_micros(lts)")))
      .head()
    val (lo, hi) = (b.getLong(0), b.getLong(1) + 1L)
    val afterUs = 600000000L
    for (w <- Seq(2, 3, 5)) {
      val edges = (0 to w).map(k => lo + (hi - lo) * k / w)
      val got = (0 until w).map { k =>
        val lw = l.filter(expr("unix_micros(lts)") >= edges(k) &&
          expr("unix_micros(lts)") < edges(k + 1))
        val rw = r.filter(expr("unix_micros(rts)") >= edges(k) &&
          expr("unix_micros(rts)") < edges(k + 1) + afterUs)
        StreamIngest.reconcileOuterIntervalJoin(half, lw, rw,
          Seq("user_id"), "lts", "rts", "0 seconds", "10 minutes",
          "lid", "rid")
      }.reduce(_.unionByName(_))
        .select("lid", "lts", "user_id", "rid", "rts")
        .collect().toSet
      assert(got == oracle,
        s"$w-window decomposition broke at a seam " +
          s"(missing=${(oracle -- got).take(3)}, extra=${(got -- oracle).take(3)})")
    }
  }

  test("reconcileWindow derives the settled slices itself: a tiling of " +
    "wrapper calls over the FULL lanes unions to the one-shot outer join") {
    val (l, r) = mkSides()
    val oracle = batchOuter(l, r)
    val trueMatched = l.as("l").join(r.as("r"),
      col("l.user_id") === col("r.user_id") &&
        col("r.rts") >= col("l.lts") &&
        col("r.rts") <= col("l.lts") + expr("INTERVAL 10 minutes"), "inner")
      .select(col("l.lid"), col("l.lts"), col("l.user_id"),
        col("r.rid"), col("r.rts"))
    val half = trueMatched.filter(col("lid") % 2 === 0)
    val b = l.agg(min(expr("unix_micros(lts)")), max(expr("unix_micros(lts)")))
      .head()
    val (lo, hi) = (b.getLong(0), b.getLong(1) + 1L)
    val afterUs = 600000000L
    val w = 4
    val edges = (0 to w).map(k => lo + (hi - lo) * k / w)
    val got = (0 until w).map { k =>
      StreamIngest.reconcileWindow(half, l, r,
        Seq("user_id"), "lts", "rts", "0 seconds", "10 minutes",
        "lid", "rid", edges(k), edges(k + 1),
        horizonUs = hi + afterUs, disorderBound = "0 seconds")
    }.reduce(_.unionByName(_))
      .select("lid", "lts", "user_id", "rid", "rts")
      .collect().toSet
    assert(got == oracle, "wrapper tiling != one-shot outer join")
  }

  test("reconcileWindow tiling law holds with a nonzero BEFORE bound: " +
    "the right slice must reach back before the window start") {
    val (l, r) = mkSides()
    // symmetric window: partners up to 5 min BEFORE the left event
    val cond = l("user_id") === r("user_id") &&
      r("rts") >= l("lts") - expr("INTERVAL 5 minutes") &&
      r("rts") <= l("lts") + expr("INTERVAL 10 minutes")
    val oracle = l.join(r, cond, "left_outer")
      .select(l("lid"), l("lts"), l("user_id"), r("rid"), r("rts"))
      .collect().toSet
    val empty = l.limit(0).withColumn("rid", lit(null).cast("long"))
      .withColumn("rts", lit(null).cast("timestamp"))
    val b = l.agg(min(expr("unix_micros(lts)")), max(expr("unix_micros(lts)")))
      .head()
    val (lo, hi) = (b.getLong(0), b.getLong(1) + 1L)
    val edges = (0 to 3).map(k => lo + (hi - lo) * k / 3)
    val got = (0 until 3).map { k =>
      StreamIngest.reconcileWindow(empty, l, r,
        Seq("user_id"), "lts", "rts", "5 minutes", "10 minutes",
        "lid", "rid", edges(k), edges(k + 1),
        horizonUs = hi + 600000000L, disorderBound = "0 seconds")
    }.reduce(_.unionByName(_))
      .select("lid", "lts", "user_id", "rid", "rts")
      .collect().toSet
    assert(got == oracle,
      "nonzero-before tiling != one-shot outer join " +
        s"(missing=${(oracle -- got).take(3)}, extra=${(got -- oracle).take(3)})")
  }

  test("reconcileWindow REFUSES an unsettled window loudly instead of " +
    "mis-emitting in-flight pairs as unmatched") {
    val (l, r) = mkSides()
    val half = l.limit(0).withColumn("rid", lit(null).cast("long"))
      .withColumn("rts", lit(null).cast("timestamp"))
    val b = l.agg(min(expr("unix_micros(lts)")), max(expr("unix_micros(lts)")))
      .head()
    val (lo, hi) = (b.getLong(0), b.getLong(1) + 1L)
    val afterUs = 600000000L
    // horizon sits exactly at the window end: rows near the end still
    // have in-flight partners (event time + after + disorder > horizon)
    val e = intercept[IllegalArgumentException] {
      StreamIngest.reconcileWindow(half, l, r,
        Seq("user_id"), "lts", "rts", "0 seconds", "10 minutes",
        "lid", "rid", lo, hi, horizonUs = hi, disorderBound = "5 minutes")
    }
    assert(e.getMessage.contains("not settled"), e.getMessage)
    // the settled form of the same call must run (guard is exact, not
    // merely conservative): horizon one past the last in-flight bound
    val n = StreamIngest.reconcileWindow(half, l, r,
      Seq("user_id"), "lts", "rts", "0 seconds", "10 minutes",
      "lid", "rid", lo, hi,
      horizonUs = hi + afterUs + 300000000L, disorderBound = "5 minutes")
      .count()
    assert(n > 0)
  }

  test("intervalMicros: day-time strings convert exactly; month-bearing " +
    "intervals are refused (no fixed settled horizon)") {
    assert(StreamIngest.intervalMicros("10 minutes") == 600000000L)
    assert(StreamIngest.intervalMicros("2 days") == 172800000000L)
    assert(StreamIngest.intervalMicros("1 day 30 seconds") == 86430000000L)
    val e = intercept[IllegalArgumentException] {
      StreamIngest.intervalMicros("1 month")
    }
    assert(e.getMessage.contains("day-time"), e.getMessage)
  }
}
