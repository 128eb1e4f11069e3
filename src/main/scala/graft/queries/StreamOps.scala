package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.{ParquetDataset, WriteConfig}
import graft.streaming.StreamIngest

/** Structured Streaming round trips, oracle-gated.
  *
  * StreamIngest was previously spec-only (MemoryStream unit tests);
  * these queries put the streaming paths under the same DuckDB hash
  * gate as everything else. Each stages a source table as several
  * parquet files, streams them back with a `maxFilesPerTrigger` below
  * the file count (so the run genuinely crosses micro-batch
  * boundaries — `drain` asserts it), lands the
  * result through the streaming sink under test, and returns a
  * deterministic batch aggregate of the read-back — the oracle
  * computes the relational equivalent straight from the source
  * parquet, so the stream must be exactly-once and value-preserving
  * for the hashes to meet.
  *
  * Determinism notes: `Trigger` defaults + `processAllAvailable()`
  * drain a static directory deterministically; the dedup gate uses a
  * watermark delay far wider than the data's time span, so state is
  * never evicted mid-run and cross-batch duplicates are always
  * caught; the order-sensitive gates (CDC upsert q135, late-drop
  * q188) sequence their batches STRUCTURALLY — drain the first file
  * set, then write the next — because the file source's mtime
  * ordering demonstrably can flip for files already present at the
  * first listing. No wall-clock values are read — event time comes
  * from the data.
  *
  * Scale notes: the streamed work per batch IS the batch pipeline
  * (same write/merge code), so all batch-path properties (bounded
  * file sizes, broadcast merge probes, sidecar maintenance) carry
  * over; checkpointed offsets give exactly-once across restarts. At
  * production rates the same topology runs with a real trigger
  * interval — nothing here depends on AvailableNow semantics.
  */
object StreamOps {

  private def streamOf(s: SparkSession, stage: String,
                       schema: org.apache.spark.sql.types.StructType,
                       filesPerTrigger: Int = 2): DataFrame =
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(stage)

  /** Read back a gate's own landing dir with the schema of the frame
    * that produced it (round-12, verdict #2): the bare
    * `spark.read.parquet` otherwise pays a footer-inference driver job
    * per read-back per run. Deep-nullable so the supplied schema is
    * bit-identical to what inference would return (Spark file sources
    * expose every parquet column as nullable).
    */
  private def readAs(s: SparkSession, dir: String,
                     like: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.schema(graft.functions.SchemaOps.asNullable(like)).parquet(dir)

  /** Run `body` with `spark.sql.shuffle.partitions` lowered to `n`.
    *
    * Stateful streaming keeps one state-store instance PER shuffle
    * partition PER operator, and every micro-batch commits all of
    * them — at the suite's 32-partition default that is 32 store
    * loads + snapshots per batch for state that fits in one. The
    * partition count is a per-query knob in production streaming
    * jobs (sized to state volume, not to the batch suite's scan
    * parallelism); these gates' state is tiny, so 4 is generous.
    * The previous value is restored before the read-back aggregate,
    * which SHOULD run at full parallelism.
    */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Scope a session conf to one gate (the withShufflePartitions
    * shape, generalized for the q527 state-store provider swap).
    */
  private def withConf[T](s: SparkSession, key: String, value: String)
      (body: => T): T = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None => s.conf.unset(key)
    }
  }

  /** Drain `q`, assert it actually ran ≥ `minBatches` non-empty
    * micro-batches (otherwise the "streaming" gate silently degrades
    * to a single batch and proves nothing), then stop it.
    */
  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery,
                    tag: String, minBatches: Int): Unit = {
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    // state-store telemetry (the r4 q178 cost question was
    // unanswerable without it): per-run micro-batch count, input rows,
    // summed batch wall, and the state operators' rows/memory/commit
    // cost — one stderr line, grep '\[stream\]'
    locally {
      val ps = q.recentProgress
      def lane(key: String): Long = ps.map(p =>
        Option(p.durationMs.get(key)).map(_.longValue).getOrElse(0L)).sum
      val rows = ps.map(_.numInputRows).sum
      val so = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      val allSo = ps.flatMap(_.stateOperators.toSeq)
      val stat = graft.streaming.StreamTelemetry.Stat(
        batches = ps.length, rows = rows,
        wallMs = lane("triggerExecution"),
        addBatchMs = lane("addBatch"),
        getBatchMs = lane("getBatch") + lane("latestOffset"),
        planMs = lane("queryPlanning"),
        walCommitMs = lane("walCommit"),
        commitOffsetsMs = lane("commitOffsets"),
        stateRows = so.map(_.numRowsTotal).sum,
        stateMemB = so.map(_.memoryUsedBytes).sum,
        stateUpdateMs = allSo.map(_.allUpdatesTimeMs).sum,
        stateCommitMs = allSo.map(_.commitTimeMs).sum,
        stateRemoveMs = allSo.map(_.allRemovalsTimeMs).sum,
        // recentProgress is a ring capped at numRecentProgressUpdates;
        // at the cap the oldest batches were evicted and every summed
        // lane above is an UNDERcount — flag, never silently truncate
        truncated = ps.length >= q.sparkSession.conf
          .get("spark.sql.streaming.numRecentProgressUpdates", "100").toInt)
      graft.streaming.StreamTelemetry.record(tag, stat)
      System.err.println(s"[stream] $tag ${stat.render}")
    }
    val session = q.sparkSession
    q.stop()
    // a stopped query leaves its state-store providers (and their
    // maintenance thread) loaded in the executor; across a 150-query
    // suite that retained state is pure memory pressure on every
    // LATER query (the r2 q08/q09 regression signature). Unload them —
    // a future streaming query reloads from its checkpoint. CAVEAT:
    // StateStore.stop() is a JVM-GLOBAL internal API — it unloads
    // EVERY query's providers — while the `streams.active` guard is
    // SESSION-scoped (StreamingQueryManager is per-session), so the
    // guard protects concurrent queries in THIS session only. A
    // streaming query in a sibling session sharing the SparkContext
    // still loses its providers (next batch reloads from its
    // checkpoint — a latency spike, not data loss). The gates run
    // single-session, where the guard is exact.
    if (session.streams.active.isEmpty)
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    require(batches >= minBatches,
      s"$tag: expected >= $minBatches non-empty micro-batches, got $batches")
  }

  /** Keep a started query from outliving its gate: driver-side work
    * between `start()` and `drain()` (mid-stream file writes, the
    * second drain phase) can throw, and an un-stopped query would
    * keep polling its stage dir for the rest of the suite AND make
    * every later gate's `streams.active.isEmpty` guard skip the
    * StateStore unload — reinstating exactly the retained-state
    * pressure drain() exists to prevent.
    */
  private def ensureStopped[T](
      q: org.apache.spark.sql.streaming.StreamingQuery)(body: => T): T =
    try body
    catch {
      case e: Throwable =>
        try if (q.isActive) q.stop() catch { case _: Exception => }
        throw e
    }

  /** Shared read-back rollup for the orders-based gates (q133, q135,
    * q189): one definition so a casting change cannot silently
    * diverge between gates.
    */
  private def ordersStatusRollup(df: DataFrame): DataFrame =
    df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("o_orderstatus")

  private val OrdersStatusRollupSql =
    """SELECT o_orderstatus,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Streaming append ingestion: orders staged as 4 files → 4
    // micro-batches, each landed through the normalizing batch
    // WritePipeline (sidecar included). The read-back aggregate must
    // equal the batch answer — exactly-once, no loss, no dup.
    "q133_stream_append" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q133s")
      val out = Lifecycle.tmpDir("q133o")
      val src = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      src.repartition(4).write.mode("overwrite").parquet(stage)
      withShufflePartitions(s, 4) {
        val q = StreamIngest.append(
          streamOf(s, stage, src.schema), out,
          WriteConfig(), Lifecycle.tmpDir("q133c"))
        drain(q, "q133", 2)
      }
      val ds = new ParquetDataset(s, out)
      require(ds.stats.nonEmpty, "q133: sidecar missing after streamed appends")
      ordersStatusRollup(ds.df)
    },

    // Streaming exact-dedup: every event duplicated, shuffled across
    // 4 staged files so most duplicate pairs land in DIFFERENT
    // micro-batches, then dropped by keyed state. The watermark delay
    // (3650 days) exceeds the data's whole time span, so no state is
    // evicted mid-run and the output must be exactly the distinct
    // events — cross-batch state is what's under test.
    "q134_stream_dedup" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q134s")
      val out = Lifecycle.tmpDir("q134o")
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"), col("user_id"))
      ev.unionAll(ev).repartition(4).write.mode("overwrite").parquet(stage)
      withShufflePartitions(s, 4) {
        val dedup = StreamIngest.dedupedStream(
          streamOf(s, stage, ev.schema), "ts", Seq("event_id"), "3650 days")
        val q = dedup.writeStream.outputMode("append")
          .option("checkpointLocation", Lifecycle.tmpDir("q134c"))
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .start()
        drain(q, "q134", 2)
      }
      readAs(s, out, ev.schema)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_distinct"))
        .orderBy("user_id")
    },

    // q134's exact dedup pipeline under the RocksDB state-store
    // provider — the backend-invariance gate for the named q134
    // design point (SCALE.md: dedup state is one row per distinct
    // key, 3.28 GB at 100× in the in-memory provider; RocksDB is the
    // production backend that takes that state off-heap/on-disk).
    // Same oracle as the relational dedup: the RESULT must be
    // byte-identical whichever backend holds the state, and the
    // [stream] telemetry line (tag q527) records the RocksDB lanes
    // next to q134's HDFS-backed ones.
    //
    // DEPLOYMENT (round-10 config sweep, SCALE.md "RocksDB
    // wall-premium probe"): swap to RocksDB when distinct keys × row
    // size threatens executor heap — the state-size win is 68×
    // (47.9 MB vs 3.28 GB at 10 M keys) and NO config tuning removes
    // the ~3.5× stateUpdate write-path wall premium, so small hot
    // state should stay on the in-memory provider. When on RocksDB:
    // enable changelogCheckpointing (commit lane ~25× cheaper, ships
    // deltas instead of snapshots to the checkpoint store) and use
    // boundedMemoryUsage to make per-executor state memory
    // predictable, not to chase wall.
    "q527_stream_dedup_rocksdb" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q527s")
      val out = Lifecycle.tmpDir("q527o")
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"), col("user_id"))
      ev.unionAll(ev).repartition(4).write.mode("overwrite").parquet(stage)
      withConf(s, "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider") {
       // run RocksDB the way this repo's OWN deployment advice says to
       // (SCALE.md "RocksDB wall-premium probe", round-10): changelog
       // checkpointing ships per-batch DELTAS to the checkpoint store
       // instead of full snapshots — the commit lane the probe measured
       // ~25× cheaper. Results are backend-invariant either way (that
       // is what this gate pins); scoped to the gate and restored.
       withConf(s, "spark.sql.streaming.stateStore.rocksdb." +
           "changelogCheckpointing.enabled", "true") {
        withShufflePartitions(s, 4) {
          val dedup = StreamIngest.dedupedStream(
            streamOf(s, stage, ev.schema), "ts", Seq("event_id"), "3650 days")
          val q = dedup.writeStream.outputMode("append")
            .option("checkpointLocation", Lifecycle.tmpDir("q527c"))
            .foreachBatch { (b: Dataset[Row], _: Long) =>
              b.write.mode("append").parquet(out)
            }
            .start()
          drain(q, "q527", 2)
        }
       }
      }
      readAs(s, out, ev.schema)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_distinct"))
        .orderBy("user_id")
    },

    // Streaming event-time windowed aggregation: hourly tumbling
    // windows with a watermark, drained in complete mode through
    // foreachBatch (each batch overwrites the landing dir with full
    // window state — the final batch has seen every file, so the
    // read-back equals the batch answer; append mode would hold back
    // windows the watermark hasn't passed, which is not a fixed set).
    // value sums stay in exact integer micros-cents (decimal-scaled
    // long) so cross-batch state accumulation is order-free.
    "q150_stream_window" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q150s")
      val out = Lifecycle.tmpDir("q150o")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)").as("vmilli"))
      ev.repartition(4).write.mode("overwrite").parquet(stage)
      val aggSchema = withShufflePartitions(s, 4) {
        val agg = StreamIngest.windowedAgg(
          streamOf(s, stage, ev.schema), "ts", "event_type", "vmilli",
          "1 hour", "2 hours")
        val q = agg.writeStream.outputMode("complete")
          .option("checkpointLocation", Lifecycle.tmpDir("q150c"))
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("overwrite").parquet(out)
          }
          .start()
        drain(q, "q150", 2)
        agg.schema
      }
      readAs(s, out, aggSchema)
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n_events"), col("total_value").as("vmilli_sum"))
        .orderBy("win_start", "event_type")
    },

    // Watermarked stream-stream interval join: even events (left)
    // joined to odd events (right) of the same user within
    // [lts, lts + 30 min], each side staged as 2 files and streamed
    // one file per trigger so matches genuinely form ACROSS
    // micro-batches out of the join's keyed state. The watermark
    // delay exceeds the data's span, so no state is evicted mid-run
    // and the append-mode inner join must emit exactly the relational
    // interval join — which is what the oracle computes. The lag sum
    // is exact integer microseconds.
    "q178_stream_interval_join" -> { (s, d) =>
      val stageL = Lifecycle.tmpDir("q178l")
      val stageR = Lifecycle.tmpDir("q178r")
      val out = Lifecycle.tmpDir("q178o")
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"), col("user_id"))
      val l = ev.filter(col("event_id") % 2 === 0)
        .select(col("event_id").as("lid"), col("ts").as("lts"), col("user_id"))
      val r = ev.filter(col("event_id") % 2 =!= 0)
        .select(col("event_id").as("rid"), col("ts").as("rts"), col("user_id"))
      l.repartition(2).write.mode("overwrite").parquet(stageL)
      r.repartition(2).write.mode("overwrite").parquet(stageR)
      val joinedSchema = withShufflePartitions(s, 4) {
        val joined = StreamIngest.intervalJoin(
          streamOf(s, stageL, l.schema, filesPerTrigger = 1),
          streamOf(s, stageR, r.schema, filesPerTrigger = 1),
          Seq("user_id"), "lts", "rts",
          before = "0 seconds", after = "30 minutes", watermark = "3650 days")
        val q = joined.writeStream.outputMode("append")
          .option("checkpointLocation", Lifecycle.tmpDir("q178c"))
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .start()
        drain(q, "q178", 2)
        joined.schema
      }
      readAs(s, out, joinedSchema)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("unix_micros(rts) - unix_micros(lts)")).as("sum_lag_us"))
        .orderBy("user_id")
    },

    // Stream-stream LEFT OUTER interval join — the enrichment shape
    // where "no match" is itself the signal (impressions with no
    // click inside the attribution window). Unlike the inner join
    // (q178), an unmatched left row can only emit once BOTH
    // watermarks pass its join window, so this gates the
    // watermark-driven null-extension path — the state-eviction
    // semantics outer stream joins exist for.
    //
    // ARRIVAL-SHAPE PIN (measured, round 9): with the default 2-file
    // staging, no intermediate watermark passes any row mid-run, the
    // single final no-data batch evicts-and-emits the complete
    // unmatched set, and the result is bit-exact vs the
    // complete-emission oracle — run-deterministic across rounds,
    // partitions, and cpu counts. Under MULTI-batch arrival Spark's
    // null-emission set is NOT a function of the data alone: time-
    // ordered 5/20/50-slice layouts emitted 79%/60%/66% of the
    // oracle's unmatched rows, random 20-slice 10%, and two identical
    // ordered-5 runs differed from each other (race in the
    // eviction/no-data-batch path). The gate therefore pins the
    // deterministic corner; at production scale the unmatched lane
    // should come from the stream INNER join (data-complete, q178)
    // plus a periodic batch anti-join reconciliation — the shape this
    // library's Merge/delta already provides. Probe knobs:
    // SPARK_GRAFT_STREAM_STAGE / SPARK_GRAFT_STREAM_ORDERED below.
    "q201_stream_outer_join" -> { (s, d) =>
      val stageL = Lifecycle.tmpDir("q201l")
      val stageR = Lifecycle.tmpDir("q201r")
      val out = Lifecycle.tmpDir("q201o")
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"), col("user_id"))
      val l = ev.filter(col("event_id") % 3 === 0)
        .select(col("event_id").as("lid"), col("ts").as("lts"), col("user_id"))
      val r = ev.filter(col("event_id") % 3 === 1)
        .select(col("event_id").as("rid"), col("ts").as("rts"), col("user_id"))
      // Probe-only staging knobs (never set by the driver; the gate's
      // default layout is unchanged): SPARK_GRAFT_STREAM_STAGE=N
      // stages N files per side, SPARK_GRAFT_STREAM_ORDERED=1 makes
      // them contiguous TIME slices (range-partitioned on event time,
      // path order = time order) — the realistic arrival shape, under
      // which the watermark advances per micro-batch and join state
      // stays interval-bounded instead of corpus-sized. The RESULT is
      // arrival-robust by construction (the final compare keeps only
      // join windows provably below the final watermark), which the
      // dev loop re-verifies bit-exact under both layouts.
      // Honored ONLY under SPARK_GRAFT_ONLY (the dev-loop / probe
      // marker, round-10 advisor fix): by this code's own round-9
      // measurements, multi-batch layouts make Spark's outer-join null
      // emission run-nondeterministic, so a stray env var must never
      // be able to change a correctness-gated driver run.
      val devLoop = sys.env.contains("SPARK_GRAFT_ONLY")
      val nStage =
        if (devLoop)
          sys.env.get("SPARK_GRAFT_STREAM_STAGE").map(_.toInt).getOrElse(2)
        else 2
      val ordered =
        devLoop && sys.env.get("SPARK_GRAFT_STREAM_ORDERED").contains("1")
      def stage(df: DataFrame, tsCol: String, dir: String): Unit =
        (if (ordered)
          df.repartitionByRange(nStage, col(tsCol)).sortWithinPartitions(tsCol)
        else df.repartition(nStage))
          .write.mode("overwrite").parquet(dir)
      stage(l, "lts", stageL)
      stage(r, "rts", stageR)
      val joinedSchema = withShufflePartitions(s, 4) {
        val joined = StreamIngest.intervalJoin(
          streamOf(s, stageL, l.schema, filesPerTrigger = 1),
          streamOf(s, stageR, r.schema, filesPerTrigger = 1),
          Seq("user_id"), "lts", "rts",
          before = "0 seconds", after = "10 minutes",
          watermark = "30 minutes", joinType = "left_outer")
        val q = joined.writeStream.outputMode("append")
          .option("checkpointLocation", Lifecycle.tmpDir("q201c"))
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .start()
        drain(q, "q201", 2)
        joined.schema
      }
      // final watermark = min(max lts, max rts) − 30 min; keep only
      // join windows ending ≥ 5 min below it (emission provably done)
      val wm = l.agg(max(expr("unix_micros(lts)")).as("ml"))
        .crossJoin(r.agg(max(expr("unix_micros(rts)")).as("mr")))
        .select(expr("least(ml, mr) - 1800000000").as("w"))
      readAs(s, out, joinedSchema)
        .withColumn("ltsu", expr("unix_micros(lts)"))
        .withColumn("rtsu", expr("unix_micros(rts)"))
        .crossJoin(broadcast(wm))
        .filter(col("ltsu") + 600000000L < col("w") - 300000000L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_rows"),
          count(col("rid")).as("n_matched"),
          (count(lit(1)) - count(col("rid"))).as("n_unmatched"),
          coalesce(sum(col("rtsu") - col("ltsu")), lit(0L)).as("sum_lag_us"))
        .orderBy("user_id")
    },

    // EMISSION-COMPLETE left-outer interval join (round-10, verdict
    // #1): the production composition SCALE.md §q201 recommends,
    // shipped as a first-class operator
    // (StreamIngest.reconcileOuterIntervalJoin). The stream lane is
    // the INNER interval join (matched pairs, low latency); a batch
    // reconciliation over the settled inputs backfills pairs the
    // stream lane dropped and derives the unmatched null-extended
    // lane by anti-join — so the result equals the batch left-outer
    // join bit-for-bit no matter how arrival was batched or ordered.
    //
    // The gate therefore runs the ADVERSARIAL corner q201 must avoid:
    // 5 hash-sliced micro-batches per side, each slice spanning the
    // FULL time range (the layout under which the raw outer join
    // emitted 10% of the oracle's unmatched rows and the inner lane
    // itself loses evicted-partner pairs). No watermark-settled
    // filter is needed — completeness is by construction, and the
    // oracle is the PLAIN left outer interval join over all data.
    "q534_stream_reconciled_outer_join" -> { (s, d) =>
      val stageL = Lifecycle.tmpDir("q534l")
      val stageR = Lifecycle.tmpDir("q534r")
      val out = Lifecycle.tmpDir("q534o")
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"), col("user_id"))
      val l = ev.filter(col("event_id") % 3 === 0)
        .select(col("event_id").as("lid"), col("ts").as("lts"), col("user_id"))
      val r = ev.filter(col("event_id") % 3 === 1)
        .select(col("event_id").as("rid"), col("ts").as("rts"), col("user_id"))
      // ONE partitioned write per side (5 hash-slice subdirs, 1 file
      // each) instead of 5 sequential coalesce(1) jobs: arrival order
      // under near-identical mod-times is whatever the file source
      // picks — WHICH IS THE POINT: the reconciled result is a pure
      // function of the data, so the gate tolerates (and the corpus
      // layout guarantees) adversarial multi-batch arrival.
      def stage(df: DataFrame, idCol: String, dir: String): Unit =
        df.withColumn("slice", pmod(xxhash64(col(idCol)), lit(5)))
          .repartition(5, col("slice"))
          .write.partitionBy("slice").mode("overwrite").parquet(dir)
      stage(l, "lid", stageL)
      stage(r, "rid", stageR)
      def sliceStream(dir: String, sch: org.apache.spark.sql.types.StructType) =
        s.readStream.schema(sch).option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true").parquet(dir)
      withShufflePartitions(s, 4) {
        val joined = StreamIngest.intervalJoin(
          sliceStream(stageL, l.schema),
          sliceStream(stageR, r.schema),
          Seq("user_id"), "lts", "rts",
          before = "0 seconds", after = "10 minutes",
          watermark = "30 minutes", joinType = "inner")
        val q = joined.writeStream.outputMode("append")
          .option("checkpointLocation", Lifecycle.tmpDir("q534c"))
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .start()
        drain(q, "q534", 2)
      }
      // explicit schema: under full-range disorder the inner lane may
      // legitimately emit nothing at tiny scale (all partner state
      // evicted) — an empty out dir must read as an empty frame, and
      // the reconciliation still produces the complete result
      val matchedSchema = org.apache.spark.sql.types.StructType(
        l.schema.fields ++ r.schema.fields.filterNot(_.name == "user_id"))
      val streamMatched = s.read.schema(matchedSchema).parquet(out)
      // settled inputs = the staged (ingested) files themselves
      // (recursive lookup: the slice subdirs are arrival layout, not a
      // partition column)
      val lB = s.read.schema(l.schema)
        .option("recursiveFileLookup", "true").parquet(stageL)
      val rB = s.read.schema(r.schema)
        .option("recursiveFileLookup", "true").parquet(stageR)
      val complete = StreamIngest.reconcileOuterIntervalJoin(
        streamMatched, lB, rB, Seq("user_id"), "lts", "rts",
        "0 seconds", "10 minutes", "lid", "rid")
      System.err.println(s"[stream] q534 inner-lane emitted " +
        s"${streamMatched.count()} matched pairs pre-reconcile")
      complete
        .withColumn("ltsu", expr("unix_micros(lts)"))
        .withColumn("rtsu", expr("unix_micros(rts)"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_rows"),
          count(col("rid")).as("n_matched"),
          (count(lit(1)) - count(col("rid"))).as("n_unmatched"),
          coalesce(sum(col("rtsu") - col("ltsu")), lit(0L)).as("sum_lag_us"))
        .orderBy("user_id")
    },

    // Streaming INCREMENTAL VIEW MAINTENANCE: the per-status revenue
    // rollup maintained across micro-batches by DeltaAgg.merge inside
    // foreachBatch — the integration gate tying the streaming stack
    // to the IVM operator. Change rows (op = ±1) arrive as files:
    // base inserts first, then one CDC batch mixing 1997+ inserts
    // with retractions of every 13th pre-1997 order. State versions
    // land per batch (v<batchId> dirs — never read-and-overwrite the
    // same path); the final state must equal a recompute over the net
    // row set — the SAME oracle as batch q457, so the gate pins that
    // micro-batch boundaries are invisible (DeltaAgg's composition
    // law, state ⊕ Δ₁ ⊕ Δ₂ ≡ state ⊕ (Δ₁ ⊎ Δ₂), exercised through a
    // real stream instead of a spec frame).
    "q487_stream_ivm" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q487s")
      val stateRoot = Lifecycle.tmpDir("q487state")
      val cents = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
      val src = Tables.orders(s, d)
        .select(col("o_orderstatus").as("status"), expr(cents).as("cents"),
          col("o_orderkey"), col("o_orderdate"))
      val base = src.filter(expr("o_orderdate < TIMESTAMP '1997-01-01'"))
      base.select(col("status"), col("cents")).withColumn("op", lit(1))
        .repartition(2).write.mode("overwrite").parquet(stage)
      val changeSchema = base.select(col("status"), col("cents"))
        .withColumn("op", lit(1)).schema
      // state-version schema is CONSTANT across batches (DeltaAgg's
      // merge output shape) — deriving it here is a pure
      // transformation, and supplying it to every per-batch state read
      // drops one footer-inference job per micro-batch
      val stateSchema = graft.operators.DeltaAgg.fromBase(
        src.limit(0).select(col("status"), col("cents")),
        Seq("status"), "cents").schema
      withShufflePartitions(s, 4) {
        var cur: Option[String] = None
        val q = streamOf(s, stage, changeSchema).writeStream
          .option("checkpointLocation", Lifecycle.tmpDir("q487c"))
          .foreachBatch { (b: Dataset[Row], id: Long) =>
            val st0 = cur.map(p => readAs(s, p, stateSchema)).getOrElse(
              graft.operators.DeltaAgg.fromBase(
                b.limit(0), Seq("status"), "cents"))
            val next = s"$stateRoot/v$id"
            graft.operators.DeltaAgg.merge(
                st0, b.toDF(), Seq("status"), "cents", "op")
              .coalesce(1).write.mode("overwrite").parquet(next)
            cur = Some(next)
          }
          .start()
        ensureStopped(q) {
          q.processAllAvailable()
          val ins = src.filter(expr("o_orderdate >= TIMESTAMP '1997-01-01'"))
            .select(col("status"), col("cents")).withColumn("op", lit(1))
          val dels = base.filter(expr("o_orderkey % 13 = 0"))
            .select(col("status"), col("cents")).withColumn("op", lit(-1))
          ins.unionByName(dels).coalesce(1).write.mode("append").parquet(stage)
          drain(q, "q487", 2)
        }
        readAs(s, cur.get, stateSchema).orderBy("status")
      }
    },

    // Streaming CDC upsert: base orders are fully drained FIRST
    // (structural ordering — the update file is only appended after
    // processAllAvailable returns, so no reliance on FileStreamSource
    // mtime ordering), then an update batch triples the price of
    // every key ≡ 0 (mod 7); keyed last-row-wins merge must leave
    // exactly the updated state.
    "q135_stream_upsert" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q135s")
      val out = Lifecycle.tmpDir("q135o")
      val src = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      src.repartition(2).write.mode("overwrite").parquet(stage)
      withShufflePartitions(s, 4) {
        // CDC order is STRUCTURAL, not mtime-based (the q188 probe
        // demonstrated the file source's mtime ordering can flip for
        // files present at the first listing): the stream drains the
        // base files first, and only then does the update file land.
        val q = StreamIngest.upsert(
          streamOf(s, stage, src.schema), out, Seq("o_orderkey"),
          Lifecycle.tmpDir("q135c"))
        ensureStopped(q) {
          q.processAllAvailable()
          src.filter("o_orderkey % 7 = 0")
            .withColumn("o_totalprice", col("o_totalprice") * 3)
            .coalesce(1).write.mode("append").parquet(stage)
          drain(q, "q135", 2)
        }
      }
      ordersStatusRollup(new ParquetDataset(s, out).df)
    },

    // Streaming event-time session windows: per-user sessions with a
    // 6-hour gap, drained in complete mode (the final batch has seen
    // every file, so the landed state is the full session set — the
    // same reason q150 uses complete). Events arrive across ≥2
    // micro-batches shuffled out of time order, so sessions must MERGE
    // in the state store (a late event bridging two provisional
    // sessions collapses them); the oracle is the batch
    // gaps-and-islands sessionization, which is exactly what merged
    // session state must converge to. Session start = min event ts,
    // and an event at EXACTLY gap distance starts a new session
    // (session windows are end-exclusive) — the oracle's >= mirrors
    // that.
    "q185_stream_session" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q185s")
      val out = Lifecycle.tmpDir("q185o")
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"), col("user_id"))
      ev.repartition(4).write.mode("overwrite").parquet(stage)
      val aggSchema = withShufflePartitions(s, 4) {
        val agg = StreamIngest.sessionAgg(
          streamOf(s, stage, ev.schema), "ts", "user_id",
          gap = "6 hours", watermark = "3650 days")
        val q = agg.writeStream.outputMode("complete")
          .option("checkpointLocation", Lifecycle.tmpDir("q185c"))
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("overwrite").parquet(out)
          }
          .start()
        drain(q, "q185", 2)
        agg.schema
      }
      readAs(s, out, aggSchema)
        .select(col("user_id"), col("session_window.start").as("win_start"),
          col("n_events"))
        .orderBy("user_id", "win_start")
    },

    // Custom keyed streaming state (flatMapGroupsWithState): running
    // per-user totals that must survive micro-batch boundaries in the
    // state store. Each batch emits the key's cumulative row; the
    // read-back takes the row with the highest count per key (counts
    // strictly increase across a key's emissions), which must equal
    // the batch groupBy — value sums ride exact integer millis in
    // doubles, so cross-batch fold order cannot perturb the hash.
    "q186_stream_stateful" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q186s")
      val out = Lifecycle.tmpDir("q186o")
      val ev = Tables.events(s, d).select(
        col("user_id").cast("long").as("key"),
        expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)")
          .cast("double").as("value"))
      ev.repartition(4).write.mode("overwrite").parquet(stage)
      val totalsSchema = withShufflePartitions(s, 4) {
        import s.implicits._
        val totals = StreamIngest.statefulTotals(
          streamOf(s, stage, ev.schema).as[StreamIngest.KeyedEvent])
        val q = totals.toDF().writeStream.outputMode("update")
          .option("checkpointLocation", Lifecycle.tmpDir("q186c"))
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .start()
        drain(q, "q186", 2)
        totals.toDF().schema
      }
      readAs(s, out, totalsSchema)
        .groupBy("key")
        .agg(max("n").as("n_events"),
          expr("max_by(total, n)").cast("bigint").as("vmilli_total"))
        .orderBy("key")
    },

    // The Spark-4 arbitrary-state API (transformWithState +
    // StatefulProcessor over handle-based typed ValueState, RocksDB
    // provider — the only store the new API runs on): running per-key
    // count and max across micro-batches. Semantics gate: the final
    // emission per key (highest n — counts strictly increase) must
    // equal the batch groupBy. The provider conf is scoped to this
    // stream and restored for the read-back.
    "q388_stream_transform_state" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q388s")
      val out = Lifecycle.tmpDir("q388o")
      val ev = Tables.events(s, d).select(
        col("user_id").cast("long").as("key"),
        expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)")
          .cast("double").as("value"))
      ev.repartition(4).write.mode("overwrite").parquet(stage)
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = s.conf.getOption(provKey)
      s.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      // deployment-advised RocksDB shape (SCALE.md round-10 probe, the
      // q527 note): changelog checkpointing ships per-batch deltas to
      // the checkpoint store instead of full snapshots; the result is
      // backend-invariant (that is what this gate pins). Scoped to the
      // gate via the same save/restore discipline as the provider.
      val clKey = "spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled"
      val prevCl = s.conf.getOption(clKey)
      s.conf.set(clKey, "true")
      val runningSchema = try withShufflePartitions(s, 4) {
        import s.implicits._
        val running = StreamIngest.runningStats(
          streamOf(s, stage, ev.schema).as[StreamIngest.KeyedEvent])
        val q = running.toDF().writeStream.outputMode("update")
          .option("checkpointLocation", Lifecycle.tmpDir("q388c"))
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .start()
        drain(q, "q388", 2)
        running.toDF().schema
      } finally {
        prevProv match {
          case Some(v) => s.conf.set(provKey, v)
          case None => s.conf.unset(provKey)
        }
        prevCl match {
          case Some(v) => s.conf.set(clKey, v)
          case None => s.conf.unset(clKey)
        }
      }
      readAs(s, out, runningSchema)
        .groupBy("key")
        .agg(max("n").as("n_events"),
          expr("max_by(vmax, n)").as("vmilli_max"))
        .orderBy("key")
    },

    // Stream-STATIC enrichment join — the remaining production
    // streaming shape (q178 covers stream-stream): each micro-batch
    // joins the event stream against a static dimension (customer
    // segments), which Spark re-plans per batch as a broadcast hash
    // join — no state store involved, so the stateless-join path's
    // exactly-once is what's under test. Inner-join semantics on the
    // overlapping key range (every user_id has a customer row here)
    // must reproduce the batch join exactly: the read-back per-segment
    // rollup hash-matches the relational join the oracle computes.
    "q194_stream_static_enrich" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q194s")
      val out = Lifecycle.tmpDir("q194o")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)").as("vmilli"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      ev.repartition(4).write.mode("overwrite").parquet(stage)
      val joinedSchema = withShufflePartitions(s, 4) {
        val joined = streamOf(s, stage, ev.schema)
          .join(broadcast(dim), col("user_id") === col("c_custkey"))
        val q = joined.writeStream.outputMode("append")
          .option("checkpointLocation", Lifecycle.tmpDir("q194c"))
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .start()
        ensureStopped(q)(drain(q, "q194", 2))
        joined.schema
      }
      readAs(s, out, joinedSchema)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum("vmilli").as("vmilli_sum"))
        .orderBy("c_mktsegment")
    },

    // Watermark LATE-DATA DROP semantics — the property every other
    // streaming gate deliberately sidesteps with huge watermarks, and
    // THE one that bounds state at ingest scale: a window whose end
    // the watermark has passed finalizes and evicts; rows for it that
    // arrive later are dropped, not merged. The batch order is
    // STRUCTURAL, not mtime-dependent: the stream starts with only
    // the on-time file present and drains (watermark advances to
    // max(on-time ts) - 1h); only then is the late pack written and
    // drained — its hour windows all ended weeks before the watermark,
    // so every late row must drop. Append mode emits exactly the
    // finalized windows, so the landed output is (on-time rows,
    // windows with end <= watermark) — which is precisely what the
    // oracle computes in batch SQL. Watermark boundary ties cannot
    // occur: window ends are hour-aligned, the watermark is
    // max(ts) - 1h for a microsecond-random max ts.
    "q188_stream_late_drop" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q188s")
      val out = Lifecycle.tmpDir("q188o")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)").as("vmilli"))
      val isLate = col("event_id") % 7 === 0 &&
        col("ts") < lit("2024-01-08").cast("timestamp")
      val onTime = ev.filter(!isLate)
      val late = ev.filter(isLate)
      // the drop-everything analysis needs the late pack non-empty and
      // the on-time max ts well past the cut (wm1 >> every late window)
      // — ONE aggregate pass for both guards (null-safe: an all-late
      // sf leaves maxOnTime null, which must fail the require, not NPE)
      val pre = ev.agg(
        sum(when(isLate, 1L).otherwise(0L)).as("n_late"),
        max(when(!isLate, col("ts"))).as("max_on_time")).head
      require(!pre.isNullAt(0) && pre.getLong(0) > 0,
        "q188: late pack is empty at this sf")
      require(Option(pre.getTimestamp(1)).exists(_.getTime >
        java.time.Instant.parse("2024-01-09T00:00:00Z").toEpochMilli),
        "q188: on-time data must extend past the late cut + 1 day")
      onTime.coalesce(1).write.mode("overwrite").parquet(stage)
      val aggSchema = withShufflePartitions(s, 4) {
        val agg = StreamIngest.windowedAgg(
          streamOf(s, stage, ev.schema, filesPerTrigger = 1),
          "ts", "event_type", "vmilli", "1 hour", "1 hour")
        val q = agg.writeStream.outputMode("append")
          .option("checkpointLocation", Lifecycle.tmpDir("q188c"))
          .foreachBatch { (b: Dataset[Row], _: Long) =>
            b.write.mode("append").parquet(out)
          }
          .start()
        ensureStopped(q) {
          // phase 1: on-time file only — state builds, watermark advances
          q.processAllAvailable()
          // phase 2: NOW the late pack lands; its rows arrive behind the
          // committed watermark and must be dropped
          late.coalesce(1).write.mode("append").parquet(stage)
          drain(q, "q188", 2)
        }
        agg.schema
      }
      readAs(s, out, aggSchema)
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n_events"), col("total_value").as("vmilli_sum"))
        .orderBy("win_start", "event_type")
    },

    // Exactly-once across a RESTART — the operational property
    // checkpointing exists for: a first query ingests half the data
    // and STOPS; a second query starts from the SAME checkpoint, so
    // its recovered offsets must skip the already-committed file. If
    // recovery replayed it, the first half would land twice and every
    // count/total below would double — the hash gate cannot miss it.
    // (The sink is the batch WritePipeline in append mode, so this
    // also pins that the foreachBatch sink tolerates a stop/start
    // without duplicating or losing a committed batch.)
    "q189_stream_restart" -> { (s, d) =>
      val stage = Lifecycle.tmpDir("q189s")
      val out = Lifecycle.tmpDir("q189o")
      val ckpt = Lifecycle.tmpDir("q189c")
      val src = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      src.filter("o_orderkey % 2 = 0").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      withShufflePartitions(s, 4) {
        val q1 = StreamIngest.append(
          streamOf(s, stage, src.schema, filesPerTrigger = 1), out,
          WriteConfig(), ckpt)
        ensureStopped(q1) {
          q1.processAllAvailable()
          q1.stop() // simulated shutdown AFTER the first file committed
        }
        src.filter("o_orderkey % 2 = 1").coalesce(1)
          .write.mode("append").parquet(stage)
        val q2 = StreamIngest.append(
          streamOf(s, stage, src.schema, filesPerTrigger = 1), out,
          WriteConfig(), ckpt)
        drain(q2, "q189", 1)
      }
      ordersStatusRollup(new ParquetDataset(s, out).df)
    }
  )

  val oracles: Map[String, String] = Map(

    "q194_stream_static_enrich" ->
      """SELECT c_mktsegment,
        | COUNT(*) AS n_events,
        | COUNT(DISTINCT user_id) AS n_users,
        | CAST(SUM(CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)) AS BIGINT)
        |   AS vmilli_sum
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q133_stream_append" -> OrdersStatusRollupSql,

    "q134_stream_dedup" ->
      """SELECT user_id,
        | COUNT(*) AS n_events,
        | COUNT(DISTINCT event_id) AS n_distinct
        |FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // backend invariance: identical relational truth as q134
    "q527_stream_dedup_rocksdb" ->
      """SELECT user_id,
        | COUNT(*) AS n_events,
        | COUNT(DISTINCT event_id) AS n_distinct
        |FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q150_stream_window" ->
      """SELECT date_trunc('hour', ts::TIMESTAMP) AS win_start,
        | event_type,
        | count(*) AS n_events,
        | CAST(SUM(CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)) AS BIGINT)
        |   AS vmilli_sum
        |FROM events
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,

    "q178_stream_interval_join" ->
      """WITH e AS (
        |  SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events),
        |l AS (SELECT event_id AS lid, ts AS lts, user_id FROM e WHERE event_id % 2 = 0),
        |r AS (SELECT event_id AS rid, ts AS rts, user_id FROM e WHERE event_id % 2 = 1),
        |j AS (
        |  SELECT l.user_id, epoch_us(rts - lts) AS lag_us
        |  FROM l JOIN r ON l.user_id = r.user_id
        |   AND rts >= lts AND rts <= lts + INTERVAL 30 MINUTE)
        |SELECT user_id, COUNT(*) AS n_pairs,
        |  CAST(SUM(lag_us) AS BIGINT) AS sum_lag_us
        |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q201_stream_outer_join" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts::TIMESTAMP) AS tsu, user_id FROM events),
        |l AS (SELECT event_id AS lid, tsu AS ltsu, user_id FROM e WHERE event_id % 3 = 0),
        |r AS (SELECT event_id AS rid, tsu AS rtsu, user_id FROM e WHERE event_id % 3 = 1),
        |wm AS (SELECT least((SELECT max(ltsu) FROM l), (SELECT max(rtsu) FROM r))
        |              - 1800000000 AS w),
        |j AS (
        |  SELECT l.user_id, l.lid, l.ltsu, r.rid, r.rtsu
        |  FROM l LEFT JOIN r
        |    ON l.user_id = r.user_id
        |   AND r.rtsu >= l.ltsu AND r.rtsu <= l.ltsu + 600000000),
        |f AS (SELECT j.* FROM j, wm WHERE j.ltsu + 600000000 < wm.w - 300000000)
        |SELECT user_id, COUNT(*) AS n_rows, COUNT(rid) AS n_matched,
        |       COUNT(*) - COUNT(rid) AS n_unmatched,
        |       CAST(COALESCE(SUM(rtsu - ltsu), 0) AS BIGINT) AS sum_lag_us
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,

    // complete-emission truth, NO settled-watermark filter: the
    // reconciled composition must equal the plain batch outer join
    "q534_stream_reconciled_outer_join" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts::TIMESTAMP) AS tsu, user_id FROM events),
        |l AS (SELECT event_id AS lid, tsu AS ltsu, user_id FROM e WHERE event_id % 3 = 0),
        |r AS (SELECT event_id AS rid, tsu AS rtsu, user_id FROM e WHERE event_id % 3 = 1),
        |j AS (
        |  SELECT l.user_id, l.lid, l.ltsu, r.rid, r.rtsu
        |  FROM l LEFT JOIN r
        |    ON l.user_id = r.user_id
        |   AND r.rtsu >= l.ltsu AND r.rtsu <= l.ltsu + 600000000)
        |SELECT user_id, COUNT(*) AS n_rows, COUNT(rid) AS n_matched,
        |       COUNT(*) - COUNT(rid) AS n_unmatched,
        |       CAST(COALESCE(SUM(rtsu - ltsu), 0) AS BIGINT) AS sum_lag_us
        |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q487_stream_ivm" ->
      """WITH upd AS (
        |  SELECT o_orderstatus AS status,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |     OR o_orderkey % 13 <> 0)
        |SELECT status, COUNT(*) AS n_rows,
        |  COUNT(cents) AS n_vals,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM upd GROUP BY 1 ORDER BY status""".stripMargin,

    "q135_stream_upsert" ->
      """SELECT o_orderstatus,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
        |                    THEN o_totalprice * 3
        |                    ELSE o_totalprice END
        |          AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q185_stream_session" ->
      """WITH e AS (
        |  SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events),
        |flags AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT user_id, MIN(ts) AS win_start, COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, win_start""".stripMargin,

    "q186_stream_stateful" ->
      """SELECT CAST(user_id AS BIGINT) AS key,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)) AS BIGINT)
        |   AS vmilli_total
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q388_stream_transform_state" ->
      """SELECT CAST(user_id AS BIGINT) AS key,
        | COUNT(*) AS n_events,
        | CAST(MAX(CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT))
        |   AS BIGINT) AS vmilli_max
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q188_stream_late_drop" ->
      """WITH e AS (
        |  SELECT event_id, ts::TIMESTAMP AS ts, event_type,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS vmilli
        |  FROM events),
        |b1 AS (
        |  SELECT * FROM e
        |  WHERE NOT (event_id % 7 = 0 AND ts < TIMESTAMP '2024-01-08')),
        |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM b1)
        |SELECT date_trunc('hour', ts) AS win_start, event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(vmilli) AS BIGINT) AS vmilli_sum
        |FROM b1, wm
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= w
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q189_stream_restart" -> OrdersStatusRollupSql
  )
}
