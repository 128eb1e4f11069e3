package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Delete, Merge}
import graft.sources.{ParquetDataset, WriteConfig, WritePipeline}

/** Round-11 inventory. Same determinism contract as
  * [[Analytics]]–[[Analytics9]]: integer lanes end-to-end; every
  * oracle aggregate/div lane CAST to BIGINT; fixed-size panels via
  * count-derived hash-bucket moduli; loud guards on every invariant
  * the query's law depends on.
  *
  * Reference behavior: pydala2 exposes none of these — they are the
  * scale-path halves of two round-10 operators (SURVEY.md "beyond the
  * reference"): the SHARDED form of the greedy sequence packer
  * (bounding per-task state by the shard width, not the corpus) and
  * the INCREMENTAL form of eval-set decontamination (the gram index
  * maintained through the managed merge path instead of recomputed).
  */
object Analytics10 {

  private val Sp = graft.functions.PortableSql.Spark
  private val Du = graft.functions.PortableSql.Duck

  /** Shard width for q544, in doc_id units: each (source, shard)
    * fold sees at most this many docs, so executor-local fold state is
    * O(SHARD) regardless of corpus size.
    */
  private val Shard = 64L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q544: sharded greedy sequence packing ----------------------
    // The 100 TB form of q543's first-fit-in-order packer
    // (Analytics9.scala q543 documents the strategy; this gates it):
    // docs shard by (source, doc_id div 64) and each shard folds
    // INDEPENDENTLY — per-task array state is bounded by the shard
    // width, not the corpus, so the packer scales by adding shards.
    // The law that makes the decomposition safe (the q541 pattern):
    // each shard force-closes at most its one tail bin, so
    //   onefold ≤ sharded ≤ onefold + (n_shards − 1)
    // — asserted EXACTLY in both engines (next-fit is subadditive
    // under concatenation and a forced close costs at most one bin).
    "q544_packing_sharded" -> { (s, dir) =>
      val d = Analytics9.corpus(s, dir)
        .select(col("doc_id"), col("source"),
          expr(s"CAST(${Sp.size(Sp.tokens("text"))} AS BIGINT)").as("n"))
        .withColumn("n", expr("CASE WHEN n > 512 THEN " +
          "CAST(raise_error('q544: doc wider than the 512-token window') " +
          "AS BIGINT) ELSE n END"))
        .filter(col("n") > 0)
      val perShard = d
        .withColumn("sh", expr(s"doc_id div $Shard"))
        .groupBy("source", "sh")
        .agg(expr("sort_array(collect_list(struct(doc_id, n)))").as("ord"))
        .withColumn("st", expr(Analytics9.packFold(Sp,
          "transform(ord, s -> s.n)")))
        .select(col("source"),
          expr("element_at(st, 1) + CASE WHEN element_at(st, 2) > 0 " +
            "THEN 1 ELSE 0 END").as("bins"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_shards"), sum("bins").as("n_bins"))
      val oneFold = d
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"),
          expr("sort_array(collect_list(struct(doc_id, n)))").as("ord"))
        .withColumn("st", expr(Analytics9.packFold(Sp,
          "transform(ord, s -> s.n)")))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("element_at(st, 1) + CASE WHEN element_at(st, 2) > 0 " +
            "THEN 1 ELSE 0 END").as("n_bins_onefold"))
      oneFold.join(perShard, Seq("source"))
        .withColumn("slack_bins", expr(
          "CASE WHEN n_bins < n_bins_onefold OR " +
            "n_bins > n_bins_onefold + n_shards - 1 THEN " +
            "CAST(raise_error('q544: shard decomposition law violated') " +
            "AS BIGINT) ELSE n_bins - n_bins_onefold END"))
        .select("source", "n_docs", "n_tokens", "n_shards", "n_bins",
          "n_bins_onefold", "slack_bins")
        .orderBy("source")
    },

    // ---- q545: incremental eval-set decontamination ------------------
    // q535's recompute, re-expressed as the job a pipeline actually
    // runs hourly (round-10 verdict #6, the q540 pattern): the train
    // 3-gram index is a PERSISTED keyed dataset maintained through the
    // managed merge path — base corpus (~80% of train docs,
    // hash-bucketed) writes it, an update batch (the remaining docs
    // PLUS a re-signed unchanged slice — upsert no-ops) merges in
    // keyed on the gram. The gate: contamination counts probed against
    // the merged index must equal the full recompute — the oracle IS
    // q535's recompute SQL, so any row the merge lost or duplicated
    // breaks the hash. At 100 TB the merge's semi-join probe touches
    // only matched index files; the rebuild it replaces scans every
    // train doc.
    "q545_decontam_incremental" -> { (s, dir) =>
      // query-local pin (the q540 pattern): count + base write + merge
      // each re-traverse the tokenized corpus; released before return
      // Round-12 variant matrix (quiet box, 2 reps each):
      // spread+persist 3.94/4.19 s; persist-only 3.37/3.43 s (shipped);
      // neither 3.53/4.58 s. The gram explodes re-traverse the
      // tokenized frame several times, so the query-local pin stays —
      // but the corpus()-spread exchange costs more than it buys here
      // (see q540's note; spread remains for the single-action corpus
      // queries where r11's plan evidence holds).
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), expr(Sp.tokens("text")).as("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val emod = math.max(1L, docs.count() / 10L)
      // the SAME fixed eval panel as q535 — the oracle equality is
      // only meaningful if both paths score identical docs
      val evSel = s"${Sp.hash64("concat('ev:', doc_id)")} % $emod = 0"
      val ev = docs.filter(expr(evSel))
      val train = docs.filter(expr(s"NOT ($evSel)"))
      def grams(d: DataFrame): DataFrame = d
        .select(explode(expr(Sp.shingles("toks", 3))).as("g"))
        .distinct().withColumn("seen", lit(1L))
      val bucket = s"${Sp.hash64("concat('ix:', doc_id)")} % 5"
      val base = train.filter(expr(s"$bucket <> 0")) // ~80%
      // new docs (bucket 0) + an unchanged slice (bucket 1): the
      // re-signed grams must upsert as no-ops, not duplicates
      val upd = train.filter(expr(s"$bucket <= 1"))
      val idxDir = Lifecycle.tmpDir("q545idx")
      WritePipeline.write(grams(base), idxDir, WriteConfig())
      val ds = new ParquetDataset(s, idxDir)
      Merge(ds, grams(upd), Seq("g"), "upsert")
      docs.unpersist() // the probe below re-derives ev lazily; setup reuse is done
      val idx = Lifecycle.readAs(s, idxDir, grams(base).schema).select("g")
      val evg = ev.select(col("doc_id"), col("source"),
        explode(expr(Sp.shingles("toks", 3))).as("g")).distinct()
      // inverted probe (the q535 shape): the panel-bounded eval grams
      // broadcast to the streamed index scan — no index-side shuffle;
      // index grams are unique so the inner join is 1:1 with the semi
      val perDoc = idx.join(broadcast(evg), Seq("g"))
        .groupBy("doc_id").agg(count(lit(1)).as("hg"))
      ev.select("doc_id", "source")
        .join(perDoc, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_eval"),
          count(col("hg")).as("n_contam"),
          coalesce(sum("hg"), lit(0L)).as("n_hit_grams"),
          expr("count(hg) * 1000 div count(1)").as("contam_milli"))
        .orderBy("source")
    },

    // ---- q546: gram-index retraction (right-to-be-forgotten) --------
    // The maintenance direction q545 can't express: a train doc is
    // RETRACTED (takedown/opt-out) and its grams must leave the index
    // — unless another doc still contributes them. The index therefore
    // carries doc-presence COUNTS (g, cnt); one delta pass over the
    // add+retract batch joins ONLY the affected grams (left-semi probe
    // — never a full index scan), Merge upserts the new counts, and
    // the zero-count rows leave through the row-level Delete operator
    // (`cnt = 0` — data-driven, no driver-side key list). A negative
    // count is a loud invariant failure (retracting a doc that was
    // never indexed). The gate pins the ENTIRE maintained index
    // against a full recompute over (train ∪ added) \ retracted: the
    // per-count histogram plus an order-independent XOR fingerprint of
    // the 60-bit gram hashes — any lost, kept-too-long, or
    // double-counted gram breaks the hash.
    "q546_decontam_retraction" -> { (s, dir) =>
      // query-local pin (the q540 pattern): base write + delta +
      // checkpointed newCnt each re-traverse the grams; released
      // after the delta is materialized
      // Round-12 variant matrix (quiet box, 2 reps each):
      // spread+persist 5.50/6.12 s; persist-only 5.75/5.96 s (shipped —
      // ties within band, and drops the spread exchange that ships
      // `source`+`text` this gate never uses); neither 5.94/6.30 s.
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), expr(Sp.tokens("text")).as("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val emod = math.max(1L, docs.count() / 10L)
      val evSel = s"${Sp.hash64("concat('ev:', doc_id)")} % $emod = 0"
      val train = docs.filter(expr(s"NOT ($evSel)"))
      def dgrams(d: DataFrame): DataFrame = d
        .select(col("doc_id"), explode(expr(Sp.shingles("toks", 3))).as("g"))
        .distinct()
      val bucket = s"${Sp.hash64("concat('ix:', doc_id)")} % 5"
      val base = train.filter(expr(s"$bucket <> 0"))      // indexed corpus
      val added = train.filter(expr(s"$bucket = 0"))      // new batch
      val retracted = train.filter(expr(s"$bucket = 1"))  // takedown batch
      val idxDir = Lifecycle.tmpDir("q546idx")
      val idxSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType)))
      // key-hash-clustered into few files: the gate's tiny index would
      // otherwise fragment into one file per shuffle partition, and
      // since BOTH swap passes (merge rewrite, zero-count delete)
      // rewrite every affected file, gate wall pays 3× the file count;
      // clustering on g also means a real deployment's delta touches
      // only the key ranges it hits
      WritePipeline.write(
        dgrams(base).groupBy("g").agg(count(lit(1)).as("cnt"))
          .repartition(4, col("g")),
        idxDir, WriteConfig())
      val ds = new ParquetDataset(s, idxDir)
      val delta = dgrams(added).select(col("g"), lit(1L).as("d"))
        .unionByName(dgrams(retracted).select(col("g"), lit(-1L).as("d")))
        .groupBy("g").agg(sum("d").as("d")).filter(col("d") =!= 0)
      val current = Lifecycle.readAs(s, idxDir, idxSchema)
        .join(delta.select("g"), Seq("g"), "left_semi")
      // materialized (lineage severed) BEFORE the merge: this source
      // READS the dataset the merge MUTATES, and Merge's mid-swap
      // refreshByPath invalidates dependent cached plans — a lazy
      // frame would recompute against the half-updated index and
      // double-apply the delta (see the Merge scaladoc's
      // source-reads-target rule)
      val newCnt = delta.join(current, Seq("g"), "left")
        .select(col("g"),
          (coalesce(col("cnt"), lit(0L)) + col("d")).as("cnt"))
        .withColumn("cnt", expr("CASE WHEN cnt < 0 THEN " +
          "CAST(raise_error('q546: retraction underflow — doc was never " +
          "indexed') AS BIGINT) ELSE cnt END"))
        .localCheckpoint(true)
      docs.unpersist() // newCnt is materialized; nothing re-reads the corpus
      Merge(ds, newCnt, Seq("g"), "upsert")
      Delete.where(ds, "cnt = 0")
      Lifecycle.readAs(s, idxDir, idxSchema)
        .groupBy("cnt")
        .agg(count(lit(1)).as("n_grams"),
          expr(s"bit_xor(${Sp.hash64("g")})").as("gram_xor"))
        .orderBy("cnt")
    }
  )

  val oracles: Map[String, String] = Map(

    "q544_packing_sharded" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, source,
         |    CAST(${Du.size(Du.tokens("text"))} AS BIGINT) AS n
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, source,
         |    CASE WHEN n > 512 THEN CAST(error('q544: doc wider than the
         | 512-token window') AS BIGINT) ELSE n END AS n
         |  FROM d0 WHERE n > 0),
         |shard AS (
         |  SELECT source, doc_id // $Shard AS sh,
         |    list(n ORDER BY doc_id) AS zs
         |  FROM d GROUP BY 1, 2),
         |sb AS (
         |  SELECT source, sh, ${Analytics9.packFold(Du, "zs")} AS stt
         |  FROM shard),
         |ps AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_shards,
         |    CAST(SUM(stt[1] + CASE WHEN stt[2] > 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_bins
         |  FROM sb GROUP BY 1),
         |g AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n) AS BIGINT) AS n_tokens,
         |    list(n ORDER BY doc_id) AS zs
         |  FROM d GROUP BY 1),
         |onef AS (
         |  SELECT source, n_docs, n_tokens,
         |    CAST(stt[1] + CASE WHEN stt[2] > 0 THEN 1 ELSE 0 END AS BIGINT)
         |      AS n_bins_onefold
         |  FROM (SELECT source, n_docs, n_tokens,
         |          ${Analytics9.packFold(Du, "zs")} AS stt FROM g) z)
         |SELECT source, n_docs, n_tokens, n_shards, n_bins, n_bins_onefold,
         |  CASE WHEN n_bins < n_bins_onefold OR
         |    n_bins > n_bins_onefold + n_shards - 1
         |  THEN CAST(error('q544: shard decomposition law violated') AS BIGINT)
         |  ELSE CAST(n_bins - n_bins_onefold AS BIGINT) END AS slack_bins
         |FROM onef JOIN ps USING (source)
         |ORDER BY source""".stripMargin,

    // the full recompute — identical text to q535's oracle: the
    // incremental index path must reproduce it bit-for-bit
    "q545_decontam_incremental" ->
      s"""WITH base AS (
         |  SELECT doc_id, source, ${Du.tokens("text")} AS toks FROM documents),
         |em AS (SELECT greatest(1, count(*) // 10) AS m FROM documents),
         |ev AS (SELECT doc_id, source, toks FROM base, em
         |       WHERE ${Du.hash64("concat('ev:', doc_id)")} % em.m = 0),
         |evg AS (SELECT DISTINCT doc_id, source,
         |          unnest(${Du.shingles("toks", 3)}) AS g FROM ev),
         |trg AS (SELECT DISTINCT unnest(${Du.shingles("toks", 3)}) AS g
         |        FROM base, em
         |        WHERE ${Du.hash64("concat('ev:', doc_id)")} % em.m <> 0),
         |hits AS (SELECT evg.doc_id, evg.g FROM evg
         |         WHERE EXISTS (SELECT 1 FROM trg WHERE trg.g = evg.g)),
         |pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS hg
         |       FROM hits GROUP BY 1)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_eval,
         |  CAST(COUNT(hg) AS BIGINT) AS n_contam,
         |  CAST(COALESCE(SUM(hg), 0) AS BIGINT) AS n_hit_grams,
         |  CAST(COUNT(hg) * 1000 // COUNT(*) AS BIGINT) AS contam_milli
         |FROM ev LEFT JOIN pd USING (doc_id)
         |GROUP BY source ORDER BY source""".stripMargin,

    // full recompute over (train ∪ added) \ retracted — the
    // retraction-maintained index must reproduce it bit-for-bit
    "q546_decontam_retraction" ->
      s"""WITH base AS (
         |  SELECT doc_id, ${Du.tokens("text")} AS toks FROM documents),
         |em AS (SELECT greatest(1, count(*) // 10) AS m FROM documents),
         |tr AS (SELECT doc_id, toks FROM base, em
         |       WHERE ${Du.hash64("concat('ev:', doc_id)")} % em.m <> 0
         |         AND ${Du.hash64("concat('ix:', doc_id)")} % 5 <> 1),
         |dg AS (SELECT DISTINCT doc_id,
         |         unnest(${Du.shingles("toks", 3)}) AS g FROM tr),
         |idx AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt
         |        FROM dg GROUP BY g)
         |SELECT cnt, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(bit_xor(${Du.hash64("g")}) AS BIGINT) AS gram_xor
         |FROM idx GROUP BY cnt ORDER BY cnt""".stripMargin
  )
}
