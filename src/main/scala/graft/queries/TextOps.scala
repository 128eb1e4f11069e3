package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.{PortableSql, SqlDialect}
import graft.operators.Merge
import graft.sources.{ParquetDataset, WriteConfig}

/** Text-analysis + deduplication operators over the `documents` table —
  * the training-data-pipeline extension of the reference's dedup
  * machinery (reference `pydala/io.py:242-259` keyed dedup,
  * `pydala/dataset.py:2392-2488` global dedup).
  *
  * Every float output is produced by the SAME IEEE-754 op sequence on
  * both engines (see [[graft.functions.SqlDialect]]); every hash is the
  * portable md5-60-bit hash. That is what lets these "non-relational"
  * ops still be DuckDB-oracle-checked bit-exactly.
  *
  * Scale notes (100 TB design):
  *  - exact dedup = hash-groupBy: shuffles once on the digest, no
  *    driver-side state.
  *  - MinHash-LSH: per-doc work is a narrow map; candidate generation
  *    shuffles (band-key) pairs only — never all-pairs. Band count
  *    (8 bands × 2 rows of 16 minhashes) trades recall vs candidate
  *    volume; at 100 TB you'd also salt very hot band keys.
  *  - Jaccard verification joins only LSH candidates back to shingle
  *    sets (two hash-join probes), so cost is O(candidates), not O(n²).
  *  - SimHash uses explode + integer aggregation: associative integer
  *    sums, no float order-dependence, map-side partial aggregation.
  *  - The all-pairs q35 simhash-pair join is blocked by `lang`; at
  *    scale you'd block by simhash band (rotate-and-sort) instead.
  */
object TextOps {

  private val S = PortableSql.Spark
  private val D = PortableSql.Duck

  /** BPE-ish token pattern: letter runs, single digits, single
    * non-alphanumerics. No backslash classes — identical semantics in
    * Java regex and RE2.
    */
  private val BpePat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  private val StopList =
    "('the','a','an','of','to','in','and','is','on','for')"

  private val Markers: Seq[(String, String)] = Seq(
    "en" -> "('the','a','is','and','of')",
    "de" -> "('der','die','das','und','ist')",
    "es" -> "('el','los','las','y','es')",
    "fr" -> "('le','la','les','et','est')",
    "zh" -> "('的','是','在','和','了')")

  /** Identical-text formula on both engines → identical doubles. */
  private val QualityFormula =
    "0.35 * stop_ratio + 0.35 * (1.0 - punct_ratio) + " +
      "0.3 * (CASE WHEN avg_token_len >= 3.0 AND avg_token_len <= 8.0 THEN 1.0 ELSE 0.0 END)"

  /** Token-level rolling-hash fingerprint: fold portable token hashes
    * through (acc*31 + h) mod p. Token-level (not per-char) keeps the
    * op linear — a per-char substr(text,i,1) walk is O(len²) on UTF-8
    * strings and single-handedly dominated the benchmark.
    */
  private def fingerprintExpr(d: SqlDialect, prefixTokens: Option[Int]): String = {
    val hs = d.transform("toks", "t", s"${d.hash64("t")} % 1000000007")
    val base = prefixTokens match {
      case None => hs
      case Some(n) => d.slice(hs, "1", s"least(${d.size("toks")}, $n)")
    }
    val f = d.fold(base, d.longLit(0), "a", "h", "(a * 31 + h) % 1000000007")
    s"CASE WHEN ${d.size("toks")} = 0 THEN ${d.longLit(0)} ELSE $f END"
  }

  /** Sum of token lengths. Folds over a pre-cast BIGINT list: DuckDB's
    * list_reduce gets its init via list_prepend, which requires init
    * and element types to unify.
    */
  private def tokenLenSum(d: SqlDialect): String = {
    val lens = d.transform("toks", "t",
      if (d.spark) "cast(length(t) as bigint)" else "length(t)::BIGINT")
    d.fold(lens, d.longLit(0), "a", "c", "a + c")
  }

  private def predLangCase(s: String => String): String =
    s"""CASE WHEN ${s("en")} >= ${s("de")} AND ${s("en")} >= ${s("es")} AND ${s("en")} >= ${s("fr")} AND ${s("en")} >= ${s("zh")} THEN 'en'
       |     WHEN ${s("de")} >= ${s("es")} AND ${s("de")} >= ${s("fr")} AND ${s("de")} >= ${s("zh")} THEN 'de'
       |     WHEN ${s("es")} >= ${s("fr")} AND ${s("es")} >= ${s("zh")} THEN 'es'
       |     WHEN ${s("fr")} >= ${s("zh")} THEN 'fr'
       |     ELSE 'zh' END""".stripMargin

  // ---- shared fragment builders (dialect-paired) -------------------

  private def shingleSet(d: SqlDialect): String =
    d.arrDistinct(d.shingles("toks", 3))

  /** 16 portable minhashes over the distinct 3-shingle set `sh`: hash
    * j lives in lane j%2 of md5(j/2 ':' shingle) — two minhashes per
    * digest, so 8 md5 calls per shingle instead of 16.
    */
  private def minhashes(d: SqlDialect): String =
    d.transform(d.rangeIncl("0", "15"), "j",
      d.arrMin(d.transform("sh", "s",
        d.hash64At(s"md5(concat(${d.intDiv("j", "2")}, ':', s))", "1 + 15 * (j % 2)"))))

  /** 8 band keys (2 minhash rows each) with the band index embedded. */
  private def bandKeys(d: SqlDialect): String =
    d.transform(d.rangeIncl("0", "7"), "b",
      s"concat(b, '|', ${d.strJoin(d.slice("mh", "b*2+1", "2"), ",")})")

  // memoized: tokenization is the shared first stage of every text
  // operator — a real pipeline tokenizes once and reuses. Routed
  // through Tables.memo (not a bare .cache(), which is invisible to
  // trimStorage's LRU stage and never unpersisted) so a long
  // Verify/Bench session can evict it once the text family is cold.
  // package-private: the PipelineOps suite shares the same frame.
  private[queries] def docsWithToks(s: SparkSession, dir: String): DataFrame =
    Tables.memo(s, s"$dir#toks") {
      Tables.spread(Tables.documents(s, dir))
        .withColumn("toks", expr(S.tokens("text")))
    }

  /** (doc_id, sh) — distinct 3-shingle set per doc, ≥3-token docs.
    * Memoized: q29/q30 reference it from both sides of a self-join,
    * and the shared pass stops Spark recomputing the shingle
    * extraction per side.
    */
  /** Distinct (source, 16-token-span fingerprint) rows — the shared
    * substrate of q163 (shared-span counts) and q485 (Jaccard). ONE
    * definition behind the memo tag: Tables.memo is first-build-wins,
    * so two inline copies under one tag would let whichever query ran
    * first define the other's data (round-8 review finding).
    */
  private def spanFingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.memo(s, s"$dir#q163spans") {
      docsWithToks(s, dir)
        .filter(expr("size(toks) >= 16"))
        .select(col("source"), explode(expr(S.shingles("toks", 16))).as("span"))
        .select(col("source"), expr(S.hash64("span")).as("hk"))
        .distinct()
    }

  private def shingleRows(s: SparkSession, dir: String): DataFrame =
    Tables.memo(s, s"$dir#shingles") {
      docsWithToks(s, dir)
        .filter(expr("size(toks) >= 3"))
        .select(col("doc_id"), expr(shingleSet(S)).as("sh"))
    }

  /** (doc_id, bk) LSH band-key rows, computed the distributed way:
    * explode shingles × 16 hash indexes → per-(doc, j) min hash →
    * per-(doc, band) key assembly. Equivalent to the nested-lambda
    * array formulation (the oracle keeps that form — values are
    * identical integers/strings), but explode+agg stays inside
    * whole-stage codegen, gets map-side partial min() combine, and —
    * critically — stops Catalyst's projection collapse from inlining
    * the whole minhash tree into join predicates, which made the
    * lambda version recompute 16 md5s per shingle per *candidate
    * pair*.
    */
  /** (doc_id, j, h) — the 16 per-doc minhashes (j = 0..15), the shared
    * substrate of the LSH band keys and the sketch-calibration q97.
    * Cached: both consumers read every row.
    */
  private def minhash16(s: SparkSession, dir: String): DataFrame = {
    val shex = shingleRows(s, dir)
      .select(col("doc_id"), explode(col("sh")).as("sm"))
    // one md5 per (shingle, digest-group g); lane split yields hashes
    // j=2g and j=2g+1 — md5 is the dominant cost, so this halves it
    val hj = shex
      .select(col("doc_id"), col("sm"), explode(expr("sequence(0, 7)")).as("g"))
      // both 60-bit lanes from one digest via the codegen'd native
      // expression — same values as md5-hex + conv, no hex round-trip
      .select(col("doc_id"), col("g"),
        expr("portable_md5_lanes(concat(g, ':', sm))").as("lanes"))
      .select(col("doc_id"), explode(expr(
        "array(named_struct('j', g * 2, 'h', element_at(lanes, 1)), " +
          "named_struct('j', g * 2 + 1, 'h', element_at(lanes, 2)))")).as("jh"))
      .select(col("doc_id"), col("jh.j").as("j"), col("jh.h").as("h"))
    Tables.memo(s, s"$dir#minhash16") {
      hj.groupBy("doc_id", "j").agg(min("h").as("h"))
    }
  }

  private def bandKeyRows(s: SparkSession, dir: String): DataFrame =
    // both sides of the candidate self-join read these rows
    Tables.memo(s, s"$dir#bandkeys") {
      minhash16(s, dir)
        .withColumn("b", expr("j div 2"))
        .groupBy("doc_id", "b")
        .agg(expr("concat_ws(',', transform(sort_array(collect_list(struct(j, h))), x -> cast(x.h as string)))").as("hs"))
        .select(col("doc_id"), expr("concat(b, '|', hs)").as("bk"))
    }

  /** LSH candidate pairs (doc_a < doc_b), deduped across bands —
    * memoized: five queries (candidates, jaccard, components, keep,
    * edit-distance) start from exactly this frame.
    */
  /** (doc_id, rep) — exact-duplicate classes by FULL SHINGLE SET
    * (the sorted set array itself as the class key: exact, no
    * hash-collision risk — the SetSimJoin discipline). Identical sets
    * give identical minhashes, hence identical LSH bucket membership
    * AND identical verify counts, so one representative can stand in
    * for the whole class during candidate generation and
    * verification. Band-key-signature equality would NOT suffice —
    * a true near-duplicate pair can collide on every band while the
    * sets differ (observed at sf0.01: an all-8-band collision at
    * Jaccard 0.974). The round-7 100× probe measured why the
    * collapse must exist: 100-deep exact clone clusters made the
    * band self-join pay clones² per bucket (q30: 0.45 s → 71.8 s);
    * collapsed, the join sees one rep per class and the clones
    * reappear only in the OUTPUT-linear expansion.
    */
  private def docClasses(s: SparkSession, dir: String): DataFrame =
    Tables.memo(s, s"$dir#docclasses") {
      val sig = shingleRows(s, dir)
        .select(col("doc_id"), expr("sort_array(sh)").as("sig"))
      val rep = sig.groupBy("sig").agg(min("doc_id").as("rep"))
      sig.join(rep, "sig").select("doc_id", "rep")
    }

  /** LSH candidate pairs BETWEEN representatives (ra < rb). */
  private def repCandPairs(s: SparkSession, dir: String): DataFrame =
    Tables.memo(s, s"$dir#repcandpairs") {
      val reps = docClasses(s, dir)
        .filter(col("doc_id") === col("rep")).select("rep")
      val e = bandKeyRows(s, dir)
        .join(reps, col("doc_id") === col("rep")).drop("rep")
      e.as("x").join(e.as("y"),
          col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("ra"), col("y.doc_id").as("rb"))
        .distinct()
    }

  private def candPairs(s: SparkSession, dir: String): DataFrame =
    Tables.memo(s, s"$dir#candpairs") {
      val cls = docClasses(s, dir)
      // same-class members always share every bucket; cross-class
      // member pairs are candidates iff their reps are (identical
      // bucket membership) — both expansions are output-linear row
      // joins, never a per-bucket clones² blowup
      val within = cls.as("m1").join(cls.as("m2"), "rep")
        .filter(col("m1.doc_id") < col("m2.doc_id"))
        .select(col("m1.doc_id").as("doc_a"), col("m2.doc_id").as("doc_b"))
      val cross = repCandPairs(s, dir)
        .join(cls.select(col("rep").as("ra"), col("doc_id").as("da")), "ra")
        .join(cls.select(col("rep").as("rb"), col("doc_id").as("db")), "rb")
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"))
      within.unionAll(cross)
    }

  /** Per-candidate-pair exact Jaccard lanes (doc_a, doc_b, n_inter,
    * n_union) over the collapsed class substrate — same-class members
    * share identical shingle sets, so the intersect/union fold runs
    * once per REP pair and inherits to members (the q30 clones²
    * collapse). Memoized: q30 reports it, q502's percolation sweep
    * thresholds it three times.
    */
  private def pairJaccard(s: SparkSession, dir: String): DataFrame =
    Tables.memo(s, s"$dir#pairjaccard") {
      val cls = docClasses(s, dir)
      val shs = shingleRows(s, dir)
      val repVals = repCandPairs(s, dir)
        .join(shs.as("sa"), col("ra") === col("sa.doc_id"))
        .join(shs.as("sb"), col("rb") === col("sb.doc_id"))
        .withColumn("n_inter", expr(s"size(${S.arrIntersect("sa.sh", "sb.sh")})").cast("long"))
        .withColumn("n_union", expr("size(sa.sh) + size(sb.sh)").cast("long") - col("n_inter"))
        .select("ra", "rb", "n_inter", "n_union")
      val cross = repVals
        .join(cls.select(col("rep").as("ra"), col("doc_id").as("da")), "ra")
        .join(cls.select(col("rep").as("rb"), col("doc_id").as("db")), "rb")
        .select(least(col("da"), col("db")).as("doc_a"),
          greatest(col("da"), col("db")).as("doc_b"),
          col("n_inter"), col("n_union"))
      val within = cls.as("m1").join(cls.as("m2"), "rep")
        .filter(col("m1.doc_id") < col("m2.doc_id"))
        .join(shs.withColumnRenamed("doc_id", "rep"), "rep")
        .select(col("m1.doc_id").as("doc_a"), col("m2.doc_id").as("doc_b"),
          expr("CAST(size(sh) AS BIGINT)").as("n_inter"),
          expr("CAST(size(sh) AS BIGINT)").as("n_union"))
      within.unionAll(cross)
    }

  /** Marker-score columns + deterministic argmax prediction (shared by
    * the per-doc report q26 and the confusion matrix q88).
    */
  private def langScored(s: SparkSession, dir: String): DataFrame =
    Markers.foldLeft(docsWithToks(s, dir)) { case (df, (l, m)) =>
      df.withColumn(s"s_$l",
        expr(s"size(${S.filterL("toks", "t", s"t IN $m")})").cast("long"))
    }.withColumn("pred_lang", expr(predLangCase(l => s"s_$l")))

  /** Scalar data-relative bounds (doc/token counts) per (session,
    * dir#tag) — the Lifecycle.ordersCount pattern: a fresh count job
    * inside every timed execution is pure bench overhead.
    */
  private val scalarMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Long]
  private def memoCount(s: SparkSession, key: String)(compute: => Long): Long = {
    scalarMemo.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    scalarMemo.getOrElseUpdate((s, key), compute)
  }

  /** (doc_id, comp, csize) — connected components over the LSH
    * candidate graph. MEMOIZED per (session, dir), not just plan-
    * cached: the propagation loop runs eagerly on the driver (actions
    * per round), so Spark's cache manager can never dedup it — without
    * memoization each of q56/q65/q99/q100 would re-run the whole
    * iteration.
    */
  private def componentRows(s: SparkSession, dir: String): DataFrame =
    Tables.memo(s, s"$dir#components") {
      val cand = candPairs(s, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      graft.operators.ConnectedComponents(cand)
        .withColumnRenamed("id", "doc_id")
    }

  /** componentRows + the q65 keep rule: rk = 1 is the cluster member
    * to keep (highest quality, ties → lowest doc_id). One shared
    * memoized frame — q65, q99, and q100 all rank the same clustering.
    */
  private def rankedComponents(s: SparkSession, dir: String): DataFrame =
    Tables.memo(s, s"$dir#rankedcomp") {
      componentRows(s, dir)
        .join(qualityRows(s, dir).select("doc_id", "quality_score"), "doc_id")
        .withColumn("rk", row_number().over(
          Window.partitionBy("comp")
            .orderBy(col("quality_score").desc, col("doc_id"))))
    }

  /** Per-doc quality signals + score (shared by q25 and the dedup
    * keep-selection q65).
    */
  private def qualityRows(s: SparkSession, dir: String): DataFrame =
    docsWithToks(s, dir)
      .withColumn("n_tokens", expr("size(toks)").cast("long"))
      .withColumn("sum_len", expr(tokenLenSum(S)))
      .withColumn("stop_cnt", expr(s"size(${S.filterL("toks", "t", s"t IN $StopList")})").cast("long"))
      .withColumn("punct_cnt",
        expr(s"length(text) - length(${S.regexReplaceAll("text", "[.,!?;:]", "")})").cast("long"))
      .withColumn("avg_token_len", expr("CAST(sum_len AS DOUBLE) / n_tokens"))
      .withColumn("stop_ratio", expr("CAST(stop_cnt AS DOUBLE) / n_tokens"))
      .withColumn("punct_ratio", expr("CAST(punct_cnt AS DOUBLE) / length(text)"))
      .withColumn("quality_score", expr(QualityFormula))

  /** (doc_id, lang, simhash) — 32-bit SimHash per doc in ONE
    * token-level shuffle. Per bit i the classic ±1 vote sum satisfies
    * sum(±1) > 0 ⟺ 2·cnt_i > n_tokens where cnt_i counts set bits, so
    * 32 integer count-aggregates replace the 32×-exploded (doc, bit)
    * frame the previous formulation shuffled — same simhash integers,
    * 1/32 the shuffle volume, and the bit assembly is one codegen'd
    * projection over the per-doc aggregate row.
    */
  private def simhashRows(s: SparkSession, dir: String): DataFrame = {
    val tok = docsWithToks(s, dir)
      .select(col("doc_id"), col("lang"), explode(col("toks")).as("t"))
    val h = tok.select(col("doc_id"), col("lang"), expr(S.hash64("t")).as("h"))
    val bitCnts = (0 until 32).map(i =>
      sum(expr(s"CAST(${S.shiftRight("h", i.toString)} & 1 AS INT)")).as(s"c$i"))
    val assembled = (0 until 32)
      .map(i => s"CASE WHEN 2 * c$i > nt THEN ${S.shiftLeft(S.longLit(1), i.toString)} ELSE ${S.longLit(0)} END")
      .mkString(" + ")
    h.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("nt"), bitCnts: _*)
      .select(col("doc_id"), col("lang"),
        expr(assembled).cast("long").as("simhash"))
  }

  private val duckBase =
    s"WITH base AS (SELECT doc_id, lang, text, ${D.tokens("text")} AS toks FROM documents)"

  /** Clipped n-gram match count Σ_{distinct g ∈ a} min(cnt_a(g),
    * cnt_b(g)) — the BLEU modified-precision numerator, exact integer,
    * ONE dialect-paired fold (q495).
    */
  private def clipCount(d: SqlDialect, a: String, b: String): String =
    d.fold(
      d.transform(d.arrDistinct(a), "t",
        s"CAST(least(${d.size(d.filterL(a, "x", "x = t"))}, " +
          s"${d.size(d.filterL(b, "x", "x = t"))}) AS BIGINT)"),
      d.longLit(0), "acc", "v", "acc + v")

  /** Geometric mean of the two clipped precisions over 12 unigrams /
    * 11 bigrams, floored to micro — engine-identical syntax, so one
    * shared text (q495).
    */
  private val bleu2Text =
    "CAST(floor(sqrt((CAST(uni_clip AS DOUBLE) / CAST(12 AS DOUBLE)) * " +
      "(CAST(bi_clip AS DOUBLE) / CAST(11 AS DOUBLE))) * " +
      "CAST(1000000 AS DOUBLE)) AS BIGINT)"

  /** Shared oracle text: the unrolled 6-round BPE chain (q170, q171) —
    * mechanical generation keeps both engines' per-round op sequence
    * (count → argmax → double-replace) textually aligned. Defines
    * s0..s6 (corpus states) and b1..b6 (round winners); requires
    * [[duckBase]] in scope.
    */
  private val duckBpeStages: String = {
    val stages = (1 to 6).map { k =>
      val prev = s"s${k - 1}"
      val once = s"replace(s, '|' || b.pr || '|', '|' || replace(b.pr, '|', '~') || '|')"
      s"""tk$k AS (
         |  SELECT doc_id, list_filter(string_split(s, '|'), t -> t != '') AS tk
         |  FROM $prev),
         |pr$k AS (
         |  SELECT unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || '|' || tk[i + 1])) AS pr
         |  FROM tk$k WHERE len(tk) >= 2),
         |c$k AS (SELECT pr, count(*) AS n FROM pr$k GROUP BY pr),
         |b$k AS (SELECT pr, n FROM c$k ORDER BY n DESC, pr LIMIT 1),
         |s$k AS (
         |  SELECT doc_id,
         |    replace($once, '|' || b.pr || '|', '|' || replace(b.pr, '|', '~') || '|') AS s
         |  FROM $prev, b$k b)""".stripMargin
    }.mkString(",\n")
    s"""s0 AS (
       |  SELECT doc_id,
       |    '|' || array_to_string(list_filter(toks, t -> regexp_matches(t, '^[a-z]+$$')), '|') || '|' AS s
       |  FROM base),
       |$stages""".stripMargin
  }

  /** Shared oracle text: shingle → minhash → band → candidate-pair →
    * transitive-closure component CTEs (q56, q65, q99, q100). Requires
    * a WITH RECURSIVE prefix.
    */
  private def duckComponentCtes: String =
    s"""f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
       |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
       |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
       |sym AS (SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand),
       |reach AS (
       |  SELECT a AS node, b AS other FROM sym
       |  UNION
       |  SELECT r.node, s.b AS other FROM reach r JOIN sym s ON r.other = s.a),
       |lab AS (
       |  SELECT node AS doc_id, least(node, min(other)) AS comp
       |  FROM reach GROUP BY node)""".stripMargin

  /** Shared oracle text: the q65 keep-rule ranking over lab ⋈ qs
    * (requires duckComponentCtes and duckQualityCtes upstream).
    */
  private val duckKeepCte: String =
    """k AS (
      |  SELECT lab.doc_id,
      |    row_number() OVER (PARTITION BY comp
      |      ORDER BY quality_score DESC, lab.doc_id) AS rk
      |  FROM lab JOIN qs ON lab.doc_id = qs.doc_id)""".stripMargin

  /** Shared oracle text: marker-score + argmax CTEs (q26, q88). */
  private val duckLangCtes: String = {
    val scoreCols = Markers.map { case (l, m) =>
      s"CAST(${D.size(D.filterL("toks", "t", s"t IN $m"))} AS BIGINT) AS s_$l"
    }.mkString(",\n    ")
    s"""sc AS (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM base),
       |p AS (
       |  SELECT *, ${predLangCase(l => s"s_$l")} AS pred_lang FROM sc)""".stripMargin
  }

  /** Shared oracle text: quality-score CTEs qm/qr/qs (q65, q85);
    * `extra` threads additional passthrough columns (e.g. lang).
    */
  private def duckQualityCtes(extra: String = ""): String = {
    val ex = if (extra.isEmpty) "" else s", $extra"
    s"""qm AS (
       |  SELECT doc_id$ex, text,
       |    CAST(${D.size("toks")} AS BIGINT) AS n_tokens,
       |    CAST(${tokenLenSum(D)} AS BIGINT) AS sum_len,
       |    CAST(${D.size(D.filterL("toks", "t", s"t IN $StopList"))} AS BIGINT) AS stop_cnt,
       |    CAST(length(text) - length(${D.regexReplaceAll("text", "[.,!?;:]", "")}) AS BIGINT) AS punct_cnt
       |  FROM base),
       |qr AS (
       |  SELECT doc_id$ex,
       |    CAST(sum_len AS DOUBLE) / n_tokens AS avg_token_len,
       |    CAST(stop_cnt AS DOUBLE) / n_tokens AS stop_ratio,
       |    CAST(punct_cnt AS DOUBLE) / length(text) AS punct_ratio
       |  FROM qm),
       |qs AS (SELECT doc_id$ex, $QualityFormula AS quality_score FROM qr)""".stripMargin
  }

  // ------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token counting: whitespace tokens + BPE-ish regex tokens.
    "q24_text_tokens" -> { (s, dir) =>
      docsWithToks(s, dir).select(
        col("doc_id"),
        expr("size(toks)").cast("long").as("n_ws_tokens"),
        expr(s"size(${S.regexExtractAll("text", BpePat)})").cast("long").as("n_bpe_tokens"),
        expr(tokenLenSum(S)).as("sum_token_len"))
        .orderBy("doc_id")
    },

    // Quality scoring: stopword/punctuation/length signals.
    "q25_text_quality" -> { (s, dir) =>
      qualityRows(s, dir)
        .select("doc_id", "n_tokens", "avg_token_len", "stop_ratio", "punct_ratio",
          "quality_score")
        .orderBy("doc_id")
    },

    // Filter-funnel attribution (C4/Gopher-style rule cascade): each
    // doc is attributed to its FIRST failing rule — too short, high
    // avg token length, low stopword ratio, repetitive (low
    // distinct-token fraction) — and the funnel reports, per stage,
    // the docs removed there, the tokens they carried, and the corpus
    // remaining after the stage: the observability report every
    // production corpus filter ships with (which rule cost how much
    // data). All-integer rule predicates (cross-multiplied ratios) so
    // attribution is exact; the funnel itself is a 5-group aggregate,
    // and the survivor running sum is a window over those 5 bounded
    // rows (never row-scale).
    "q204_filter_funnel" -> { (s, dir) =>
      val staged = qualityRows(s, dir)
        .withColumn("n_distinct",
          expr(s"size(${S.arrDistinct("toks")})").cast("long"))
        .withColumn("stage", expr(
          """CASE WHEN n_tokens < 25 THEN 1
            |     WHEN 9 * n_tokens < 2 * sum_len THEN 2
            |     WHEN 20 * stop_cnt < n_tokens THEN 3
            |     WHEN 2 * n_distinct < n_tokens THEN 4
            |     ELSE 0 END""".stripMargin))
      val per = staged.groupBy("stage")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tok_sum"))
      // the corpus total is the sum of the 5 stage rows — derived by
      // window over the aggregate, not a second scan of the corpus
      val wp = Window.partitionBy(lit(1))
      val w = wp.orderBy("stage")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      per
        .withColumn("nn", sum("n_docs").over(wp))
        .withColumn("cum_removed",
          sum(when(col("stage") > 0, col("n_docs")).otherwise(0L)).over(w))
        .withColumn("rule", expr(
          """CASE stage WHEN 0 THEN 'keep' WHEN 1 THEN 'too_short'
            |     WHEN 2 THEN 'long_tokens' WHEN 3 THEN 'low_stopword'
            |     ELSE 'repetitive' END""".stripMargin))
        .withColumn("survivors_after",
          when(col("stage") === 0, col("n_docs"))
            .otherwise(col("nn") - col("cum_removed")))
        .select("stage", "rule", "n_docs", "tok_sum", "survivors_after")
        .orderBy("stage")
    },

    // Language ID: marker-word scores with a deterministic argmax.
    "q26_text_langid" -> { (s, dir) =>
      langScored(s, dir)
        .withColumn("is_match", expr("pred_lang = lang"))
        .select("doc_id", "s_en", "s_de", "s_es", "s_fr", "s_zh", "pred_lang", "is_match")
        .orderBy("doc_id")
    },

    // Rolling-hash document fingerprints (whole doc + 8-token prefix).
    // Unicode NFC normalization — the canonical-composition pass that
    // must precede hashing/shingling (composed "é" vs decomposed
    // "e"+U+0301 is the same text in different bytes; unnormalized,
    // duplicate clusters silently split). The gate CONSTRUCTS
    // decomposed suffixes (base letter + combining mark literals) on
    // every doc, normalizes through the codegen'd NfcNormalize
    // expression, and hash-matches DuckDB's nfc_normalize — both are
    // UAX #15 NFC, so lengths, change flags, and the composed tail
    // bytes must agree exactly. Narrow map, no shuffle.
    "q192_nfc_normalize" -> { (s, dir) =>
      val raw = Tables.spread(Tables.documents(s, dir).select("doc_id", "text"))
        .withColumn("raw",
          concat(expr("substring(text, 1, 40)"),
            lit("e\u0301A\u030A"))) // DECOMPOSED: NFC must compose both
      raw.withColumn("norm", graft.functions.NfcNormalize(col("raw")))
        .select(col("doc_id"),
          length(col("raw")).as("n_raw"),
          length(col("norm")).as("n_norm"),
          (col("raw") =!= col("norm")).as("changed"),
          expr("substring(norm, -2, 2)").as("tail_norm"))
        .orderBy("doc_id")
    },

    "q27_text_fingerprint" -> { (s, dir) =>
      docsWithToks(s, dir).select(
        col("doc_id"),
        expr(fingerprintExpr(S, None)).as("fp"),
        expr(fingerprintExpr(S, Some(8))).as("fp_prefix"))
        .orderBy("doc_id")
    },

    // Exact dedup: one shuffle on the text digest.
    "q28_dedup_exact" -> { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(expr("md5(text)").as("h"))
        .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n_dups"))
        .orderBy("rep_id")
    },

    // MinHash-LSH candidate pairs (the scale path: no all-pairs join).
    "q29_minhash_lsh_pairs" -> { (s, dir) =>
      candPairs(s, dir).orderBy("doc_a", "doc_b")
    },

    // Jaccard-scored dedup over LSH candidates: O(candidates), not O(n²).
    // Exact Jaccard over the LSH candidate pairs, with the verify
    // computed ONCE per representative pair and inherited by every
    // member pair (identical shingle sets give identical counts —
    // the round-7 100× probe measured the per-member-pair verify at
    // clones²·|set| array intersections; inheritance makes it one
    // intersect per rep pair plus output-linear row joins).
    "q30_dedup_jaccard" -> { (s, dir) =>
      pairJaccard(s, dir)
        .withColumn("jaccard", expr("CAST(n_inter AS DOUBLE) / n_union"))
        .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")
        .orderBy("doc_a", "doc_b")
    },

    // Per-doc 32-bit SimHash via explode + integer aggregation
    // (associative sums → deterministic, map-side combinable).
    "q31_dedup_simhash" -> { (s, dir) =>
      simhashRows(s, dir).select("doc_id", "simhash").orderBy("doc_id")
    },

    // Top-20 bigrams per language: explode 2-shingles → count →
    // windowed top-k. Integer counts; rank ties break on the bigram.
    "q48_ngram_topk" -> { (s, dir) =>
      val bi = docsWithToks(s, dir)
        .filter(expr("size(toks) >= 2"))
        .select(col("lang"), explode(expr(S.shingles("toks", 2))).as("bigram"))
      val counts = bi.groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("bigram").asc)
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 20)
        .select("lang", "rk", "bigram", "n")
        .orderBy("lang", "rk")
    },

    // Deterministic stratified sampling: portable-hash selection is
    // reproducible across engines, runs, and cluster sizes — unlike
    // rand() — and stratifies by taking a per-language rate. The
    // filter is a narrow map: no shuffle, no driver state.
    "q52_hash_sample" -> { (s, dir) =>
      val rates = "CASE lang WHEN 'en' THEN 20 WHEN 'zh' THEN 50 ELSE 10 END"
      Tables.spread(Tables.documents(s, dir))
        .filter(expr(s"${S.hash64("concat('sample:', doc_id)")} % 100 < $rates"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Text normalization / cleaning: lowercase, strip punctuation,
    // collapse whitespace — the canonical pre-dedup scrub.
    "q53_text_normalize" -> { (s, dir) =>
      Tables.spread(Tables.documents(s, dir))
        .select(
          col("doc_id"),
          expr(s"trim(${S.regexReplaceAll(
            S.regexReplaceAll("lower(text)", "[.,!?;:]", ""), " +", " ")})")
            .as("clean_text"),
          expr(s"length(${S.regexReplaceAll("text", "[.,!?;:]", "")})")
            .cast("long").as("clean_len"))
        .orderBy("doc_id")
    },

    // SimHash near-dup pairs (hamming ≤ 10), blocked by lang.
    "q35_simhash_pairs" -> { (s, dir) =>
      // both sides of the self-join read the memoized pass
      val sim = Tables.memo(s, s"$dir#simhash")(simhashRows(s, dir))
      sim.as("a").join(sim.as("b"),
          col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
        .withColumn("hamming",
          expr(s"CAST(${S.bitCount(S.bxor("a.simhash", "b.simhash"))} AS INT)"))
        .filter(col("hamming") <= 10)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
        .orderBy("doc_a", "doc_b")
    },

    // Duplicate-cluster assembly: connected components over the LSH
    // candidate graph via iterative min-label propagation — the step
    // that turns near-dup PAIRS into actionable KEEP/DROP clusters.
    // Each round is one shuffle (join + min-combine groupBy); rounds =
    // graph diameter (dup clusters are tiny, so 2-3 in practice). The
    // driver-side loop touches only a one-row convergence aggregate,
    // never data rows; localCheckpoint caps lineage growth. At 100 TB
    // you'd swap in large-star/small-star to bound component diameter,
    // but the join shape is the same.
    "q56_dup_components" -> { (s, dir) =>
      componentRows(s, dir).orderBy("doc_id")
    },

    // Same clustering through the OTHER components engine: the
    // large-star/small-star contraction (O(log n) rounds on any
    // topology — the deep-chain-safe variant). Identical (id, comp,
    // csize) contract, so the q56 oracle gates both engines' results
    // against each other and against DuckDB's recursive closure.
    "q129_components_contraction" -> { (s, dir) =>
      val cand = candPairs(s, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      graft.operators.ConnectedComponents.largeSmallStar(cand)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // Persisted LSH index lifecycle — dedup-at-ingest as an OPERATED
    // service rather than a one-shot query: the band keys of the base
    // corpus (doc_id % 3 != 0) are written as a managed parquet
    // dataset (the index), the increment probes the PERSISTED files
    // for candidates, then the increment's keys are merged into the
    // index (insert mode) so the NEXT batch probes an up-to-date
    // index. Runtime requires pin the physical effect (the index grew
    // by exactly the increment's rows); the relation reports each
    // increment doc's candidate count plus the final index
    // cardinality, which the oracle recomputes from scratch. At
    // 100 TB the index is a partitioned dataset maintained by the
    // same merge/compaction machinery as any other table — probing is
    // one hash join against it, never a rebuild.
    "q205_lsh_index_persist" -> { (s, dir) =>
      val idxDir = Lifecycle.tmpDir("q205")
      val bk = bandKeyRows(s, dir)
      val base = bk.filter(col("doc_id") % 3 =!= 0)
      val inc = bk.filter(col("doc_id") % 3 === 0)
      val ds = new ParquetDataset(s, idxDir)
      ds.write(base, WriteConfig(mode = "overwrite"))
      // probe the persisted files, materialized BEFORE the merge
      // mutates what the probe plan reads
      val probed = inc.as("x")
        .join(ds.df.as("y"), col("x.bk") === col("y.bk"))
        .groupBy(col("x.doc_id").as("doc_id"))
        .agg(countDistinct(col("y.doc_id")).as("n_cand"))
        .localCheckpoint()
      // counts on the memoized band-key frame (cached), growth check
      // from MergeResult + the sidecar's metadata-only count — the
      // merged index is never re-scanned for bookkeeping
      val baseRows = base.count()
      val incRows = inc.count()
      val res = Merge(ds, inc, Seq("doc_id", "bk"), "insert")
      val after = ds.count()
      require(res.inserted == incRows && after == baseRows + incRows,
        s"q205: index grew $baseRows -> $after (inserted ${res.inserted}), " +
          s"expected +$incRows")
      inc.select("doc_id").distinct()
        .join(probed, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          lit(after).as("index_rows"))
        .orderBy("doc_id")
    },

    // Incremental-ingest dedup — the production shape: dedupe a NEW
    // batch (doc_id % 3 = 0) against the EXISTING corpus only, never
    // all-pairs over history. Exact text-hash semi-join first, then
    // LSH band-key candidates restricted to (incoming × existing),
    // Jaccard-verified with an integer cross-multiplied threshold
    // (n_inter·5 ≥ n_union·2 ⇔ J ≥ 0.4 — no float compare to
    // diverge). At 100 TB the existing side's hashes and band keys
    // are precomputed artifacts maintained at write time (the
    // sidecar pattern); incremental cost is |batch| hashing plus
    // candidate-bounded verification.
    "q132_incremental_dedup" -> { (s, dir) =>
      val th = docsWithToks(s, dir)
        .select(col("doc_id"), expr(S.hash64("text")).as("th"))
      val exTh = th.filter(col("doc_id") % 3 =!= 0).select("th").distinct()
      val inc = th.filter(col("doc_id") % 3 === 0)
      val exactDup = inc.join(broadcast(exTh), Seq("th"), "left_semi")
        .select("doc_id")
      val bk = bandKeyRows(s, dir)
      val cand = bk.filter(col("doc_id") % 3 === 0).as("x")
        .join(bk.filter(col("doc_id") % 3 =!= 0).as("y"), col("x.bk") === col("y.bk"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      val shs = shingleRows(s, dir)
      val nearDup = cand
        .join(shs.as("sa"), col("a") === col("sa.doc_id"))
        .join(shs.as("sb"), col("b") === col("sb.doc_id"))
        .withColumn("n_inter", expr(s"size(${S.arrIntersect("sa.sh", "sb.sh")})").cast("long"))
        .withColumn("n_union", expr("size(sa.sh) + size(sb.sh)").cast("long") - col("n_inter"))
        .filter(col("n_inter") * 5 >= col("n_union") * 2)
        .select(col("a").as("doc_id")).distinct()
      inc.select("doc_id")
        .join(broadcast(exactDup.withColumn("de", lit(true))), Seq("doc_id"), "left")
        .join(broadcast(nearDup.withColumn("dn", lit(true))), Seq("doc_id"), "left")
        .select(col("doc_id"),
          expr("CASE WHEN de THEN 'dup_exact' WHEN dn THEN 'dup_near' ELSE 'kept' END")
            .as("status"))
        .orderBy("doc_id")
    },

    // Edit-distance verification of LSH candidate pairs — the fuzzy
    // confirmation step of a dedup pipeline, O(candidates) not O(n²).
    // Distance runs on 40-char printable-ASCII prefixes: DuckDB's
    // levenshtein is byte-level while Spark's is codepoint-level, so
    // non-ASCII is stripped (identically) before comparing.
    "q68_edit_distance" -> { (s, dir) =>
      val cand = candPairs(s, dir)
      val pre = Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"),
          expr(s"substring(${S.regexReplaceAll("text", "[^ -~]", "")}, 1, 40)")
            .as("pre"))
      cand.join(pre.as("pa"), col("doc_a") === col("pa.doc_id"))
        .join(pre.as("pb"), col("doc_b") === col("pb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          expr("CAST(levenshtein(pa.pre, pb.pre) AS INT)").as("edit_dist"))
        .withColumn("is_near", col("edit_dist") <= 5)
        .orderBy("doc_a", "doc_b")
    },

    // The dedup DECISION: per duplicate cluster keep the
    // highest-quality member (ties → lowest doc_id). Components come
    // from the LSH candidate graph (q56), the score from the quality
    // model (q25) — the end-to-end near-dup pipeline: shingle →
    // minhash → band join → components → keep/drop.
    "q65_dedup_keep" -> { (s, dir) =>
      rankedComponents(s, dir)
        .filter("rk = 1")
        .select(col("comp"), col("doc_id").as("keep_id"),
          col("csize").as("n_members"),
          col("quality_score").as("keep_quality"))
        .orderBy("comp")
    },

    // Within-document repetition: duplicate-token fraction + the most
    // repeated token — the standard boilerplate/spam signal (repeated
    // nav bars, SEO keyword stuffing). The ratio is one integer
    // subtraction and one IEEE division; the top token is a bounded
    // per-doc window (ties → lexicographically first).
    "q82_repetition" -> { (s, dir) =>
      val base = docsWithToks(s, dir).filter(expr("size(toks) > 0"))
      val sizes = base.select(col("doc_id"),
        expr("size(toks)").cast("long").as("n_toks"),
        expr(s"size(${S.arrDistinct("toks")})").cast("long").as("n_distinct"))
      val top = base.select(col("doc_id"), explode(col("toks")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("top_n"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("top_n").desc, col("t").asc)))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("t").as("top_tok"), col("top_n"))
      sizes.join(top, "doc_id")
        .withColumn("rep_ratio",
          expr("CAST(n_toks - n_distinct AS DOUBLE) / CAST(n_toks AS DOUBLE)"))
        .select("doc_id", "n_toks", "n_distinct", "rep_ratio", "top_tok", "top_n")
        .orderBy("doc_id")
    },

    // Quality-band filtering: keep docs between the exact global p10
    // and p90 of the quality score — the "drop the worst and the
    // too-good-to-be-true" corpus trim. Exact two-sided interpolated
    // quantiles (the q55 scheme) so the band edges bit-match the
    // oracle's quantile_cont. The global row_number is the two-phase
    // distributed rank (GlobalOrder) — exact at any scale, no
    // single-partition sort.
    "q85_quality_band" -> { (s, dir) =>
      val q = qualityRows(s, dir).select("doc_id", "lang", "quality_score")
      val g = graft.plans.GlobalOrder.withRowNumber(q,
          Seq(col("quality_score"), col("doc_id")),
          col("quality_score"), "rn", countName = Some("n"))
        .withColumn("rn", col("rn") - 1)
      def bound(p: Double, edge: String => String) =
        max(when(expr(s"rn = ${edge(s"(n - 1) * CAST($p AS DOUBLE)")}"),
          col("quality_score")))
      def interp(p: Double, lo: String, hi: String): String =
        PortableSql.interpQuantile(p.toString, lo, hi, "n")
      val bounds = g.agg(
        bound(0.1, e => s"floor($e)").as("lo1"),
        bound(0.1, e => s"ceil($e)").as("hi1"),
        bound(0.9, e => s"floor($e)").as("lo9"),
        bound(0.9, e => s"ceil($e)").as("hi9"),
        max("n").as("n"))
        .selectExpr(
          s"${interp(0.1, "lo1", "hi1")} AS p10",
          s"${interp(0.9, "lo9", "hi9")} AS p90")
      q.crossJoin(broadcast(bounds))
        .filter(col("quality_score") >= col("p10") &&
          col("quality_score") <= col("p90"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          min("quality_score").as("lo_score"),
          max("quality_score").as("hi_score"),
          max("p10").as("p10"), max("p90").as("p90"))
        .orderBy("lang")
    },

    // Mean frequency rank of a document's tokens — a log-free
    // "how common are this doc's words" score (low = stock phrasing,
    // high = rare vocabulary; the rational stand-in for unigram LM
    // perplexity). Vocabulary ranks are a broadcast; the per-doc
    // aggregate is integer sums + one final division. The rank order
    // (n desc, t asc) is tie-free, so rank() ≡ row_number and the
    // two-phase GlobalOrder computes it distributed (a web-corpus
    // vocabulary is 10⁸+ types — itself row-scale); bucketing on −n is
    // monotone with the count-descending order, and the singleton tail
    // (all n=1) collapsing into one bucket is the known skew — at real
    // scale a min-count threshold precedes ranking anyway.
    "q87_token_rank" -> { (s, dir) =>
      val tok = docsWithToks(s, dir).filter(expr("size(toks) > 0"))
        .select(col("doc_id"), explode(col("toks")).as("t"))
      val rk = graft.plans.GlobalOrder.withRowNumber(
        tok.groupBy("t").agg(count(lit(1)).as("n")),
        Seq(col("n").desc, col("t").asc), negate(col("n")), "rnk")
      tok.join(broadcast(rk.select("t", "rnk")), "t")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"), sum("rnk").as("sum_rank"))
        .withColumn("avg_rank",
          expr("CAST(sum_rank AS DOUBLE) / CAST(n_toks AS DOUBLE)"))
        .select("doc_id", "n_toks", "sum_rank", "avg_rank")
        .orderBy("doc_id")
    },

    // Pairwise source JACCARD over distinct 16-token span
    // fingerprints — q163's shared-span counts normalized into the
    // similarity matrix a corpus-mixing decision actually reads
    // (|A∩B| alone says nothing when source sizes differ 100×). ALL
    // C(5,2) pairs appear, zero-overlap included: the pair frame is
    // the 5-row size table crossed with itself (broadcast, bounded),
    // intersections left-joined in. Shares q163's memoized distinct
    // (source, hk) substrate; exact integer micro units.
    "q485_source_jaccard" -> { (s, dir) =>
      val sp = spanFingerprints(s, dir)
      val sizes = sp.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = sp.as("a").join(sp.as("b"),
          col("a.hk") === col("b.hk") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("inter"))
      sizes.select(col("source").as("src_a"), col("n").as("n_a")).as("sa")
        .join(sizes.select(col("source").as("src_b"), col("n").as("n_b")),
          col("src_a") < col("src_b"))
        .join(inter, Seq("src_a", "src_b"), "left")
        .withColumn("inter", coalesce(col("inter"), lit(0L)))
        .withColumn("jaccard_micro",
          expr("inter * 1000000 div (n_a + n_b - inter)"))
        .select("src_a", "src_b", "n_a", "n_b", "inter", "jaccard_micro")
        .orderBy("src_a", "src_b")
    },

    // Yule's K lexical-richness characteristic per source — the
    // repetitiveness index (10⁴·(Σₘm²Vₘ − N)/N², i.e. (Σ_t n_t² − N)/N²
    // over type frequencies) that flags template-heavy or spam-like
    // corpora before training. Exact rational: the frequency pass is
    // one map-side-combined aggregate, the square sum rides the
    // DECIMAL(38) lane (n_t² crosses BIGINT for hot types past ~3·10⁹
    // occurrences), and K surfaces in micro units via wide division —
    // no float enters. Vₘ-free formulation: Σₘ m²Vₘ = Σ_types n_t².
    "q475_yule_k" -> { (s, dir) =>
      val tok = docsWithToks(s, dir).filter(expr("size(toks) > 0"))
        .select(col("source"), explode(col("toks")).as("t"))
      tok.groupBy("source", "t").agg(count(lit(1)).as("nt"))
        .groupBy("source")
        .agg(sum("nt").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(expr(s"${S.wide("nt")} * nt")).as("s2"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          expr("CAST(s2 AS BIGINT)").as("sum_sq"),
          expr("CASE WHEN n_tokens < 2 THEN NULL ELSE " +
            s"CAST(${S.intDiv(
              s"(s2 - ${S.wide("n_tokens")}) * 10000000000",
              s"(${S.wide("n_tokens")} * n_tokens)")} AS BIGINT) END")
            .as("yule_k_micro"))
        .orderBy("source")
    },

    // Distinct-n diversity (n = 2, 3) per source — the generation-
    // diversity metric (unique n-grams over total n-grams) applied as
    // a corpus-quality screen: a source whose distinct-2 ratio
    // collapses is template spam. Shares the portable shingle
    // builder; counts are exact (the distinct pass shuffles each
    // distinct (source, gram) pair once after partial aggregation —
    // the same string-keyed shuffle budget as q87's token ranks);
    // ratios are exact integer micro units.
    "q479_distinct_ngrams" -> { (s, dir) =>
      def grams(k: Int) = docsWithToks(s, dir)
        .select(col("source"), explode(expr(S.shingles("toks", k))).as("g"))
        .groupBy("source")
        .agg(count(lit(1)).as(s"n_${k}grams"),
          countDistinct(col("g")).as(s"uniq_${k}grams"))
        .withColumn(s"distinct${k}_micro", expr(
          s"CASE WHEN n_${k}grams = 0 THEN NULL " +
            s"ELSE uniq_${k}grams * 1000000 div n_${k}grams END"))
      // LEFT join on the 2-gram side: a source whose docs are all
      // 2-token templates — the extreme spam case this screen exists
      // to flag — has bigrams but no trigrams, and an inner join
      // would silently drop exactly that source (round-8 review)
      grams(2).join(grams(3), Seq("source"), "left")
        .select("source", "n_2grams", "uniq_2grams", "distinct2_micro",
          "n_3grams", "uniq_3grams", "distinct3_micro")
        .orderBy("source")
    },

    // Cross-document boilerplate removal at segment granularity (the
    // CCNet paragraph-dedup shape): docs split into consecutive
    // 8-token segments; a segment whose hash appears in ≥2 distinct
    // docs is template text. Emits per-doc segment counts and the
    // cleaned text with boilerplate segments dropped. The frequency
    // pass shuffles segment HASHES (never strings); the boilerplate
    // set is small by definition → broadcast back; the rebuild is one
    // doc-keyed aggregation.
    "q122_boilerplate_segments" -> { (s, dir) =>
      val segs = docsWithToks(s, dir)
        .filter(expr("size(toks) >= 8"))
        .select(col("doc_id"), col("toks"),
          explode(expr(S.rangeIncl("1", "size(toks) div 8"))).as("idx"))
        .select(col("doc_id"), col("idx"),
          expr(S.strJoin(S.slice("toks", "8*(idx-1)+1", "8"), " ")).as("seg"))
        .withColumn("h", expr(S.hash64("seg")))
      val boiler = segs.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("ndocs"))
        .filter(col("ndocs") >= 2)
        .select(col("h"), lit(true).as("b"))
      segs.join(broadcast(boiler), Seq("h"), "left")
        .withColumn("b", coalesce(col("b"), lit(false)))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_seg"),
          sum(when(col("b"), 1L).otherwise(0L)).as("n_boiler"),
          concat_ws(" ", expr(
            "transform(sort_array(collect_list(CASE WHEN NOT b THEN named_struct('idx', idx, 'seg', seg) END)), x -> x.seg)"))
            .as("cleaned_text"))
        .orderBy("doc_id")
    },

    // Out-of-vocabulary rate: the gibberish filter — vocabulary =
    // tokens seen ≥5 times corpus-wide; per doc, the fraction of
    // token occurrences outside it. Integer counts end-to-end with
    // one final division. At 100 TB the ≥5 vocabulary is the heavy
    // object, but the per-doc join is against its COMPLEMENT'S
    // membership: rare-token lookups hash-join the (small) OOV side
    // only after the vocab agg — here the vocab is broadcast.
    "q123_oov_rate" -> { (s, dir) =>
      val tok = docsWithToks(s, dir).filter(expr("size(toks) > 0"))
        .select(col("doc_id"), explode(col("toks")).as("t"))
      val vocab = tok.groupBy("t").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
        .select(col("t"), lit(true).as("iv"))
      tok.join(broadcast(vocab), Seq("t"), "left")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_toks"),
          sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          expr("CAST(n_oov AS DOUBLE) / CAST(n_toks AS DOUBLE)"))
        .select("doc_id", "n_toks", "n_oov", "oov_rate")
        .orderBy("doc_id")
    },

    // One BPE training round: adjacent character-pair frequencies
    // weighted by word frequency, top-20 merge candidates. Real BPE
    // trainers run on the WORD-COUNT table (vocabulary-sized), not the
    // corpus — the corpus is touched once for the word counts and
    // every merge round after that is vocab-sized work. Overlapping
    // pairs count per occurrence ("aaa" → "aa" twice), matching the
    // standard algorithm. Integer counts end-to-end.
    "q127_bpe_merge_step" -> { (s, dir) =>
      val wc = docsWithToks(s, dir)
        .select(explode(col("toks")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("wc"))
      wc.filter(length(col("t")) >= 2)
        .select(col("t"), col("wc"),
          explode(expr(S.rangeIncl("1", "length(t) - 1"))).as("i"))
        .select(expr("substr(t, i, 2)").as("pair"), col("wc"))
        .groupBy("pair").agg(sum("wc").as("total"))
        .orderBy(col("total").desc, col("pair").asc)
        .limit(20)
        .select(col("pair"), col("total"))
    },

    // Language-ID confusion matrix: actual × predicted counts with
    // per-actual-language fractions — the evaluation half of q26.
    "q88_langid_confusion" -> { (s, dir) =>
      langScored(s, dir)
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
        .withColumn("lang_total", sum("n").over(Window.partitionBy("lang")))
        .withColumn("frac", expr("CAST(n AS DOUBLE) / CAST(lang_total AS DOUBLE)"))
        .select("lang", "pred_lang", "n", "lang_total", "frac")
        .orderBy("lang", "pred_lang")
    },

    // Matthews correlation of the language-ID marker classifier on
    // the binary en-vs-rest task — the chance-robust single-number
    // companion to q88's confusion matrix and the kappa gate. The
    // numerator is sign-split around the shared sqrt text
    // (tp·tn − fp·fn can be negative; wideToDouble needs
    // non-negative input); the denominator is a product of four
    // marginals in the DECIMAL(38,0) lane — HONEST CEILING: exact to
    // ~3·10⁹ rows per cell, beyond which the product passes 10³⁸ and
    // the marginals must pre-scale.
    "q455_mcc" -> { (s, dir) =>
      val mccF = "CASE WHEN den_w = 0 THEN NULL WHEN num_w >= 0 THEN " +
        s"CAST(floor(${S.wideToDouble("num_w")} * CAST(1000000 AS DOUBLE) / " +
        s"sqrt(${S.wideToDouble("den_w")})) AS BIGINT) ELSE " +
        s"-CAST(floor(${S.wideToDouble("(-num_w)")} * CAST(1000000 AS DOUBLE) / " +
        s"sqrt(${S.wideToDouble("den_w")})) AS BIGINT) END"
      langScored(s, dir)
        .select(expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").as("a"),
          expr("CASE WHEN pred_lang = 'en' THEN 1 ELSE 0 END").as("p"))
        .agg(sum(expr("a * p")).as("tp"),
          sum(expr("(1 - a) * p")).as("fp"),
          sum(expr("a * (1 - p)")).as("fn"),
          sum(expr("(1 - a) * (1 - p)")).as("tn"))
        .withColumn("num_w",
          expr(s"${S.wide("tp")} * tn - ${S.wide("fp")} * fn"))
        .withColumn("den_w", expr(
          s"${S.wide("(tp + fp)")} * (tp + fn) * (tn + fp) * (tn + fn)"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          expr(mccF).as("mcc_micro"))
    },

    // ROUGE-L over the LSH candidate pairs: longest common
    // subsequence of the two docs' first-12-token prefixes, the
    // whole O(12²) DP inside ONE nested-fold expression (the q411
    // DTW discipline — array accumulator = DP row, sequential within
    // a pair, data-parallel across the pair frame). Candidates ride
    // the collapsed candPairs substrate, so clone clusters cost
    // output rows, not clones² DP runs.
    "q456_rouge_l" -> { (s, dir) =>
      val pre = docsWithToks(s, dir).filter(expr("size(toks) >= 12"))
        .select(col("doc_id"), expr("slice(toks, 1, 12)").as("tp"))
      val initRow =
        "aggregate(sequence(1, 12), cast(array() as array<bigint>), " +
          "(row, j) -> concat(row, array(greatest(" +
          "if(j > 1, element_at(row, j - 1), 0L), " +
          "if(element_at(ta, 1) = element_at(tb, j), 1L, 0L)))))"
      val dp =
        s"aggregate(sequence(2, 12), $initRow, " +
          "(acc, i) -> aggregate(sequence(1, 12), " +
          "cast(array() as array<bigint>), " +
          "(row, j) -> concat(row, array(greatest(" +
          "element_at(acc, j), " +
          "if(j > 1, element_at(row, j - 1), 0L), " +
          "if(element_at(ta, i) = element_at(tb, j), " +
          "if(j > 1, element_at(acc, j - 1), 0L) + 1L, 0L))))))"
      candPairs(s, dir)
        .join(pre.select(col("doc_id").as("doc_a"), col("tp").as("ta")),
          "doc_a")
        .join(pre.select(col("doc_id").as("doc_b"), col("tp").as("tb")),
          "doc_b")
        .withColumn("lcs", expr(s"element_at($dp, 12)"))
        .withColumn("rouge_l_milli", expr("lcs * 2000 div 24"))
        .select("doc_a", "doc_b", "lcs", "rouge_l_milli")
        .orderBy("doc_a", "doc_b")
    },

    // Directional BLEU-2 over the same LSH candidate substrate as
    // q456's ROUGE-L — the self-BLEU corpus-diversity probe (a corpus
    // whose candidate pairs score high self-BLEU is template spam
    // even when exact dedup is clean). Hypothesis doc_a scores
    // against reference doc_b on the 12-token prefixes: clipped
    // unigram and bigram precision counts are EXACT integers
    // (Σ_g min(count_a(g), count_b(g)) via a per-distinct-gram fold —
    // O(12²) lambda work per pair, data-parallel across the pair
    // frame); the geometric mean surfaces through ONE shared sqrt
    // text. Brevity penalty is exactly 1 by construction (equal
    // 12-token prefixes). Candidates ride the collapsed candPairs
    // substrate — output-linear under clone clusters, like q456.
    "q495_self_bleu" -> { (s, dir) =>
      val pre = docsWithToks(s, dir).filter(expr("size(toks) >= 12"))
        .select(col("doc_id"), expr("slice(toks, 1, 12)").as("tp"))
      def bigrams(arr: String) =
        s"transform(sequence(1, 11), i -> concat(element_at($arr, i), " +
          s"' ', element_at($arr, i + 1)))"
      candPairs(s, dir)
        .join(pre.select(col("doc_id").as("doc_a"), col("tp").as("ta")),
          "doc_a")
        .join(pre.select(col("doc_id").as("doc_b"), col("tp").as("tb")),
          "doc_b")
        .withColumn("ba", expr(bigrams("ta")))
        .withColumn("bb", expr(bigrams("tb")))
        .withColumn("uni_clip", expr(clipCount(S, "ta", "tb")))
        .withColumn("bi_clip", expr(clipCount(S, "ba", "bb")))
        .withColumn("bleu2_micro", expr(bleu2Text))
        .select("doc_a", "doc_b", "uni_clip", "bi_clip", "bleu2_micro")
        .orderBy("doc_a", "doc_b")
    },

    // Dedup percolation curve: component structure of the similarity
    // graph at Jaccard thresholds 0.5 / 0.7 / 0.9 — the threshold-
    // tuning table read before fixing a near-dup cutoff (the knee
    // where the giant component collapses into small clusters IS the
    // right threshold; below it dedup over-merges distinct docs).
    // Each threshold filters the memoized pairJaccard lanes (exact
    // integer milli-Jaccard) and runs the contraction components
    // operator; singleton docs (in the candidate universe but no
    // surviving edge) count as their own components. All exact
    // integers; three bounded CC runs over ever-sparser edge sets.
    "q502_percolation" -> { (s, dir) =>
      import s.implicits._
      val pj = pairJaccard(s, dir)
        .withColumn("jm", expr("n_inter * 1000 div n_union"))
      val univ = pj
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc"))
        .agg(countDistinct("doc").as("n_nodes"))
      // ONE components run over the layer-tagged union graph instead
      // of three sequential CC invocations: each edge replicates into
      // every threshold layer it passes, node ids offset by θ·10¹²
      // so layers can't interconnect (doc_id < 10¹² — far past the
      // corpus scale where this probe's all-pairs tier applies).
      // Component labels and sizes then decode per layer. Cuts the
      // fixed per-CC-round checkpoint machinery from 3× to 1×.
      val tagged = pj.filter(col("jm") >= 500)
        .select(explode(expr(
          "filter(array(500L, 700L, 900L), t -> jm >= t)")).as("t"),
          col("doc_a"), col("doc_b"))
      // loud guard on the encoding precondition: a corpus generator
      // emitting doc_id ≥ 10¹² would silently interconnect layers and
      // corrupt component counts — fail the run instead.
      def enc(c: String) =
        s"CASE WHEN $c >= 1000000000000 THEN CAST(raise_error(" +
          s"'q502: doc_id >= 10^12 breaks layer encoding') AS BIGINT) " +
          s"ELSE t * 1000000000000 + $c END"
      val edges = tagged.select(
        expr(enc("doc_a")).as("a"), expr(enc("doc_b")).as("b"))
      val cc = graft.operators.ConnectedComponents(edges)
      val layer = cc
        .groupBy(expr("id div 1000000000000").as("threshold_milli"))
        .agg(countDistinct("comp").as("n_comp_edged"),
          count(lit(1)).as("n_nodes_edged"), max("csize").as("max_cs"))
      val eCnt = tagged.groupBy(col("t").as("threshold_milli"))
        .agg(count(lit(1)).as("n_edges"))
      Seq(500L, 700L, 900L).toDF("threshold_milli")
        .join(layer, Seq("threshold_milli"), "left")
        .join(eCnt, Seq("threshold_milli"), "left")
        .crossJoin(broadcast(univ))
        .selectExpr("threshold_milli", "n_nodes",
          "coalesce(n_edges, CAST(0 AS BIGINT)) AS n_edges",
          "coalesce(n_comp_edged, CAST(0 AS BIGINT)) + " +
            "(n_nodes - coalesce(n_nodes_edged, CAST(0 AS BIGINT))) " +
            "AS n_components",
          "greatest(coalesce(max_cs, CAST(0 AS BIGINT)), " +
            "CASE WHEN n_nodes > coalesce(n_nodes_edged, CAST(0 AS BIGINT)) " +
            "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) " +
            "AS largest_comp",
          "CASE WHEN n_nodes = 0 THEN NULL ELSE " +
            "(n_nodes - (coalesce(n_comp_edged, CAST(0 AS BIGINT)) + " +
            "(n_nodes - coalesce(n_nodes_edged, CAST(0 AS BIGINT))))) " +
            "* 1000 div n_nodes END AS dedup_gain_permille")
        .orderBy("threshold_milli")
    },

    // b-bit minhash (Li & König 2010, b=1): compress each 16-minhash
    // signature to 16 PARITY bits and estimate Jaccard from the bit
    // agreement rate (Ĵ = 2A/k − 1, clamped at 0 — under b=1 a
    // non-matching lane still agrees half the time). The per-pair
    // report against the EXACT Jaccard lanes measures what the 16×
    // storage reduction costs in estimation error — the signature-
    // sizing table read before provisioning a planet-scale dedup
    // index. All integer: parity bits pack into one BIGINT per doc,
    // agreement is popcount over XOR, both Jaccards ride exact milli
    // lanes over the memoized pairJaccard/minhash16 substrates.
    "q509_bbit_minhash" -> { (s, dir) =>
      val bits = minhash16(s, dir)
        .groupBy("doc_id")
        .agg(sum(expr(
          "(h % 2) * shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"))
          .as("sig"))
      pairJaccard(s, dir)
        .join(bits.select(col("doc_id").as("doc_a"), col("sig").as("ga")),
          "doc_a")
        .join(bits.select(col("doc_id").as("doc_b"), col("sig").as("gb")),
          "doc_b")
        .withColumn("agree",
          expr(s"16 - ${S.bitCount(S.bxor("ga", "gb"))}").cast("long"))
        .withColumn("jac_est_milli", expr(
          "greatest(CAST(0 AS BIGINT), (2 * agree - 16) * 1000 div 16)"))
        .withColumn("jac_true_milli", expr("n_inter * 1000 div n_union"))
        .withColumn("abs_err_milli",
          expr("abs(jac_est_milli - jac_true_milli)"))
        .select("doc_a", "doc_b", "agree", "jac_est_milli",
          "jac_true_milli", "abs_err_milli")
        .orderBy("doc_a", "doc_b")
    },

    // LSH band-geometry sweep: the (rows-per-band r, bands b) tuning
    // table for the 16-lane minhash signature — r=2/b=8 (the shipped
    // geometry), 4/4, 8/2. Two numbers per geometry: PROBE volume
    // (Σ_key C(n,2) over band-key groups — the join work an index at
    // that geometry pays, clone clusters counted at full cost, which
    // IS the uncollapsed probe bill) and RECALL of the jm ≥ 700
    // near-dup truth set (the collapsed pairJaccard substrate — truth
    // is output-sized, so the per-pair band checks are lambda work
    // over 16-lane arrays, never a per-geometry candidate self-join).
    "q533_lsh_band_sweep" -> { (s, dir) =>
      val sig = Tables.memo(s, s"$dir#mh16arr") {
        minhash16(s, dir).groupBy("doc_id")
          .agg(expr("transform(sort_array(collect_list(struct(j, h))), " +
            "x -> x.h)").as("mh"))
      }
      val truth = pairJaccard(s, dir)
        .filter(expr("n_inter * 1000 div n_union >= 700"))
        .select("doc_a", "doc_b")
        .join(sig.select(col("doc_id").as("doc_a"), col("mh").as("ma")),
          "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("mh").as("mb")),
          "doc_b")
      val geoms = Seq(2, 4, 8)
      geoms.map { r =>
        val b = 16 / r
        val probe = sig
          .select(explode(expr(
            s"transform(sequence(0, ${b - 1}), i -> concat(i, '|', " +
              s"concat_ws(',', transform(slice(mh, i * $r + 1, $r), " +
              "x -> cast(x as string)))))")).as("bk"))
          .groupBy("bk").agg(count(lit(1)).as("c"))
          .agg(expr("CAST(SUM(c * (c - 1) div 2) AS BIGINT)")
            .as("probe_pairs"))
        val rec = truth
          .withColumn("hit", expr(
            s"CASE WHEN size(filter(sequence(0, ${b - 1}), " +
              s"i -> slice(ma, i * $r + 1, $r) = slice(mb, i * $r + 1, $r)" +
              ")) > 0 THEN 1 ELSE 0 END"))
          .agg(count(lit(1)).as("n_true"),
            sum("hit").cast("long").as("n_recalled"))
        rec.crossJoin(broadcast(probe))
          .select(lit(r.toLong).as("r_rows"), lit(b.toLong).as("n_bands"),
            col("probe_pairs"), col("n_true"), col("n_recalled"),
            expr("CASE WHEN n_true = 0 THEN NULL ELSE " +
              "n_recalled * 1000 div n_true END").as("recall_permille"))
      }.reduce(_.unionByName(_)).orderBy("r_rows")
    },

    // Train/test near-dup leakage audit: how many LSH candidate pairs
    // straddle the q84 hash split — the contamination check every
    // eval pipeline owes its benchmark (a test doc whose near-twin
    // sits in train inflates the score without any verbatim overlap;
    // q72/q121's n-gram contamination misses paraphrase-level twins).
    // Candidate pairs ride the collapsed candPairs substrate; the
    // split is the same portable-hash bucket as q84 (stable across
    // engines and cluster sizes), so the report is exact integers:
    // total pairs, cross-split pairs, the train↔test subset, and the
    // exact-duplicate-class subset of those (same sorted shingle set
    // ACROSS the split — the worst leak class).
    "q504_split_leakage" -> { (s, dir) =>
      // split needs only doc_id — read documents directly instead of
      // coupling to the tokenization memo (review finding: the memo
      // persists the whole toks column for a query that never reads it)
      val sp = Tables.documents(s, dir)
        .select(col("doc_id"), expr(S.splitBucket).as("hk"))
        .withColumn("split", expr(graft.functions.PortableSql.SplitCase))
        .select("doc_id", "split")
      val cls = docClasses(s, dir)
      val cand = candPairs(s, dir)
        .join(sp.select(col("doc_id").as("doc_a"), col("split").as("sa")),
          "doc_a")
        .join(sp.select(col("doc_id").as("doc_b"), col("split").as("sb")),
          "doc_b")
        .join(cls.select(col("doc_id").as("doc_a"), col("rep").as("ra")),
          "doc_a")
        .join(cls.select(col("doc_id").as("doc_b"), col("rep").as("rb")),
          "doc_b")
      cand.agg(
          count(lit(1)).as("n_cand_pairs"),
          sum(expr("CASE WHEN sa <> sb THEN 1 ELSE 0 END"))
            .as("n_cross_split"),
          sum(expr("CASE WHEN (sa = 'train' AND sb = 'test') OR " +
            "(sa = 'test' AND sb = 'train') THEN 1 ELSE 0 END"))
            .as("n_train_test"),
          sum(expr("CASE WHEN ra = rb AND sa <> sb THEN 1 ELSE 0 END"))
            .as("n_exact_cross"))
        .withColumn("leak_permille", expr(
          "CASE WHEN n_cand_pairs = 0 THEN NULL " +
            "ELSE n_cross_split * 1000 div n_cand_pairs END"))
    },

    // Fellegi–Sunter probabilistic record linkage over the candidate
    // pairs: per-field agreement weights log2(m/u) learned from the
    // exact-duplicate classes (same-class pairs are the matched set M,
    // cross-class candidates the unmatched set U), in the q173
    // integer-bit lane — weight_f = floor(log2((m_f·|U|) div
    // (u_f·|M|))) = bitlen(ratio) − 1, which floors sub-evidence
    // fields to 0 bits, no float log anywhere. The m·|U| cross
    // products ride the wide lane (two pair-counts multiply — BIGINT
    // alone saturates near 3×10⁹ candidate pairs). Cross-class pairs then score Σ weights over their
    // agreeing fields (language, source, length band, 16-char
    // prefix); the top-20 "possible match" band surfaces through a
    // bounded heap. The supervision-free linkage step between q434's
    // blocking and a human review queue.
    "q505_record_linkage" -> { (s, dir) =>
      val attrs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          expr("substring(text, 1, 16)").as("p16"))
      val cls = docClasses(s, dir)
      val pairs = candPairs(s, dir)
        .join(attrs.select(col("doc_id").as("doc_a"), col("lang").as("la"),
          col("source").as("oa"), col("n_chars").as("na"),
          col("p16").as("pa")), "doc_a")
        .join(attrs.select(col("doc_id").as("doc_b"), col("lang").as("lb"),
          col("source").as("ob"), col("n_chars").as("nb"),
          col("p16").as("pb")), "doc_b")
        .join(cls.select(col("doc_id").as("doc_a"), col("rep").as("ra")),
          "doc_a")
        .join(cls.select(col("doc_id").as("doc_b"), col("rep").as("rb")),
          "doc_b")
        .withColumn("matched", expr("CASE WHEN ra = rb THEN 1 ELSE 0 END"))
        .withColumn("f1", expr("CASE WHEN la = lb THEN 1 ELSE 0 END"))
        .withColumn("f2", expr("CASE WHEN oa = ob THEN 1 ELSE 0 END"))
        .withColumn("f3",
          expr("CASE WHEN abs(na - nb) <= 20 THEN 1 ELSE 0 END"))
        .withColumn("f4", expr("CASE WHEN pa = pb THEN 1 ELSE 0 END"))
      val aggs = Seq(sum(col("matched")).as("mt"),
        sum(expr("1 - matched")).as("ut")) ++
        (1 to 4).map(i =>
          sum(expr(s"CASE WHEN matched = 1 THEN f$i ELSE 0 END"))
            .as(s"m$i")) ++
        (1 to 4).map(i =>
          sum(expr(s"CASE WHEN matched = 0 THEN f$i ELSE 0 END"))
            .as(s"u$i"))
      val wts = pairs.agg(aggs.head, aggs.tail: _*)
      val wCols = (1 to 4).map(i =>
        s"CAST(length(bin(CAST(${S.intDiv(
          s"${S.wide(s"m$i")} * ut",
          s"greatest(${S.wide("1")}, ${S.wide(s"u$i")} * mt)")} " +
          s"AS BIGINT))) - 1 AS BIGINT) AS w$i")
      val weighted = wts.selectExpr(wCols: _*)
      pairs.filter(col("matched") === 0)
        .crossJoin(broadcast(weighted))
        .withColumn("score_bits", expr(
          "f1 * w1 + f2 * w2 + f3 * w3 + f4 * w4").cast("long"))
        .withColumn("n_agree", expr("f1 + f2 + f3 + f4").cast("long"))
        .select("doc_a", "doc_b", "score_bits", "n_agree")
        .orderBy(col("score_bits").desc, col("doc_a").asc, col("doc_b").asc)
        .limit(20)
    },

    // Per-source dedup-inflation report: how many docs and tokens
    // each source loses under exact-duplicate-class dedup (the q28/
    // q65 classes: identical sorted shingle sets, global first-id
    // rep) — the "dedup savings" table a corpus budget review reads
    // before paying for another crawl of a source that is 40% clones.
    // A doc whose rep lives in ANOTHER source counts as dropped here
    // (global dedup, per-source attribution); short docs (<3 tokens,
    // no shingle class) keep themselves. All exact integers over the
    // memoized docClasses substrate — one broadcast-joinable class
    // map, one source-grain aggregate.
    "q500_dedup_inflation" -> { (s, dir) =>
      val base = docsWithToks(s, dir)
        .select(col("doc_id"), col("source"),
          expr("CAST(size(toks) AS BIGINT)").as("nt"))
      base.join(docClasses(s, dir), Seq("doc_id"), "left")
        .withColumn("kept",
          expr("CASE WHEN rep IS NULL OR rep = doc_id THEN 1 ELSE 0 END"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("kept").as("n_kept"),
          sum("nt").as("tok_total"),
          sum(expr("CASE WHEN kept = 1 THEN nt ELSE 0 END")).as("tok_kept"))
        .withColumn("inflation_permille",
          expr("CASE WHEN tok_total = 0 THEN NULL " +
            "ELSE (tok_total - tok_kept) * 1000 div tok_total END"))
        .withColumn("dup_ratio_milli",
          expr("CASE WHEN n_kept = 0 THEN NULL " +
            "ELSE n_docs * 1000 div n_kept END"))
        .select("source", "n_docs", "n_kept", "tok_total", "tok_kept",
          "inflation_permille", "dup_ratio_milli")
        .orderBy("source")
    },

    // Content-defined chunk dedup: hash-gated chunk boundaries
    // (a token whose portable hash ≡ 0 mod 31 ends a chunk, so
    // boundaries survive insertions/deletions — the rsync/CDC trick),
    // per-chunk rolling fingerprints, then duplicate chunks across the
    // corpus. This catches SHARED PASSAGES between non-duplicate
    // documents, which doc-level minhash misses. Chunking is one
    // per-doc window pass; dedup is one shuffle on the fingerprint.
    "q91_cdc_chunks" -> { (s, dir) =>
      val wPrev = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val chunked = docsWithToks(s, dir)
        .filter(expr("size(toks) > 0"))
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "t")))
        .withColumn("h", expr(S.hash64("t")))
        .withColumn("gate", expr("CASE WHEN h % 31 = 0 THEN 1 ELSE 0 END"))
        .withColumn("chunk",
          coalesce(sum("gate").over(wPrev), lit(0L)).cast("long"))
      val fp = expr(
        s"""${S.fold(
            S.transform("sort_array(collect_list(struct(pos, h)))", "x", "x.h"),
            S.longLit(0), "a", "x", "(a * 31 + x) % 1000000007")}""")
      chunked.groupBy("doc_id", "chunk")
        .agg(count(lit(1)).as("chunk_len"), fp.as("fp"))
        .groupBy("fp", "chunk_len")
        .agg(count(lit(1)).as("n_copies"),
          countDistinct("doc_id").as("n_docs"),
          min("doc_id").as("rep_doc"))
        .filter(col("n_copies") >= 2)
        .orderBy("fp", "chunk_len")
    },

    // Robust length-outlier detection: per language, median and MAD
    // (median absolute deviation) of the token count — both exact
    // interpolated quantiles — and the count of docs beyond 3 MADs.
    // The robust-statistics variant of the length filter every corpus
    // pipeline runs (mean/stddev break under the very outliers being
    // hunted).
    "q92_length_outliers" -> { (s, dir) =>
      def interp(p: String, lo: String, hi: String, n: String): String =
        PortableSql.interpQuantile(p, lo, hi, n)
      def medianOf(df: DataFrame, valueCol: String, out: String): DataFrame = {
        val byLang = Window.partitionBy("lang")
        val g = df
          .withColumn("v", col(valueCol).cast("double"))
          .withColumn("rn", row_number().over(byLang.orderBy("v", "doc_id")) - 1)
          .withColumn("n", count(lit(1)).over(byLang))
        g.groupBy("lang").agg(
          max(when(expr("rn = floor((n - 1) * CAST(0.5 AS DOUBLE))"), col("v"))).as("lo"),
          max(when(expr("rn = ceil((n - 1) * CAST(0.5 AS DOUBLE))"), col("v"))).as("hi"),
          max("n").as("n"))
          .selectExpr("lang", s"${interp("0.5", "lo", "hi", "n")} AS $out")
      }
      val toks = docsWithToks(s, dir)
        .select(col("doc_id"), col("lang"), expr("size(toks)").cast("long").as("n_tokens"))
      val med = medianOf(toks, "n_tokens", "med")
      val dev = toks.join(broadcast(med), "lang")
        .withColumn("dev", expr("abs(CAST(n_tokens AS DOUBLE) - med)"))
      val mad = medianOf(dev.withColumnRenamed("dev", "devv")
        .select(col("doc_id"), col("lang"), col("devv")), "devv", "mad")
      dev.join(broadcast(mad), "lang")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), max("med").as("med"), max("mad").as("mad"),
          sum(expr("CASE WHEN dev > CAST(3 AS DOUBLE) * mad THEN 1 ELSE 0 END"))
            .as("n_outliers"))
        .orderBy("lang")
    },

    // Lexical diversity via Gini impurity over the token distribution:
    // 1 - Σ(c_i/n)² spelled as (n² - Σc²)/n² — all-integer numerators,
    // one exactly-rounded division (the log-free alternative to token
    // entropy, which no two libms round identically). Low = one token
    // dominates (spam); high = diverse vocabulary.
    "q93_gini_diversity" -> { (s, dir) =>
      docsWithToks(s, dir)
        .filter(expr("size(toks) > 0"))
        .select(col("doc_id"), explode(col("toks")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_toks"), sum(expr("c * c")).as("sum_c2"))
        .withColumn("gini",
          expr("CAST(n_toks * n_toks - sum_c2 AS DOUBLE) / CAST(n_toks * n_toks AS DOUBLE)"))
        .select("doc_id", "n_toks", "sum_c2", "gini")
        .orderBy("doc_id")
    },

    // Collocation mining by lift: (N · c_ab) / (c_a · c_b) over corpus
    // bigrams with support ≥ 5 — the log-free PMI. Unigram counts
    // broadcast to the bigram frame; integer products stay < 2^53 so
    // both numerator and denominator are exact before the one division.
    "q94_collocations" -> { (s, dir) =>
      val tok = docsWithToks(s, dir)
        .filter(expr("size(toks) >= 2"))
      // memoized: the ta- and tb-side broadcasts would otherwise each
      // re-run the vocabulary aggregation
      val uni = Tables.memo(s, s"$dir#q94uni") {
        tok.select(explode(col("toks")).as("t"))
          .groupBy("t").agg(count(lit(1)).as("cu"))
      }
      // total tokens from the (tiny, cached) vocabulary frame — a second
      // corpus-wide explode just to count would be a wasted full pass
      val nTot = uni.agg(sum("cu").as("nn"))
      val bi = tok
        .select(explode(expr(S.shingles("toks", 2))).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5)
        .withColumn("ta", expr("split_part(bigram, ' ', 1)"))
        .withColumn("tb", expr("split_part(bigram, ' ', 2)"))
      bi.join(broadcast(uni.withColumnRenamed("t", "ta").withColumnRenamed("cu", "ca")), "ta")
        .join(broadcast(uni.withColumnRenamed("t", "tb").withColumnRenamed("cu", "cb")), "tb")
        .crossJoin(broadcast(nTot))
        .withColumn("lift", expr(
          "(CAST(nn AS DOUBLE) * CAST(cab AS DOUBLE)) / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))"))
        .orderBy(col("lift").desc, col("bigram").asc)
        .limit(50)
        .select("bigram", "cab", "ca", "cb", "lift")
    },

    // Distribution drift: two-sample Kolmogorov-Smirnov distance of the
    // quality score, each source vs the rest of the corpus — the
    // monitoring op that catches a crawler or source gone bad. The
    // empirical CDFs are step functions, so the sup is attained at a
    // sample point: evaluate both CDFs at every distinct score (window
    // cumsum per source partition) and take the max |diff| — counts and
    // totals are integers, two divisions and a subtraction per point.
    "q95_ks_drift" -> { (s, dir) =>
      val q = qualityRows(s, dir).select(col("doc_id"), col("source"), col("quality_score"))
      val srcs = q.select("source").distinct()
      val tot = q.agg(count(lit(1)).as("nn"))
      val perSrc = q.groupBy("source").agg(count(lit(1)).as("ns"))
      val ex = srcs.withColumnRenamed("source", "s")
        .crossJoin(q)
        .withColumn("in_s", expr("CASE WHEN source = s THEN 1 ELSE 0 END"))
      val wOrd = Window.partitionBy("s").orderBy("quality_score", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = ex
        .withColumn("cin", sum("in_s").over(wOrd))
        .withColumn("rn", count(lit(1)).over(wOrd))
        // CDF is right-continuous: evaluate at the LAST row of each
        // distinct score (ties collapse to the same threshold)
        .groupBy("s", "quality_score")
        .agg(max("cin").as("cin"), max("rn").as("rn"))
      cum.join(broadcast(perSrc.withColumnRenamed("source", "s")), "s")
        .crossJoin(broadcast(tot))
        .withColumn("d", expr(
          "abs(CAST(cin AS DOUBLE) / CAST(ns AS DOUBLE) - " +
            "CAST(rn - cin AS DOUBLE) / CAST(nn - ns AS DOUBLE))"))
        .groupBy("s").agg(max("ns").as("n_docs"), max("d").as("ks"))
        .withColumnRenamed("s", "source")
        .orderBy("source")
    },

    // BM25-style relevance for a fixed query, with the rational idf
    // (N - df + ½)/(df + ½) — BM25's log dropped so the score is a
    // pure rational op chain (the ranking it induces per term is
    // identical; the log only compresses). Per-term scores pivot to
    // columns so the final sum has a PINNED add order.
    "q96_bm25" -> { (s, dir) =>
      val terms = Seq("scan", "merge", "window")
      val k1 = "CAST(1.2 AS DOUBLE)"
      val b = "CAST(0.75 AS DOUBLE)"
      val half = "CAST(0.5 AS DOUBLE)"
      val base = docsWithToks(s, dir)
        .withColumn("dl", expr("size(toks)").cast("long"))
      val stats = base.agg(count(lit(1)).as("nn"), sum("dl").as("sum_dl"))
      val inList = terms.map(t => s"'$t'").mkString("(", ",", ")")
      val tf = base
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
        .filter(s"t IN $inList")
        .groupBy("doc_id", "dl", "t").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(dfreq), "t")
        .crossJoin(broadcast(stats))
        .withColumn("avgdl", expr("CAST(sum_dl AS DOUBLE) / CAST(nn AS DOUBLE)"))
        .withColumn("idf_r", expr(
          s"(CAST(nn - df AS DOUBLE) + $half) / (CAST(df AS DOUBLE) + $half)"))
        .withColumn("score", expr(
          s"idf_r * (CAST(tf AS DOUBLE) * ($k1 + CAST(1 AS DOUBLE))) / " +
            s"(CAST(tf AS DOUBLE) + $k1 * (CAST(1 AS DOUBLE) - $b + $b * (CAST(dl AS DOUBLE) / avgdl)))"))
      val zero = "CAST(0 AS DOUBLE)"
      val aggCols = terms.map(t =>
        coalesce(max(when(col("t") === t, col("score"))), expr(zero)).as(s"s_$t"))
      val pivoted = scored.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
      pivoted
        .withColumn("bm25", expr(terms.map(t => s"s_$t").mkString(" + ")))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id").asc)))
        .filter(col("rk") <= 20)
        .select(Seq(col("rk"), col("doc_id")) ++
          terms.map(t => col(s"s_$t")) :+ col("bm25"): _*)
        .orderBy("rk")
    },

    // MinHash sketch calibration: for every LSH candidate pair, the
    // signature-agreement Jaccard estimate (matching minhashes / 16)
    // against the exact shingle Jaccard — the measurement that tells
    // you whether 16 hashes / 8 bands is enough before trusting the
    // sketch at corpus scale. All counts are integers; est, jaccard,
    // and the error are three divisions and a subtraction.
    "q97_sketch_calibration" -> { (s, dir) =>
      val mh = minhash16(s, dir)
      val cand = candPairs(s, dir)
      val agree = cand
        .join(mh.as("ma"), col("doc_a") === col("ma.doc_id"))
        .join(mh.as("mb"),
          col("doc_b") === col("mb.doc_id") && col("ma.j") === col("mb.j"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(expr("CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END")).as("n_agree"))
      val shs = shingleRows(s, dir)
      agree
        .join(shs.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(shs.as("sb"), col("doc_b") === col("sb.doc_id"))
        .withColumn("n_inter", expr(s"size(${S.arrIntersect("sa.sh", "sb.sh")})").cast("long"))
        .withColumn("jaccard", expr(
          "CAST(n_inter AS DOUBLE) / CAST(size(sa.sh) + size(sb.sh) - n_inter AS DOUBLE)"))
        .withColumn("est", expr("CAST(n_agree AS DOUBLE) / CAST(16 AS DOUBLE)"))
        .withColumn("abs_err", expr("abs(est - jaccard)"))
        .select("doc_a", "doc_b", "n_agree", "est", "jaccard", "abs_err")
        .orderBy("doc_a", "doc_b")
    },

    // End-to-end dedup impact report, one row: corpus totals, exact-dup
    // surplus, LSH candidate volume, cluster counts, and what the q65
    // keep rule would drop (docs and tokens) — the before/after numbers
    // a pipeline run reports. Every input frame is a one-row aggregate;
    // the heavy lifting reuses the cached LSH chain.
    "q99_dedup_summary" -> { (s, dir) =>
      val docs = docsWithToks(s, dir)
      val totals = docs.agg(count(lit(1)).as("n_docs"),
        sum(expr("CAST(size(toks) AS BIGINT)")).as("n_tokens"))
      val exactDups = docs
        .groupBy(expr("md5(text)").as("h")).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n - 1")).as("n_exact_dups"))
      val cand = candPairs(s, dir)
      val nPairs = cand.agg(count(lit(1)).as("n_lsh_pairs"))
      val comp = componentRows(s, dir)
      val compStats = comp.agg(count(lit(1)).as("n_clustered"),
        countDistinct("comp").as("n_clusters"))
      val dropStats = rankedComponents(s, dir)
        .filter(col("rk") > 1)
        .join(docs.select(col("doc_id"), expr("CAST(size(toks) AS BIGINT)").as("nt")), "doc_id")
        .agg(count(lit(1)).as("n_dropped"),
          coalesce(sum("nt"), lit(0L)).as("tokens_dropped"))
      totals.crossJoin(exactDups).crossJoin(nPairs)
        .crossJoin(compStats).crossJoin(dropStats)
    },

    // The full corpus-prep pipeline in ONE declarative plan: quality
    // gate at the exact global p10 → near-dup drop (q65 keep rule) →
    // deterministic 90/5/5 split → per-(split, lang) doc/token report.
    // This is the flagship composition: five operators (quality,
    // quantile, LSH dedup, components, hash split) fused by Catalyst
    // into a single job graph with the tokenize/LSH caches shared.
    "q100_corpus_prep" -> { (s, dir) =>
      val q = qualityRows(s, dir).select(col("doc_id"), col("lang"),
        expr("CAST(size(toks) AS BIGINT)").as("nt"), col("quality_score"))
      val g = graft.plans.GlobalOrder.withRowNumber(q,
          Seq(col("quality_score"), col("doc_id")),
          col("quality_score"), "rn", countName = Some("n"))
        .withColumn("rn", col("rn") - 1)
      val ps = PortableSql.quantilePos("0.1", "n")
      val p10 = g.agg(
        max(when(expr(s"rn = floor($ps)"), col("quality_score"))).as("lo"),
        max(when(expr(s"rn = ceil($ps)"), col("quality_score"))).as("hi"),
        max("n").as("n"))
        .selectExpr(
          s"${PortableSql.interpQuantile("0.1", "lo", "hi", "n")} AS p10")
      val qual = q.crossJoin(broadcast(p10))
        .filter(col("quality_score") >= col("p10"))
      val losers = rankedComponents(s, dir)
        .filter(col("rk") > 1)
        .select("doc_id")
      qual.join(losers, Seq("doc_id"), "left_anti")
        .withColumn("hk", expr(S.splitBucket))
        .withColumn("split", expr(PortableSql.SplitCase))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
          min("doc_id").as("first_doc"))
        .orderBy("split", "lang")
    },

    // Inverted-index construction for the mid-frequency bigram band
    // (df in [2, n_docs/20] — data-relative, so the band is populated
    // at every scale factor): document frequency, total term
    // frequency, and the ordered posting list serialized as a string.
    // df-filter FIRST, collect postings only for surviving terms —
    // head terms (df ≈ corpus size) never build a list, so per-group
    // state is bounded by the df ceiling, not by the worst term.
    "q139_posting_lists" -> { (s, dir) =>
      val dfCap =
        memoCount(s, s"$dir#ndocs")(docsWithToks(s, dir).count()) / 20
      val perDoc = docsWithToks(s, dir)
        .filter(expr("size(toks) >= 2"))
        .select(col("doc_id"), explode(expr(S.shingles("toks", 2))).as("tok"))
        .groupBy("tok", "doc_id").agg(count(lit(1)).as("tf"))
      val kept = perDoc.groupBy("tok")
        .agg(count(lit(1)).as("df"), sum("tf").cast("long").as("ttf"))
        .filter(col("df").between(2, dfCap))
      kept.join(perDoc, "tok")
        .groupBy("tok")
        .agg(max("df").as("df"), max("ttf").as("ttf"),
          expr("concat_ws(',', sort_array(collect_list(doc_id)))").as("postings"))
        .orderBy("tok")
    },

    // Containment scoring over the LSH candidates — the ONE-WAY
    // near-dup test Jaccard misses: a short doc quoted inside a much
    // larger one has tiny |A∩B|/|A∪B| but containment
    // |A∩B|/min(|A|,|B|) ≈ 1. Candidates come from the shared
    // symmetric-LSH stage (at 100 TB a dedicated containment pass
    // would band per size stratum, since minhash recall drops with
    // size asymmetry — the gate's semantics don't change). The
    // smaller side is reported as the contained doc.
    "q146_containment" -> { (s, dir) =>
      val cand = candPairs(s, dir)
      val shs = shingleRows(s, dir)
      cand
        .join(shs.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(shs.as("sb"), col("doc_b") === col("sb.doc_id"))
        .withColumn("n_inter",
          expr(s"size(${S.arrIntersect("sa.sh", "sb.sh")})").cast("long"))
        .withColumn("n_a", expr("size(sa.sh)").cast("long"))
        .withColumn("n_b", expr("size(sb.sh)").cast("long"))
        .withColumn("containment",
          expr("CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)"))
        .filter(col("containment") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("n_inter"),
          col("n_a"), col("n_b"), col("containment"),
          expr("CASE WHEN n_a <= n_b THEN doc_a ELSE doc_b END").as("contained_doc"))
        .orderBy("doc_a", "doc_b")
    },

    // Rank-based score calibration across sources (quantile
    // normalization): raw per-doc scores are not comparable across
    // domains — a "long" doc in one source is median in another — so
    // each source maps its docs onto decile ranks before any global
    // threshold applies. row_number with a doc_id tiebreak + integer
    // decile arithmetic: no floats anywhere, one window shuffle per
    // source partition.
    "q147_score_calibration" -> { (s, dir) =>
      val scored = docsWithToks(s, dir)
        .select(col("source"), col("doc_id"),
          expr("CAST(size(toks) AS BIGINT)").as("nt"))
      val w = Window.partitionBy("source").orderBy("nt", "doc_id")
      scored
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
        .withColumn("decile", expr("(CAST(rn AS BIGINT) - 1) * 10 div n"))
        .groupBy("source", "decile")
        .agg(count(lit(1)).as("n_docs"),
          min("nt").as("min_nt"), max("nt").as("max_nt"))
        .orderBy("source", "decile")
    },

    // Cross-document repeated-span detection — the substring-level
    // dedup signal (the suffix-array "dedup training data" shape,
    // approximated distributively with 16-token shingle fingerprints):
    // a span is duplicated if its fingerprint occurs in >= 2 distinct
    // docs; each doc reports its duplicated-span fraction in exact
    // milli-units. Spans travel as 60-bit hashes, never as strings —
    // the shuffle carries 8 bytes per span regardless of span length
    // (hash collisions are identical on both engines, so parity holds
    // even in the collision case).
    "q144_span_dedup" -> { (s, dir) =>
      // memoized: the shared-filter, per-doc-total, and dup-count
      // branches all traverse the 16-token explode — without the
      // shared pass the heaviest stage of the query runs three times
      val sp = Tables.memo(s, s"$dir#q144spans") {
        docsWithToks(s, dir)
          .filter(expr("size(toks) >= 16"))
          .select(col("doc_id"),
            explode(expr(S.shingles("toks", 16))).as("span"))
          .select(col("doc_id"), expr(S.hash64("span")).as("hk"))
      }
      val shared = sp.groupBy("hk")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2)
        .select("hk")
      val tot = sp.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      val dup = sp.join(shared, Seq("hk"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
      tot.join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          expr("coalesce(n_dup, 0) * 1000 div n_spans").as("dup_milli"))
        .orderBy("doc_id")
    },

    // Misra-Gries heavy-hitter contract gate (the q131/q136 pattern
    // for frequency sketches): every token with true count > n/k must
    // be present in the k-slot sketch with an estimate in
    // [count − n/k, count]. The gate holds under ANY partition-merge
    // order (the bound is order-independent), which is exactly why a
    // boolean contract — not the raw estimates — is the right oracle
    // surface for a mergeable sketch. The sketch itself is one typed
    // aggregation; only the k-entry map reaches the driver.
    "q141_mg_heavy_bound" -> { (s, dir) =>
      import s.implicits._
      val k = 200
      val toks = docsWithToks(s, dir).select(explode(col("toks")).as("tok"))
      val sketch: Map[String, Long] =
        toks.as[String].select(graft.functions.Sketches.heavyHitters(k)).head()
      val skDf = sketch.toSeq.toDF("tok", "est")
      val n = memoCount(s, s"$dir#ntoks")(toks.count())
      val thresh = n / k
      toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .filter(col("n") > thresh)
        .join(broadcast(skDf), Seq("tok"), "left")
        .select(col("tok"), col("n"),
          col("est").isNotNull.as("present"),
          (col("est").isNotNull && col("est") <= col("n") &&
            col("est") >= col("n") - lit(thresh)).as("est_ok"))
        .orderBy("tok")
    },

    // Sparse-vector cosine similarity via the inverted index — the
    // lexical complement to the dense ANN stack (q33/q34/q47): docs are
    // 3-shingle count vectors, pairs form ONLY through shared postings
    // (a self-join on the term key — never all-pairs), and hot terms
    // are dropped by a document-frequency cap, which is what bounds
    // every posting list (and therefore the join's fan-out) at corpus
    // scale. All-integer similarity: dot and norms² stay BIGINT and
    // the score is milli(cos²) by integer division, so the aggregation
    // is order-free — no float fold to pin. Top-200 by a bounded
    // WindowGroupLimit heap.
    "q157_sparse_cosine" -> { (s, dir) =>
      val dfCap =
        memoCount(s, s"$dir#ndocs")(docsWithToks(s, dir).count()) / 20
      val tf = docsWithToks(s, dir)
        .filter(expr("size(toks) >= 3"))
        .select(col("doc_id"), explode(expr(S.shingles("toks", 3))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val rare = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, dfCap)).select("tok")
      val kept = Tables.memo(s, s"$dir#q157kept")(
        tf.join(rare, Seq("tok"), "left_semi"))
      val norms = kept.groupBy("doc_id")
        .agg(sum(expr("tf * tf")).cast("long").as("n2"))
      val dots = kept.as("a").join(kept.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(sum(expr("a.tf * b.tf")).cast("long").as("dot"))
      val scored = dots
        .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("na2")), "doc_a")
        .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("nb2")), "doc_b")
        .withColumn("cos2_milli", expr("dot * dot * 1000 div (na2 * nb2)"))
      scored
        .withColumn("rn", row_number().over(
          Window.orderBy(col("cos2_milli").desc, col("doc_a"), col("doc_b"))))
        .filter(col("rn") <= 200).drop("rn")
        .select("doc_a", "doc_b", "dot", "na2", "nb2", "cos2_milli")
        .orderBy("doc_a", "doc_b")
    },

    // Cross-source duplication matrix — which source PAIRS share
    // repeated content (the provenance view that tells a corpus
    // curator "crawl B heavily mirrors crawl A"): the shared unit is
    // the 16-token span fingerprint (q144's substring-dedup signal —
    // whole-document digests almost never collide across crawls, spans
    // do), deduped to one row per (source, span) BEFORE the pair
    // self-join, so the join's fan-out per span is bounded by the
    // number of sources, never by document count. Spans travel as
    // 60-bit hashes — 8 bytes each through the one shuffle.
    "q163_source_overlap" -> { (s, dir) =>
      val sp = spanFingerprints(s, dir)
      sp.as("a").join(sp.as("b"),
          col("a.hk") === col("b.hk") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("shared_spans"))
        .orderBy("src_a", "src_b")
    },

    // BPE tokenizer TRAINING, 6 merge rounds end-to-end (q127 gates
    // one round; this gates the iterated algorithm — each round's
    // winning pair depends on every previous round's rewrites). The
    // corpus state is one separator-framed string per doc
    // ('|tok|tok|'); a round counts adjacent symbol pairs, picks the
    // (count DESC, pair ASC) winner — a 1-row broadcast, never a
    // driver value — and rewrites via plain string replace, applied
    // TWICE because leftmost non-overlapping replacement shares the
    // boundary '|' between abutting occurrences ('|a|b|a|b|' blocks
    // its second match; the second pass reaches closure — no regex,
    // so no lookahead portability trap, and both engines' replace()
    // scan identically). Merged symbols join with '~', outside the
    // [a-z] symbol alphabet, so a pattern can never match inside an
    // earlier merge. Each round caches its rewritten corpus: the next
    // round's count and the final merge table read it once instead of
    // re-running the whole chain (at cluster scale: checkpoint per
    // round, exactly like the components loop).
    "q170_bpe_train" -> { (s, dir) =>
      bpeChain(s, dir)._3.reduceLeft(_ unionAll _).orderBy("round")
    },

    // BPE tokenizer APPLICATION: encode every doc with the 6 learned
    // merges (identical chain plans → Spark's cache manager serves
    // q170's per-round corpora) and report the per-doc compression —
    // symbols before vs after, ratio in exact milli. This is the
    // metric that justifies a vocabulary: how many fewer symbols per
    // document the learned merges buy.
    "q171_bpe_apply" -> { (s, dir) =>
      val (init, fin, _) = bpeChain(s, dir)
      def syms(df: DataFrame, out: String): DataFrame =
        df.select(col("doc_id"),
          expr("CAST(size(filter(split(s, '\\\\|'), t -> t != '')) AS BIGINT)").as(out))
      syms(init, "n_before").join(syms(fin, "n_after"), "doc_id")
        .filter(col("n_before") > 0)
        .withColumn("ratio_milli", expr("n_after * 1000 div n_before"))
        .orderBy("doc_id")
    },

    // Jaccard band histogram at a LOW threshold (τ = 0.3): how many
    // pairs live in each similarity decile — the threshold-landscape
    // readout that tells you whether 0.5 sits in a valley (robust
    // cutoff) or on a cliff (tune carefully). Bands are the exact
    // integer (10·inter) div union; the naive oracle re-derives them.
    "q267_jaccard_bands" -> { (s, dir) =>
      graft.operators.SetSimJoin
        .jaccardSelfJoin(shingleRows(s, dir), "doc_id", "sh", 3, 10)
        .withColumn("band", expr("(10 * n_inter) div n_union"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_pairs"),
          min(expr("CAST(n_inter AS DOUBLE) / n_union")).as("min_j"),
          max(expr("CAST(n_inter AS DOUBLE) / n_union")).as("max_j"))
        .orderBy("band")
    },

    // LSH recall BY SIMILARITY BAND: q259's single number, broken
    // down by exact Jaccard decile — recall should rise toward J = 1
    // (banding theory: detection probability 1−(1−s²)⁸ for 8 bands of
    // 2), and this table is the empirical check. Both frames are
    // memoized (the exact join and the LSH candidates), so the
    // breakdown costs one semi-join + one aggregate.
    "q273_recall_by_band" -> { (s, dir) =>
      val truth = Tables.memo(s, s"$dir#setsimtruth") {
        graft.operators.SetSimJoin
          .jaccardSelfJoin(shingleRows(s, dir), "doc_id", "sh", 1, 2)
      }.select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        expr("(10 * n_inter) div n_union").as("band"))
      val flagged = truth.join(
        candPairs(s, dir).withColumn("hit", lit(1L)),
        Seq("doc_a", "doc_b"), "left")
      flagged.groupBy("band")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_found"))
        .withColumn("recall_milli", expr("n_found * 1000 div n_true"))
        .orderBy("band")
    },

    // LSH recall against exact ground truth: the measurement that
    // licenses running MinHash-LSH (q29/q30) instead of the exact
    // prefix join (q214) at scale — how many true J ≥ 0.5 pairs the
    // banded candidates actually surface. Truth = the exact join;
    // found = truth ∩ LSH candidates (left-semi); recall in exact
    // milli. The complement of q97's per-pair estimate calibration:
    // this one scores the CANDIDATE GENERATOR, not the estimator.
    "q259_lsh_recall" -> { (s, dir) =>
      // memoized: the exact join's candidate+verify+expansion stages
      // feed BOTH aggregates (n_true and the semi-joined n_found) —
      // and q256 reads the same frame
      val truth = Tables.memo(s, s"$dir#setsimtruth") {
        graft.operators.SetSimJoin
          .jaccardSelfJoin(shingleRows(s, dir), "doc_id", "sh", 1, 2)
      }.select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      val found = truth.join(candPairs(s, dir), Seq("doc_a", "doc_b"),
        "left_semi")
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found"))))
        .withColumn("recall_milli",
          expr("CASE WHEN n_true = 0 THEN NULL " +
            "ELSE n_found * 1000 div n_true END"))
    },

    // Cross-source duplication matrix: which source pairs share
    // near-duplicate documents — the corpus-governance readout that
    // tells you feed B mirrors feed A. Composes the exact
    // prefix-filtered similarity join (q214, J ≥ 0.5 on 3-shingles)
    // with the doc→source map; the (source_a, source_b) cell counts
    // pairs with sources ordered lexicographically so a pair lands in
    // exactly one cell. Oracle recomputes from the naive all-pairs
    // join — the matrix inherits q214's no-misses guarantee.
    "q256_cross_source_dups" -> { (s, dir) =>
      val pairs = Tables.memo(s, s"$dir#setsimtruth") {
        graft.operators.SetSimJoin
          .jaccardSelfJoin(shingleRows(s, dir), "doc_id", "sh", 1, 2)
      }
      val src = Tables.documents(s, dir).select("doc_id", "source")
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), "id_b")
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("CASE WHEN n_inter = n_union THEN 1 ELSE 0 END"))
            .as("n_identical"))
        .orderBy("source_a", "source_b")
    },

    // Duplicate-family size distribution: how many exact-duplicate
    // clusters exist at each size — the shape report a dedup run
    // starts from (one giant family means template spam; many pairs
    // mean mirror feeds). Two stacked aggregates over the md5 of the
    // raw text; family share of the corpus in exact milli.
    "q255_dup_family_sizes" -> { (s, dir) =>
      val fam = Tables.documents(s, dir)
        .groupBy(expr("md5(text)").as("h"))
        .agg(count(lit(1)).as("fam_sz"))
      val tot = fam.agg(sum("fam_sz").as("n_docs"))
      fam.groupBy("fam_sz")
        .agg(count(lit(1)).as("n_families"))
        .crossJoin(broadcast(tot))
        .withColumn("docs_in_bucket", expr("fam_sz * n_families"))
        .withColumn("share_milli", expr("fam_sz * n_families * 1000 div n_docs"))
        .select("fam_sz", "n_families", "docs_in_bucket", "share_milli")
        .orderBy("fam_sz")
    },

    // Source × language mix matrix with exact independence
    // deviations (obs·N − row·col, the q234 integer-χ² shape pointed
    // at corpus governance): which feeds skew which languages. One
    // count aggregate + broadcast marginals.
    "q283_source_lang_mix" -> { (s, dir) =>
      val cells = Tables.documents(s, dir)
        .groupBy("source", "lang").agg(count(lit(1)).as("obs"))
      val rowT = cells.groupBy("source").agg(sum("obs").as("row_n"))
      val colT = cells.groupBy("lang").agg(sum("obs").as("col_n"))
      val tot = cells.agg(sum("obs").as("n"))
      cells.join(broadcast(rowT), "source").join(broadcast(colT), "lang")
        .crossJoin(broadcast(tot))
        .withColumn("dev", expr("obs * n - row_n * col_n"))
        .select("source", "lang", "obs", "row_n", "col_n", "n", "dev")
        .orderBy("source", "lang")
    },

    // Distinctive vocabulary per source: the tokens whose in-source
    // rate most exceeds their rest-of-corpus rate — the log-odds-lite
    // contrast in exact micro (both rates truncating divisions of
    // non-negative counts). df ≥ 5 in-source keeps noise out; top-10
    // per source via the bounded WindowGroupLimit heap.
    "q285_distinctive_terms" -> { (s, dir) =>
      val tok = docsWithToks(s, dir)
        .select(col("source"), explode(col("toks")).as("t"))
      val bySource = tok.groupBy("source", "t").agg(count(lit(1)).as("n_st"))
      val srcTot = tok.groupBy("source").agg(count(lit(1)).as("n_s"))
      val tokTot = tok.groupBy("t").agg(count(lit(1)).as("n_t"))
      val tot = tok.agg(count(lit(1)).as("n"))
      val scored = bySource
        .join(broadcast(srcTot), "source")
        .join(tokTot, "t")
        .crossJoin(broadcast(tot))
        .filter(col("n_st") >= 5 && col("n") > col("n_s"))
        .withColumn("rate_in_micro", expr("n_st * 1000000 div n_s"))
        .withColumn("rate_out_micro",
          expr("(n_t - n_st) * 1000000 div (n - n_s)"))
        .withColumn("contrast_micro",
          col("rate_in_micro") - col("rate_out_micro"))
      scored.withColumn("rk", row_number().over(
          Window.partitionBy("source")
            .orderBy(col("contrast_micro").desc, col("t"))))
        .filter(col("rk") <= 10)
        .select("source", "rk", "t", "n_st", "rate_in_micro",
          "rate_out_micro", "contrast_micro")
        .orderBy("source", "rk")
    },

    // Hapax-legomena rate per source: the share of each source's
    // vocabulary that occurs exactly once IN THAT SOURCE — the
    // vocabulary-richness/contamination signal (template-generated
    // corpora have almost no hapaxes; natural text ~40-60%). One
    // (source, token) count aggregate, one vocabulary rollup, shares
    // in exact milli.
    "q247_hapax_rate" -> { (s, dir) =>
      docsWithToks(s, dir)
        .select(col("source"), explode(col("toks")).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(count(lit(1)).as("vocab"),
          sum(expr("CASE WHEN n = 1 THEN 1 ELSE 0 END")).as("n_hapax"),
          sum("n").as("n_tokens"))
        .withColumn("hapax_milli", expr("n_hapax * 1000 div vocab"))
        .orderBy("source")
    },

    // Cohen's kappa for the language-ID classifier vs the labeled
    // lang — chance-corrected agreement over q88's confusion matrix,
    // kept EXACT as the integer rational (n·Σdiag − Σ row·col) /
    // (n² − Σ row·col); the double kappa is one IEEE division of the
    // two exact BIGINTs. The marginals are a 25-cell frame — driver-
    // free conditional aggregation, no float probability enters.
    "q237_langid_kappa" -> { (s, dir) =>
      val cells = langScored(s, dir)
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      val rowT = cells.groupBy("lang").agg(sum("n").as("row_n"))
      val colT = cells.groupBy("pred_lang").agg(sum("n").as("col_n"))
      val marg = rowT.join(colT, col("lang") === col("pred_lang"))
        .agg(sum(expr("row_n * col_n")).as("sum_rc"))
      cells.agg(sum("n").as("n_tot"),
          sum(when(col("lang") === col("pred_lang"), col("n"))
            .otherwise(0L)).as("n_agree"))
        .crossJoin(broadcast(marg))
        .withColumn("kappa_num", expr("n_tot * n_agree - sum_rc"))
        .withColumn("kappa_den", expr("n_tot * n_tot - sum_rc"))
        // single-class degenerate matrix → den = 0; both engines must
        // yield NULL (Spark-4 ANSI errors on DOUBLE/0, DuckDB doesn't)
        .withColumn("kappa",
          expr("CASE WHEN kappa_den = 0 THEN NULL " +
            "ELSE CAST(kappa_num AS DOUBLE) / CAST(kappa_den AS DOUBLE) END"))
        .select("n_tot", "n_agree", "sum_rc", "kappa_num", "kappa_den", "kappa")
    },

    // EXACT set-similarity self-join (Jaccard ≥ 0.5 over 3-shingle
    // sets) via prefix filtering — the guaranteed-no-misses complement
    // to the MinHash-LSH candidates of q29/q30 (which trade recall for
    // cost). See [[graft.operators.SetSimJoin]] for the completeness
    // argument and the 100 TB shape; the naive all-pairs oracle proves
    // the pruning loses nothing. jaccard is one IEEE division of the
    // two exact counts — identical on both engines.
    "q214_setsim_prefix" -> { (s, dir) =>
      // the memoized exact-pairs frame is shared with q256/q259
      Tables.memo(s, s"$dir#setsimtruth") {
        graft.operators.SetSimJoin
          .jaccardSelfJoin(shingleRows(s, dir), "doc_id", "sh", 1, 2)
      }
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          col("n_inter"), col("n_union"),
          expr("CAST(n_inter AS DOUBLE) / n_union").as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }
  )

  /** The 6-round BPE training chain: (initial corpus, final rewritten
    * corpus, per-round merge-table frames). Each round counts
    * adjacent symbol pairs, broadcasts the (count DESC, pair ASC)
    * winner, and rewrites by the double string-replace (see q170's
    * inventory comment for why twice and why no regex). Per-round
    * corpora persist through [[graft.core.Tables.memo]] — q170's
    * merge table and q171's encode both read them, and round k+1's
    * count would otherwise re-run rounds 1..k. Tracked (not bare
    * .cache()) so the 6 corpus copies are LRU-evictable once the BPE
    * family is done — in round 3 they pinned storage for the rest of
    * the 180-query bench session and regressed everything after them.
    */
  private def bpeChain(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, Seq[DataFrame]) = {
    val P = "concat('|', pr, '|')"
    val R = "concat('|', replace(pr, '|', '~'), '|')"
    val once = s"replace(s, $P, $R)"
    val twice = s"replace($once, $P, $R)"
    val init = docsWithToks(s, dir)
      .select(col("doc_id"),
        expr(s"concat('|', concat_ws('|', ${S.filterL("toks", "t", "t rlike '^[a-z]+$'")}), '|')").as("s"))
    var cur = init
    val merges = (1 to 6).map { r =>
      val tk = cur.select(col("doc_id"),
        expr("filter(split(s, '\\\\|'), t -> t != '')").as("tk"))
      val pairs = tk.filter(expr("size(tk) >= 2"))
        .select(explode(expr(
          "transform(sequence(1, size(tk) - 1), i -> concat(element_at(tk, i), '|', element_at(tk, i + 1)))")).as("pr"))
      val best = pairs.groupBy("pr").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pr").asc).limit(1)
      val prev = cur
      cur = graft.core.Tables.memo(s, s"$dir#bpe$r") {
        prev.crossJoin(broadcast(best))
          .select(col("doc_id"), expr(twice).as("s"))
      }
      best.select(lit(r).cast("int").as("round"), col("pr").as("pair"), col("n"))
    }
    (init, cur, merges)
  }

  // ------------------------------------------------------------------

  val oracles: Map[String, String] = Map(
    "q533_lsh_band_sweep" -> {
      def geom(r: Int): String = {
        val b = 16 / r
        s"""SELECT CAST($r AS BIGINT) AS r_rows, CAST($b AS BIGINT) AS n_bands,
           |  (SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) FROM (
           |     SELECT COUNT(*) AS c FROM (
           |       SELECT unnest(${D.transform(D.rangeIncl("0", (b - 1).toString),
                    "i", s"concat(i, '|', ${D.strJoin(
                      D.slice("mh", s"CAST(i AS BIGINT) * $r + 1", r.toString), ",")})")})
           |         AS bk FROM m) z GROUP BY bk) zz) AS probe_pairs,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
           |  (SELECT CAST(SUM(CASE WHEN ${D.size(D.filterL(
                  D.rangeIncl("0", (b - 1).toString), "i",
                  s"ma[CAST(i AS BIGINT) * $r + 1 : CAST(i AS BIGINT) * $r + $r] = " +
                    s"mb[CAST(i AS BIGINT) * $r + 1 : CAST(i AS BIGINT) * $r + $r]"))}
           |     > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM truth) AS n_recalled""".stripMargin
      }
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base
         |  WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |jac AS (
         |  SELECT doc_a, doc_b,
         |    CAST(${D.size(D.arrIntersect("sa.sh", "sb.sh"))} AS BIGINT)
         |      AS n_inter,
         |    CAST(${D.size("sa.sh")} + ${D.size("sb.sh")} AS BIGINT) AS sz
         |  FROM cand
         |  JOIN f sa ON cand.doc_a = sa.doc_id
         |  JOIN f sb ON cand.doc_b = sb.doc_id),
         |truth AS (
         |  SELECT doc_a, doc_b, ma.mh AS ma, mb.mh AS mb
         |  FROM jac
         |  JOIN m ma ON jac.doc_a = ma.doc_id
         |  JOIN m mb ON jac.doc_b = mb.doc_id
         |  WHERE n_inter * 1000 // (sz - n_inter) >= 700),
         |g AS (${geom(2)} UNION ALL ${geom(4)} UNION ALL ${geom(8)})
         |SELECT r_rows, n_bands, probe_pairs, n_true, n_recalled,
         |  CASE WHEN n_true = 0 THEN NULL ELSE
         |    CAST(n_recalled * 1000 // n_true AS BIGINT) END
         |    AS recall_permille
         |FROM g ORDER BY r_rows""".stripMargin
    },

    "q24_text_tokens" ->
      s"""$duckBase
         |SELECT doc_id,
         | CAST(${D.size("toks")} AS BIGINT) AS n_ws_tokens,
         | CAST(${D.size(D.regexExtractAll("text", BpePat))} AS BIGINT) AS n_bpe_tokens,
         | CAST(${tokenLenSum(D)} AS BIGINT) AS sum_token_len
         |FROM base ORDER BY doc_id""".stripMargin,

    "q204_filter_funnel" ->
      s"""$duckBase,
         |m AS (
         |  SELECT doc_id,
         |    CAST(${D.size("toks")} AS BIGINT) AS n_tokens,
         |    CAST(${tokenLenSum(D)} AS BIGINT) AS sum_len,
         |    CAST(${D.size(D.filterL("toks", "t", s"t IN $StopList"))} AS BIGINT) AS stop_cnt,
         |    CAST(${D.size(D.arrDistinct("toks"))} AS BIGINT) AS n_distinct
         |  FROM base),
         |st AS (
         |  SELECT CASE WHEN n_tokens < 25 THEN 1
         |              WHEN 9 * n_tokens < 2 * sum_len THEN 2
         |              WHEN 20 * stop_cnt < n_tokens THEN 3
         |              WHEN 2 * n_distinct < n_tokens THEN 4
         |              ELSE 0 END AS stage, n_tokens FROM m),
         |per AS (SELECT stage, COUNT(*) AS n_docs,
         |               CAST(SUM(n_tokens) AS BIGINT) AS tok_sum
         |        FROM st GROUP BY stage),
         |t AS (SELECT COUNT(*) AS nn FROM st)
         |SELECT stage,
         |  CASE stage WHEN 0 THEN 'keep' WHEN 1 THEN 'too_short'
         |       WHEN 2 THEN 'long_tokens' WHEN 3 THEN 'low_stopword'
         |       ELSE 'repetitive' END AS rule,
         |  n_docs, tok_sum,
         |  CAST(CASE WHEN stage = 0 THEN n_docs
         |       ELSE nn - SUM(CASE WHEN stage > 0 THEN n_docs ELSE 0 END)
         |              OVER (ORDER BY stage ROWS UNBOUNDED PRECEDING)
         |  END AS BIGINT) AS survivors_after
         |FROM per, t ORDER BY stage""".stripMargin,

    "q25_text_quality" ->
      s"""$duckBase,
         |m AS (
         |  SELECT doc_id, text,
         |    CAST(${D.size("toks")} AS BIGINT) AS n_tokens,
         |    CAST(${tokenLenSum(D)} AS BIGINT) AS sum_len,
         |    CAST(${D.size(D.filterL("toks", "t", s"t IN $StopList"))} AS BIGINT) AS stop_cnt,
         |    CAST(length(text) - length(${D.regexReplaceAll("text", "[.,!?;:]", "")}) AS BIGINT) AS punct_cnt
         |  FROM base),
         |r AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum_len AS DOUBLE) / n_tokens AS avg_token_len,
         |    CAST(stop_cnt AS DOUBLE) / n_tokens AS stop_ratio,
         |    CAST(punct_cnt AS DOUBLE) / length(text) AS punct_ratio
         |  FROM m)
         |SELECT doc_id, n_tokens, avg_token_len, stop_ratio, punct_ratio,
         | $QualityFormula AS quality_score
         |FROM r ORDER BY doc_id""".stripMargin,

    "q26_text_langid" ->
      s"""$duckBase,
         |$duckLangCtes
         |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh, pred_lang,
         | pred_lang = lang AS is_match
         |FROM p ORDER BY doc_id""".stripMargin,

    "q192_nfc_normalize" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    substring(text, 1, 40) || 'e' || chr(769) || 'A' || chr(778) AS raw
        |  FROM documents),
        |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM r)
        |SELECT doc_id,
        |  CAST(length(raw) AS INT) AS n_raw,
        |  CAST(length(norm) AS INT) AS n_norm,
        |  raw != norm AS changed,
        |  right(norm, 2) AS tail_norm
        |FROM n ORDER BY doc_id""".stripMargin,

    "q27_text_fingerprint" ->
      s"""$duckBase
         |SELECT doc_id,
         | ${fingerprintExpr(D, None)} AS fp,
         | ${fingerprintExpr(D, Some(8))} AS fp_prefix
         |FROM base ORDER BY doc_id""".stripMargin,

    "q28_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS rep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY rep_id""".stripMargin,

    "q29_minhash_lsh_pairs" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m)
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q30_dedup_jaccard" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |j AS (
         |  SELECT doc_a, doc_b,
         |    CAST(${D.size(D.arrIntersect("sa.sh", "sb.sh"))} AS BIGINT) AS n_inter,
         |    CAST(${D.size("sa.sh")} + ${D.size("sb.sh")} AS BIGINT) AS sz
         |  FROM cand
         |  JOIN f sa ON cand.doc_a = sa.doc_id
         |  JOIN f sb ON cand.doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, n_inter, sz - n_inter AS n_union,
         | CAST(n_inter AS DOUBLE) / (sz - n_inter) AS jaccard
         |FROM j ORDER BY doc_a, doc_b""".stripMargin,

    "q146_containment" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |j AS (
         |  SELECT doc_a, doc_b,
         |    CAST(${D.size(D.arrIntersect("sa.sh", "sb.sh"))} AS BIGINT) AS n_inter,
         |    CAST(${D.size("sa.sh")} AS BIGINT) AS n_a,
         |    CAST(${D.size("sb.sh")} AS BIGINT) AS n_b
         |  FROM cand
         |  JOIN f sa ON cand.doc_a = sa.doc_id
         |  JOIN f sb ON cand.doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, n_inter, n_a, n_b,
         | CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE) AS containment,
         | CASE WHEN n_a <= n_b THEN doc_a ELSE doc_b END AS contained_doc
         |FROM j
         |WHERE CAST(n_inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q147_score_calibration" ->
      s"""$duckBase,
         |sc AS (
         |  SELECT source, doc_id, CAST(${D.size("toks")} AS BIGINT) AS nt
         |  FROM (SELECT doc_id, ${D.tokens("text")} AS toks, source FROM documents)),
         |r AS (
         |  SELECT source, nt,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY nt, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY source) AS n
         |  FROM sc)
         |SELECT source, (rn - 1) * 10 // n AS decile,
         |  count(*) AS n_docs, min(nt) AS min_nt, max(nt) AS max_nt
         |FROM r GROUP BY source, decile
         |ORDER BY source, decile""".stripMargin,

    "q31_dedup_simhash" ->
      s"""$duckBase,
         |tok AS (SELECT doc_id, unnest(toks) AS t FROM base),
         |h AS (SELECT doc_id, ${D.hash64("t")} AS h FROM tok),
         |hv AS (SELECT doc_id, h, i FROM h, (SELECT unnest(range(0, 32)) AS i) r),
         |v AS (SELECT doc_id, i,
         |        SUM(CASE WHEN (${D.shiftRight("h", "i")} & 1) = 1 THEN 1 ELSE -1 END) AS v
         |      FROM hv GROUP BY doc_id, i)
         |SELECT doc_id,
         | CAST(SUM(CASE WHEN v > 0 THEN ${D.shiftLeft(D.longLit(1), "i")} ELSE ${D.longLit(0)} END) AS BIGINT) AS simhash
         |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q48_ngram_topk" ->
      s"""$duckBase,
         |bi AS (
         |  SELECT lang, unnest(${D.shingles("toks", 2)}) AS bigram
         |  FROM base WHERE ${D.size("toks")} >= 2),
         |c AS (SELECT lang, bigram, COUNT(*) AS n FROM bi GROUP BY lang, bigram),
         |r AS (
         |  SELECT lang, bigram, n,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram ASC) AS rk
         |  FROM c)
         |SELECT lang, rk, bigram, n FROM r WHERE rk <= 20
         |ORDER BY lang, rk""".stripMargin,

    "q52_hash_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${D.hash64("concat('sample:', doc_id)")} % 100 <
         |  CASE lang WHEN 'en' THEN 20 WHEN 'zh' THEN 50 ELSE 10 END
         |ORDER BY doc_id""".stripMargin,

    "q53_text_normalize" ->
      s"""SELECT doc_id,
         | trim(${D.regexReplaceAll(D.regexReplaceAll("lower(text)", "[.,!?;:]", ""), " +", " ")}) AS clean_text,
         | CAST(length(${D.regexReplaceAll("text", "[.,!?;:]", "")}) AS BIGINT) AS clean_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q35_simhash_pairs" ->
      s"""$duckBase,
         |tok AS (SELECT doc_id, lang, unnest(toks) AS t FROM base),
         |h AS (SELECT doc_id, lang, ${D.hash64("t")} AS h FROM tok),
         |hv AS (SELECT doc_id, lang, h, i FROM h, (SELECT unnest(range(0, 32)) AS i) r),
         |v AS (SELECT doc_id, lang, i,
         |        SUM(CASE WHEN (${D.shiftRight("h", "i")} & 1) = 1 THEN 1 ELSE -1 END) AS v
         |      FROM hv GROUP BY doc_id, lang, i),
         |sim AS (
         |  SELECT doc_id, lang,
         |    CAST(SUM(CASE WHEN v > 0 THEN ${D.shiftLeft(D.longLit(1), "i")} ELSE ${D.longLit(0)} END) AS BIGINT) AS simhash
         |  FROM v GROUP BY doc_id, lang)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | CAST(${D.bitCount(D.bxor("a.simhash", "b.simhash"))} AS INT) AS hamming
         |FROM sim a JOIN sim b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE ${D.bitCount(D.bxor("a.simhash", "b.simhash"))} <= 10
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Transitive closure over the (tiny) candidate graph; min over
    // reachable nodes = the component label the propagation converges
    // to. Engine-independent by construction — components are a
    // graph property, not an execution order.
    "q56_dup_components" ->
      s"""${duckBase.replace("WITH ", "WITH RECURSIVE ")},
         |$duckComponentCtes
         |SELECT doc_id, comp, count(*) OVER (PARTITION BY comp) AS csize
         |FROM lab ORDER BY doc_id""".stripMargin,

    "q129_components_contraction" ->
      s"""${duckBase.replace("WITH ", "WITH RECURSIVE ")},
         |$duckComponentCtes
         |SELECT doc_id, comp, count(*) OVER (PARTITION BY comp) AS csize
         |FROM lab ORDER BY doc_id""".stripMargin,

    "q68_edit_distance" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |pre AS (
         |  SELECT doc_id,
         |    substring(${D.regexReplaceAll("text", "[^ -~]", "")}, 1, 40) AS pre
         |  FROM documents)
         |SELECT doc_a, doc_b,
         | CAST(levenshtein(pa.pre, pb.pre) AS INT) AS edit_dist,
         | CAST(levenshtein(pa.pre, pb.pre) AS INT) <= 5 AS is_near
         |FROM cand
         |JOIN pre pa ON doc_a = pa.doc_id
         |JOIN pre pb ON doc_b = pb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q65_dedup_keep" ->
      s"""${duckBase.replace("WITH ", "WITH RECURSIVE ")},
         |$duckComponentCtes,
         |sz AS (
         |  SELECT doc_id, comp, count(*) OVER (PARTITION BY comp) AS csize FROM lab),
         |${duckQualityCtes()}
         |SELECT comp, doc_id AS keep_id, csize AS n_members,
         | quality_score AS keep_quality
         |FROM (
         |  SELECT sz.doc_id, sz.comp, sz.csize, qs.quality_score,
         |    row_number() OVER (
         |      PARTITION BY sz.comp
         |      ORDER BY qs.quality_score DESC, sz.doc_id) AS rk
         |  FROM sz JOIN qs ON sz.doc_id = qs.doc_id)
         |WHERE rk = 1 ORDER BY comp""".stripMargin,

    "q82_repetition" ->
      s"""$duckBase,
         |nz AS (SELECT * FROM base WHERE ${D.size("toks")} > 0),
         |sz AS (
         |  SELECT doc_id,
         |    CAST(${D.size("toks")} AS BIGINT) AS n_toks,
         |    CAST(${D.size(D.arrDistinct("toks"))} AS BIGINT) AS n_distinct
         |  FROM nz),
         |ex AS (SELECT doc_id, unnest(toks) AS t FROM nz),
         |c AS (SELECT doc_id, t, count(*) AS top_n FROM ex GROUP BY doc_id, t),
         |r AS (
         |  SELECT doc_id, t, top_n,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY top_n DESC, t ASC) AS rk
         |  FROM c)
         |SELECT sz.doc_id, n_toks, n_distinct,
         | CAST(n_toks - n_distinct AS DOUBLE) / CAST(n_toks AS DOUBLE) AS rep_ratio,
         | r.t AS top_tok, r.top_n
         |FROM sz JOIN r ON sz.doc_id = r.doc_id AND r.rk = 1
         |ORDER BY sz.doc_id""".stripMargin,

    "q85_quality_band" ->
      s"""$duckBase,
         |${duckQualityCtes("lang")},
         |b AS (
         |  SELECT quantile_cont(quality_score, 0.1) AS p10,
         |         quantile_cont(quality_score, 0.9) AS p90
         |  FROM qs)
         |SELECT lang, count(*) AS n_kept,
         | min(quality_score) AS lo_score, max(quality_score) AS hi_score,
         | max(p10) AS p10, max(p90) AS p90
         |FROM qs, b
         |WHERE quality_score >= p10 AND quality_score <= p90
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q87_token_rank" ->
      s"""$duckBase,
         |ex AS (SELECT doc_id, unnest(toks) AS t FROM base WHERE ${D.size("toks")} > 0),
         |f AS (SELECT t, count(*) AS n FROM ex GROUP BY t),
         |rk AS (SELECT t, RANK() OVER (ORDER BY n DESC, t ASC) AS rnk FROM f),
         |d AS (
         |  SELECT doc_id, count(*) AS n_toks, CAST(sum(rnk) AS BIGINT) AS sum_rank
         |  FROM ex JOIN rk USING (t) GROUP BY doc_id)
         |SELECT doc_id, n_toks, sum_rank,
         | CAST(sum_rank AS DOUBLE) / CAST(n_toks AS DOUBLE) AS avg_rank
         |FROM d ORDER BY doc_id""".stripMargin,

    "q475_yule_k" ->
      s"""WITH base AS (
         |  SELECT source, ${D.tokens("text")} AS toks FROM documents),
         |ex AS (SELECT source, unnest(toks) AS t FROM base
         |  WHERE ${D.size("toks")} > 0),
         |f AS (SELECT source, t, COUNT(*) AS nt FROM ex GROUP BY 1, 2),
         |g AS (
         |  SELECT source, CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(*) AS BIGINT) AS n_types,
         |    SUM(${D.wide("nt")} * nt) AS s2
         |  FROM f GROUP BY 1)
         |SELECT source, n_tokens, n_types,
         |  CAST(s2 AS BIGINT) AS sum_sq,
         |  CASE WHEN n_tokens < 2 THEN NULL ELSE
         |    CAST(${D.intDiv(
                s"(s2 - ${D.wide("n_tokens")}) * 10000000000",
                s"(${D.wide("n_tokens")} * n_tokens)")} AS BIGINT) END
         |    AS yule_k_micro
         |FROM g ORDER BY source""".stripMargin,

    "q479_distinct_ngrams" ->
      s"""WITH base AS (
         |  SELECT source, ${D.tokens("text")} AS toks FROM documents),
         |g2 AS (SELECT source, unnest(${D.shingles("toks", 2)}) AS g FROM base),
         |g3 AS (SELECT source, unnest(${D.shingles("toks", 3)}) AS g FROM base),
         |a2 AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_2grams,
         |    CAST(COUNT(DISTINCT g) AS BIGINT) AS uniq_2grams
         |  FROM g2 GROUP BY 1),
         |a3 AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_3grams,
         |    CAST(COUNT(DISTINCT g) AS BIGINT) AS uniq_3grams
         |  FROM g3 GROUP BY 1)
         |SELECT source, n_2grams, uniq_2grams,
         |  CASE WHEN n_2grams = 0 THEN NULL
         |    ELSE uniq_2grams * 1000000 // n_2grams END AS distinct2_micro,
         |  n_3grams, uniq_3grams,
         |  CASE WHEN n_3grams = 0 THEN NULL
         |    ELSE uniq_3grams * 1000000 // n_3grams END AS distinct3_micro
         |FROM a2 LEFT JOIN a3 USING (source) ORDER BY source""".stripMargin,

    "q122_boilerplate_segments" ->
      s"""$duckBase,
         |seg AS (
         |  SELECT doc_id, i AS idx,
         |    array_to_string(toks[(8*(i-1)+1):(8*(i-1)+8)], ' ') AS seg
         |  FROM base, LATERAL unnest(range(1::BIGINT, (${D.size("toks")} // 8)::BIGINT + 1)) AS u(i)
         |  WHERE ${D.size("toks")} >= 8),
         |sh AS (SELECT doc_id, idx, seg, ${D.hash64("seg")} AS h FROM seg),
         |boiler AS (SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |fl AS (SELECT doc_id, idx, seg, h IN (SELECT h FROM boiler) AS b FROM sh)
         |SELECT doc_id, count(*) AS n_seg,
         |  CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
         |  coalesce(string_agg(CASE WHEN NOT b THEN seg END, ' ' ORDER BY idx), '') AS cleaned_text
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q123_oov_rate" ->
      s"""$duckBase,
         |ex AS (SELECT doc_id, unnest(toks) AS t FROM base WHERE ${D.size("toks")} > 0),
         |v AS (SELECT t FROM ex GROUP BY t HAVING count(*) >= 5),
         |fl AS (SELECT doc_id, t IN (SELECT t FROM v) AS iv FROM ex)
         |SELECT doc_id, count(*) AS n_toks,
         |  CAST(sum(CASE WHEN iv THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
         |  CAST(CAST(sum(CASE WHEN iv THEN 0 ELSE 1 END) AS BIGINT) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS oov_rate
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q205_lsh_index_persist" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |bb AS (SELECT doc_id, bk FROM e WHERE doc_id % 3 != 0),
         |ii AS (SELECT doc_id, bk FROM e WHERE doc_id % 3 = 0),
         |pr AS (SELECT ii.doc_id, COUNT(DISTINCT bb.doc_id) AS n_cand
         |       FROM ii JOIN bb ON ii.bk = bb.bk GROUP BY ii.doc_id),
         |tot AS (SELECT COUNT(*) AS index_rows FROM e)
         |SELECT i.doc_id, COALESCE(pr.n_cand, 0) AS n_cand, tot.index_rows
         |FROM (SELECT DISTINCT doc_id FROM ii) i
         |LEFT JOIN pr ON i.doc_id = pr.doc_id, tot
         |ORDER BY i.doc_id""".stripMargin,

    "q132_incremental_dedup" ->
      s"""$duckBase,
         |th AS (SELECT doc_id, ${D.hash64("text")} AS th FROM base),
         |ex AS (SELECT DISTINCT th FROM th WHERE doc_id % 3 != 0),
         |inc AS (SELECT doc_id, th FROM th WHERE doc_id % 3 = 0),
         |de AS (SELECT doc_id FROM inc WHERE th IN (SELECT th FROM ex)),
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM e x JOIN e y ON x.bk = y.bk
         |  WHERE x.doc_id % 3 = 0 AND y.doc_id % 3 != 0),
         |nd AS (
         |  SELECT DISTINCT a AS doc_id FROM (
         |    SELECT a,
         |      CAST(${D.size(D.arrIntersect("sa.sh", "sb.sh"))} AS BIGINT) AS n_inter,
         |      CAST(${D.size("sa.sh")} + ${D.size("sb.sh")} AS BIGINT)
         |        - CAST(${D.size(D.arrIntersect("sa.sh", "sb.sh"))} AS BIGINT) AS n_union
         |    FROM cand
         |    JOIN f sa ON cand.a = sa.doc_id
         |    JOIN f sb ON cand.b = sb.doc_id) _v
         |  WHERE n_inter * 5 >= n_union * 2)
         |SELECT i.doc_id,
         |  CASE WHEN i.doc_id IN (SELECT doc_id FROM de) THEN 'dup_exact'
         |       WHEN i.doc_id IN (SELECT doc_id FROM nd) THEN 'dup_near'
         |       ELSE 'kept' END AS status
         |FROM inc i ORDER BY i.doc_id""".stripMargin,

    "q127_bpe_merge_step" ->
      s"""$duckBase,
         |wc AS (
         |  SELECT t, count(*) AS wc
         |  FROM (SELECT unnest(toks) AS t FROM base) _t GROUP BY t),
         |pr AS (
         |  SELECT substr(t, i, 2) AS pair, wc
         |  FROM wc, LATERAL unnest(${D.rangeIncl("1", "length(t) - 1")}) AS u(i)
         |  WHERE length(t) >= 2)
         |SELECT pair, CAST(sum(wc) AS BIGINT) AS total
         |FROM pr GROUP BY pair
         |ORDER BY total DESC, pair ASC LIMIT 20""".stripMargin,

    "q88_langid_confusion" ->
      s"""$duckBase,
         |$duckLangCtes,
         |c AS (SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY lang, pred_lang)
         |SELECT lang, pred_lang, n,
         | CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS lang_total,
         | CAST(n AS DOUBLE) / CAST(CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS DOUBLE) AS frac
         |FROM c ORDER BY lang, pred_lang""".stripMargin,

    "q455_mcc" ->
      s"""$duckBase,
         |$duckLangCtes,
         |b2 AS (
         |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
         |    CASE WHEN pred_lang = 'en' THEN 1 ELSE 0 END AS pd
         |  FROM p),
         |cm AS (
         |  SELECT CAST(SUM(a * pd) AS BIGINT) AS tp,
         |    CAST(SUM((1 - a) * pd) AS BIGINT) AS fp,
         |    CAST(SUM(a * (1 - pd)) AS BIGINT) AS fn,
         |    CAST(SUM((1 - a) * (1 - pd)) AS BIGINT) AS tn
         |  FROM b2),
         |lanes AS (
         |  SELECT *, CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
         |      AS num_w,
         |    CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) * (tn + fn)
         |      AS den_w
         |  FROM cm)
         |SELECT tp, fp, fn, tn,
         |  CASE WHEN den_w = 0 THEN NULL WHEN num_w >= 0 THEN
         |    CAST(floor(${D.wideToDouble("num_w")} *
         |      CAST(1000000 AS DOUBLE) /
         |      sqrt(${D.wideToDouble("den_w")})) AS BIGINT) ELSE
         |    -CAST(floor(${D.wideToDouble("(-num_w)")} *
         |      CAST(1000000 AS DOUBLE) /
         |      sqrt(${D.wideToDouble("den_w")})) AS BIGINT) END AS mcc_micro
         |FROM lanes""".stripMargin,

    "q456_rouge_l" -> {
      val initRow =
        """list_reduce(
          |      list_prepend([]::BIGINT[],
          |        list_transform(range(1, 13), j -> [j]::BIGINT[])),
          |      (row, jx) -> list_append(row, CAST(greatest(
          |        CASE WHEN jx[1] > 1 THEN row[jx[1] - 1] ELSE 0 END,
          |        CASE WHEN ta[1] = tb[jx[1]] THEN 1 ELSE 0 END)
          |        AS BIGINT)))""".stripMargin
      val dp =
        s"""list_reduce(
           |    list_prepend(
           |      $initRow,
           |      list_transform(range(2, 13), i -> [i]::BIGINT[])),
           |    (acc, x) -> list_reduce(
           |      list_prepend([]::BIGINT[],
           |        list_transform(range(1, 13), j -> [j]::BIGINT[])),
           |      (row, jx) -> list_append(row, CAST(greatest(
           |        acc[jx[1]],
           |        CASE WHEN jx[1] > 1 THEN row[jx[1] - 1] ELSE 0 END,
           |        CASE WHEN ta[x[1]] = tb[jx[1]] THEN
           |          (CASE WHEN jx[1] > 1 THEN acc[jx[1] - 1] ELSE 0 END) + 1
           |        ELSE 0 END) AS BIGINT))))[12]""".stripMargin
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |pre AS (SELECT doc_id, toks[1:12] AS tp FROM base
         |  WHERE ${D.size("toks")} >= 12),
         |px AS (
         |  SELECT cand.doc_a, cand.doc_b, a.tp AS ta, b.tp AS tb
         |  FROM cand
         |  JOIN pre a ON cand.doc_a = a.doc_id
         |  JOIN pre b ON cand.doc_b = b.doc_id),
         |r AS (SELECT doc_a, doc_b, $dp AS lcs FROM px)
         |SELECT doc_a, doc_b, lcs, lcs * 2000 // 24 AS rouge_l_milli
         |FROM r ORDER BY doc_a, doc_b""".stripMargin
    },

    "q495_self_bleu" -> {
      def bigrams(arr: String) =
        s"list_transform(range(1, 12), i -> $arr[i] || ' ' || $arr[i + 1])"
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |pre AS (SELECT doc_id, toks[1:12] AS tp FROM base
         |  WHERE ${D.size("toks")} >= 12),
         |px AS (
         |  SELECT cand.doc_a, cand.doc_b, a.tp AS ta, b.tp AS tb
         |  FROM cand
         |  JOIN pre a ON cand.doc_a = a.doc_id
         |  JOIN pre b ON cand.doc_b = b.doc_id),
         |bg AS (
         |  SELECT doc_a, doc_b, ta, tb,
         |    ${bigrams("ta")} AS ba, ${bigrams("tb")} AS bb
         |  FROM px),
         |cl AS (
         |  SELECT doc_a, doc_b,
         |    ${clipCount(D, "ta", "tb")} AS uni_clip,
         |    ${clipCount(D, "ba", "bb")} AS bi_clip
         |  FROM bg)
         |SELECT doc_a, doc_b, uni_clip, bi_clip,
         |  $bleu2Text AS bleu2_micro
         |FROM cl ORDER BY doc_a, doc_b""".stripMargin
    },

    "q502_percolation" -> {
      val perT = Seq(500, 700, 900).map { t =>
        s"""e$t AS (SELECT doc_a AS a, doc_b AS b FROM jm WHERE jmv >= $t),
           |sym$t AS (SELECT a, b FROM e$t
           |  UNION SELECT b AS a, a AS b FROM e$t),
           |reach$t AS (
           |  SELECT a AS node, b AS other FROM sym$t
           |  UNION
           |  SELECT r.node, s.b AS other
           |  FROM reach$t r JOIN sym$t s ON r.other = s.a),
           |lab$t AS (
           |  SELECT node, least(node, min(other)) AS comp
           |  FROM reach$t GROUP BY node),
           |st$t AS (
           |  SELECT CAST($t AS BIGINT) AS threshold_milli,
           |    (SELECT n_nodes FROM univ) AS n_nodes,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM e$t) AS n_edges,
           |    (SELECT CAST(COUNT(DISTINCT comp) AS BIGINT) FROM lab$t)
           |      AS n_comp_edged,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM lab$t)
           |      AS n_nodes_edged,
           |    (SELECT CAST(COALESCE(MAX(cs), 0) AS BIGINT) FROM
           |      (SELECT COUNT(*) AS cs FROM lab$t GROUP BY comp) q)
           |      AS max_cs)""".stripMargin
      }.mkString(",\n")
      s"""${duckBase.replace("WITH ", "WITH RECURSIVE ")},
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base
         |  WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |j AS (
         |  SELECT doc_a, doc_b,
         |    CAST(${D.size(D.arrIntersect("sa.sh", "sb.sh"))} AS BIGINT)
         |      AS n_inter,
         |    CAST(${D.size("sa.sh")} + ${D.size("sb.sh")} AS BIGINT) AS sz
         |  FROM cand
         |  JOIN f sa ON cand.doc_a = sa.doc_id
         |  JOIN f sb ON cand.doc_b = sb.doc_id),
         |jm AS (SELECT doc_a, doc_b,
         |  ${D.intDiv("n_inter * 1000", "(sz - n_inter)")} AS jmv FROM j),
         |univ AS (
         |  SELECT CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_nodes FROM
         |    (SELECT doc_a AS doc FROM jm
         |     UNION SELECT doc_b AS doc FROM jm) u),
         |$perT
         |SELECT threshold_milli, n_nodes, n_edges,
         |  n_comp_edged + (n_nodes - n_nodes_edged) AS n_components,
         |  greatest(max_cs, CASE WHEN n_nodes > n_nodes_edged THEN 1
         |    ELSE 0 END) AS largest_comp,
         |  CASE WHEN n_nodes = 0 THEN NULL ELSE
         |    ${D.intDiv(
               "(n_nodes - (n_comp_edged + (n_nodes - n_nodes_edged))) * 1000",
               "n_nodes")} END AS dedup_gain_permille
         |FROM (SELECT * FROM st500 UNION ALL SELECT * FROM st700
         |      UNION ALL SELECT * FROM st900) s
         |ORDER BY threshold_milli""".stripMargin
    },

    "q509_bbit_minhash" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base
         |  WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |j AS (
         |  SELECT doc_a, doc_b,
         |    CAST(${D.size(D.arrIntersect("sa.sh", "sb.sh"))} AS BIGINT)
         |      AS n_inter,
         |    CAST(${D.size("sa.sh")} + ${D.size("sb.sh")} AS BIGINT) AS sz
         |  FROM cand
         |  JOIN f sa ON cand.doc_a = sa.doc_id
         |  JOIN f sb ON cand.doc_b = sb.doc_id),
         |bits AS (
         |  SELECT doc_id,
         |    CAST(SUM((u.h % 2) *
         |      ${D.shiftLeft(D.longLit(1), "(u.j - 1)")}) AS BIGINT) AS sig
         |  FROM (SELECT doc_id, unnest(mh) AS h,
         |        generate_subscripts(mh, 1) AS j FROM m) u
         |  GROUP BY doc_id),
         |sc AS (
         |  SELECT j.doc_a, j.doc_b,
         |    CAST(16 - ${D.bitCount(D.bxor("a.sig", "b.sig"))} AS BIGINT)
         |      AS agree,
         |    j.n_inter, j.sz - j.n_inter AS n_union
         |  FROM j
         |  JOIN bits a ON j.doc_a = a.doc_id
         |  JOIN bits b ON j.doc_b = b.doc_id)
         |SELECT doc_a, doc_b, agree,
         |  greatest(CAST(0 AS BIGINT),
         |    ${D.intDiv("(2 * agree - 16) * 1000", "16")}) AS jac_est_milli,
         |  ${D.intDiv("n_inter * 1000", "n_union")} AS jac_true_milli,
         |  abs(greatest(CAST(0 AS BIGINT),
         |    ${D.intDiv("(2 * agree - 16) * 1000", "16")}) -
         |    ${D.intDiv("n_inter * 1000", "n_union")}) AS abs_err_milli
         |FROM sc ORDER BY doc_a, doc_b""".stripMargin,

    "q504_split_leakage" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base
         |  WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |spl AS (
         |  SELECT doc_id, ${graft.functions.PortableSql.SplitCase} AS split
         |  FROM (SELECT doc_id, ${D.splitBucket} AS hk FROM documents) h),
         |cls AS (
         |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY list_sort(sh))
         |    AS rep
         |  FROM f),
         |cp AS (
         |  SELECT a.split AS sa, b.split AS sb, ca.rep AS ra, cb.rep AS rb
         |  FROM cand
         |  JOIN spl a ON cand.doc_a = a.doc_id
         |  JOIN spl b ON cand.doc_b = b.doc_id
         |  JOIN cls ca ON cand.doc_a = ca.doc_id
         |  JOIN cls cb ON cand.doc_b = cb.doc_id)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
         |  CAST(SUM(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_cross_split,
         |  CAST(SUM(CASE WHEN (sa = 'train' AND sb = 'test') OR
         |    (sa = 'test' AND sb = 'train') THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_train_test,
         |  CAST(SUM(CASE WHEN ra = rb AND sa <> sb THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_exact_cross,
         |  CASE WHEN COUNT(*) = 0 THEN NULL ELSE
         |    ${D.intDiv(
              "CAST(SUM(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT) * 1000",
              "CAST(COUNT(*) AS BIGINT)")} END AS leak_permille
         |FROM cp""".stripMargin,

    "q505_record_linkage" -> {
      val wCols = (1 to 4).map(i =>
        s"CAST(length(printf('%b', CAST(${D.intDiv(
          s"${D.wide(s"m$i")} * ut",
          s"greatest(${D.wide("1")}, ${D.wide(s"u$i")} * mt)")} " +
          s"AS BIGINT))) - 1 AS BIGINT) AS w$i")
        .mkString(", ")
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base
         |  WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |cls AS (
         |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY list_sort(sh))
         |    AS rep
         |  FROM f),
         |at AS (
         |  SELECT doc_id, lang, source, n_chars,
         |    substring(text, 1, 16) AS p16
         |  FROM documents),
         |pr AS (
         |  SELECT cand.doc_a, cand.doc_b,
         |    CASE WHEN ca.rep = cb.rep THEN 1 ELSE 0 END AS matched,
         |    CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END AS f1,
         |    CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS f2,
         |    CASE WHEN abs(a.n_chars - b.n_chars) <= 20 THEN 1 ELSE 0 END
         |      AS f3,
         |    CASE WHEN a.p16 = b.p16 THEN 1 ELSE 0 END AS f4
         |  FROM cand
         |  JOIN at a ON cand.doc_a = a.doc_id
         |  JOIN at b ON cand.doc_b = b.doc_id
         |  JOIN cls ca ON cand.doc_a = ca.doc_id
         |  JOIN cls cb ON cand.doc_b = cb.doc_id),
         |lanes AS (
         |  SELECT CAST(SUM(matched) AS BIGINT) AS mt,
         |    CAST(SUM(1 - matched) AS BIGINT) AS ut,
         |${(1 to 4).map(i =>
             s"    CAST(SUM(CASE WHEN matched = 1 THEN f$i ELSE 0 END) " +
             s"AS BIGINT) AS m$i,\n" +
             s"    CAST(SUM(CASE WHEN matched = 0 THEN f$i ELSE 0 END) " +
             s"AS BIGINT) AS u$i").mkString(",\n")}
         |  FROM pr),
         |wt AS (SELECT $wCols FROM lanes)
         |SELECT doc_a, doc_b,
         |  CAST(f1 * w1 + f2 * w2 + f3 * w3 + f4 * w4 AS BIGINT)
         |    AS score_bits,
         |  CAST(f1 + f2 + f3 + f4 AS BIGINT) AS n_agree
         |FROM pr, wt WHERE matched = 0
         |ORDER BY score_bits DESC, doc_a, doc_b LIMIT 20""".stripMargin
    },

    "q500_dedup_inflation" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base
         |  WHERE ${D.size("toks")} >= 3),
         |cls AS (
         |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY list_sort(sh))
         |    AS rep
         |  FROM f),
         |sized AS (
         |  SELECT b.doc_id, d.source,
         |    CAST(${D.size("toks")} AS BIGINT) AS nt, cls.rep
         |  FROM base b
         |  JOIN documents d ON b.doc_id = d.doc_id
         |  LEFT JOIN cls ON b.doc_id = cls.doc_id),
         |k AS (
         |  SELECT source, nt,
         |    CASE WHEN rep IS NULL OR rep = doc_id THEN 1 ELSE 0 END AS kept
         |  FROM sized)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(kept) AS BIGINT) AS n_kept,
         |  CAST(SUM(nt) AS BIGINT) AS tok_total,
         |  CAST(SUM(CASE WHEN kept = 1 THEN nt ELSE 0 END) AS BIGINT)
         |    AS tok_kept,
         |  CASE WHEN SUM(nt) = 0 THEN NULL ELSE
         |    CAST(${D.intDiv("(SUM(nt) - SUM(CASE WHEN kept = 1 THEN nt ELSE 0 END)) * 1000",
                "SUM(nt)")} AS BIGINT) END AS inflation_permille,
         |  CASE WHEN SUM(kept) = 0 THEN NULL ELSE
         |    CAST(${D.intDiv("COUNT(*) * 1000", "SUM(kept)")} AS BIGINT) END
         |    AS dup_ratio_milli
         |FROM k GROUP BY 1 ORDER BY source""".stripMargin,

    "q91_cdc_chunks" ->
      s"""$duckBase,
         |tok AS (
         |  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS t
         |  FROM base WHERE ${D.size("toks")} > 0),
         |hh AS (SELECT doc_id, pos, ${D.hash64("t")} AS h FROM tok),
         |c AS (
         |  SELECT doc_id, pos, h,
         |    CAST(coalesce(SUM(CASE WHEN h % 31 = 0 THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk
         |  FROM hh),
         |ch AS (
         |  SELECT doc_id, chunk, count(*) AS chunk_len,
         |    ${D.fold("list(h ORDER BY pos)", D.longLit(0), "a", "x", "(a * 31 + x) % 1000000007")} AS fp
         |  FROM c GROUP BY doc_id, chunk)
         |SELECT fp, chunk_len, count(*) AS n_copies,
         | count(DISTINCT doc_id) AS n_docs, min(doc_id) AS rep_doc
         |FROM ch GROUP BY fp, chunk_len
         |HAVING count(*) >= 2
         |ORDER BY fp, chunk_len""".stripMargin,

    "q92_length_outliers" ->
      s"""$duckBase,
         |tk AS (SELECT doc_id, lang, CAST(${D.size("toks")} AS BIGINT) AS n_tokens FROM base),
         |md AS (
         |  SELECT lang, quantile_cont(CAST(n_tokens AS DOUBLE), 0.5) AS med
         |  FROM tk GROUP BY lang),
         |dv AS (
         |  SELECT tk.doc_id, tk.lang, abs(CAST(n_tokens AS DOUBLE) - med) AS dev
         |  FROM tk JOIN md ON tk.lang = md.lang),
         |mad AS (SELECT lang, quantile_cont(dev, 0.5) AS mad FROM dv GROUP BY lang)
         |SELECT dv.lang, count(*) AS n_docs, max(md.med) AS med, max(mad.mad) AS mad,
         | CAST(sum(CASE WHEN dev > CAST(3 AS DOUBLE) * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM dv
         |JOIN md ON dv.lang = md.lang
         |JOIN mad ON dv.lang = mad.lang
         |GROUP BY dv.lang ORDER BY dv.lang""".stripMargin,

    "q93_gini_diversity" ->
      s"""$duckBase,
         |ex AS (SELECT doc_id, unnest(toks) AS t FROM base WHERE ${D.size("toks")} > 0),
         |c AS (SELECT doc_id, t, count(*) AS c FROM ex GROUP BY doc_id, t),
         |g AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
         |    CAST(sum(c * c) AS BIGINT) AS sum_c2
         |  FROM c GROUP BY doc_id)
         |SELECT doc_id, n_toks, sum_c2,
         | CAST(n_toks * n_toks - sum_c2 AS DOUBLE) / CAST(n_toks * n_toks AS DOUBLE) AS gini
         |FROM g ORDER BY doc_id""".stripMargin,

    "q94_collocations" ->
      s"""$duckBase,
         |tk AS (SELECT toks FROM base WHERE ${D.size("toks")} >= 2),
         |u AS (
         |  SELECT t, count(*) AS cu
         |  FROM (SELECT unnest(toks) AS t FROM tk) GROUP BY t),
         |nt AS (SELECT count(*) AS nn FROM (SELECT unnest(toks) AS t FROM tk)),
         |b AS (
         |  SELECT bigram, count(*) AS cab
         |  FROM (SELECT unnest(${D.shingles("toks", 2)}) AS bigram FROM tk)
         |  GROUP BY bigram HAVING count(*) >= 5),
         |bj AS (
         |  SELECT bigram, cab,
         |    split_part(bigram, ' ', 1) AS ta, split_part(bigram, ' ', 2) AS tb
         |  FROM b)
         |SELECT bigram, cab, ua.cu AS ca, ub.cu AS cb,
         | (CAST(nn AS DOUBLE) * CAST(cab AS DOUBLE)) / (CAST(ua.cu AS DOUBLE) * CAST(ub.cu AS DOUBLE)) AS lift
         |FROM bj
         |JOIN u ua ON bj.ta = ua.t
         |JOIN u ub ON bj.tb = ub.t
         |CROSS JOIN nt
         |ORDER BY lift DESC, bigram ASC LIMIT 50""".stripMargin,

    "q95_ks_drift" ->
      s"""WITH base AS (SELECT doc_id, source, text, ${D.tokens("text")} AS toks FROM documents),
         |${duckQualityCtes("source")},
         |srcs AS (SELECT DISTINCT source AS s FROM qs),
         |tot AS (SELECT count(*) AS nn FROM qs),
         |ps AS (SELECT source AS s, count(*) AS ns FROM qs GROUP BY source),
         |ex AS (
         |  SELECT srcs.s, qs.doc_id, qs.quality_score,
         |    CASE WHEN qs.source = srcs.s THEN 1 ELSE 0 END AS in_s
         |  FROM srcs CROSS JOIN qs),
         |cw AS (
         |  SELECT s, quality_score,
         |    SUM(in_s) OVER (PARTITION BY s ORDER BY quality_score, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cin,
         |    COUNT(*) OVER (PARTITION BY s ORDER BY quality_score, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rn
         |  FROM ex),
         |cum AS (
         |  SELECT s, quality_score,
         |    CAST(max(cin) AS BIGINT) AS cin, CAST(max(rn) AS BIGINT) AS rn
         |  FROM cw GROUP BY s, quality_score),
         |dd AS (
         |  SELECT cum.s,
         |    abs(CAST(cin AS DOUBLE) / CAST(ns AS DOUBLE) -
         |      CAST(rn - cin AS DOUBLE) / CAST(nn - ns AS DOUBLE)) AS d, ns
         |  FROM cum JOIN ps ON cum.s = ps.s CROSS JOIN tot)
         |SELECT s AS source, max(ns) AS n_docs, max(d) AS ks
         |FROM dd GROUP BY s ORDER BY source""".stripMargin,

    "q96_bm25" -> {
      val half = "CAST(0.5 AS DOUBLE)"
      val score =
        s"""((CAST(nn - df AS DOUBLE) + $half) / (CAST(df AS DOUBLE) + $half))
           | * (CAST(tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE))) /
           |  (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)
           |    + CAST(0.75 AS DOUBLE) * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(nn AS DOUBLE)))))""".stripMargin
      def pv(t: String) =
        s"coalesce(max(CASE WHEN t = '$t' THEN score END), CAST(0 AS DOUBLE)) AS s_$t"
      s"""$duckBase,
         |bs AS (SELECT doc_id, toks, CAST(${D.size("toks")} AS BIGINT) AS dl FROM base),
         |st AS (SELECT count(*) AS nn, CAST(sum(dl) AS BIGINT) AS sum_dl FROM bs),
         |tf AS (
         |  SELECT doc_id, dl, t, count(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS t FROM bs)
         |  WHERE t IN ('scan','merge','window')
         |  GROUP BY doc_id, dl, t),
         |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
         |sc AS (
         |  SELECT doc_id, t,
         |    $score AS score
         |  FROM tf JOIN dfq USING (t) CROSS JOIN st),
         |pv AS (
         |  SELECT doc_id,
         |    ${pv("scan")},
         |    ${pv("merge")},
         |    ${pv("window")}
         |  FROM sc GROUP BY doc_id),
         |bb AS (SELECT *, s_scan + s_merge + s_window AS bm25 FROM pv),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rk FROM bb)
         |SELECT rk, doc_id, s_scan, s_merge, s_window, bm25
         |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin
    },

    "q97_sketch_calibration" -> {
      val nAgree = s"CAST(${D.size(D.filterL(D.rangeIncl("1", "16"), "i",
        s"${D.idx("ma.mh", "i")} = ${D.idx("mb.mh", "i")}"))} AS BIGINT)"
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |ag AS (
         |  SELECT doc_a, doc_b, $nAgree AS n_agree
         |  FROM cand
         |  JOIN m ma ON cand.doc_a = ma.doc_id
         |  JOIN m mb ON cand.doc_b = mb.doc_id),
         |jj AS (
         |  SELECT doc_a, doc_b, n_agree,
         |    CAST(${D.size(D.arrIntersect("sa.sh", "sb.sh"))} AS BIGINT) AS n_inter,
         |    CAST(${D.size("sa.sh")} + ${D.size("sb.sh")} AS BIGINT) AS sz
         |  FROM ag
         |  JOIN f sa ON ag.doc_a = sa.doc_id
         |  JOIN f sb ON ag.doc_b = sb.doc_id),
         |rr AS (
         |  SELECT doc_a, doc_b, n_agree,
         |    CAST(n_agree AS DOUBLE) / CAST(16 AS DOUBLE) AS est,
         |    CAST(n_inter AS DOUBLE) / CAST(sz - n_inter AS DOUBLE) AS jaccard
         |  FROM jj)
         |SELECT doc_a, doc_b, n_agree, est, jaccard, abs(est - jaccard) AS abs_err
         |FROM rr ORDER BY doc_a, doc_b""".stripMargin
    },

    "q99_dedup_summary" ->
      s"""${duckBase.replace("WITH ", "WITH RECURSIVE ")},
         |tot AS (
         |  SELECT count(*) AS n_docs,
         |    CAST(sum(${D.size("toks")}) AS BIGINT) AS n_tokens
         |  FROM base),
         |ed AS (
         |  SELECT CAST(sum(n - 1) AS BIGINT) AS n_exact_dups
         |  FROM (SELECT count(*) AS n FROM documents GROUP BY md5(text)) _e),
         |$duckComponentCtes,
         |np AS (SELECT count(*) AS n_lsh_pairs FROM cand),
         |cs AS (
         |  SELECT count(*) AS n_clustered, count(DISTINCT comp) AS n_clusters
         |  FROM lab),
         |${duckQualityCtes()},
         |$duckKeepCte,
         |dr AS (
         |  SELECT count(*) AS n_dropped,
         |    CAST(coalesce(sum(${D.size("b2.toks")}), 0) AS BIGINT) AS tokens_dropped
         |  FROM k JOIN base b2 ON k.doc_id = b2.doc_id WHERE rk > 1)
         |SELECT tot.n_docs, tot.n_tokens, ed.n_exact_dups, np.n_lsh_pairs,
         | cs.n_clustered, cs.n_clusters, dr.n_dropped, dr.tokens_dropped
         |FROM tot, ed, np, cs, dr""".stripMargin,

    "q100_corpus_prep" ->
      s"""${duckBase.replace("WITH ", "WITH RECURSIVE ")},
         |${duckQualityCtes("lang")},
         |bb AS (SELECT quantile_cont(quality_score, 0.1) AS p10 FROM qs),
         |qual AS (
         |  SELECT qs.doc_id, qs.lang, qs.quality_score
         |  FROM qs, bb WHERE quality_score >= p10),
         |$duckComponentCtes,
         |$duckKeepCte,
         |losers AS (SELECT doc_id FROM k WHERE rk > 1),
         |sv AS (
         |  SELECT doc_id, lang, ${D.splitBucket} AS hk
         |  FROM qual WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         |sp AS (
         |  SELECT doc_id, lang,
         |    ${PortableSql.SplitCase} AS split
         |  FROM sv),
         |tk2 AS (SELECT doc_id, CAST(${D.size("toks")} AS BIGINT) AS nt FROM base)
         |SELECT split, lang, count(*) AS n_docs,
         | CAST(sum(nt) AS BIGINT) AS n_tokens, min(sp.doc_id) AS first_doc
         |FROM sp JOIN tk2 ON sp.doc_id = tk2.doc_id
         |GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    "q139_posting_lists" ->
      s"""$duckBase,
         |p AS (
         |  SELECT doc_id, unnest(${D.shingles("toks", 2)}) AS tok
         |  FROM base WHERE ${D.size("toks")} >= 2),
         |pd AS (SELECT tok, doc_id, count(*) AS tf FROM p GROUP BY tok, doc_id)
         |SELECT tok, count(*) AS df, CAST(sum(tf) AS BIGINT) AS ttf,
         |  string_agg(doc_id, ',' ORDER BY doc_id) AS postings
         |FROM pd GROUP BY tok
         |HAVING count(*) BETWEEN 2 AND (SELECT count(*) FROM documents) // 20
         |ORDER BY tok""".stripMargin,

    "q163_source_overlap" ->
      s"""WITH tk AS (
         |  SELECT source, ${D.tokens("text")} AS toks FROM documents),
         |spx AS (
         |  SELECT source, unnest(${D.shingles("toks", 16)}) AS span
         |  FROM tk WHERE ${D.size("toks")} >= 16),
         |sp AS (SELECT DISTINCT source, ${D.hash64("span")} AS hk FROM spx)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  count(*) AS shared_spans
         |FROM sp a JOIN sp b ON a.hk = b.hk AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q485_source_jaccard" ->
      s"""WITH tk AS (
         |  SELECT source, ${D.tokens("text")} AS toks FROM documents),
         |spx AS (
         |  SELECT source, unnest(${D.shingles("toks", 16)}) AS span
         |  FROM tk WHERE ${D.size("toks")} >= 16),
         |sp AS (SELECT DISTINCT source, ${D.hash64("span")} AS hk FROM spx),
         |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM sp GROUP BY 1),
         |ix AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM sp a JOIN sp b ON a.hk = b.hk AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT sa.source AS src_a, sb.source AS src_b,
         |  sa.n AS n_a, sb.n AS n_b,
         |  COALESCE(ix.inter, 0) AS inter,
         |  COALESCE(ix.inter, 0) * 1000000 //
         |    (sa.n + sb.n - COALESCE(ix.inter, 0)) AS jaccard_micro
         |FROM sz sa JOIN sz sb ON sa.source < sb.source
         |LEFT JOIN ix ON ix.src_a = sa.source AND ix.src_b = sb.source
         |ORDER BY 1, 2""".stripMargin,

    "q170_bpe_train" -> {
      val out = (1 to 6)
        .map(k => s"SELECT $k AS round, pr AS pair, n FROM b$k")
        .mkString("\nUNION ALL\n")
      s"""$duckBase,
         |$duckBpeStages
         |$out
         |ORDER BY round""".stripMargin
    },

    "q171_bpe_apply" ->
      s"""$duckBase,
         |$duckBpeStages,
         |n0 AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(s, '|'), t -> t != ''))::BIGINT AS n_before
         |  FROM s0),
         |n6 AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(s, '|'), t -> t != ''))::BIGINT AS n_after
         |  FROM s6)
         |SELECT n0.doc_id AS doc_id, n_before, n_after,
         |  n_after * 1000 // n_before AS ratio_milli
         |FROM n0 JOIN n6 ON n0.doc_id = n6.doc_id
         |WHERE n_before > 0
         |ORDER BY doc_id""".stripMargin,

    "q157_sparse_cosine" ->
      s"""$duckBase,
         |p AS (
         |  SELECT doc_id, unnest(${D.shingles("toks", 3)}) AS tok
         |  FROM base WHERE ${D.size("toks")} >= 3),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM p GROUP BY 1, 2),
         |rare AS (
         |  SELECT tok FROM tf GROUP BY tok
         |  HAVING count(*) BETWEEN 2 AND (SELECT count(*) FROM documents) // 20),
         |kept AS (SELECT tf.* FROM tf SEMI JOIN rare USING (tok)),
         |n2 AS (
         |  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
         |  FROM kept GROUP BY doc_id),
         |d AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
         |  FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sc AS (
         |  SELECT doc_a, doc_b, dot, na.n2 AS na2, nb.n2 AS nb2,
         |    dot * dot * 1000 // (na.n2 * nb.n2) AS cos2_milli
         |  FROM d JOIN n2 na ON d.doc_a = na.doc_id
         |         JOIN n2 nb ON d.doc_b = nb.doc_id),
         |r AS (
         |  SELECT *, row_number() OVER (ORDER BY cos2_milli DESC, doc_a, doc_b) AS rn
         |  FROM sc)
         |SELECT doc_a, doc_b, dot, na2, nb2, cos2_milli
         |FROM r WHERE rn <= 200 ORDER BY doc_a, doc_b""".stripMargin,

    "q144_span_dedup" ->
      s"""$duckBase,
         |sp AS (
         |  SELECT doc_id, unnest(${D.shingles("toks", 16)}) AS span
         |  FROM base WHERE ${D.size("toks")} >= 16),
         |h AS (SELECT doc_id, ${D.hash64("span")} AS hk FROM sp),
         |shared AS (
         |  SELECT hk FROM h GROUP BY hk HAVING count(DISTINCT doc_id) >= 2),
         |tot AS (SELECT doc_id, count(*) AS n_spans FROM h GROUP BY doc_id),
         |dup AS (
         |  SELECT doc_id, count(*) AS n_dup FROM h
         |  WHERE hk IN (SELECT hk FROM shared) GROUP BY doc_id)
         |SELECT t.doc_id, t.n_spans,
         |  COALESCE(d.n_dup, 0) AS n_dup,
         |  COALESCE(d.n_dup, 0) * 1000 // t.n_spans AS dup_milli
         |FROM tot t LEFT JOIN dup d ON t.doc_id = d.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    "q141_mg_heavy_bound" ->
      s"""$duckBase,
         |p AS (SELECT unnest(toks) AS tok FROM base),
         |c AS (SELECT tok, count(*) AS n FROM p GROUP BY tok),
         |t AS (SELECT ${D.intDiv("CAST(count(*) AS BIGINT)", "200")} AS thresh FROM p)
         |SELECT tok, n, TRUE AS present, TRUE AS est_ok
         |FROM c, t WHERE n > thresh ORDER BY tok""".stripMargin,

    "q273_recall_by_band" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |s AS (SELECT doc_id, unnest(sh) AS sm FROM f),
         |tp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(count(*) AS BIGINT) AS n_inter
         |  FROM s a JOIN s b ON a.sm = b.sm AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, CAST(${D.size("sh")} AS BIGINT) AS sz FROM f),
         |truth AS (
         |  SELECT doc_a, doc_b,
         |    (10 * n_inter) // (za.sz + zb.sz - n_inter) AS band
         |  FROM tp
         |  JOIN sz za ON doc_a = za.doc_id
         |  JOIN sz zb ON doc_b = zb.doc_id
         |  WHERE n_inter * 2 >= za.sz + zb.sz - n_inter),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id)
         |SELECT band, COUNT(*) AS n_true,
         |  CAST(SUM(CASE WHEN EXISTS (
         |    SELECT 1 FROM cand
         |    WHERE cand.doc_a = truth.doc_a AND cand.doc_b = truth.doc_b)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
         |  CAST(SUM(CASE WHEN EXISTS (
         |    SELECT 1 FROM cand
         |    WHERE cand.doc_a = truth.doc_a AND cand.doc_b = truth.doc_b)
         |    THEN 1 ELSE 0 END) AS BIGINT) * 1000 // COUNT(*) AS recall_milli
         |FROM truth GROUP BY band ORDER BY band""".stripMargin,

    "q267_jaccard_bands" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |s AS (SELECT doc_id, unnest(sh) AS sm FROM f),
         |tp AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         CAST(count(*) AS BIGINT) AS n_inter
         |  FROM s a JOIN s b ON a.sm = b.sm AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, CAST(${D.size("sh")} AS BIGINT) AS sz FROM f),
         |q AS (
         |  SELECT n_inter, za.sz + zb.sz - n_inter AS n_union
         |  FROM tp
         |  JOIN sz za ON id_a = za.doc_id
         |  JOIN sz zb ON id_b = zb.doc_id
         |  WHERE n_inter * 10 >= (za.sz + zb.sz - n_inter) * 3)
         |SELECT (10 * n_inter) // n_union AS band,
         |  COUNT(*) AS n_pairs,
         |  MIN(CAST(n_inter AS DOUBLE) / n_union) AS min_j,
         |  MAX(CAST(n_inter AS DOUBLE) / n_union) AS max_j
         |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    "q259_lsh_recall" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |s AS (SELECT doc_id, unnest(sh) AS sm FROM f),
         |tp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(count(*) AS BIGINT) AS n_inter
         |  FROM s a JOIN s b ON a.sm = b.sm AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, CAST(${D.size("sh")} AS BIGINT) AS sz FROM f),
         |truth AS (
         |  SELECT doc_a, doc_b FROM tp
         |  JOIN sz za ON doc_a = za.doc_id
         |  JOIN sz zb ON doc_b = zb.doc_id
         |  WHERE n_inter * 2 >= za.sz + zb.sz - n_inter),
         |m AS (SELECT doc_id, ${minhashes(D)} AS mh FROM f),
         |e AS (SELECT doc_id, unnest(${bandKeys(D)}) AS bk FROM m),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM e x JOIN e y ON x.bk = y.bk AND x.doc_id < y.doc_id),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth),
         |fd AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_found
         |  FROM truth WHERE EXISTS (
         |    SELECT 1 FROM cand
         |    WHERE cand.doc_a = truth.doc_a AND cand.doc_b = truth.doc_b))
         |SELECT n_true, n_found,
         |  CASE WHEN n_true = 0 THEN NULL
         |       ELSE n_found * 1000 // n_true END AS recall_milli
         |FROM t, fd""".stripMargin,

    "q256_cross_source_dups" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |s AS (SELECT doc_id, unnest(sh) AS sm FROM f),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         CAST(count(*) AS BIGINT) AS n_inter
         |  FROM s a JOIN s b ON a.sm = b.sm AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, CAST(${D.size("sh")} AS BIGINT) AS sz FROM f),
         |q AS (
         |  SELECT id_a, id_b, n_inter,
         |         za.sz + zb.sz - n_inter AS n_union
         |  FROM pairs
         |  JOIN sz za ON id_a = za.doc_id
         |  JOIN sz zb ON id_b = zb.doc_id
         |  WHERE n_inter * 2 >= za.sz + zb.sz - n_inter),
         |j AS (
         |  SELECT LEAST(da.source, db.source) AS source_a,
         |         GREATEST(da.source, db.source) AS source_b,
         |         n_inter, n_union
         |  FROM q
         |  JOIN documents da ON q.id_a = da.doc_id
         |  JOIN documents db ON q.id_b = db.doc_id)
         |SELECT source_a, source_b, COUNT(*) AS n_pairs,
         |  CAST(SUM(CASE WHEN n_inter = n_union THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_identical
         |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q283_source_lang_mix" ->
      """WITH c AS (
        |  SELECT source, lang, COUNT(*) AS obs
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS row_n FROM c GROUP BY 1),
        |k AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS col_n FROM c GROUP BY 1),
        |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM c)
        |SELECT source, lang, obs, row_n, col_n, n,
        |       obs * n - row_n * col_n AS dev
        |FROM c JOIN r USING (source) JOIN k USING (lang), t
        |ORDER BY source, lang""".stripMargin,

    "q285_distinctive_terms" -> {
      s"""WITH b AS (SELECT source, ${D.tokens("text")} AS toks FROM documents),
         |p AS (SELECT source, unnest(toks) AS t FROM b),
         |st AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS n_st FROM p GROUP BY 1, 2),
         |ss AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM p GROUP BY 1),
         |tt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_t FROM p GROUP BY 1),
         |n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p),
         |sc AS (
         |  SELECT st.source, st.t, n_st,
         |    n_st * 1000000 // n_s AS rate_in_micro,
         |    (n_t - n_st) * 1000000 // (n - n_s) AS rate_out_micro
         |  FROM st JOIN ss ON st.source = ss.source
         |  JOIN tt ON st.t = tt.t, n0
         |  WHERE n_st >= 5 AND n > n_s),
         |r AS (
         |  SELECT *, rate_in_micro - rate_out_micro AS contrast_micro,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY rate_in_micro - rate_out_micro DESC, t) AS rk
         |  FROM sc)
         |SELECT source, CAST(rk AS INTEGER) AS rk, t, n_st,
         |       rate_in_micro, rate_out_micro, contrast_micro
         |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin
    },

    "q255_dup_family_sizes" ->
      """WITH f AS (
        |  SELECT md5(text) AS h, COUNT(*) AS fam_sz
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(fam_sz) AS BIGINT) AS n_docs FROM f)
        |SELECT fam_sz, COUNT(*) AS n_families,
        |  fam_sz * COUNT(*) AS docs_in_bucket,
        |  fam_sz * COUNT(*) * 1000 // n_docs AS share_milli
        |FROM f, t GROUP BY fam_sz, n_docs ORDER BY fam_sz""".stripMargin,

    "q247_hapax_rate" -> {
      s"""WITH b AS (SELECT source, ${D.tokens("text")} AS toks FROM documents),
         |p AS (SELECT source, unnest(toks) AS t FROM b),
         |c AS (SELECT source, t, COUNT(*) AS n FROM p GROUP BY 1, 2)
         |SELECT source, COUNT(*) AS vocab,
         |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         |  CAST(SUM(n) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000
         |    // COUNT(*) AS hapax_milli
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q237_langid_kappa" ->
      s"""$duckBase,
         |$duckLangCtes,
         |c AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
         |      FROM p GROUP BY 1, 2),
         |r AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS row_n FROM c GROUP BY 1),
         |k AS (SELECT pred_lang, CAST(SUM(n) AS BIGINT) AS col_n FROM c GROUP BY 1),
         |m AS (SELECT CAST(SUM(row_n * col_n) AS BIGINT) AS sum_rc
         |      FROM r JOIN k ON r.lang = k.pred_lang),
         |a AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
         |        CAST(SUM(CASE WHEN lang = pred_lang THEN n ELSE 0 END) AS BIGINT)
         |          AS n_agree
         |      FROM c)
         |SELECT n_tot, n_agree, sum_rc,
         |  n_tot * n_agree - sum_rc AS kappa_num,
         |  n_tot * n_tot - sum_rc AS kappa_den,
         |  CASE WHEN n_tot * n_tot - sum_rc = 0 THEN NULL
         |       ELSE CAST(n_tot * n_agree - sum_rc AS DOUBLE)
         |            / CAST(n_tot * n_tot - sum_rc AS DOUBLE) END AS kappa
         |FROM a, m""".stripMargin,

    // Naive all-pairs form — the prefix filter on the Spark side is
    // pure pruning, so the outputs must be identical.
    "q214_setsim_prefix" ->
      s"""$duckBase,
         |f AS (SELECT doc_id, ${shingleSet(D)} AS sh FROM base WHERE ${D.size("toks")} >= 3),
         |s AS (SELECT doc_id, unnest(sh) AS sm FROM f),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(count(*) AS BIGINT) AS n_inter
         |  FROM s a JOIN s b ON a.sm = b.sm AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, CAST(${D.size("sh")} AS BIGINT) AS sz FROM f)
         |SELECT doc_a, doc_b, n_inter,
         |       za.sz + zb.sz - n_inter AS n_union,
         |       CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter) AS jaccard
         |FROM pairs
         |JOIN sz za ON pairs.doc_a = za.doc_id
         |JOIN sz zb ON pairs.doc_b = zb.doc_id
         |WHERE n_inter * 2 >= za.sz + zb.sz - n_inter
         |ORDER BY doc_a, doc_b""".stripMargin
  )
}
