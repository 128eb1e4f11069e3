package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{PortableSql, SqlDialect}

/** Corpus-hygiene operators that REWRITE or SCORE the training corpus
  * globally — the C4/CCNet-style passes that run after per-doc stats
  * (TextOps) and before packing (PipelineOps):
  *
  *  - q172: global line-level dedup with text REASSEMBLY (C4's
  *    "discard duplicate three-sentence spans" pass, re-expressed over
  *    fixed 8-token lines since the synthetic corpus has no sentence
  *    boundaries). Unlike q91/q144 — which only REPORT duplication —
  *    this emits the cleaned text, which is what the next pipeline
  *    stage actually consumes.
  *  - q173: bigram language-model surprisal scoring — the
  *    perplexity-filter analogue (CCNet/KenLM style) made integer-exact
  *    by measuring surprisal in floor(log2) bits of the inverted
  *    conditional count ratio.
  *  - q175: label-propagation communities (synchronous mode-label LPA)
  *    over the part↔supplier co-occurrence graph — the community
  *    detector run next to connected components (q56) when dedup
  *    clusters should follow DENSITY, not mere reachability.
  *
  * Reference provenance: extends pydala2's dedup/maintenance machinery
  * (pydala/io.py:242-259, pydala/dataset.py:1549-1777) to the
  * corpus-rewrite domain; the reference has no corpus operators at all,
  * so these are Spark-first designs gated by the same DuckDB oracle
  * discipline as the rest of the suite.
  *
  * Scale notes (100 TB design point):
  *  - q172 shuffles the line stream twice (once by line hash for the
  *    global first-occurrence window, once by doc for reassembly);
  *    lines ≈ tokens/8, so each shuffle is ≈ the tokenized corpus — the
  *    same order as the exact-dedup digest pass, with no all-pairs
  *    term anywhere.
  *  - q173's model side (bigram counts) is vocab²-BOUNDED and built
  *    with map-side partial aggregation; the stream is then scored by
  *    one co-partitioned join on (t1, t2). Nothing broadcasts the
  *    model, so a 100 M-bigram vocabulary still fits the plan.
  *  - q175 is per-round: one co-partitioned edge⋈label join, one
  *    (node, label) count aggregation, one bounded argmax window —
  *    O(E) shuffled per round, the standard distributed-LPA shape.
  */
object CorpusOps {

  private val S = PortableSql.Spark
  private val D = PortableSql.Duck

  /** Tokens per "line" — the dedup span. 8 keeps lines long enough to
    * be distinctive and short enough that boilerplate repeats.
    */
  private val LineW = 8

  /** Fixed LineW-token lines of `toks`, joined by single spaces; the
    * tail keeps its short remainder. Both engines slice 1-based and
    * length-clamp.
    */
  private def lineArr(d: SqlDialect): String = {
    val body =
      if (d.spark) s"concat_ws(' ', ${d.slice("toks", s"i * $LineW + 1", LineW.toString)})"
      else s"array_to_string(${d.slice("toks", s"i * $LineW + 1", LineW.toString)}, ' ')"
    d.transform(d.rangeIncl("0", s"${d.intDiv(s"(${d.size("toks")} - 1)", LineW.toString)}"), "i", body)
  }

  /** Part and (offset) supplier node ids — the q113 graph, shared by
    * the LPA oracle and Spark sides.
    */
  private val SuppOffset = 10000000L

  /** Peel threshold for the q177 k-core: part degrees span ~11-52 at
    * the test SFs, so 30 peels a meaningful subset while the
    * high-degree supplier side survives on residual degree.
    */
  private val CoreK = 30

  /** Both-direction part↔supplier edge frame (distinct lineitem
    * pairs) — the graph under q175 and q177.
    */
  private def partSuppEdges(s: SparkSession, dir: String): DataFrame =
    // memoized: the round loops in q175/q177 reference this frame in
    // EVERY round's join, and an unpersisted distinct would re-run
    // per reference (it cost both queries ~4 s at sf0.1)
    Tables.memo(s, s"$dir#psEdges") {
      val f = Tables.lineitem(s, dir)
        .select(col("l_partkey").as("src"),
          (col("l_suppkey") + lit(SuppOffset)).as("dst"))
        .distinct()
      f.unionAll(f.select(col("dst").as("src"), col("src").as("dst")))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q172: global line dedup with reassembly --------------------
    // Keep rule: the globally FIRST occurrence of each distinct line
    // (by (doc_id, pos)) survives; every later copy — across docs or
    // within one — is dropped. Documents are then rebuilt from the
    // surviving lines in position order. row_number over the line-hash
    // partition does first-occurrence in ONE shuffle (no count+join).
    "q172_line_dedup_rewrite" -> { (s, dir) =>
      val lines = TextOps.docsWithToks(s, dir)
        .filter(expr("size(toks) > 0"))
        .select(col("doc_id"), posexplode(expr(lineArr(S))).as(Seq("pos", "line")))
        .withColumn("h", expr(S.hash64("line")))
      val firstOcc = Window.partitionBy("h").orderBy("doc_id", "pos")
      val rebuilt = lines
        .withColumn("rk", row_number().over(firstOcc))
        .filter(col("rk") === 1)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("kept"),
          expr("concat_ws(' ', transform(sort_array(collect_list(struct(pos, line))), x -> x.line))")
            .as("ctext"))
      TextOps.docsWithToks(s, dir)
        .select(col("doc_id"),
          expr(s"(size(toks) + ${LineW - 1}) div $LineW").cast("long").as("n_lines"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_lines"),
          coalesce(col("kept"), lit(0L)).as("n_kept"),
          coalesce(col("ctext"), lit("")).as("clean_text"))
        .orderBy("doc_id")
    },

    // ---- q173: bigram-LM surprisal scoring --------------------------
    // Surprisal of bigram (t1, t2) = floor(log2(c(t1·) / c(t1, t2)))
    // bits, where c(t1·) is the corpus count of bigrams starting with
    // t1 — an integer-exact stand-in for -log2 P(t2 | t1). High
    // mean-surprisal docs are "perplexing" under the corpus's own
    // bigram model: the CCNet quality axis. floor(log2) is computed as
    // the bit-length of the integer quotient (length of the base-2
    // string minus 1) — no float log anywhere.
    "q173_bigram_surprisal" -> { (s, dir) =>
      val bi = TextOps.docsWithToks(s, dir)
        .filter(expr("size(toks) >= 2"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(element_at(toks, i) AS t1, element_at(toks, i + 1) AS t2))")).as("bg"))
        .select(col("doc_id"), col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      val c2 = bi.groupBy("t1", "t2").agg(count(lit(1)).as("c2"))
      // c(t1·) folds over the already-aggregated c2 — vocab-sized input,
      // not the bigram stream
      val c1 = c2.groupBy("t1").agg(sum("c2").as("c1"))
      val model = c2.join(c1, Seq("t1"))
        .withColumn("bits", expr("length(bin(c1 div c2)) - 1").cast("long"))
      val scored = bi.join(model, Seq("t1", "t2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nb"), sum("bits").as("sb"))
      TextOps.docsWithToks(s, dir)
        .select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("nb"), lit(0L)).as("n_bigrams"),
          coalesce(col("sb"), lit(0L)).as("sum_bits"),
          coalesce(expr("sb * 1000 div nb"), lit(0L)).as("milli_bits"))
        .orderBy("doc_id")
    },

    // ---- q175: label-propagation communities ------------------------
    // Synchronous LPA, 2 rounds, over the bidirectional part↔supplier
    // graph (q113's node space). Each round every node takes the MODE
    // of its neighbors' previous-round labels (ties → smallest label);
    // labels start as the node ids. Mode — not min — is what separates
    // communities from q56's connected components: a node between two
    // dense blocks follows the DENSER one.
    "q175_label_propagation" -> { (s, dir) =>
      // both directions: label flows src -> dst along every edge
      val e = partSuppEdges(s, dir)
      var lbl = e.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
      for (_ <- 1 to 2) {
        val cnt = e.join(lbl, col("src") === col("node"))
          .groupBy(col("dst").as("n2"), col("lbl"))
          .agg(count(lit(1)).as("c"))
        lbl = cnt
          .withColumn("rk", row_number().over(
            Window.partitionBy("n2").orderBy(col("c").desc, col("lbl").asc)))
          .filter(col("rk") === 1)
          .select(col("n2").as("node"), col("lbl"))
      }
      lbl.select(col("node"), col("lbl").as("community"))
        .orderBy("node")
    },

    // ---- q179: vocabulary coverage curve -----------------------------
    // What fraction of the token stream does a top-N vocabulary
    // cover, for candidate sizes N — the tokenizer-sizing curve read
    // before fixing a vocab budget (complements q74's prune and
    // q123's OOV rate, which assume a vocab already chosen). One
    // token-count aggregation, one vocab global rank — distributed via
    // GlobalOrder (the q87 pattern: −n bucketing, tie-free order),
    // then a 5-row broadcast threshold join; coverage is exact
    // permille.
    "q179_vocab_coverage" -> { (s, dir) =>
      import s.implicits._
      val ranked = graft.plans.GlobalOrder.withRowNumber(
        TextOps.docsWithToks(s, dir)
          .filter(expr("size(toks) > 0"))
          .select(explode(col("toks")).as("t"))
          .groupBy("t").agg(count(lit(1)).as("n")),
        Seq(col("n").desc, col("t").asc), negate(col("n")), "rk")
      val th = Seq(100L, 300L, 1000L, 3000L, 10000L).toDF("n_vocab")
      ranked.crossJoin(broadcast(th))
        .groupBy("n_vocab")
        .agg(
          sum("n").as("total"),
          sum(when(col("rk") <= col("n_vocab"), col("n"))).as("cov"),
          count(when(col("rk") <= col("n_vocab"), lit(1))).as("n_types"))
        .select(col("n_vocab"), col("n_types"),
          expr("coalesce(cov, 0) * 1000 div total").as("covered_milli"))
        .orderBy("n_vocab")
    },

    // ---- q180: deterministic epoch reshuffle -------------------------
    // The training-data loader's shuffle, made reproducible: each
    // epoch permutes the corpus by seeding a portable 60-bit hash
    // with the epoch number, SHARDS by hash block (16 here; sized to
    // the loader's shard budget in production), and orders within the
    // shard — exactly how distributed training shuffles at scale
    // (shard-then-shuffle-within-shard), and deliberately NOT a
    // global per-epoch sort, which would serialize the corpus through
    // one task per epoch. One narrow hash map + one (epoch, block)
    // window whose partitions are ~N/16 rows.
    "q180_epoch_shuffle" -> { (s, dir) =>
      import s.implicits._
      val epochs = Seq(0L, 1L).toDF("epoch")
      val h = S.hash64("concat(cast(epoch as string), ':', cast(doc_id as string))")
      Tables.documents(s, dir).select(col("doc_id"))
        .crossJoin(broadcast(epochs))
        .withColumn("blk", expr(s"pmod($h, 16)"))
        .withColumn("pos", row_number().over(
          Window.partitionBy("epoch", "blk")
            .orderBy(expr(h), col("doc_id"))) - 1)
        .select(col("epoch"), col("blk").as("block"),
          col("pos").cast("long").as("pos"), col("doc_id"))
        .orderBy("epoch", "block", "pos")
    },

    // ---- q499: temperature-sampled mixture budget --------------------
    // The training-mix planning table (the "sampling prop. / epochs"
    // columns of the published LLM data-mixture tables): per-source
    // token counts, τ=2 temperature weights w_s ∝ √n_s, and the
    // effective epochs each source sustains when one corpus-pass of
    // tokens is drawn under those weights (epochs > 1 ⇒ the source
    // repeats — the overfitting-risk column). Counts are exact
    // integers; Σ√n rides a source-SORTED sequential fold (sources
    // are a bounded vocabulary, so the fold array is tiny at any
    // scale) and the two derived floats surface through ONE
    // fixed-op-order text shared by both engines.
    "q499_mix_budget" -> { (s, dir) =>
      val st = TextOps.docsWithToks(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("CAST(size(toks) AS BIGINT)")).as("n_tokens"))
      val tot = st.agg(
        expr("aggregate(transform(" +
          "sort_array(collect_list(struct(source, n_tokens))), " +
          "x -> sqrt(CAST(x.n_tokens AS DOUBLE))), " +
          "cast(0 as double), (a, v) -> a + v)").as("ssum"),
        sum("n_tokens").as("n_total"))
      st.crossJoin(broadcast(tot))
        .selectExpr("source", "n_docs", "n_tokens",
          s"CASE WHEN ssum <= 0 THEN NULL ELSE $MixWeightT END" +
            " AS weight_micro",
          s"CASE WHEN ssum <= 0 OR n_tokens = 0 THEN NULL " +
            s"ELSE $MixEpochsT END AS epochs_milli")
        .orderBy("source")
    },

    // ---- q177: k-core density filter ---------------------------------
    // Three peel rounds at k=30 over the same graph as q175: parts
    // below 30 distinct suppliers die first, and survivors' residual
    // degrees are reported. Components/LPA/k-core form the graph
    // toolkit's reachability/density/support axes — see
    // operators/KCore.scala for the role split.
    "q177_kcore" -> { (s, dir) =>
      graft.operators.KCore.run(partSuppEdges(s, dir), k = CoreK, rounds = 3)
        .orderBy("node")
    },
  )

  /** One oracle peel round: from edge CTE `prev`, keep nodes of
    * degree >= k, then keep edges whose BOTH endpoints survive.
    */
  private def kcoreRound(prev: String, out: String): String =
    s"""k$out AS (
       |  SELECT src AS n FROM $prev GROUP BY src HAVING COUNT(*) >= $CoreK),
       |$out AS (
       |  SELECT e.src, e.dst FROM $prev e
       |  JOIN k$out a ON e.src = a.n
       |  JOIN k$out b ON e.dst = b.n)""".stripMargin

  private def lpaRound(prev: String, out: String): String =
    s"""c$out AS (
       |  SELECT e.dst AS node, $prev.lbl, COUNT(*) AS c
       |  FROM e JOIN $prev ON e.src = $prev.node GROUP BY 1, 2),
       |$out AS (
       |  SELECT node, lbl FROM (
       |    SELECT node, lbl,
       |      ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rk
       |    FROM c$out) t
       |  WHERE rk = 1)""".stripMargin

  /** τ=2 weight and effective-epochs texts over the lanes (n_tokens,
    * ssum, n_total) — engine-identical syntax, ONE shared string each
    * (q499).
    */
  private val MixWeightT =
    "CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) / ssum * " +
      "CAST(1000000 AS DOUBLE)) AS BIGINT)"
  private val MixEpochsT =
    "CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) / ssum * " +
      "CAST(n_total AS DOUBLE) / CAST(n_tokens AS DOUBLE) * " +
      "CAST(1000 AS DOUBLE)) AS BIGINT)"

  val oracles: Map[String, String] = Map(

    "q499_mix_budget" ->
      s"""WITH tk AS (
         |  SELECT source, ${D.tokens("text")} AS toks FROM documents),
         |st AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(${D.size("toks")}) AS BIGINT) AS n_tokens
         |  FROM tk GROUP BY 1),
         |tot AS (
         |  SELECT ${D.fold(
               D.transform("list(n_tokens ORDER BY source)", "x",
                 "sqrt(CAST(x AS DOUBLE))"),
               D.dblZero, "a", "v", "a + v")} AS ssum,
         |    CAST(SUM(n_tokens) AS BIGINT) AS n_total
         |  FROM st)
         |SELECT source, n_docs, n_tokens,
         |  CASE WHEN ssum <= 0 THEN NULL ELSE $MixWeightT END
         |    AS weight_micro,
         |  CASE WHEN ssum <= 0 OR n_tokens = 0 THEN NULL
         |    ELSE $MixEpochsT END AS epochs_milli
         |FROM st, tot ORDER BY source""".stripMargin,

    "q172_line_dedup_rewrite" ->
      s"""WITH base AS (SELECT doc_id, ${D.tokens("text")} AS toks FROM documents),
         |ln0 AS (
         |  SELECT doc_id, unnest(${lineArr(D)}) AS line,
         |    generate_subscripts(${lineArr(D)}, 1) - 1 AS pos
         |  FROM base WHERE ${D.size("toks")} > 0),
         |k AS (
         |  SELECT doc_id, pos, line,
         |    ROW_NUMBER() OVER (PARTITION BY ${D.hash64("line")}
         |                       ORDER BY doc_id, pos) AS rk
         |  FROM ln0),
         |rb AS (
         |  SELECT doc_id, COUNT(*) AS kept,
         |    string_agg(line, ' ' ORDER BY pos) AS ctext
         |  FROM k WHERE rk = 1 GROUP BY doc_id)
         |SELECT base.doc_id,
         |  CAST(${D.intDiv(s"(${D.size("toks")} + ${LineW - 1})", LineW.toString)} AS BIGINT) AS n_lines,
         |  CAST(COALESCE(kept, 0) AS BIGINT) AS n_kept,
         |  COALESCE(ctext, '') AS clean_text
         |FROM base LEFT JOIN rb ON base.doc_id = rb.doc_id
         |ORDER BY base.doc_id""".stripMargin,

    "q173_bigram_surprisal" ->
      s"""WITH base AS (SELECT doc_id, ${D.tokens("text")} AS toks FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(range(1, ${D.size("toks")})) AS i, toks
         |  FROM base WHERE ${D.size("toks")} >= 2),
         |b2 AS (SELECT doc_id, ${D.idx("toks", "i")} AS t1, ${D.idx("toks", "i + 1")} AS t2 FROM bg),
         |c2 AS (SELECT t1, t2, COUNT(*) AS c2 FROM b2 GROUP BY 1, 2),
         |c1 AS (SELECT t1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         |sc AS (
         |  SELECT doc_id,
         |    length(printf('%b', ${D.intDiv("c1", "c2")})) - 1 AS bits
         |  FROM b2 JOIN c2 USING (t1, t2) JOIN c1 USING (t1)),
         |d AS (SELECT doc_id, COUNT(*) AS nb, SUM(bits) AS sb FROM sc GROUP BY 1)
         |SELECT base.doc_id,
         |  CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams,
         |  CAST(COALESCE(sb, 0) AS BIGINT) AS sum_bits,
         |  CAST(COALESCE(${D.intDiv("sb * 1000", "nb")}, 0) AS BIGINT) AS milli_bits
         |FROM base LEFT JOIN d ON base.doc_id = d.doc_id
         |ORDER BY base.doc_id""".stripMargin,

    "q175_label_propagation" ->
      s"""WITH f AS (
         |  SELECT DISTINCT l_partkey AS src, l_suppkey + $SuppOffset AS dst
         |  FROM lineitem),
         |e AS (SELECT src, dst FROM f UNION ALL SELECT dst, src FROM f),
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
         |${lpaRound("l0", "l1")},
         |${lpaRound("l1", "l2")}
         |SELECT node, lbl AS community FROM l2
         |ORDER BY node""".stripMargin,

    "q179_vocab_coverage" ->
      s"""WITH base AS (SELECT doc_id, ${D.tokens("text")} AS toks FROM documents),
         |ex AS (SELECT unnest(toks) AS t FROM base WHERE ${D.size("toks")} > 0),
         |f AS (SELECT t, COUNT(*) AS n FROM ex GROUP BY t),
         |r AS (
         |  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, t ASC) AS rk FROM f),
         |th(n_vocab) AS (VALUES (100), (300), (1000), (3000), (10000))
         |SELECT CAST(th.n_vocab AS BIGINT) AS n_vocab,
         |  COUNT(CASE WHEN rk <= th.n_vocab THEN 1 END) AS n_types,
         |  CAST(${D.intDiv("COALESCE(SUM(CASE WHEN rk <= th.n_vocab THEN n END), 0) * 1000", "SUM(n)")} AS BIGINT) AS covered_milli
         |FROM r, th GROUP BY th.n_vocab
         |ORDER BY n_vocab""".stripMargin,

    "q180_epoch_shuffle" ->
      s"""WITH ep(epoch) AS (VALUES (0), (1)),
         |h AS (
         |  SELECT epoch, doc_id,
         |    ${D.hash64("concat(CAST(epoch AS VARCHAR), ':', CAST(doc_id AS VARCHAR))")} AS hv
         |  FROM documents, ep)
         |SELECT CAST(epoch AS BIGINT) AS epoch,
         |  CAST(hv % 16 AS BIGINT) AS block,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, hv % 16
         |                          ORDER BY hv, doc_id) - 1 AS BIGINT) AS pos,
         |  doc_id
         |FROM h ORDER BY epoch, block, pos""".stripMargin,

    "q177_kcore" ->
      s"""WITH f AS (
         |  SELECT DISTINCT l_partkey AS src, l_suppkey + $SuppOffset AS dst
         |  FROM lineitem),
         |e0 AS (SELECT src, dst FROM f UNION ALL SELECT dst, src FROM f),
         |${kcoreRound("e0", "e1")},
         |${kcoreRound("e1", "e2")},
         |${kcoreRound("e2", "e3")}
         |SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
         |FROM e3 GROUP BY src ORDER BY node""".stripMargin,
  )
}
