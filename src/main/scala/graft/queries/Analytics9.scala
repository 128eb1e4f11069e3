package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.SqlDialect
import graft.operators.Merge
import graft.sources.{ParquetDataset, WriteConfig, WritePipeline}

/** Round-10 inventory. Same determinism contract as
  * [[Analytics]]–[[Analytics8]]: integer lanes end-to-end wherever the
  * math allows; floats only through ONE fixed-op-order text shared by
  * both engines; every oracle aggregate/div lane CAST to BIGINT (the
  * HUGEINT rule); negative numerators sign-split before integer
  * division; fixed-size panels derived from corpus counts (the
  * round-10 verdict-#4 rule — never fraction-scaled).
  *
  * Reference behavior: pydala2 exposes none of these — they extend
  * the training-data-pipeline stack (SURVEY.md "beyond the
  * reference"): eval-set decontamination, repetition quality
  * filtering, Zipf/Heaps corpus-statistics fits, a quality-rule
  * battery, incremental LSH-index maintenance through the managed
  * merge path, and the windowed decomposition law of the round-10
  * emission-complete streaming reconciliation operator.
  */
object Analytics9 {

  private val Sp = graft.functions.PortableSql.Spark
  private val Du = graft.functions.PortableSql.Duck

  /** Corpus scan spread across the session's parallelism BEFORE any
    * token/shingle projection (round-11 optimization, guide §2.5
    * input skew): the test corpus arrives as ONE parquet file (one
    * scan partition), so every tokenize/explode lane in this family
    * ran single-threaded — the q542 event-log showed a 3.6–4.8 s
    * one-task stage per run with 31 cores idle. `Tables.spread` is
    * size-estimated: at real scale the scan already clears the
    * session parallelism and this is a no-op; the round-robin
    * exchange ships only (doc_id, source, text), never derived
    * token arrays.
    *
    * Used by the SINGLE-ACTION token/shingle queries (q535–q539,
    * q542–q544). The write/merge-bound index gates (q540, q545, q546)
    * deliberately bypass it — round-12's quiet-box variant matrix
    * showed the spread exchange costs more than it buys on their
    * multi-action shapes (numbers at each gate).
    */
  private[queries] def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text")))

  /** Sign-split exact integer division (Spark `div` truncates, DuckDB
    * `//` floors; they agree only on non-negative operands).
    */
  private def signedDiv(d: SqlDialect, num: String, den: String): String =
    s"CASE WHEN ($num) >= 0 THEN CAST(${d.intDiv(s"($num)", den)} AS BIGINT) " +
      s"ELSE -CAST(${d.intDiv(s"(-($num))", den)} AS BIGINT) END"

  /** floor(log2(x)) for x >= 1 as the bit-length minus one — the q173
    * convention, no float log anywhere.
    */
  private def log2floor(d: SqlDialect, e: String): String =
    if (d.spark) s"CAST(length(bin($e)) - 1 AS BIGINT)"
    else s"CAST(length(printf('%b', $e)) - 1 AS BIGINT)"

  /** Per-doc duplicate-3-gram milli fraction — q536's ONE shared
    * text: total 3-shingles minus distinct, scaled by 1000, floor-div
    * by total. Doc-parallel array ops, no explode.
    */
  private def dupMilli(d: SqlDialect): String = {
    val sh = d.shingles("toks", 3)
    val total = d.size(sh)
    val dups = s"($total - ${d.size(d.arrDistinct(sh))})"
    s"CAST(${d.intDiv(s"$dups * 1000", total)} AS BIGINT)"
  }

  /** q540's MinHash-lite signature: per band j, the min 60-bit
    * portable hash of the doc's 3-gram shingles salted with the band
    * id. r=1 rows-per-band, 4 bands — the banded-index SHAPE (what the
    * incremental-maintenance gate needs), not a tuned geometry (q533
    * sweeps geometry).
    */
  private def bandSig(d: SqlDialect, band: Int): String = {
    val g = if (d.spark) "g" else "g"
    d.arrMin(d.transform(d.shingles("toks", 3), g,
      d.hash64(s"concat('mh$band:', $g)")))
  }


  /** q543's greedy first-fit-in-order packing fold — ONE shared text:
    * state [bins_closed, current_fill], elements wrapped as
    * single-element arrays so the fold list unifies with the state
    * type on DuckDB (the hwFold convention). Window = 512 tokens.
    */
  private[graft] def packFold(d: SqlDialect, zs: String): String = {
    def el(a: String, i: Int) =
      if (d.spark) s"element_at($a, $i)" else s"$a[$i]"
    def arr(els: String*) =
      if (d.spark) els.mkString("array(", ", ", ")")
      else els.mkString("[", ", ", "]")
    val wrapped = d.transform(zs, "z", arr("z"))
    val init = arr("CAST(0 AS BIGINT)", "CAST(0 AS BIGINT)")
    d.fold(wrapped, init, "acc", "x",
      s"CASE WHEN ${el("acc", 2)} + ${el("x", 1)} <= 512 " +
        s"THEN ${arr(el("acc", 1), s"${el("acc", 2)} + ${el("x", 1)}")} " +
        s"ELSE ${arr(s"${el("acc", 1)} + 1", el("x", 1))} END")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- q535: eval-set decontamination ----------------------------
    // The published decontamination recipe (n-gram collision between
    // a held-out eval slice and the training corpus), integer-exact:
    // an eval doc is contaminated when ANY of its distinct 3-gram
    // shingles appears in any train doc. The eval panel is FIXED-size
    // (~10 docs via count-derived modulus — the verdict-#4 rule), so
    // the eval-gram side always broadcasts; the train side is a
    // distinct-gram semi-join probe, shuffled on the gram key —
    // bucketed, never all-pairs.
    "q535_eval_contamination" -> { (s, dir) =>
      val docs = corpus(s, dir)
        .select(col("doc_id"), col("source"), expr(Sp.tokens("text")).as("toks"))
      val emod = math.max(1L, docs.count() / 10L)
      // hash-bucketed panel (the q84/q100 split convention), NOT plain
      // doc_id % m — the raw modulus correlates with the synthetic
      // source assignment and collapses the panel onto 2 sources
      val evSel = s"${Sp.hash64("concat('ev:', doc_id)")} % $emod = 0"
      val ev = docs.filter(expr(evSel))
      val evg = ev.select(col("doc_id"), col("source"),
          explode(expr(Sp.shingles("toks", 3))).as("g")).distinct()
      // INVERTED probe (round-11, explain-driven): the eval-gram side
      // is panel-bounded BY CONSTRUCTION, so it broadcasts to the raw
      // train-gram stream — one scan of the corpus, NO distinct and NO
      // shuffle on the corpus-sized side (the former
      // `evg LEFT SEMI distinct(trg)` shuffled the full train-gram
      // frame twice at 100 TB). Duplicate train occurrences multiply
      // the inner join, so hits dedup AFTER the probe — a panel-sized
      // frame, not a corpus-sized one.
      val trgRaw = docs.filter(expr(s"NOT ($evSel)"))
        .select(explode(expr(Sp.shingles("toks", 3))).as("g"))
      val hits = trgRaw.join(broadcast(evg), Seq("g"))
        .select("doc_id", "g").distinct()
      val perDoc = hits.groupBy("doc_id").agg(count(lit(1)).as("hg"))
      ev.select("doc_id", "source")
        .join(perDoc, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_eval"),
          count(col("hg")).as("n_contam"),
          coalesce(sum("hg"), lit(0L)).as("n_hit_grams"),
          expr("count(hg) * 1000 div count(1)").as("contam_milli"))
        .orderBy("source")
    },

    // ---- q536: repetition quality filter ---------------------------
    // The Gopher/MassiveText "repetition" rule as an integer lane:
    // fraction of duplicated 3-gram shingles per doc (milli), flagged
    // at >= 100‰. Pure doc-parallel array math — the 100 TB shape is
    // a narrow map over the corpus, no shuffle until the per-source
    // rollup.
    "q536_repetition_filter" -> { (s, dir) =>
      corpus(s, dir)
        .select(col("doc_id"), col("source"), expr(Sp.tokens("text")).as("toks"))
        .filter(expr(s"${Sp.size("toks")} >= 3"))
        .withColumn("milli", expr(dupMilli(Sp)))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("milli") >= 100, 1L).otherwise(0L)).as("n_flagged"),
          sum("milli").as("sum_milli"),
          max("milli").as("max_milli"))
        .orderBy("source")
    },

    // ---- q537: Zipf slope fit --------------------------------------
    // Zipf's-law exponent per source: least-squares slope of
    // floor(log2 freq) on floor(log2 rank) over the token frequency
    // table — the corpus-health fit (a natural corpus slopes ~-1;
    // templated/duplicated corpora flatten). Integer-exact: bit-length
    // log2 lanes (q173), closed-form slope in milli with sign-split
    // division. The regression inputs are VOCAB-sized (one row per
    // distinct token), never token-stream-sized.
    "q537_zipf_slope" -> { (s, dir) =>
      val tf = corpus(s, dir)
        .select(col("source"), explode(expr(Sp.tokens("text"))).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("f"))
      val ranked = tf.withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(col("f").desc, col("t").asc))
          .cast("long"))
        .select(col("source"), col("f"),
          expr(log2floor(Sp, "rk")).as("x"), expr(log2floor(Sp, "f")).as("y"))
      ranked.groupBy("source")
        .agg(count(lit(1)).as("vocab"),
          sum("f").as("total_toks"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
        .select(col("source"), col("vocab"), col("total_toks"),
          expr("CASE WHEN vocab * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT) " +
            s"ELSE ${signedDiv(Sp, "(vocab * sxy - sx * sy) * 1000",
              "(vocab * sxx - sx * sx)")} END").as("slope_milli"))
        .orderBy("source")
    },

    // ---- q538: Heaps-law vocabulary growth -------------------------
    // Vocabulary size at power-of-two document prefixes per source
    // (docs in doc_id order): the sublinearity check that catches a
    // corpus whose "new" documents stop contributing new vocabulary
    // (saturation = duplication/templating). Exact: each token's
    // FIRST-occurrence doc rank is a min-aggregate; vocab at prefix k
    // counts first-occurrences <= k — no per-prefix rescan, one pass
    // however many prefixes.
    "q538_heaps_law" -> { (s, dir) =>
      val d = corpus(s, dir)
        .select(col("doc_id"), col("source"), expr(Sp.tokens("text")).as("toks"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy("doc_id")).cast("long"))
      val fr = d.select(col("source"), col("rk"), explode(col("toks")).as("t"))
        .groupBy("source", "t").agg(min("rk").as("fr"))
      val ks = d.groupBy("source").agg(max("rk").as("n"))
        .select(col("source"), explode(expr(
          s"transform(sequence(0, ${log2floor(Sp, "n")}), " +
            "i -> shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)))")).as("k"))
      val vocab = ks.join(fr, Seq("source"))
        .filter(col("fr") <= col("k"))
        .groupBy("source", "k").agg(count(lit(1)).as("n_vocab"))
      val toks = ks.join(d.select(col("source"), col("rk"),
          expr(s"CAST(${Sp.size("toks")} AS BIGINT)").as("nt")), Seq("source"))
        .filter(col("rk") <= col("k"))
        .groupBy("source", "k").agg(sum("nt").as("n_toks"))
      vocab.join(toks, Seq("source", "k"))
        .select("source", "k", "n_vocab", "n_toks")
        .orderBy("source", "k")
    },

    // ---- q539: quality-rule battery --------------------------------
    // The MassiveText-class rule battery, integer lanes only: doc
    // length in [10, 1000] tokens; mean word length in [3, 9] (milli);
    // stopword fraction >= 10‰ over a fixed 5-word list; max
    // single-token fraction <= 300‰. Per source: docs passing each
    // rule and all four. Doc-parallel array math (the max-frequency
    // lane is |distinct| x |toks| per doc — doc-bounded, no shuffle).
    "q539_quality_rules" -> { (s, dir) =>
      val stop = "(t = 'the' OR t = 'a' OR t = 'of' OR t = 'to' OR t = 'and')"
      val d = corpus(s, dir)
        .select(col("source"), expr(Sp.tokens("text")).as("toks"))
        .withColumn("n", expr(s"CAST(${Sp.size("toks")} AS BIGINT)"))
        .filter(col("n") > 0)
        .withColumn("sumlen", expr(s"CAST(${Sp.fold(
          Sp.transform("toks", "t", "length(t)"),
          "CAST(0 AS BIGINT)", "acc", "v", "acc + v")} AS BIGINT)"))
        .withColumn("nstop", expr(s"CAST(${Sp.size(
          Sp.filterL("toks", "t", stop))} AS BIGINT)"))
        .withColumn("maxf", expr(s"CAST(array_max(${Sp.transform(
          Sp.arrDistinct("toks"), "t",
          Sp.size(Sp.filterL("toks", "x", "x = t")))}) AS BIGINT)"))
        .withColumn("r_len",
          (col("n") >= 10 && col("n") <= 1000).cast("long"))
        .withColumn("r_wlen", expr(
          "CAST(sumlen * 1000 div n BETWEEN 3000 AND 9000 AS LONG)"))
        .withColumn("r_stop", expr("CAST(nstop * 1000 div n >= 10 AS LONG)"))
        .withColumn("r_rep", expr("CAST(maxf * 1000 div n <= 300 AS LONG)"))
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("r_len").as("p_len"), sum("r_wlen").as("p_wlen"),
          sum("r_stop").as("p_stop"), sum("r_rep").as("p_rep"),
          sum(expr("CAST(r_len + r_wlen + r_stop + r_rep = 4 AS LONG)"))
            .as("p_all"))
        .orderBy("source")
    },

    // ---- q540: incremental LSH-index maintenance -------------------
    // The persisted banded-MinHash index (q205/q259 lifecycle) kept
    // CURRENT through the managed MERGE path instead of rebuilt: base
    // corpus (count-derived ~80%) signs and writes the index dataset;
    // an update batch (the remaining docs PLUS re-signs of unchanged
    // docs — upsert no-ops) merges in keyed on (doc_id, band). The
    // gate: the merged index must equal a full recompute over the
    // whole corpus — per band, row count, distinct buckets, and the
    // largest bucket. At 100 TB re-signing only changed docs is the
    // difference between an hourly index refresh and a full rebuild;
    // the merge's semi-join probe touches only matched index files.
    "q540_lsh_index_incremental" -> { (s, dir) =>
      // Round-12, verdict #1 (the round-11 number pointing the wrong
      // way): quiet-box variant matrix, min-of-3 Bench, 2 reps each —
      //   spread+persist (r11 shape)  5.83 / 5.60 s
      //   persist only                4.49 / 4.04 s
      //   neither (r10 shape)         3.96 / 3.57 s   <- shipped
      // This gate is write/merge-bound: its per-action slices
      // re-tokenize cheaply under predicate pushdown, while the spread
      // exchange + 32-block persist + cache bookkeeping cost more than
      // the 4x band-union re-derivation they save at gate scale. The
      // corpus()-spread stays for the single-action token/shingle
      // queries (q535-q539, q542-q544) where r11's plan evidence holds
      // (q542 4.38->0.92); at 100 TB the scan clears session
      // parallelism and spread is a no-op anyway, so the gate and the
      // deployment agree on this shape. Columns are projected BEFORE
      // tokenize so nothing drags `source`/`text` further than needed.
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), expr(Sp.tokens("text")).as("toks"))
        .filter(expr(s"${Sp.size("toks")} >= 3"))
      def sig(d: DataFrame): DataFrame =
        (0 until 4).map { b =>
          d.select(col("doc_id"), lit(b.toLong).as("band"),
            expr(bandSig(Sp, b)).as("sig"))
        }.reduce(_.unionByName(_))
      val tenth = math.max(1L, docs.count() / 10L)
      val idxDir = Lifecycle.tmpDir("q540idx")
      val base = docs.filter(col("doc_id") % (tenth * 10) >= tenth * 2)
      WritePipeline.write(sig(base), idxDir, WriteConfig())
      val ds = new ParquetDataset(s, idxDir)
      // update wave: the new 20% plus re-signs of an unchanged slice
      val upd = docs.filter(col("doc_id") % (tenth * 10) < tenth * 3)
      Merge(ds, sig(upd), Seq("doc_id", "band"), "upsert")
      // read back with the signature frame's schema (pure metadata —
      // the footer-inference job the bare read paid is gone)
      Lifecycle.readAs(s, idxDir, sig(base).schema)
        .groupBy("band", "sig").agg(count(lit(1)).as("bsz"))
        .groupBy("band")
        .agg(sum("bsz").as("n_docs"),
          count(lit(1)).as("n_buckets"),
          max("bsz").as("max_bucket"))
        .orderBy("band")
    },

    // ---- q542: DSIR-lite domain affinity --------------------------
    // Importance-style domain scoring (the hashed-ngram DSIR recipe,
    // integer-exact): per bigram, weight = bitlen(ct+1) - bitlen(cb+1)
    // (floor-log2 of the target/background count ratio, sign-exact);
    // per doc, affinity = the weight sum over its bigram occurrences.
    // Target = the src0 slice, background = the rest. The model frame
    // is vocab^2-BOUNDED (distinct bigrams), built once and joined to
    // the doc-gram stream — the q173 shape, so 100 TB cost is one
    // shuffle on the gram key.
    "q542_domain_affinity" -> { (s, dir) =>
      // per-(doc, gram) counts FIRST: the synthetic corpus repeats
      // grams heavily, so the model join probes the collapsed frame
      // (distinct doc-grams), not the occurrence stream — same math
      // via the count weights, ~3x fewer join rows
      val bgc = corpus(s, dir)
        .select(col("doc_id"), col("source"),
          explode(expr(Sp.shingles(Sp.tokens("text"), 2))).as("g"))
        .groupBy("doc_id", "source", "g").agg(count(lit(1)).as("c"))
      val model = bgc.groupBy("g").agg(
        sum(when(col("source") === "src0", col("c")).otherwise(0L)).as("ct"),
        sum(when(col("source") =!= "src0", col("c")).otherwise(0L)).as("cb"))
        .select(col("g"),
          (expr(log2floor(Sp, "ct + 1")) - expr(log2floor(Sp, "cb + 1")))
            .as("w"))
      val perDoc = bgc.join(model, Seq("g"))
        .groupBy("doc_id", "source")
        .agg(sum("c").as("ng"), sum(expr("w * c")).as("sw"))
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("sw") > 0, 1L).otherwise(0L)).as("n_pos"),
          sum("sw").as("sum_wbits"),
          sum("ng").as("n_grams"))
        .select(col("source"), col("n_docs"), col("n_pos"), col("sum_wbits"),
          expr(signedDiv(Sp, "sum_wbits * 1000", "n_grams")).as("avg_milli"))
        .orderBy("source")
    },

    // ---- q543: greedy sequence packing ------------------------------
    // First-fit-in-order packing of documents into 512-token training
    // windows — the REAL packer (q98 reports the ideal lower bound):
    // a sequential fold in doc_id order per source, counting closed
    // bins and the running fill. Loud guard on docs wider than the
    // window (they would loop the fold's invariant, and the synthetic
    // corpus must never silently truncate). Output: greedy bins vs
    // ideal bins and the padding waste the greedy order pays.
    //
    // Scale note: first-fit-IN-ORDER is inherently sequential, so the
    // per-source size array is source-sized here (executor-local fold,
    // never a driver collect). At 100 TB packing shards by
    // (source, doc_id div SHARD) — each shard folds independently and
    // the per-shard tails add ≤ one bin each, the standard loader
    // sharding; the gate keeps one fold per source so the oracle can
    // pin the exact greedy semantics.
    "q543_greedy_packing" -> { (s, dir) =>
      val d = corpus(s, dir)
        .select(col("doc_id"), col("source"),
          expr(s"CAST(${Sp.size(Sp.tokens("text"))} AS BIGINT)").as("n"))
        .withColumn("n", expr("CASE WHEN n > 512 THEN " +
          "CAST(raise_error('q543: doc wider than the 512-token window') " +
          "AS BIGINT) ELSE n END"))
        .filter(col("n") > 0)
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n").as("n_tokens"),
          expr(s"sort_array(collect_list(struct(doc_id, n)))").as("ord"))
        .withColumn("zs", expr("transform(ord, s -> s.n)"))
        .withColumn("st", expr(packFold(Sp, "zs")))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("element_at(st, 1) + CASE WHEN element_at(st, 2) > 0 " +
            "THEN 1 ELSE 0 END").as("n_bins"),
          expr("(n_tokens + 511) div 512").as("n_bins_ideal"))
        .withColumn("waste_tokens", expr("n_bins * 512 - n_tokens"))
        .orderBy("source")
    },

    // ---- q541: windowed reconciliation decomposition ----------------
    // The periodic form of q534's emission-complete outer join: event
    // time splits into 3 settled horizon windows; each window
    // reconciles INDEPENDENTLY (left rows with lts in the window,
    // right rows in [window start, window end + after) — exactly the
    // slice a periodic job would read), fed a deliberately HALF-
    // delivered stream lane (even lids only). The union of the three
    // windows must equal the one-shot batch outer join — the
    // decomposition law that makes the operator periodic-safe: no
    // pair or null row is lost or duplicated at window seams.
    "q541_reconcile_windows" -> { (s, dir) =>
      import graft.streaming.StreamIngest
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"))
      val l = ev.filter(col("event_id") % 3 === 0)
        .select(col("event_id").as("lid"), col("ts").as("lts"), col("user_id"))
      val r = ev.filter(col("event_id") % 3 === 1)
        .select(col("event_id").as("rid"), col("ts").as("rts"), col("user_id"))
      val afterUs = 600000000L
      val b = l.agg(min(expr("unix_micros(lts)")).as("lo"),
        max(expr("unix_micros(lts)")).as("hi")).head()
      // loud guard (round-11, advisor): an empty left lane yields NULL
      // min/max and the getLong below would NPE opaquely
      require(!b.isNullAt(0),
        "q541: empty events left lane — no windows to reconcile")
      val (lo, hi) = (b.getLong(0), b.getLong(1) + 1L)
      val edges = (0 to 3).map(k => lo + (hi - lo) * k / 3)
      // the "stream delivered half" lane: even-lid matched pairs
      val half = l.as("l").join(r.as("r"),
          col("l.user_id") === col("r.user_id") &&
            col("r.rts") >= col("l.lts") &&
            col("r.rts") <= col("l.lts") + expr("INTERVAL 10 minutes"), "inner")
        .select(col("l.lid"), col("l.lts"), col("l.user_id"),
          col("r.rid"), col("r.rts"))
        .filter(col("lid") % 2 === 0)
      // through the settled-horizon wrapper (round-11, verdict #3):
      // the wrapper derives each window's slices and enforces the
      // settled contract — hi is past the last left event, so every
      // window is settled at horizon = hi + after (disorder 0 for a
      // fully-ingested batch)
      val windows = (0 until 3).map { k =>
        StreamIngest.reconcileWindow(half, l, r,
          Seq("user_id"), "lts", "rts", "0 seconds", "10 minutes",
          "lid", "rid", edges(k), edges(k + 1),
          hi + afterUs, "0 seconds")
      }
      windows.reduce(_.unionByName(_))
        .withColumn("ltsu", expr("unix_micros(lts)"))
        .withColumn("rtsu", expr("unix_micros(rts)"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_rows"),
          count(col("rid")).as("n_matched"),
          (count(lit(1)) - count(col("rid"))).as("n_unmatched"),
          coalesce(sum(col("rtsu") - col("ltsu")), lit(0L)).as("sum_lag_us"))
        .orderBy("user_id")
    }
  )

  val oracles: Map[String, String] = Map(

    "q535_eval_contamination" ->
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

    "q536_repetition_filter" ->
      s"""WITH d AS (
         |  SELECT source, ${Du.tokens("text")} AS toks FROM documents),
         |m AS (
         |  SELECT source, ${dupMilli(Du)} AS milli
         |  FROM d WHERE ${Du.size("toks")} >= 3)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN milli >= 100 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flagged,
         |  CAST(SUM(milli) AS BIGINT) AS sum_milli,
         |  CAST(MAX(milli) AS BIGINT) AS max_milli
         |FROM m GROUP BY source ORDER BY source""".stripMargin,

    "q537_zipf_slope" ->
      s"""WITH tf AS (
         |  SELECT source, unnest(${Du.tokens("text")}) AS t FROM documents),
         |f AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS f
         |      FROM tf GROUP BY 1, 2),
         |rk AS (
         |  SELECT source, f,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY f DESC, t ASC) AS rk
         |  FROM f),
         |xy AS (SELECT source, f, ${log2floor(Du, "rk")} AS x,
         |         ${log2floor(Du, "f")} AS y FROM rk),
         |ag AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
         |    CAST(SUM(f) AS BIGINT) AS total_toks,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx
         |  FROM xy GROUP BY 1)
         |SELECT source, vocab, total_toks,
         |  CASE WHEN vocab * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT)
         |    ELSE ${signedDiv(Du, "(vocab * sxy - sx * sy) * 1000",
              "(vocab * sxx - sx * sx)")} END AS slope_milli
         |FROM ag ORDER BY source""".stripMargin,

    "q538_heaps_law" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, ${Du.tokens("text")} AS toks,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk
         |  FROM documents),
         |fr AS (
         |  SELECT source, t, CAST(MIN(rk) AS BIGINT) AS fr
         |  FROM (SELECT source, rk, unnest(toks) AS t FROM d) z
         |  GROUP BY 1, 2),
         |ks AS (
         |  SELECT source, unnest(${Du.transform(
              Du.rangeIncl("0", log2floor(Du, "max(rk)")), "i",
              "(1::BIGINT << i)")}) AS k
         |  FROM d GROUP BY source),
         |v AS (SELECT source, k, CAST(COUNT(*) AS BIGINT) AS n_vocab
         |      FROM ks JOIN fr USING (source) WHERE fr <= k GROUP BY 1, 2),
         |t AS (SELECT source, k,
         |        CAST(SUM(${Du.size("toks")}) AS BIGINT) AS n_toks
         |      FROM ks JOIN d USING (source) WHERE rk <= k GROUP BY 1, 2)
         |SELECT source, CAST(k AS BIGINT) AS k, n_vocab, n_toks
         |FROM v JOIN t USING (source, k)
         |ORDER BY source, k""".stripMargin,

    "q539_quality_rules" -> {
      val stop = "(t = 'the' OR t = 'a' OR t = 'of' OR t = 'to' OR t = 'and')"
      s"""WITH d AS (
         |  SELECT source, ${Du.tokens("text")} AS toks FROM documents),
         |m AS (
         |  SELECT source,
         |    CAST(${Du.size("toks")} AS BIGINT) AS n,
         |    CAST(${Du.fold(Du.transform("toks", "t", "length(t)"),
                "CAST(0 AS BIGINT)", "acc", "v", "acc + v")} AS BIGINT)
         |      AS sumlen,
         |    CAST(${Du.size(Du.filterL("toks", "t", stop))} AS BIGINT)
         |      AS nstop,
         |    CAST(list_max(${Du.transform(Du.arrDistinct("toks"), "t",
                Du.size(Du.filterL("toks", "x", "x = t")))}) AS BIGINT)
         |      AS maxf
         |  FROM d WHERE ${Du.size("toks")} > 0),
         |rules AS (
         |  SELECT source,
         |    CASE WHEN n BETWEEN 10 AND 1000 THEN 1 ELSE 0 END AS r_len,
         |    CASE WHEN sumlen * 1000 // n BETWEEN 3000 AND 9000
         |      THEN 1 ELSE 0 END AS r_wlen,
         |    CASE WHEN nstop * 1000 // n >= 10 THEN 1 ELSE 0 END AS r_stop,
         |    CASE WHEN maxf * 1000 // n <= 300 THEN 1 ELSE 0 END AS r_rep
         |  FROM m)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(r_len) AS BIGINT) AS p_len,
         |  CAST(SUM(r_wlen) AS BIGINT) AS p_wlen,
         |  CAST(SUM(r_stop) AS BIGINT) AS p_stop,
         |  CAST(SUM(r_rep) AS BIGINT) AS p_rep,
         |  CAST(SUM(CASE WHEN r_len + r_wlen + r_stop + r_rep = 4
         |    THEN 1 ELSE 0 END) AS BIGINT) AS p_all
         |FROM rules GROUP BY source ORDER BY source""".stripMargin
    },

    // full recompute over the whole corpus — the merged incremental
    // index must match it exactly
    "q540_lsh_index_incremental" -> {
      val bands = (0 until 4).map { b =>
        s"SELECT doc_id, CAST($b AS BIGINT) AS band, ${bandSig(Du, b)} AS sig " +
          s"FROM d"
      }.mkString("\n| UNION ALL ")
      s"""WITH d AS (
         |  SELECT doc_id, ${Du.tokens("text")} AS toks FROM documents
         |  WHERE ${Du.size(Du.tokens("text"))} >= 3),
         |sigs AS ($bands),
         |bk AS (SELECT band, sig, CAST(COUNT(*) AS BIGINT) AS bsz
         |       FROM sigs GROUP BY 1, 2)
         |SELECT band, CAST(SUM(bsz) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(MAX(bsz) AS BIGINT) AS max_bucket
         |FROM bk GROUP BY band ORDER BY band""".stripMargin
    },

    "q542_domain_affinity" ->
      s"""WITH bg AS (
         |  SELECT doc_id, source,
         |    unnest(${Du.shingles(Du.tokens("text"), 2)}) AS g
         |  FROM documents),
         |model AS (
         |  SELECT g,
         |    ${log2floor(Du,
             "CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) + 1")} -
         |    ${log2floor(Du,
             "CAST(SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT) + 1")}
         |      AS w
         |  FROM bg GROUP BY g),
         |pd AS (
         |  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(w) AS BIGINT) AS sw
         |  FROM bg JOIN model USING (g) GROUP BY 1, 2),
         |ag AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN sw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |    CAST(SUM(sw) AS BIGINT) AS sum_wbits,
         |    CAST(SUM(ng) AS BIGINT) AS n_grams
         |  FROM pd GROUP BY 1)
         |SELECT source, n_docs, n_pos, sum_wbits,
         |  ${signedDiv(Du, "sum_wbits * 1000", "n_grams")} AS avg_milli
         |FROM ag ORDER BY source""".stripMargin,

    "q543_greedy_packing" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, source,
         |    CAST(${Du.size(Du.tokens("text"))} AS BIGINT) AS n
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, source,
         |    CASE WHEN n > 512 THEN CAST(error('q543: doc wider than the
         | 512-token window') AS BIGINT) ELSE n END AS n
         |  FROM d0 WHERE n > 0),
         |g AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n) AS BIGINT) AS n_tokens,
         |    list(n ORDER BY doc_id) AS zs
         |  FROM d GROUP BY 1),
         |st AS (SELECT source, n_docs, n_tokens,
         |         ${packFold(Du, "zs")} AS stt FROM g)
         |SELECT source, n_docs, n_tokens,
         |  CAST(stt[1] + CASE WHEN stt[2] > 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS n_bins,
         |  CAST((n_tokens + 511) // 512 AS BIGINT) AS n_bins_ideal,
         |  CAST((stt[1] + CASE WHEN stt[2] > 0 THEN 1 ELSE 0 END) * 512
         |    - n_tokens AS BIGINT) AS waste_tokens
         |FROM st ORDER BY source""".stripMargin,

    // identical truth to q534: the windowed decomposition must equal
    // the one-shot complete-emission outer join
    "q541_reconcile_windows" ->
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
        |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
