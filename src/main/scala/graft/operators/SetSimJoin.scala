package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join (Jaccard ≥ τ) via prefix filtering
  * — the guaranteed-no-misses counterpart of MinHash-LSH candidate
  * generation (reference behavior: pydala delegates similarity joins
  * to external engines; this operator owns the exact path).
  *
  * Prefix-filter principle (SSJoin/PPJoin): fix ONE global total
  * order over all set elements (document frequency ascending, element
  * ascending — rarest first). If J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·|A|⌉, so
  * the intersection cannot fit inside A's (⌈τ|A|⌉−1)-suffix — A's
  * prefix of length |A| − ⌈τ|A|⌉ + 1 must hit B, and by the shared
  * order the two prefixes themselves must intersect. Joining only
  * prefix rows on element equality is therefore a COMPLETE candidate
  * generator; the verify recomputes the exact intersection over the
  * full sets, so the result equals the naive all-pairs join
  * bit-for-bit.
  *
  * EXACT-DUPLICATE COLLAPSE: clone-heavy corpora (the dedup workload
  * this operator exists for) break a naive prefix join — g exact
  * copies multiply every prefix element's df by g and the candidate
  * volume by g² (measured: 10× clone density cost 50× wall-clock).
  * So the join runs over DISTINCT sets only (one representative per
  * sorted-set equivalence class; the class key is the full sorted
  * array — exact, no hash-collision risk), and the answer expands
  * back through row-wise member joins: within-class pairs are all
  * Jaccard 1, cross-class pairs inherit their representatives'
  * counts. Both expansions are output-linear row joins (no arrays of
  * member ids are ever collected), so a hot clone class costs what
  * its emitted pairs cost and nothing more.
  *
  * Scale shape: candidate volume is Σ df² over PREFIX elements of
  * DISTINCT sets. Prefixes hold each set's rarest elements, so hot
  * elements never enter the join; the size filter τ·|A| ≤ |B|
  * (cross-multiplied, integral) prunes cross-length pairs before the
  * verify. Everything is equi-join + aggregate: hash-partitionable,
  * no Cartesian, AQE-skew-splittable.
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with Jaccard(setCol) ≥ tauNum/tauDen.
    *
    * @param df     one row per set: (idCol: integral, setCol:
    *               non-empty array; duplicate elements are ignored —
    *               set semantics, normalized with array_distinct)
    * @return (id_a, id_b, n_inter, n_union) — exact counts
    */
  def jaccardSelfJoin(df: DataFrame, idCol: String, setCol: String,
                      tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"threshold must be in (0,1]: $tauNum/$tauDen")
    // Memo key = 128-bit digest of the CANONICALIZED input plan +
    // params, not the identity of the derived frame: repeated
    // identical calls re-hit the same persisted entries instead of
    // stacking three fresh MEMORY_AND_DISK frames per invocation that
    // only LRU pressure could ever evict. md5 of the canonical plan
    // text rather than the 32-bit semanticHash — at 32 bits a
    // long-lived session calling this on many distinct inputs has a
    // birthday-realistic collision that would silently serve another
    // input's persisted frames; at 128 bits it does not. Lifecycle
    // stays owned by the memo LRU (the partitionBy lesson — a library
    // operator must not pin storage it never releases).
    val inputKey = {
      val canon = df.queryExecution.analyzed.canonicalized.toString
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(canon.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      s"${md.map("%02x".format(_)).mkString}:$idCol:$setCol:$tauNum/$tauDen"
    }
    def pin(tag: String, frame: => DataFrame): DataFrame =
      graft.core.Tables.memo(df.sparkSession, s"$tag#$inputKey")(frame)
    // ---- exact-duplicate collapse: one representative per distinct
    // sorted set; members keep a (rep, id) row each. array_distinct
    // makes duplicate input elements ignored CONSISTENTLY (set
    // semantics — matching naiveSelfJoin's normalization), rather
    // than silently counted in within-class sizes only ---------------
    val sortedSets = df.select(col(idCol).as("_id"),
      expr(s"array_sort(array_distinct($setCol))").as("_sset"))
    // persisted: members derivation, the reps frame, and the
    // within-class size join all read it
    val classesP = pin("setsimcls", sortedSets.groupBy("_sset")
      .agg(min("_id").as("_rid")))
    // persisted: both sides of the within-class pair join and both
    // cross-pair expansion joins read members
    val members = pin("setsimmem", sortedSets
      .join(classesP.select(col("_sset"), col("_rid")), "_sset")
      .select(col("_rid"), col("_id")))
    val f = classesP.select(col("_rid").as("_id"), col("_sset").as("_set"))

    // ---- prefix-filtered join over the distinct sets ---------------
    val ex = f.select(col("_id"), explode(col("_set")).as("_el"))
    val freq = ex.groupBy("_el").agg(count(lit(1)).as("_df"))
    // canonical order (df asc, element asc); prefix length
    // p = sz − ⌈τ·sz⌉ + 1 with ⌈τ·sz⌉ = (tauNum·sz + tauDen − 1) div tauDen
    val sorted = ex.join(freq, "_el")
      .groupBy("_id")
      .agg(expr("transform(sort_array(collect_list(struct(_df, _el))), x -> x._el)")
        .as("_ss"))
      .withColumn("_sz", expr("size(_ss)"))
    val pre0 = sorted
      .withColumn("_p",
        expr(s"_sz - (($tauNum * _sz + ${tauDen - 1}) div $tauDen) + 1"))
      .select(col("_id"), col("_sz"), explode(expr("slice(_ss, 1, _p)")).as("_el"))
    // persist the prefix rows: both sides of the candidate self-join
    // read them, and without the pin Spark recomputes the whole
    // freq-join + per-set sort pipeline per side
    val pre = pin("setsim", pre0)
    val lenOk: Column = // τ·max ≤ min, cross-multiplied (integral, exact)
      col("x._sz") * tauDen >= col("y._sz") * tauNum &&
        col("y._sz") * tauDen >= col("x._sz") * tauNum
    val cand = pre.as("x").join(pre.as("y"),
        col("x._el") === col("y._el") && col("x._id") < col("y._id") && lenOk)
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"))
      .distinct()
    val repPairs = cand
      .join(f.select(col("_id").as("id_a"), col("_set").as("_sa")), "id_a")
      .join(f.select(col("_id").as("id_b"), col("_set").as("_sb")), "id_b")
      .withColumn("n_inter",
        expr("CAST(size(array_intersect(_sa, _sb)) AS BIGINT)"))
      .withColumn("n_union",
        expr("CAST(size(_sa) + size(_sb) AS BIGINT) - n_inter"))
      .filter(col("n_inter") * tauDen >= col("n_union") * tauNum)
      .select("id_a", "id_b", "n_inter", "n_union")

    // ---- expand back to original ids (both joins output-linear) ----
    val withinPairs = members.as("a")
      .join(members.as("b"),
        col("a._rid") === col("b._rid") && col("a._id") < col("b._id"))
      .join(classesP.select(col("_rid").as("_crid"),
        expr("CAST(size(_sset) AS BIGINT)").as("_csz")),
        col("a._rid") === col("_crid"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("_csz").as("n_inter"), col("_csz").as("n_union"))
    val crossPairs = repPairs
      .join(members.select(col("_rid").as("id_a"), col("_id").as("_ia")), "id_a")
      .join(members.select(col("_rid").as("id_b"), col("_id").as("_ib")), "id_b")
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"),
        col("n_inter"), col("n_union"))
    withinPairs.unionByName(crossPairs)
  }

  /** The naive quadratic definition — the spec's oracle, never the
    * production path. */
  def naiveSelfJoin(df: DataFrame, idCol: String, setCol: String,
                    tauNum: Int, tauDen: Int): DataFrame = {
    // same set-semantics normalization as the fast path: duplicate
    // input elements are ignored, not counted into sizes
    val f = df.select(col(idCol).as("_id"),
      expr(s"array_distinct($setCol)").as("_set"))
    f.as("a").join(f.as("b"), col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        expr("CAST(size(array_intersect(a._set, b._set)) AS BIGINT)").as("n_inter"),
        expr("CAST(size(a._set) + size(b._set) AS BIGINT)").as("_sab"))
      .withColumn("n_union", col("_sab") - col("n_inter"))
      .filter(col("n_inter") * tauDen >= col("n_union") * tauNum)
      .select("id_a", "id_b", "n_inter", "n_union")
  }
}
