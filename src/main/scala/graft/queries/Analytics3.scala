package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PortableSql

/** Round-6 third analytics inventory: string-distance entity ops on
  * the codegen'd [[graft.functions.StringDistance]] kernels, plus the
  * statistics/test wave (normality, runs, rank tests, changepoints).
  * Same determinism contract as [[Analytics]]/[[Analytics2]]: integer
  * lanes, shared IEEE formula texts for any float tail, ANSI
  * zero-denominator guards mirrored on both engines, sign split
  * before any integer division whose numerator can be negative.
  *
  * Reference behavior: pydala2 exposes none of these — they extend
  * the training-data-pipeline stack (SURVEY.md "beyond the
  * reference").
  */
object Analytics3 {

  private val Du = PortableSql.Duck
  private val Sp = PortableSql.Spark

  /** The part-name token vocabulary both engines agree on: whitespace
    * tokens, deduplicated, with token frequency. Tiny by construction
    * (TPC-H part names draw from a fixed color-word list), and
    * SUBLINEAR at scale — Heaps' law keeps any real corpus vocabulary
    * far below row count, which is what licenses the pairwise block
    * join downstream.
    */
  private def partVocab(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(explode(expr(Sp.tokens("p_name"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Typo-pair mining over the part-name vocabulary with the
    // codegen'd FULL Damerau–Levenshtein (DuckDB-builtin-identical,
    // byte alphabet — see StringDistanceExpressions.scala): all
    // vocabulary pairs within edit distance ≤ 2, classified by edit
    // kind — same-length pairs split into pure substitutions
    // (hamming = dl) vs adjacent-transposition slips (hamming = 2·dl
    // with dl swaps), length-changing pairs are indels. The pair
    // frame is a length-banded self-join (|len diff| ≤ 2 rides the
    // equi-join on a shared length-band key pair); vocabulary is
    // sublinear in corpus size (Heaps), so the blocked pair count
    // stays bounded at 100 TB while the kernel itself is O(len²) on
    // token-length strings inside whole-stage codegen.
    "q363_typo_pairs" -> { (s, d) =>
      val v = partVocab(s, d)
      // band join: every token joins its own band and the band above,
      // so any pair with |len(a)−len(b)| ≤ 2 meets in ≥1 band without
      // a non-equi condition reaching the join (bands are floor(len/3))
      val left = v.select(col("t").as("ta"), col("n").as("na"),
        explode(expr("array(CAST(length(t) AS BIGINT) div 3, " +
          "CAST(length(t) AS BIGINT) div 3 + 1)")).as("band"))
      val right = v.select(col("t").as("tb"), col("n").as("nb"),
        expr("CAST(length(tb) AS BIGINT) div 3").as("band"))
      left.join(right, Seq("band"))
        .filter(expr("ta < tb AND abs(length(ta) - length(tb)) <= 2"))
        .withColumn("dl", expr("damerau_levenshtein(ta, tb)"))
        .filter(expr("dl <= 2"))
        // a pair can meet in two bands; collapse before classifying
        .select("ta", "tb", "na", "nb", "dl").distinct()
        .withColumn("ham", expr(
          "CASE WHEN length(ta) = length(tb) THEN hamming(ta, tb) END"))
        .withColumn("kind", expr(
          """CASE WHEN length(ta) <> length(tb) THEN 'indel'
            |     WHEN ham = dl THEN 'subst'
            |     WHEN ham = 2 * dl THEN 'swap'
            |     ELSE 'mixed' END""".stripMargin))
        .select("ta", "tb", "dl", "ham", "kind", "na", "nb")
        .orderBy("ta", "tb")
    })

  val oracles: Map[String, String] = Map(

    "q363_typo_pairs" ->
      s"""WITH toks AS (
         |  SELECT unnest(${Du.tokens("p_name")}) AS t FROM part),
         |v AS (SELECT t, COUNT(*) AS n FROM toks GROUP BY 1),
         |pairs AS (
         |  SELECT a.t AS ta, b.t AS tb, a.n AS na, b.n AS nb,
         |    damerau_levenshtein(a.t, b.t) AS dl
         |  FROM v a JOIN v b ON a.t < b.t
         |  WHERE abs(length(a.t) - length(b.t)) <= 2),
         |hit AS (SELECT * FROM pairs WHERE dl <= 2),
         |cls AS (
         |  SELECT ta, tb, dl,
         |    CASE WHEN length(ta) = length(tb)
         |      THEN hamming(ta, tb) END AS ham,
         |    na, nb
         |  FROM hit)
         |SELECT ta, tb, dl, ham,
         |  CASE WHEN length(ta) <> length(tb) THEN 'indel'
         |       WHEN ham = dl THEN 'subst'
         |       WHEN ham = 2 * dl THEN 'swap'
         |       ELSE 'mixed' END AS kind,
         |  na, nb
         |FROM cls ORDER BY ta, tb""".stripMargin)
}
