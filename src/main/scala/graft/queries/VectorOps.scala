package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.{PortableSql, SqlDialect, VectorExpressions}

/** Similarity search + embedding near-dup over the `embeddings` table
  * (64-dim float vectors).
  *
  * Bit-exactness vs the DuckDB oracle: cosine is computed by the SAME
  * left-to-right fold of double ops on both engines (see
  * [[graft.functions.SqlDialect.cosine]]); ranking ties break on
  * neighbor id, so identical scores ⇒ identical top-k.
  *
  * Scale notes (100 TB design):
  *  - Brute-force top-k is the baseline/verifier: a broadcast of the
  *    (small) query set against the full corpus — one pass, no all-pairs
  *    materialization beyond the per-partition window.
  *  - The LSH variant is the scale path: a 4-bit sign-random-projection
  *    bucket is computed per row (narrow map), and candidate generation
  *    joins bucket-to-bucket, cutting the search space ~16×. More
  *    planes / multi-probe trade recall for speed; an IVF variant would
  *    replace the hash with learned centroids but keep the same join
  *    shape.
  */
object VectorOps {

  private val S = PortableSql.Spark
  private val D = PortableSql.Duck

  private val Dim = 64
  private val Planes = 4

  /** Deterministic ±1 hyperplane components derived from md5 — the
    * same literals are inlined into both engines' SQL.
    */
  private val signs: IndexedSeq[IndexedSeq[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until Planes).map { p =>
      (0 until Dim).map { i =>
        val h = md.digest(s"plane:$p:dim:$i".getBytes(StandardCharsets.UTF_8))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }
  }

  private def signArr(d: SqlDialect, p: Int): String =
    if (d.spark) signs(p).mkString("array(", ", ", ")")
    else signs(p).mkString("[", ", ", "]")

  /** Signed-projection dot: fold of double adds, sign flip is exact.
    * Maps to a DOUBLE list first so DuckDB's list_reduce init
    * (list_prepend) unifies types without demoting the index var.
    */
  private def srpDot(d: SqlDialect, vec: String, p: Int): String =
    d.fold(
      d.transform(d.rangeIncl("1", Dim.toString), "i",
        s"CASE WHEN ${d.idx(signArr(d, p), "i")} = 1 " +
          s"THEN CAST(${d.idx(vec, "i")} AS DOUBLE) " +
          s"ELSE -CAST(${d.idx(vec, "i")} AS DOUBLE) END"),
      d.dblZero, "acc", "v", "acc + v")

  private def bucketExpr(d: SqlDialect, vec: String): String =
    "CAST(" + (0 until Planes).map { p =>
      s"(CASE WHEN ${srpDot(d, vec, p)} > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ") + " AS INT)"

  /** Embeddings with sqrt(L2-norm) precomputed once per row; cached —
    * every similarity query reads it from both join sides. The norm
    * and the per-pair dot use the codegen'd
    * [[graft.functions.DotProductFloat]] expression (bit-identical to
    * the HOF fold, ~an order of magnitude faster per pair).
    */
  private def withNorm(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(s, dir))
      .withColumn("nrm", VectorExpressions.norm(col("embedding")))
      .cache()

  /** Codegen'd cosine between the two sides of an aliased self-join. */
  private def cosCol: org.apache.spark.sql.Column =
    VectorExpressions.dot(col("a.embedding"), col("b.embedding")) /
      (col("a.nrm") * col("b.nrm"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Embedding near-duplicate pairs (cosine ≥ 0.4). All-pairs is the
    // exact baseline; the LSH bucketing (q34) is the scale path.
    "q32_embed_neardup" -> { (s, dir) =>
      // hoist sqrt(norm) per ROW (not per pair): same IEEE value as
      // computing it inside the pair expression, 3× less work
      val e = withNorm(s, dir)
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("vec_a"),
          col("b.vec_id").as("vec_b"),
          cosCol.as("cos"))
        .filter(col("cos") >= 0.4)
        .orderBy("vec_a", "vec_b")
    },

    // Brute-force cosine top-k for a bounded query set.
    "q33_embed_knn" -> { (s, dir) =>
      val e = withNorm(s, dir)
      val q = e.filter(col("vec_id") < 20)
      val j = q.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(
          col("a.vec_id").as("qid"),
          col("b.vec_id").as("nb"),
          cosCol.as("cos"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nb").asc)
      j.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("qid", "rank", "nb", "cos")
        .orderBy("qid", "rank")
    },

    // LSH-bucketed top-k: search only within the 4-bit SRP bucket.
    "q34_embed_lsh_knn" -> { (s, dir) =>
      val e = withNorm(s, dir)
        .withColumn("bucket", expr(bucketExpr(S, "embedding")))
      val q = e.filter(col("vec_id") < 20)
      val j = q.as("a").join(e.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(
          col("a.vec_id").as("qid"),
          col("b.vec_id").as("nb"),
          cosCol.as("cos"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nb").asc)
      j.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("qid", "rank", "nb", "cos")
        .orderBy("qid", "rank")
    }
  )

  val oracles: Map[String, String] = Map(
    "q32_embed_neardup" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         | ${D.cosine("a.embedding", "b.embedding")} AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${D.cosine("a.embedding", "b.embedding")} >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q33_embed_knn" ->
      s"""WITH j AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS nb,
         |    ${D.cosine("a.embedding", "b.embedding")} AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
         |  WHERE a.vec_id < 20),
         |r AS (
         |  SELECT qid, nb, cos,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nb ASC) AS rank
         |  FROM j)
         |SELECT qid, rank, nb, cos FROM r WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,

    "q34_embed_lsh_knn" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${bucketExpr(D, "embedding")} AS bucket
         |  FROM embeddings),
         |j AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS nb,
         |    ${D.cosine("a.embedding", "b.embedding")} AS cos
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
         |  WHERE a.vec_id < 20),
         |r AS (
         |  SELECT qid, nb, cos,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nb ASC) AS rank
         |  FROM j)
         |SELECT qid, rank, nb, cos FROM r WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin
  )
}
