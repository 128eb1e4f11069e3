package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.PortableSql

/** Oracle-checked slice of the multimodal-column surface: the
  * `documents.text` UTF-8 bytes stand in for an opaque media payload
  * (`binary` column), exactly how image/audio/video rows are modeled
  * by [[graft.operators.Multimodal]] (whose decode stage is a stubbed
  * codec — see MultimodalSpec for the mapInPandas-shaped plumbing).
  *
  * What q60 pins against DuckDB, bit-exactly:
  *  - byte length of the payload (octet_length over BLOB),
  *  - a content digest (sha-256 of the payload bytes),
  *  - base64 transport encoding + windowed "frame sampling" at a
  *    byte-derived stride (sliced from the base64 form: DuckDB has no
  *    BLOB slicing, and ASCII slicing is identical on both engines),
  *  - deterministic fake-decode metadata (width/height/n_frames from
  *    the portable 60-bit hash) — the stand-in for codec-extracted
  *    typed metadata.
  *
  * Scale notes: every op is a narrow per-row map over the payload —
  * no shuffle at all; the plan is scan → project. At 100 TB the same
  * shape holds with real codecs behind mapInPandas/mapPartitions:
  * payload bytes never cross a shuffle boundary, only extracted
  * features do.
  */
object MultimodalOps {

  private val S = PortableSql.Spark
  private val D = PortableSql.Duck

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_multimodal_features" -> { (s, dir) =>
      val h = S.hash64("text")
      Tables.spread(Tables.documents(s, dir))
        .withColumn("payload", expr("encode(text, 'UTF-8')"))
        .withColumn("b64", expr("base64(payload)"))
        .select(
          col("doc_id"),
          expr("CAST(octet_length(payload) AS BIGINT)").as("n_bytes"),
          expr("sha2(payload, 256)").as("digest"),
          expr("substring(b64, 1, 24)").as("b64_prefix"),
          // joined to one string: array cells break the driver's pandas sort
          expr("array_join(transform(sequence(0, 3), i -> substring(b64, 1 + i * 16, 8)), '|')")
            .as("frames"),
          expr(s"64 + ($h) % 1024").as("width"),
          expr(s"64 + (($h) div 1024) % 1024").as("height"),
          expr("CAST(1 + octet_length(payload) div 100 AS BIGINT)").as("n_frames"))
        .orderBy("doc_id")
    })

  val oracles: Map[String, String] = Map(
    "q60_multimodal_features" -> {
      val h = D.hash64("text")
      s"""WITH base AS (
         |  SELECT doc_id, text, encode(text) AS payload,
         |    base64(encode(text)) AS b64
         |  FROM documents)
         |SELECT doc_id,
         | octet_length(payload) AS n_bytes,
         | sha256(text) AS digest,
         | substring(b64, 1, 24) AS b64_prefix,
         | array_to_string(list_transform(range(0, 4), i -> substring(b64, CAST(1 + i * 16 AS INTEGER), 8)), '|') AS frames,
         | 64 + ($h) % 1024 AS width,
         | 64 + (($h) // 1024) % 1024 AS height,
         | 1 + octet_length(payload) // 100 AS n_frames
         |FROM base ORDER BY doc_id""".stripMargin
    })
}
