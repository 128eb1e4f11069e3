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

    // Payload byte-entropy screen: per-media run-length Σc² over the
    // sorted byte values — the compressibility diagnostic a media
    // pipeline runs before paying for decode (a payload whose
    // collision index sits near the uniform floor ≈ 10⁶/256 ≈ 3906 µ
    // is already compressed/encrypted; text-like payloads sit far
    // above). Exact integers end-to-end: the byte histogram never
    // materializes — a sorted-array run-length fold computes Σc²
    // payload-locally ([[runSumSq]]), so payload bytes never cross a
    // shuffle (the multimodal scale contract); the plan is
    // scan → project → sort-by-doc_id.
    "q503_payload_entropy" -> { (s, dir) =>
      Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), expr("hex(encode(text, 'UTF-8'))").as("hx"))
        .filter(expr("length(hx) >= 2"))
        .withColumn("n_bytes", expr("CAST(length(hx) / 2 AS BIGINT)"))
        .withColumn("sb", expr(s"array_sort(${S.transform(
          S.rangeStep("1", "length(hx) - 1", "2"), "i", byteAt(S))})"))
        .withColumn("rs", expr(runSumSq(S, "sb")))
        .select(col("doc_id"), col("n_bytes"),
          expr("CAST(size(array_distinct(sb)) AS BIGINT)")
            .as("n_distinct_bytes"),
          // Σc² ≤ n² rides the wide lane before the ×10⁶ scale-up
          // (BIGINT alone overflows at ~3 MB payloads). HONEST
          // CEILING: the fold's in-flight sumsq is BIGINT — exact to
          // n_bytes ≈ 3×10⁹ (3 GB per single payload), wide enough
          // for any per-row media object this path should carry.
          expr(s"CAST(${S.intDiv(
            s"${S.wide(runFlush(S))} * 1000000",
            s"(${S.wide("n_bytes")} * n_bytes)")} AS BIGINT)")
            .as("collision_micro"))
        .orderBy("doc_id")
    },

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
    },

    // Perceptual-hash near-dup over the media payload channel: a
    // 32-bit simhash of the payload's byte 8-grams (stride 4, over the
    // HEX transport form — unlike base64, which Spark MIME-chunks with
    // CRLF every 76 chars while DuckDB never wraps, hex renders
    // identically on both engines at every length; q60's b64 fields
    // survive only because they slice below the first wrap point)
    // stands in for the codec's pHash; with a real decoder
    // the mapInPandas stage would emit a true DCT pHash and EVERYTHING
    // downstream — 8-bit band buckets for candidate generation, then
    // a hamming verify on candidates only — is unchanged. The band
    // join is the scale path: near-identical payloads share a band
    // bucket, so candidates form per bucket and the payload bytes
    // themselves never join. One gram-level shuffle (count-aggregate
    // simhash, the q31 formulation), one banded self-join.
    "q169_phash_neardup" -> { (s, dir) =>
      val base = Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), expr("hex(encode(text, 'UTF-8'))").as("hx"))
        .filter(expr("length(hx) >= 16"))
      val h = base.select(col("doc_id"),
          explode(expr(S.transform(
            S.rangeStep("1", "length(hx) - 15", "8"), "i",
            "substring(hx, i, 16)"))).as("g"))
        .select(col("doc_id"), expr(S.hash64("g")).as("h"))
      val bitCnts = (0 until 32).map(i =>
        sum(expr(s"CAST(${S.shiftRight("h", i.toString)} & 1 AS INT)")).as(s"c$i"))
      val assembled = (0 until 32)
        .map(i => s"CASE WHEN 2 * c$i > ng THEN ${S.shiftLeft(S.longLit(1), i.toString)} ELSE ${S.longLit(0)} END")
        .mkString(" + ")
      // both sides of the banded self-join read the memoized pass
      val ph = graft.core.Tables.memo(s, s"$dir#q169phash") {
        h.groupBy("doc_id")
          .agg(count(lit(1)).as("ng"), bitCnts: _*)
          .select(col("doc_id"), expr(assembled).cast("long").as("phash"))
      }
      val bands = ph.select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("b"))
        .withColumn("bv", expr(s"${S.shiftRight("phash", "b * 8")} & 255"))
      bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("x.phash").as("pa"),
          col("y.doc_id").as("doc_b"), col("y.phash").as("pb"))
        .distinct()
        .withColumn("hamming",
          expr(s"CAST(${S.bitCount(S.bxor("pa", "pb"))} AS INT)"))
        .filter(col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    },

    // Frame-sampling schedule + frame-level dedup: each payload's
    // fake-decoded frame count (q60's byte-derived n_frames) drives an
    // evenly-spaced byte-offset schedule; each sampled frame gets a
    // 60-bit feature (the codec-pHash stand-in, computed over the hex
    // transport form like q169), and the per-media rollup reports
    // frame diversity — the static-content detector a video pipeline
    // runs before paying for full decode. The schedule is arithmetic
    // (offset = 1 + i·stride — order from index math, never from
    // array order), the explode is payload-local, and only 60-bit
    // features reach the aggregate: payload bytes never shuffle,
    // which is the whole multimodal scale contract.
    "q330_frame_dedup" -> { (s, dir) =>
      val base = Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), expr("hex(encode(text, 'UTF-8'))").as("hx"))
        .filter(expr("length(hx) >= 16"))
        .withColumn("len", expr("CAST(length(hx) AS BIGINT)"))
        .withColumn("nf", expr("1 + (len div 2) div 100"))
        .withColumn("stride",
          expr("CASE WHEN nf = 1 THEN 0 ELSE (len - 16) div (nf - 1) END"))
      base
        .select(col("doc_id"), col("hx"), col("stride"),
          explode(expr(S.transform(
            S.rangeIncl("0", "nf - 1"), "i", "1 + i * stride"))).as("off"))
        .select(col("doc_id"),
          expr(S.hash64("substring(hx, CAST(off AS INT), 16)")).as("f"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("f")).as("n_distinct"))
        .withColumn("diversity_milli", expr("n_distinct * 1000 div n_frames"))
        .withColumn("is_static", expr("n_distinct = 1"))
        .select("doc_id", "n_frames", "n_distinct", "diversity_milli",
          "is_static")
        .orderBy("doc_id")
    },

    // Audio-style windowed energy features over the payload channel:
    // the byte stream (hex transport, the q169 convention) is cut
    // into 16-byte frames (≤ 32 per payload), each frame's energy is
    // Σ byte² — an exact-integer stand-in for the per-window RMS an
    // audio pipeline extracts after decode — and the per-media
    // rollup reports total/peak energy, the FIRST peak window
    // (deterministic argmax: min w among maxima, never max_by's
    // tie-luck), and spectral-flatness-style min/max dynamics. Same
    // multimodal scale contract: the fold is payload-local, only
    // per-window integers reach the aggregate, payload bytes never
    // shuffle.
    "q467_audio_energy" -> { (s, dir) =>
      def byteAt(pos: String) =
        s"CAST(conv(substring(hx, CAST($pos AS INT), 2), 16, 10) AS BIGINT)"
      val energy = S.fold(S.rangeIncl("0", "15"), "CAST(0 AS BIGINT)",
        "acc", "j", s"acc + ${byteAt("2 * (w * 16 + j) + 1")} * " +
          byteAt("2 * (w * 16 + j) + 1"))
      val g1 = Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), expr("hex(encode(text, 'UTF-8'))").as("hx"))
        .withColumn("nw", expr(
          "least(CAST(32 AS BIGINT), (CAST(length(hx) AS BIGINT) div 2) div 16)"))
        .filter(col("nw") >= 1)
        .select(col("doc_id"), col("hx"),
          explode(expr(S.rangeIncl("0", "nw - 1"))).as("w"))
        .withColumn("e", expr(energy))
        .select("doc_id", "w", "e")
      val g2 = g1.groupBy("doc_id").agg(
        count(lit(1)).as("n_windows"), sum("e").as("total_e"),
        max("e").as("peak_e"), min("e").as("min_e"))
      g1.join(g2, "doc_id")
        .filter(col("e") === col("peak_e"))
        .groupBy("doc_id")
        .agg(max("n_windows").as("n_windows"), max("total_e").as("total_e"),
          max("peak_e").as("peak_e"), max("min_e").as("min_e"),
          min("w").as("peak_w"))
        .withColumn("flatness_milli", expr(
          "CASE WHEN peak_e = 0 THEN NULL ELSE min_e * 1000 div peak_e END"))
        .select("doc_id", "n_windows", "total_e", "peak_e", "peak_w",
          "flatness_milli")
        .orderBy("doc_id")
    },

    // Image-style TILED feature extraction over opaque payload bytes
    // (the 2D companion to q467's 1D windows): the first 64 payload
    // bytes read as an 8×8 grid, split into four 4×4 tiles; per tile a
    // byte-sum "brightness", per doc the brightest tile, the
    // tile-contrast span, and the total. This is the decode-free
    // plumbing a thumbnail/patch pipeline needs — 2D block indexing,
    // per-tile aggregation, and argmax-tile selection — as one narrow
    // map + bounded explode (4 rows/doc), no shuffle before the
    // per-doc aggregate. Tile sum folds are payload-local.
    "q481_image_tiles" -> { (s, dir) =>
      def byteAt(pos: String) =
        s"CAST(conv(substring(hx, CAST($pos AS INT), 2), 16, 10) AS BIGINT)"
      // byte (r, c) of the 8×8 grid sits at hex offset 2·(8r+c)+1;
      // tile t (0..3) covers rows (t div 2)·4.. and cols (t mod 2)·4..
      val tileSum = S.fold(S.rangeIncl("0", "15"), "CAST(0 AS BIGINT)",
        "acc", "i",
        "acc + " + byteAt(
          "2 * (((t div 2) * 4 + i div 4) * 8 + (t % 2) * 4 + i % 4) + 1"))
      val tiles = Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), expr("hex(encode(text, 'UTF-8'))").as("hx"))
        .filter(expr("length(hx) >= 128"))
        .select(col("doc_id"), col("hx"),
          explode(expr(S.rangeIncl("0", "3"))).as("t"))
        .withColumn("ts", expr(tileSum))
        .select("doc_id", "t", "ts")
      val agg = tiles.groupBy("doc_id").agg(
        sum("ts").as("total_sum"), max("ts").as("bright_sum"),
        min("ts").as("dark_sum"))
      tiles.join(agg, "doc_id")
        .filter(col("ts") === col("bright_sum"))
        .groupBy("doc_id")
        .agg(max("total_sum").as("total_sum"),
          max("bright_sum").as("bright_sum"), max("dark_sum").as("dark_sum"),
          min(col("t").cast("long")).as("bright_tile"))
        .withColumn("contrast", expr("bright_sum - dark_sum"))
        .select("doc_id", "total_sum", "bright_tile", "bright_sum",
          "dark_sum", "contrast")
        .orderBy("doc_id")
    })

  /** Byte value of the 2-hex-char pair at 1-based offset `i` of `hx`
    * — the q169 hex-transport idiom at byte grain (q503).
    */
  private def byteAt(d: graft.functions.SqlDialect): String =
    if (d.spark) "CAST(conv(substring(hx, i, 2), 16, 10) AS BIGINT)"
    else "CAST(('0x' || substring(hx, CAST(i AS INTEGER), 2)) AS BIGINT)"

  /** Run-length Σc² fold over the SORTED byte array: acc is
    * [prev, run, sumsq]; equal-value runs extend, a value change
    * flushes run² into the sum, and the final flush happens outside
    * the fold. Payload-local (no byte ever shuffles), O(len) per row,
    * identical sequential order on both engines (q503).
    */
  private def runSumSq(d: graft.functions.SqlDialect, sortedArr: String): String =
    if (d.spark)
      d.fold(sortedArr,
        "array(CAST(-1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT))",
        "acc", "v",
        "CASE WHEN v = element_at(acc, 1) THEN " +
          "array(v, element_at(acc, 2) + 1, element_at(acc, 3)) ELSE " +
          "array(v, CAST(1 AS BIGINT), element_at(acc, 3) + " +
          "element_at(acc, 2) * element_at(acc, 2)) END")
    else
      // DuckDB 1.0's list_reduce has no separate-init form (the
      // list_prepend trick forces accumulator type = element type),
      // so elements wrap to [v, 0, 0] first
      d.fold(s"list_transform($sortedArr, w -> [w, 0, 0])",
        "[-1, 0, 0]::BIGINT[]", "acc", "v",
        "CASE WHEN v[1] = acc[1] THEN [v[1], acc[2] + 1, acc[3]] " +
          "ELSE [v[1], 1, acc[3] + acc[2] * acc[2]] END")

  /** Final-run flush over the fold result `rs` (q503). */
  private def runFlush(d: graft.functions.SqlDialect): String =
    s"(${d.idx("rs", "3")} + ${d.idx("rs", "2")} * ${d.idx("rs", "2")})"

  val oracles: Map[String, String] = Map(

    "q503_payload_entropy" ->
      s"""WITH pb AS (
         |  SELECT doc_id, hex(encode(text)) AS hx FROM documents
         |  WHERE length(hex(encode(text))) >= 2),
         |arrs AS (
         |  SELECT doc_id, CAST(length(hx) / 2 AS BIGINT) AS n_bytes,
         |    list_sort(${D.transform(
               D.rangeStep("1", "length(hx) - 1", "2"), "i", byteAt(D))})
         |      AS sb
         |  FROM pb),
         |lanes AS (
         |  SELECT doc_id, n_bytes,
         |    CAST(len(list_distinct(sb)) AS BIGINT) AS n_distinct_bytes,
         |    ${runSumSq(D, "sb")} AS rs
         |  FROM arrs)
         |SELECT doc_id, n_bytes, n_distinct_bytes,
         |  CAST(${D.intDiv(
              s"${D.wide(runFlush(D))} * 1000000",
              s"(${D.wide("n_bytes")} * n_bytes)")} AS BIGINT)
         |    AS collision_micro
         |FROM lanes ORDER BY doc_id""".stripMargin,
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
    },

    "q169_phash_neardup" ->
      s"""WITH pb AS (
         |  SELECT doc_id, hex(encode(text)) AS hx FROM documents
         |  WHERE length(hex(encode(text))) >= 16),
         |g AS (
         |  SELECT doc_id, substring(hx, CAST(i AS INTEGER), 16) AS g
         |  FROM pb, LATERAL unnest(${D.rangeStep("1", "length(hx) - 15", "8")}) AS u(i)),
         |h AS (SELECT doc_id, ${D.hash64("g")} AS h FROM g),
         |hv AS (SELECT doc_id, h, i FROM h, (SELECT unnest(range(0, 32)) AS i) r),
         |v AS (SELECT doc_id, i,
         |        SUM(CASE WHEN (${D.shiftRight("h", "i")} & 1) = 1 THEN 1 ELSE -1 END) AS v
         |      FROM hv GROUP BY doc_id, i),
         |ph AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN v > 0 THEN ${D.shiftLeft(D.longLit(1), "i")} ELSE ${D.longLit(0)} END) AS BIGINT) AS phash
         |  FROM v GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, phash, b, (${D.shiftRight("phash", "b * 8")}) & 255 AS bv
         |  FROM ph, (SELECT unnest(range(0, 4)) AS b) bb),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, x.phash AS pa,
         |    y.doc_id AS doc_b, y.phash AS pb
         |  FROM bands x JOIN bands y
         |    ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(${D.bitCount(D.bxor("pa", "pb"))} AS INT) AS hamming
         |FROM cand WHERE ${D.bitCount(D.bxor("pa", "pb"))} <= 6
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q330_frame_dedup" ->
      s"""WITH pb AS (
         |  SELECT doc_id, hex(encode(text)) AS hx FROM documents
         |  WHERE length(hex(encode(text))) >= 16),
         |m AS (
         |  SELECT doc_id, hx, CAST(length(hx) AS BIGINT) AS len,
         |    1 + (CAST(length(hx) AS BIGINT) // 2) // 100 AS nf
         |  FROM pb),
         |st AS (
         |  SELECT doc_id, hx, nf,
         |    CASE WHEN nf = 1 THEN 0 ELSE (len - 16) // (nf - 1) END AS stride
         |  FROM m),
         |f AS (
         |  SELECT doc_id,
         |    ${D.hash64("substring(hx, CAST(1 + i * stride AS INTEGER), 16)")}
         |      AS f
         |  FROM st, LATERAL unnest(${D.rangeIncl("0", "nf - 1")}) AS u(i)),
         |g AS (
         |  SELECT doc_id, COUNT(*) AS n_frames,
         |    COUNT(DISTINCT f) AS n_distinct
         |  FROM f GROUP BY 1)
         |SELECT doc_id, n_frames, n_distinct,
         |  n_distinct * 1000 // n_frames AS diversity_milli,
         |  n_distinct = 1 AS is_static
         |FROM g ORDER BY doc_id""".stripMargin,

    "q467_audio_energy" -> {
      def byteAt(pos: String) =
        s"CAST(('0x' || substr(hx, CAST($pos AS INT), 2)) AS BIGINT)"
      val energy = D.fold(D.rangeIncl("0", "15"), "CAST(0 AS BIGINT)",
        "acc", "j", s"acc + ${byteAt("2 * (w * 16 + j) + 1")} * " +
          byteAt("2 * (w * 16 + j) + 1"))
      s"""WITH base AS (
         |  SELECT doc_id, hex(encode(text)) AS hx,
         |    least(CAST(32 AS BIGINT),
         |      (CAST(length(hex(encode(text))) AS BIGINT) // 2) // 16)
         |      AS nw
         |  FROM documents),
         |g1 AS (
         |  SELECT doc_id, unnest(${D.rangeIncl("0", "nw - 1")}) AS w, hx
         |  FROM base WHERE nw >= 1),
         |ge AS (
         |  SELECT doc_id, w, $energy AS e FROM g1),
         |g2 AS (
         |  SELECT doc_id, COUNT(*) AS n_windows,
         |    CAST(SUM(e) AS BIGINT) AS total_e,
         |    CAST(MAX(e) AS BIGINT) AS peak_e,
         |    CAST(MIN(e) AS BIGINT) AS min_e
         |  FROM ge GROUP BY 1)
         |SELECT ge.doc_id, MAX(n_windows) AS n_windows,
         |  MAX(total_e) AS total_e, MAX(peak_e) AS peak_e,
         |  CAST(MIN(w) AS BIGINT) AS peak_w,
         |  CASE WHEN MAX(peak_e) = 0 THEN NULL
         |    ELSE MAX(min_e) * 1000 // MAX(peak_e) END AS flatness_milli
         |FROM ge JOIN g2 ON ge.doc_id = g2.doc_id AND ge.e = g2.peak_e
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q481_image_tiles" -> {
      def byteAt(pos: String) =
        s"CAST(('0x' || substr(hx, CAST($pos AS INT), 2)) AS BIGINT)"
      val tileSum = D.fold(D.rangeIncl("0", "15"), "CAST(0 AS BIGINT)",
        "acc", "i",
        "acc + " + byteAt(
          "2 * (((t // 2) * 4 + i // 4) * 8 + (t % 2) * 4 + i % 4) + 1"))
      s"""WITH base AS (
         |  SELECT doc_id, hex(encode(text)) AS hx FROM documents
         |  WHERE length(hex(encode(text))) >= 128),
         |tl AS (
         |  SELECT doc_id, unnest(${D.rangeIncl("0", "3")}) AS t, hx
         |  FROM base),
         |ts AS (SELECT doc_id, t, $tileSum AS ts FROM tl),
         |ag AS (
         |  SELECT doc_id, CAST(SUM(ts) AS BIGINT) AS total_sum,
         |    CAST(MAX(ts) AS BIGINT) AS bright_sum,
         |    CAST(MIN(ts) AS BIGINT) AS dark_sum
         |  FROM ts GROUP BY 1)
         |SELECT ts.doc_id, MAX(total_sum) AS total_sum,
         |  CAST(MIN(t) AS BIGINT) AS bright_tile,
         |  MAX(bright_sum) AS bright_sum, MAX(dark_sum) AS dark_sum,
         |  MAX(bright_sum) - MAX(dark_sum) AS contrast
         |FROM ts JOIN ag ON ts.doc_id = ag.doc_id AND ts.ts = ag.bright_sum
         |GROUP BY 1 ORDER BY 1""".stripMargin
    })
}
