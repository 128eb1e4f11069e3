package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{CanonHash, JsonText}

/** Adversarial self-check on the canonicalization seam (round-9,
  * verdict #5): every ACTIVE result-column type family across the 511
  * oracle queries — BIGINT, INTEGER, SMALLINT, BOOLEAN, DOUBLE,
  * VARCHAR, DATE, TIMESTAMP(micros, NTZ-at-dump) per the round-9
  * inventory of the full verify output — round-trips through the
  * EXACT dump path Verify uses (ntz-normalize → parquet write →
  * read-back), pinning:
  *
  *  1. the canonical lines are identical before and after the parquet
  *     boundary (so `_canon_rows.txt.gz` is the dump's ground truth);
  *  2. re-reading yields the same hash (no rendering instability);
  *  3. the same parquet read through DuckDB — the oracle comparator's
  *     read path, driven by `tools/seam_check.py` — is BIT-identical
  *     cell-for-cell (doubles compared as raw IEEE bits), and no
  *     column widens to HUGEINT/DECIMAL on the way (the r6–r8
  *     driver-red-cell class).
  *
  * Values are chosen adversarially per family: NaN / −0.0 / ±Inf /
  * min-subnormal doubles, ±2⁵³±1 and Long extremes, the canonical
  * separator chars (U+0001, newline) inside strings, astral-plane
  * unicode, year-1583/9999 dates and timestamps (post-Gregorian: the
  * rebase seam is out of the active surface and stays out), and NULL
  * in every column.
  */
class CanonSeamSpec extends SparkSpecBase {

  import spark.implicits._

  private val D = java.lang.Double.doubleToRawLongBits(_: Double)

  // (id, long, int, short, bool, double, string, dateIso, tsMicros)
  private val rows: Seq[(Long, Option[Long], Option[Int], Option[Short],
      Option[Boolean], Option[Double], Option[String], Option[String],
      Option[Long])] = Seq(
    (1L, Some(Long.MinValue), Some(Int.MinValue), Some(Short.MinValue),
      Some(true), Some(Double.NaN), Some(""), Some("1583-01-01"),
      Some(-12212553600000000L)),
    (2L, Some(Long.MaxValue), Some(Int.MaxValue), Some(Short.MaxValue),
      Some(false), Some(-0.0), Some("ab"), Some("9999-12-31"),
      Some(253402300799999999L)),
    (3L, Some(9007199254740993L), Some(0), Some(0.toShort), Some(true),
      Some(0.0), Some("line\nbreak\ttab"), Some("1970-01-01"), Some(0L)),
    (4L, Some(-9007199254740993L), Some(-1), Some(-1.toShort), Some(false),
      Some(Double.PositiveInfinity), Some("quote'\"q\\back"),
      Some("2024-02-29"), Some(1700000000123456L)),
    (5L, Some(0L), Some(42), Some(7.toShort), Some(true),
      Some(Double.NegativeInfinity), Some("astral 𝕊 plane"),
      Some("1999-12-31"), Some(-1L)),
    (6L, Some(1L), Some(1), Some(1.toShort), Some(false),
      Some(java.lang.Double.MIN_VALUE), Some("ünïcodé ≠ ascii"),
      Some("2000-02-29"), Some(951827696000001L)),
    (7L, Some(-1L), Some(2), Some(2.toShort), Some(true),
      Some(1.0 / 3.0), Some(" leading and trailing "),
      Some("1969-07-20"), Some(-14182940000000L)),
    (8L, None, None, None, None, None, None, None, None))

  private def fixture: DataFrame =
    rows.toDF("id", "c_long", "c_int", "c_short", "c_bool", "c_double",
        "c_string", "date_iso", "ts_us")
      .select(col("id"), col("c_long"), col("c_int"),
        col("c_short").cast("smallint").as("c_short"), col("c_bool"),
        col("c_double"), col("c_string"),
        to_date(col("date_iso")).as("c_date"),
        timestamp_micros(col("ts_us")).as("c_ts"))

  /** Verify.scala's dump-boundary normalization, reproduced exactly:
    * session-TZ TIMESTAMP casts to NTZ (value-identity under the
    * pinned UTC zone).
    */
  private def ntzNormalized(df: DataFrame): DataFrame =
    df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampType => f.name
    }.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("timestamp_ntz")))

  test("every active result type family round-trips the dump boundary " +
    "with identical canonical lines") {
    val dir = tmpDir("seam")
    val pre = ntzNormalized(fixture)
    val preLines = CanonHash.lines(pre)
    pre.coalesce(1).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val backLines = CanonHash.lines(back)
    assert(preLines.toSeq == backLines.toSeq,
      s"canonical lines changed across the parquet boundary:\n" +
        preLines.zip(backLines).filter(p => p._1 != p._2).take(3)
          .map(p => s"  pre=${p._1}\n  post=${p._2}").mkString("\n"))
    // a second read must hash identically (no iteration-order leak)
    assert(CanonHash.of(spark.read.parquet(dir)) ==
      CanonHash.hashOfLines(backLines))
    // no JVM-identity rendering anywhere (Object.toString = name@hex)
    backLines.foreach(l => assert(!l.matches(".*@[0-9a-f]{4,}.*"),
      s"identity-hash rendering leaked into canonical line: $l"))
  }

  test("the dump read through DuckDB (the oracle comparator's path) is " +
    "bit-identical and never widens to HUGEINT") {
    val dir = tmpDir("seam_duck")
    ntzNormalized(fixture).coalesce(1).write.mode("overwrite").parquet(dir)

    def jv(t: String, v: Option[String]): String =
      v.map(x => s"""{"t":"$t","v":${JsonText.escape(x)}}""")
        .getOrElse(s"""{"t":"$t"}""")
    val expRows = rows.map { case (id, l, i, sh, b, d, s, dt, ts) =>
      Seq(
        "id" -> jv("long", Some(id.toString)),
        "c_long" -> jv("long", l.map(_.toString)),
        "c_int" -> jv("int", i.map(_.toString)),
        "c_short" -> jv("int", sh.map(_.toString)),
        "c_bool" -> jv("bool", b.map(x => if (x) "1" else "0")),
        "c_double" -> jv("double", d.map(x => java.lang.Long.toUnsignedString(D(x)))),
        "c_string" -> jv("string", s),
        "c_date" -> jv("date", dt),
        "c_ts" -> jv("ts_micros", ts.map(_.toString))
      ).map { case (k, body) => s""""$k":$body""" }.mkString("{", ",", "}")
    }
    val json = s"""{"columns":["id","c_long","c_int","c_short","c_bool",
      |"c_double","c_string","c_date","c_ts"],
      |"rows":[${expRows.mkString(",")}]}""".stripMargin.replace("\n", "")
    val exp = s"$dir/expected.json"
    Files.writeString(Paths.get(exp), json)

    import scala.sys.process._
    val outBuf = new StringBuilder
    val code = Process(Seq("python3", "tools/seam_check.py", dir, exp),
      new java.io.File(sys.props.getOrElse("user.dir", ".")))
      .!(ProcessLogger(l => outBuf.append(l).append('\n'),
        l => outBuf.append(l).append('\n')))
    assert(code == 0, s"seam_check failed:\n$outBuf")
    assert(outBuf.toString.contains("bit-identical"), outBuf.toString)
  }

  test("family guard: every covered family passes; an unpinned family " +
    "fails LOUDLY before it can reach the dump (round-10, verdict #7)") {
    import org.apache.spark.sql.types._
    // the spec's own fixture frame — by construction all-covered
    val covered = StructType(Seq(
      StructField("a", LongType), StructField("b", IntegerType),
      StructField("c", ShortType), StructField("d", BooleanType),
      StructField("e", DoubleType), StructField("f", StringType),
      StructField("g", DateType), StructField("h", TimestampType),
      StructField("i", TimestampNTZType)))
    CanonHash.assertSeamCovered("ok_query", covered) // must not throw
    for (bad <- Seq[DataType](DecimalType(18, 2), ArrayType(LongType),
        FloatType, BinaryType,
        MapType(StringType, LongType),
        StructType(Seq(StructField("x", LongType))))) {
      val sch = StructType(Seq(StructField("a", LongType),
        StructField("z", bad)))
      val ex = intercept[IllegalArgumentException] {
        CanonHash.assertSeamCovered("bad_query", sch)
      }
      assert(ex.getMessage.contains("bad_query") &&
        ex.getMessage.contains("CanonSeamSpec"),
        s"guard message must name the query and the spec: ${ex.getMessage}")
    }
    // the guard's covered set and this spec's fixture families are the
    // SAME inventory — a drift in either direction fails here
    assert(CanonHash.CoveredFamilies ==
      covered.fields.map(_.dataType).toSet,
      "CoveredFamilies and the seam-spec fixture families diverged")
  }
}
