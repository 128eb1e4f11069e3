package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import graft.sources.{CsvDataset, JsonDataset, Table}

/** Pins the Table/CSV/JSON surface (reference pydala/table.py,
  * pydala/dataset.py:2656-2774).
  */
class TableSpec extends SparkSpecBase {

  import spark.implicits._

  test("sort/filter/select/limit/distinct chain") {
    val t = Table(Seq((3, "c"), (1, "a"), (2, "b"), (1, "a")).toDF("id", "v"))
    val out = t.distinct().filter("id >= 1").sort("id desc").select("id", "v")
      .limit(2).collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((3, "c"), (2, "b")))
    assert(t.distinct().count() == 3)
  }

  test("filter sanitization is quote-aware") {
    import graft.sources.Sanitize
    // comment markers inside string literals are data, not comments
    assert(Sanitize("v = 'a--b'") == "v = 'a--b'")
    assert(Sanitize("v = 'x/*y*/z'") == "v = 'x/*y*/z'")
    // real comments outside literals still stripped
    assert(Sanitize("id > 1 -- trailing note") == "id > 1")
    assert(Sanitize("id > 1 /* note */ AND id < 9") == "id > 1   AND id < 9")
    // removal must not SYNTHESIZE a marker from the joined neighbors
    assert(Sanitize("x = 1 -/**/- AND v = 'a'") == "x = 1 - - AND v = 'a'")
    assert(Sanitize(Sanitize("x = 1 -/**/- AND v = 'a'"))
      == Sanitize("x = 1 -/**/- AND v = 'a'"))
    // multi-line: the comment ends at the newline, the rest survives
    assert(Sanitize("id > 1 -- note\nAND id < 9") == "id > 1 \nAND id < 9")
    // ...and inside backtick / double-quoted IDENTIFIERS too
    assert(Sanitize("`a--b` = 1") == "`a--b` = 1")
    assert(Sanitize("\"a/*b*/c\" = 1") == "\"a/*b*/c\" = 1")
    // genuinely unbalanced quotes still rejected
    intercept[IllegalArgumentException](Sanitize("v = 'oops"))
    // end-to-end through Table.filter
    val t = Table(Seq((1, "a--b"), (2, "plain")).toDF("id", "v"))
    assert(t.filter("v = 'a--b'").collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("sanitizer law: no comment markers survive outside quotes; idempotent") {
    import graft.sources.Sanitize
    val rnd = new scala.util.Random(42)
    val alphabet = "ab '-/*\n`\"=1".toCharArray
    def randSql() = Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
    def markersOutsideQuotes(s: String): Boolean = {
      var i = 0; var q: Char = 0
      while (i < s.length - 1) {
        val c = s.charAt(i)
        if (q != 0) { if (c == q) q = 0 }
        else if (c == '\'' || c == '`' || c == '"') q = c
        else if ((c == '-' && s.charAt(i + 1) == '-') ||
                 (c == '/' && s.charAt(i + 1) == '*')) return true
        i += 1
      }
      false
    }
    var checked = 0
    for (_ <- 1 to 2000) {
      val in = randSql()
      try {
        val out = Sanitize(in)
        assert(!markersOutsideQuotes(out), s"markers survive: ${in.replace("\n", "\\n")} -> $out")
        assert(Sanitize(out) == out, s"not idempotent: $in")
        checked += 1
      } catch { case _: IllegalArgumentException => } // unbalanced → rejected, fine
    }
    assert(checked > 200) // the law actually exercised accepted inputs
  }

  test("batch iterator streams without driver materialization") {
    val t = Table((1 to 100).toDF("n"))
    assert(t.batchIterator().map(_.getInt(0)).sum == 5050)
  }

  test("csv dataset reads with header + schema inference, converts to parquet") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(s"$dir/data.csv"), "id,name,score\n1,a,1.5\n2,b,2.5\n")
    val ds = new CsvDataset(spark, s"$dir/data.csv")
    assert(ds.df.schema("id").dataType == IntegerType)
    assert(ds.df.count() == 2)
    val pq = ds.toParquet(tmpDir("csvpq"))
    assert(pq.df.count() == 2)
  }

  test("json dataset with dtype optimization narrows numeric strings") {
    val dir = tmpDir("json")
    Files.writeString(Paths.get(s"$dir/data.json"),
      """{"id": 1, "v": "42"}
        |{"id": 2, "v": "7"}
        |""".stripMargin)
    val plain = new JsonDataset(spark, s"$dir/data.json")
    assert(plain.df.schema("v").dataType == StringType)
    val opt = new JsonDataset(spark, s"$dir/data.json", optimizeDtypes = true)
    assert(opt.df.schema("v").dataType == ByteType)
    assert(opt.df.select("v").collect().map(_.getByte(0)).sorted.toSeq == Seq(7, 42))
  }

  test("sql passthrough registers the table under the given name") {
    import spark.implicits._
    val t = graft.sources.Table(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val out = t.sql("SELECT max(id) AS m FROM docs", name = "docs")
      .collect().head.getInt(0)
    assert(out == 2)
  }

  test("events loader adapts to the footer's physical timestamp layout") {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.TimestampType
    // nanos generation: ts arrives as LONG (nanosAsLong) → div-1000
    // conversion. Spark cannot WRITE nanos parquet, so synthesize the
    // post-read shape the conf produces: a LONG ts column.
    val nanosDir = tmpDir("evnanos")
    Seq((1L, 1704067200000000000L, 7L)).toDF("event_id", "ts", "user_id")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    val fromNanos = graft.core.Tables.load(spark, nanosDir, "events")
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.select(expr("unix_micros(ts)")).head.getLong(0) ==
      1704067200000000L)

    // NTZ-micros generation: ts arrives as TIMESTAMP_NTZ → cast to
    // the session (UTC) TIMESTAMP, value-identical
    val ntzDir = tmpDir("evntz")
    Seq((2L, 8L)).toDF("event_id", "user_id")
      .withColumn("ts", expr("timestamp_ntz '2024-01-01 00:00:00'"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    val fromNtz = graft.core.Tables.load(spark, ntzDir, "events")
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(expr("unix_micros(ts)")).head.getLong(0) ==
      1704067200000000L)
  }

  test("GraftExtensions injects native functions at session build") {
    // a derived session picking up the extensions class resolves the
    // native functions with no library-side registration call
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    val s2 = spark.newSession()
    org.apache.spark.sql.graftshim.Bridge.applyFunctionExtensions(s2, ext)
    val v = s2.sql("SELECT portable_hash64('abc') AS h").collect().head.getLong(0)
    // == conv(substr(md5('abc'),1,15),16,10)
    assert(v == java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("abc".getBytes("UTF-8")).take(8)
        .map("%02x".format(_)).mkString.take(15), 16))
  }
}
