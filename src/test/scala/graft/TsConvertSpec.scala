package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.functions.TsConvert
import graft.sources.{ParquetDataset, WriteConfig, WritePipeline}

/** Timestamp unit / tz conversion contract, mirroring the reference's
  * convert_timestamp (pydala/schema.py:70-109) through the write path
  * args (pydala/io.py:325-351) — see TsConvert for the Spark mapping.
  */
class TsConvertSpec extends SparkSpecBase {

  import spark.implicits._

  private val instant = Timestamp.from(java.time.Instant.parse("2024-03-10T12:30:45.123456Z"))

  test("strip renders the wall clock in the requested zone") {
    val df = Seq((1, instant)).toDF("id", "ts")
    val utc = TsConvert.strip(df) // default UTC = the reference's zone drop
    assert(utc.schema("ts").dataType == TimestampNTZType)
    assert(utc.select($"ts".cast("string")).head().getString(0)
      == "2024-03-10 12:30:45.123456")
    // DST starts at 2am local on 2024-03-10, so 12:30 UTC is already
    // EDT (UTC-4) — 08:30 confirms the real zone rules apply, not a
    // fixed offset
    val ny = TsConvert.strip(df, "America/New_York")
    assert(ny.select($"ts".cast("string")).head().getString(0)
      == "2024-03-10 08:30:45.123456")
  }

  test("localize interprets the wall clock in the given zone") {
    val df = Seq((1, LocalDateTime.parse("2024-03-10T07:30:45.123456")))
      .toDF("id", "ts")
    assert(df.schema("ts").dataType == TimestampNTZType)
    val ny = TsConvert.localize(df, "America/New_York")
    assert(ny.schema("ts").dataType == TimestampType)
    // 07:30 EDT (post-2am DST switch) = 11:30 UTC (session zone is
    // UTC, so the rendered string IS UTC)
    assert(ny.select($"ts".cast("string")).head().getString(0)
      == "2024-03-10 11:30:45.123456")
  }

  test("strip then localize round-trips the instant") {
    val df = Seq((1, instant)).toDF("id", "ts")
    val back = TsConvert.localize(
      TsConvert.strip(df, "Asia/Tokyo"), "Asia/Tokyo")
    assert(back.select($"ts").head().getTimestamp(0) == instant)
  }

  test("strip∘localize is the identity for unambiguous instants across zones") {
    // the identity cannot hold inside a DST fall-back overlap (two
    // instants share one wall clock; localize must pick one), so
    // ambiguous wall times are excluded BY RULE — not by seed luck
    val rnd = new scala.util.Random(11)
    val zones = Seq("UTC", "America/New_York", "Asia/Tokyo", "Europe/Berlin",
      "Australia/Adelaide") // incl. a half-hour-offset zone
    val raw = Seq.fill(60)(
      new Timestamp(rnd.between(0L, 253402300799L) * 1000L)) // 1970..9999
    for (z <- zones) {
      val zid = java.time.ZoneId.of(z)
      val instants = raw.filter { t =>
        val wall = t.toInstant.atZone(zid).toLocalDateTime
        zid.getRules.getValidOffsets(wall).size == 1
      }
      assert(instants.size >= 40, s"zone $z: too few unambiguous samples")
      val df = instants.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "ts")
      val back = TsConvert.localize(TsConvert.strip(df, z), z)
        .orderBy("id").collect().map(_.getTimestamp(1))
      assert(back.toSeq == instants, s"zone $z")
    }
  }

  test("malformed zone ids are rejected before reaching SQL") {
    val df = Seq((1, instant)).toDF("id", "ts")
    intercept[IllegalArgumentException] {
      TsConvert.strip(df, "UTC', ts), x) --")
    }
  }

  test("unit mapping: us/ms/int96 accepted, ns rejected") {
    assert(TsConvert.outputTimestampType("us") == "TIMESTAMP_MICROS")
    assert(TsConvert.outputTimestampType("millis") == "TIMESTAMP_MILLIS")
    assert(TsConvert.outputTimestampType("INT96") == "INT96")
    intercept[IllegalArgumentException](TsConvert.outputTimestampType("ns"))
    intercept[IllegalArgumentException](TsConvert.outputTimestampType("weird"))
  }

  test("write with tsUnit=ms truncates to milliseconds in the file") {
    val dir = tmpDir("tsunit")
    WritePipeline.write(Seq((1, instant)).toDF("id", "ts"), dir,
      WriteConfig(tsUnit = Some("ms")))
    val back = spark.read.parquet(dir).select($"ts".cast("string")).head().getString(0)
    assert(back == "2024-03-10 12:30:45.123") // .123456 → .123, reference io.py:106
    // the session conf was restored after the scoped write
    assert(spark.conf.get("spark.sql.parquet.outputTimestampType") == "TIMESTAMP_MICROS")
  }

  test("write with removeTz + tz writes NTZ wall clocks; dateparts follow the zone") {
    // 2024-01-01 03:00 UTC is 2023-12-31 22:00 in New York: the
    // derived year partition must be 2023, not 2024
    val ts = Timestamp.from(java.time.Instant.parse("2024-01-01T03:00:00Z"))
    val dir = tmpDir("tsntz")
    WritePipeline.write(Seq((1, ts)).toDF("id", "ts"), dir,
      WriteConfig(partitionBy = Seq("year"),
        datepartsFrom = Some("ts"), dateparts = Seq("year"),
        tz = Some("America/New_York"), removeTz = true))
    val ds = new ParquetDataset(spark, dir)
    assert(ds.relFiles.forall(_.startsWith("year=2023/")))
    val back = ds.df
    assert(back.schema("ts").dataType == TimestampNTZType)
    assert(back.select($"ts".cast("string")).head().getString(0)
      == "2023-12-31 22:00:00")
  }

  test("write with tz localizes NTZ input to instants") {
    val dir = tmpDir("tsloc")
    WritePipeline.write(
      Seq((1, LocalDateTime.parse("2023-12-31T22:00:00"))).toDF("id", "ts"), dir,
      WriteConfig(tz = Some("America/New_York")))
    val back = spark.read.parquet(dir)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.select(unix_micros($"ts")).head().getLong(0)
      == java.time.Instant.parse("2024-01-01T03:00:00Z").toEpochMilli * 1000L)
  }

  test("partitionBy splits into keyed frames without the partition columns") {
    val df = Seq(("x", 1), ("y", 2), ("x", 3)).toDF("cat", "v")
    val parts = graft.functions.FrameOps.partitionBy(df, Seq("cat"))
    assert(parts.map(_._1).toSet == Set(Map("cat" -> "x"), Map("cat" -> "y")))
    val x = parts.find(_._1 == Map("cat" -> "x")).get._2
    assert(x.columns.toSeq == Seq("v"))
    assert(x.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    // no columns → single partition with an empty key map
    val whole = graft.functions.FrameOps.partitionBy(df, Nil)
    assert(whole.size == 1 && whole.head._1.isEmpty)
    assert(whole.head._2.count() == 3)
  }

  test("partitionBy pins ONE source pass — every split reads the cache") {
    val df = Seq(("x", 1), ("y", 2), ("x", 3), ("z", 4)).toDF("cat", "v")
    val parts = graft.functions.FrameOps.partitionBy(df, Seq("cat"))
    try {
      assert(df.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "source must be persisted for the dimensional split")
      // every split's physical plan scans the InMemoryRelation, not parquet
      parts.foreach { case (_, p) =>
        val hasCacheScan = p.queryExecution.optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
        }.nonEmpty
        assert(hasCacheScan, s"split ${p.columns.mkString(",")} bypasses the cached pass")
      }
      // opt-out path leaves the source unpersisted
      val df2 = Seq(("a", 1)).toDF("cat", "v")
      graft.functions.FrameOps.partitionBy(df2, Seq("cat"), persistSource = false)
      assert(df2.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    } finally df.unpersist()
  }
}
