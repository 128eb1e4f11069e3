package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-location law (q470): a join of two catalog
  * tables bucketed on the join key with EQUAL bucket counts plans
  * with zero shuffle exchanges, and its result equals the plain
  * shuffle join bit-for-bit — the write-once/join-many scale lever.
  */
class BucketedJoinSpec extends SparkSpecBase {

  import spark.implicits._

  test("equal-bucket join plans no shuffle and matches the plain join") {
    val dir = java.nio.file.Files.createTempDirectory("bj").toString
    val a = (1L to 500L).map(i => (i, s"s${i % 7}")).toDF("k", "tag")
    val b = (1L to 1500L).map(i => (i % 500 + 1, i)).toDF("k2", "v")
    a.write.mode("overwrite").format("parquet").bucketBy(4, "k")
      .option("path", s"$dir/a").saveAsTable("bjspec_a")
    b.write.mode("overwrite").format("parquet").bucketBy(4, "k2")
      .option("path", s"$dir/b").saveAsTable("bjspec_b")
    val j = spark.table("bjspec_a")
      .join(spark.table("bjspec_b"), col("k") === col("k2"))
    // Two traps found in round-8 review: (1) a node-type collect() on
    // executedPlan sees only the AdaptiveSparkPlanExec LEAF wrapper
    // and can never find an exchange — count in the rendered text;
    // (2) these tiny tables broadcast by default, which also has no
    // shuffle but tests nothing about co-location — force the
    // sort-merge path while asserting.
    val planStr =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j.queryExecution.executedPlan.toString
      } finally
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(planStr.contains("SortMergeJoin"), planStr)
    val exchanges =
      "Exchange (hash|range)partitioning".r.findAllMatchIn(planStr).size
    assert(exchanges == 0,
      s"bucketed join planned $exchanges exchange(s):\n$planStr")
    val got = j.groupBy("tag").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = a.join(b, col("k") === col("k2"))
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == want)
  }

  test("mismatched bucket counts still produce correct values " +
    "(co-location is an optimization, never a semantic)") {
    val dir = java.nio.file.Files.createTempDirectory("bj2").toString
    val a = (1L to 100L).map(i => (i, i * 2)).toDF("k", "x")
    val b = (1L to 300L).map(i => (i % 100 + 1, i)).toDF("k2", "v")
    a.write.mode("overwrite").format("parquet").bucketBy(4, "k")
      .option("path", s"$dir/a").saveAsTable("bjspec2_a")
    b.write.mode("overwrite").format("parquet").bucketBy(2, "k2")
      .option("path", s"$dir/b").saveAsTable("bjspec2_b")
    val got = spark.table("bjspec2_a")
      .join(spark.table("bjspec2_b"), col("k") === col("k2")).count()
    val want = a.join(b, col("k") === col("k2")).count()
    assert(got == want)
  }
}
