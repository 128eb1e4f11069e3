package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge
import graft.sources.{ParquetDataset, WriteConfig, WritePipeline}

/** Laws for the round-11 Analytics10 lanes: the shard decomposition
  * bound of the sharded greedy packer (q544) and the
  * merged-index-equals-recompute contract of incremental
  * decontamination (q545), both against plain Scala references.
  */
class Analytics10Spec extends SparkSpecBase {

  import spark.implicits._

  private def refPack(zs: Seq[Long]): Long = {
    var bins = 0L; var cur = 0L
    zs.foreach { z =>
      if (cur + z <= 512) cur += z else { bins += 1; cur = z }
    }
    bins + (if (cur > 0) 1 else 0)
  }

  test("shard decomposition law: onefold <= sum(shard folds) <= " +
    "onefold + (n_shards - 1), across shapes and shard widths") {
    // deterministic pseudo-random sizes (no Math.random — resume rule)
    def sizes(seed: Long, n: Int): Seq[Long] =
      (0 until n).map(i => ((seed * (i + 1) * 2654435761L) >>> 40) % 512 + 1)
    val cases: Seq[Seq[Long]] = Seq(
      (1L to 200L), Seq.fill(300)(5L), Seq.fill(10)(512L),
      sizes(7, 257), sizes(13, 64), sizes(99, 1000),
      Seq(509L, 2L, 2L, 2L, 509L) ++ sizes(3, 100))
    for (zs <- cases; w <- Seq(16, 64, 100)) {
      val one = refPack(zs)
      val shards = zs.grouped(w).toSeq
      val sharded = shards.map(refPack).sum
      assert(sharded >= one,
        s"subadditivity broke: sharded=$sharded one=$one w=$w n=${zs.size}")
      assert(sharded <= one + shards.size - 1,
        s"tail bound broke: sharded=$sharded one=$one " +
          s"shards=${shards.size} w=$w n=${zs.size}")
    }
  }

  test("q544's Spark-side sharded fold matches the Scala reference " +
    "per shard and in total") {
    val zs = (0 until 300).map(i => ((i * 37) % 500 + 1).toLong)
    val df = zs.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n")
    val perShard = df.withColumn("sh", expr("doc_id div 64"))
      .groupBy("sh")
      .agg(expr("sort_array(collect_list(struct(doc_id, n)))").as("ord"))
      .withColumn("st", expr(graft.queries.Analytics9.packFold(
        graft.functions.PortableSql.Spark, "transform(ord, s -> s.n)")))
      .select(col("sh"),
        expr("element_at(st, 1) + CASE WHEN element_at(st, 2) > 0 " +
          "THEN 1 ELSE 0 END").as("bins"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = zs.grouped(64).zipWithIndex
      .map { case (g, i) => i.toLong -> refPack(g) }.toMap
    assert(perShard == ref, s"spark=$perShard ref=$ref")
  }

  test("incremental gram index through Merge == full recompute: key set " +
    "identical, re-signed grams upsert as no-ops") {
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 12).map(j => s"w${(i * 5 + j * 3) % 30}").mkString(" "))
    }.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    def grams(d: org.apache.spark.sql.DataFrame) = d
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> " +
          "concat_ws(' ', slice(toks, i, 3)))")).as("g"))
      .distinct().withColumn("seen", lit(1L))
    val base = docs.filter(col("doc_id") % 5 =!= 0)   // 80%
    val upd = docs.filter(col("doc_id") % 5 <= 1)     // new 20% + re-signs
    val idxDir = tmpDir("a10idx")
    WritePipeline.write(grams(base), idxDir, WriteConfig())
    val ds = new ParquetDataset(spark, idxDir)
    val res = Merge(ds, grams(upd), Seq("g"), "upsert")
    val merged = spark.read.parquet(idxDir).select("g")
    val full = grams(docs).select("g")
    assert(merged.count() == merged.distinct().count(),
      "merge duplicated a gram key")
    assert(merged.except(full).isEmpty && full.except(merged).isEmpty,
      "merged index key set != full recompute")
    assert(res.sourceCount == grams(upd).count())
  }

  test("retraction-maintained count index == recompute over the post-" +
    "takedown corpus; retracting an unindexed doc fails loudly") {
    import org.apache.spark.sql.DataFrame
    def mk(ids: Seq[Int]): DataFrame = ids.map { i =>
      (i.toLong, (0 until 10).map(j => s"w${(i * 7 + j * 5) % 25}").mkString(" "))
    }.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    def dgrams(d: DataFrame) = d.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(toks) - 2), i -> " +
        "concat_ws(' ', slice(toks, i, 3)))")).as("g")).distinct()
    val base = mk(0 until 30)
    val added = mk(30 until 40)
    val retractedIds = (0 until 30 by 3)
    val retracted = mk(retractedIds)
    val idxDir = tmpDir("a10ret")
    graft.sources.WritePipeline.write(
      dgrams(base).groupBy("g").agg(count(lit(1)).as("cnt")),
      idxDir, graft.sources.WriteConfig())
    val ds = new ParquetDataset(spark, idxDir)
    def applyDelta(add: DataFrame, retract: DataFrame): Unit = {
      val delta = dgrams(add).select(col("g"), lit(1L).as("d"))
        .unionByName(dgrams(retract).select(col("g"), lit(-1L).as("d")))
        .groupBy("g").agg(sum("d").as("d")).filter(col("d") =!= 0)
      val current = spark.read.parquet(idxDir)
        .join(delta.select("g"), Seq("g"), "left_semi")
      val newCnt = delta.join(current, Seq("g"), "left")
        .select(col("g"), (coalesce(col("cnt"), lit(0L)) + col("d")).as("cnt"))
        .withColumn("cnt", expr("CASE WHEN cnt < 0 THEN " +
          "CAST(raise_error('retraction underflow') AS BIGINT) " +
          "ELSE cnt END"))
        .localCheckpoint(true) // source reads the target — Merge rule
      Merge(ds, newCnt, Seq("g"), "upsert")
      graft.operators.Delete.where(ds, "cnt = 0")
    }
    applyDelta(added, retracted)
    val kept = mk(((0 until 30) ++ (30 until 40)).filterNot(retractedIds.contains))
    val truth = dgrams(kept).groupBy("g").agg(count(lit(1)).as("cnt"))
    val got = spark.read.parquet(idxDir)
    assert(got.except(truth).isEmpty && truth.except(got).isEmpty,
      "maintained index != recompute over post-takedown corpus")
    assert(got.filter(col("cnt") <= 0).isEmpty, "zero/negative counts kept")
    // retracting a doc that was never indexed must refuse loudly
    // (out-of-vocabulary tokens: its grams cannot exist in the index)
    val foreign = Seq((999L, (0 until 10).map(j => s"zz$j").mkString(" ")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val e = intercept[Exception] {
      applyDelta(mk(Nil), foreign)
    }
    assert(e.getMessage.contains("retraction underflow"), e.getMessage)
  }
}
