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
}
