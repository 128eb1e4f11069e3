package graft

import graft.operators.DedupPipeline

/** End-to-end dedup: exact copies, near-dups, and transitive clusters
  * collapse to one survivor; distinct docs survive.
  */
class DedupPipelineSpec extends SparkSpecBase {

  import spark.implicits._

  private val baseText =
    "the quick brown fox jumps over the lazy dog near the river bank today"

  test("exact and near duplicates collapse to the lowest id") {
    val docs = Seq(
      (1L, baseText),
      (2L, baseText),                                  // exact dup of 1
      (3L, baseText + " extra"),                       // near dup of 1
      (4L, baseText.toUpperCase + "."),                // normalizes to dup of 1
      (5L, "completely different content about spark joins and shuffles at scale")
    ).toDF("doc_id", "text")

    val r = DedupPipeline(docs, "doc_id", "text", jaccardMin = 0.6)
    val survivors = r.survivors.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(survivors.toSeq == Seq(1L, 5L))
    val dups = r.duplicates.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(dups.keySet == Set(2L, 3L, 4L))
    assert(dups.values.forall(_ == 1L))
  }

  test("transitive near-dup chains resolve to one representative") {
    // 1 ~ 2 and 2 ~ 3 (but 1 and 3 are farther apart): all map to 1
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val t2 = t1 + " nu"
    val t3 = t2 + " xi"
    val docs = Seq((1L, t1), (2L, t2), (3L, t3)).toDF("doc_id", "text")
    val r = DedupPipeline(docs, "doc_id", "text", jaccardMin = 0.8)
    val survivors = r.survivors.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(survivors.toSeq == Seq(1L))
    val dups = r.duplicates.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(dups == Map(2L -> 1L, 3L -> 1L))
  }

  test("distinct corpus passes through untouched") {
    val docs = Seq(
      (1L, "spark catalyst optimizer rules rewrite logical plans"),
      (2L, "parquet row groups carry min max statistics per column"),
      (3L, "duckdb executes vectorized pipelines over morsels")
    ).toDF("doc_id", "text")
    val r = DedupPipeline(docs, "doc_id", "text")
    assert(r.survivors.count() == 3)
    assert(r.duplicates.isEmpty)
  }
}
