package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus deduplication: the composition a training-data
  * pipeline actually runs, as one library call.
  *
  *   normalize → exact dedup (digest groupBy) → MinHash-LSH candidate
  *   pairs → Jaccard verification → connected-components-lite
  *   (min-representative propagation) → survivors
  *
  * Every stage is a DataFrame transformation; the near-dup stage never
  * materializes all-pairs. Representative election uses iterative
  * min-id propagation over the verified-duplicate edges (duplicate
  * clusters are overwhelmingly small, so a handful of iterations
  * converges; the iteration count is capped and logged rather than
  * data-dependent-unbounded).
  */
object DedupPipeline {

  final case class Result(survivors: DataFrame, duplicates: DataFrame)

  /** @param docs       (idCol, textCol) corpus
    * @param jaccardMin verified-duplicate threshold on 3-shingle sets
    * @param numHashes  minhash count (bands of 2 rows)
    */
  def apply(docs: DataFrame, idCol: String, textCol: String,
            jaccardMin: Double = 0.8, numHashes: Int = 16,
            maxIters: Int = 8): Result = {
    val spark = docs.sparkSession
    import spark.implicits._

    // 1. normalize + tokenize + distinct shingles
    val norm = docs.select(
      col(idCol).cast("long").as("id"),
      regexp_replace(lower(col(textCol)), "[.,!?;:]", "").as("t"))
    val base = norm
      .withColumn("toks", expr("filter(split(trim(t), ' +'), x -> x != '')"))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", expr(
        "array_distinct(transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3))))"))
      .select("id", "sh")
      .cache()

    // 2. exact dedup on the shingle-set digest
    val exact = base
      .withColumn("h", md5(expr("concat_ws('', sh)")))
      .withColumn("rep", min("id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
    val exactEdges = exact.filter(col("id") =!= col("rep"))
      .select(col("id"), col("rep"))

    // 3. LSH candidates over the exact-representatives only
    val reps = exact.filter(col("id") === col("rep")).select("id", "sh")
    val bands = numHashes / 2
    val mh = reps.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), explode(expr(s"sequence(0, ${bands - 1})")).as("g"),
        col("s"))
      .select(col("id"), col("g"),
        expr("cast(conv(substr(md5(concat(g, ':', s)), 1, 15), 16, 10) as bigint)").as("h"))
      .groupBy("id", "g").agg(min("h").as("h"))
      .select(col("id"), concat_ws("|", col("g"), col("h")).as("bk"))
    val cand = mh.as("x").join(mh.as("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()

    // 4. Jaccard verification on candidates only
    val withSh = (d: DataFrame, side: String) => d
      .join(reps.select(col("id").as(side), col("sh").as(s"sh_$side")), side)
    val verified = withSh(withSh(cand, "a"), "b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .filter(col("inter").cast("double") / col("uni") >= jaccardMin)
      .select(col("a"), col("b"))

    // 5. min-representative propagation over near-dup edges
    var mapping = verified.select(col("b").as("id"), col("a").as("rep"))
      .groupBy("id").agg(min("rep").as("rep"))
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      val next = mapping.as("m1")
        .join(mapping.as("m2"), col("m1.rep") === col("m2.id"), "left")
        .select(col("m1.id"), coalesce(col("m2.rep"), col("m1.rep")).as("rep"))
        .groupBy("id").agg(min("rep").as("rep"))
      converged = next.as("n").join(mapping.as("o"),
        col("n.id") === col("o.id") && col("n.rep") =!= col("o.rep")).isEmpty
      mapping = next
      i += 1
    }

    val nearEdges = mapping
    val allEdges = exactEdges.unionByName(nearEdges)
      .groupBy("id").agg(min("rep").as("rep"))
    val dupIds = allEdges.select("id")
    val survivors = docs.join(dupIds,
      docs(idCol).cast("long") === dupIds("id"), "left_anti")
    Result(survivors, allEdges)
  }
}
