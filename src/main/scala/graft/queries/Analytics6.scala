package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-8 analytics inventory. Same determinism contract as
  * [[Analytics]]–[[Analytics5]]: integer lanes end-to-end, ANSI
  * zero-denominator guards mirrored on both engines, floats only
  * through shared fixed-op-order texts over exact sums.
  *
  * Reference behavior: pydala2 exposes none of these — they extend
  * the training-data-pipeline stack (SURVEY.md "beyond the
  * reference").
  */
object Analytics6 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DeltaAgg MIN/MAX maintenance (the IVM case with no group
    // inverse): state built over pre-1997 shipments, then one mixed
    // batch — retract every 13th orderkey's rows (which includes
    // group extrema: the bounded-recompute path) and insert every 3rd
    // 1997+ row. The oracle recomputes min/max directly over the
    // updated row set, so the gate pins merge ≡ recompute end-to-end
    // INCLUDING the key-bounded base re-aggregation of
    // extremum-touched groups (DeltaAgg.mergeMinMax: safe groups
    // merge from state ⊕ Δ alone; unsafe groups re-aggregate through
    // a left-semi join on their keys — never an O(|base|) rescan).
    // NULL lane: every 7th orderkey ships a NULL value, so n_vals,
    // NULL-retraction no-ops, and all-NULL extremum semantics ride
    // the same gate.
    "q471_delta_minmax" -> { (s, d) =>
      val l = Tables.lineitem(s, d).select(
        expr("CAST(l_partkey % 500 AS BIGINT)").as("g"),
        expr("CASE WHEN l_orderkey % 7 = 0 THEN NULL " +
          "ELSE CAST(l_quantity AS BIGINT) END").as("v"),
        col("l_shipdate"), col("l_orderkey"))
      val base = l.filter(expr("l_shipdate < TIMESTAMP '1997-01-01'"))
      val dels = base.filter(expr("l_orderkey % 13 = 0"))
        .withColumn("op", lit(-1))
      val ins = l.filter(expr(
          "l_shipdate >= TIMESTAMP '1997-01-01' AND l_orderkey % 3 = 0"))
        .withColumn("op", lit(1))
      val updated = base.filter(expr("l_orderkey % 13 <> 0"))
        .unionByName(ins.drop("op"))
      graft.operators.DeltaAgg.mergeMinMax(
          graft.operators.DeltaAgg.fromBaseMinMax(base, Seq("g"), "v"),
          dels.unionByName(ins), Seq("g"), "v", "op")(
          updated.select("g", "v"))
        .orderBy("g")
    })

  val oracles: Map[String, String] = Map(

    "q471_delta_minmax" ->
      """WITH upd AS (
        |  SELECT CAST(l_partkey % 500 AS BIGINT) AS g,
        |    CASE WHEN l_orderkey % 7 = 0 THEN NULL
        |      ELSE CAST(l_quantity AS BIGINT) END AS v
        |  FROM lineitem
        |  WHERE (l_shipdate < TIMESTAMP '1997-01-01' AND l_orderkey % 13 <> 0)
        |     OR (l_shipdate >= TIMESTAMP '1997-01-01' AND l_orderkey % 3 = 0))
        |SELECT g, COUNT(*) AS n_rows, COUNT(v) AS n_vals,
        |  MIN(v) AS min_v, MAX(v) AS max_v
        |FROM upd GROUP BY g ORDER BY g""".stripMargin)
}
