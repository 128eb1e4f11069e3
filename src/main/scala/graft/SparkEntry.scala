package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, CorpusOps, Events, Lifecycle, MultimodalOps, PipelineOps, Relational, Relational2, StreamOps, TextOps, VectorOps}
import graft.queries.{Analytics2, Analytics3, Analytics4, Analytics5, Analytics6, Analytics7, Analytics8, Analytics9, Analytics10}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (one per implemented operator from
  * SURVEY.md §2) to `(spark, sfDir) => DataFrame`; `oracleSql` holds the
  * equivalent DuckDB SQL over the same parquet tables. Column names and
  * row ordering match exactly on both sides (the driver's compare hashes
  * name-sorted columns).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_local_supplier_volume")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Events.queries ++
      TextOps.queries ++ VectorOps.queries ++ MultimodalOps.queries ++
      PipelineOps.queries ++ Lifecycle.queries ++ StreamOps.queries ++
      CorpusOps.queries ++ Analytics.queries ++ Analytics2.queries ++
      Analytics3.queries ++ Analytics4.queries ++ Analytics5.queries ++
      Analytics6.queries ++ Analytics7.queries ++ Analytics8.queries ++
      Analytics9.queries ++ Analytics10.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Events.oracles ++
      TextOps.oracles ++ VectorOps.oracles ++ MultimodalOps.oracles ++
      PipelineOps.oracles ++ Lifecycle.oracles ++ StreamOps.oracles ++
      CorpusOps.oracles ++ Analytics.oracles ++ Analytics2.oracles ++
      Analytics3.oracles ++ Analytics4.oracles ++ Analytics5.oracles ++
      Analytics6.oracles ++ Analytics7.oracles ++ Analytics8.oracles ++
      Analytics9.oracles ++ Analytics10.oracles

  /** Dev-loop selection shared by Bench and Verify: each
    * SPARK_GRAFT_ONLY element matches a query by its id prefix
    * ("q121") or its full name ("q121_bloom_contamination") — never
    * by bare startsWith, which would over-match (q12 → q120-q126).
    */
  def selectQueries(only: Option[Set[String]])
      : Map[String, (SparkSession, String) => DataFrame] =
    queries.filter { case (name, _) =>
      only.forall(_.exists(sel =>
        sel == name || sel == name.takeWhile(_ != '_')))
    }
}
