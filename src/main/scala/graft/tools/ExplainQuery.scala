package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the formatted physical plan of one or more gated
  * queries — the explain-driven loop ("is this the plan you'd want at
  * 100 TB": pushed filters, pruned scans, broadcast vs shuffle sides,
  * whole-stage codegen spans) without hand-writing a scratch main per
  * query.
  *
  * Usage: ExplainQuery <sfDir> <name>[,<name>...]
  * Names match by the SparkEntry id-prefix rule (q544 → q544_...).
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .appName("graft-explain")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val qs = graft.SparkEntry.queries
    for (n <- names; (name, fn) <- qs if name.startsWith(n)) {
      println(s"==== $name")
      // NOTE: side-effecting gates (managed writes/merges) run their
      // setup — explain is of the RETURNED frame
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
