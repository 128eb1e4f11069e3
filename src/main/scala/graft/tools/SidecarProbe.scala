package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.StatsSidecar

/** Dev probe for the sidecar-update fixed cost (round-10, verdict
  * #3): times `StatsSidecar.update` on a small dataset under the fast
  * (driver-side) path and under the distributed reconcile path
  * (forced via -Dgraft.sidecar.small.files=0), isolating the per-call
  * fixed overhead that the round-9 lifecycle bench cluster paid on
  * every write. Results go to docs/BENCH_NOTES_r10.md.
  *
  * Usage: SidecarProbe <nFiles> <reps>
  */
object SidecarProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args(0).toInt
    val reps = args(1).toInt
    val spark = SparkSession.builder()
      .appName("graft-sidecar-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sidecar_probe").toString
    (0 until nFiles).foreach { i =>
      (1 to 200).map(j => (i * 1000L + j, s"v$j", j * 1.5))
        .toDF("k", "v", "x").coalesce(1).write.mode("append").parquet(dir)
    }
    def time(tag: String): Unit = {
      StatsSidecar.update(spark, dir) // warm (bootstraps the sidecar)
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        StatsSidecar.update(spark, dir)
        (System.nanoTime() - t0) / 1e6
      }
      println(f"sidecar-update $tag files=$nFiles reps=$reps " +
        f"minMs=${walls.min}%.0f medMs=${walls.sorted.apply(reps / 2)}%.0f")
    }
    // force each path regardless of the shipped thresholds — the
    // round-11 sweep measures BOTH paths at 256..2048 files to set the
    // crossover from data instead of a chosen constant
    sys.props("graft.sidecar.small.files") = (nFiles + 1).toString
    sys.props("graft.sidecar.small.bytes") = Long.MaxValue.toString
    time("fast-path")
    sys.props("graft.sidecar.small.files") = "0"
    time("distributed")
    sys.props.remove("graft.sidecar.small.files")
    sys.props.remove("graft.sidecar.small.bytes")
    graft.sources.FsUtil.deleteRecursively(dir)
    spark.stop()
  }
}
