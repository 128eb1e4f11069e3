package graft.tools

/** Dev-loop helper: print every SparkEntry query name (one `qname
  * <name>` line) without starting a SparkSession — the shard script
  * (tools/verify_shard.sh) partitions this list across parallel
  * Verify JVMs.
  */
object ListQueries {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(n => println(s"qname $n"))
}
