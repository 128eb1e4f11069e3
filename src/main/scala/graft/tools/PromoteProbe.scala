package graft.tools

import java.nio.file.{Files, Paths}

import graft.sources.FsUtil

/** Dev probe for the staged-promote wall (round-10, verdict #2): a
  * 100 TB compaction wave stages 10⁴–10⁵ files, and promote was a
  * serial driver loop. Creates N staged files (with partition
  * subdirs), promotes them under the given thread count, prints the
  * wall. Local-FS renames are ~free, so the probe's degraded mode
  * (copy+delete of `bytes`-sized payloads) is the object-store-shaped
  * cost model; results go to docs/SCALE.md.
  *
  * Usage: PromoteProbe <nFiles> <threads> <bytesPerFile> [degraded]
  *                      [latencyMs]
  * `latencyMs` injects a per-move sleep (graft.fs.rename.latencyMs)
  * modeling object-store per-op latency — the regime the thread pool
  * exists for.
  */
object PromoteProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val threads = args(1).toInt
    val bytes = args(2).toInt
    val degraded = args.length > 3 && args(3) == "degraded"
    val root = Files.createTempDirectory("promote_probe").toString
    val src = s"$root/_staged"
    val dst = s"$root/data"
    val payload = Array.fill[Byte](bytes)(7)
    (0 until n).foreach { i =>
      val p = Paths.get(src, s"part=${i % 16}", f"f$i%06d.parquet")
      Files.createDirectories(p.getParent)
      Files.write(p, payload)
    }
    if (degraded) sys.props("graft.fs.rename") = "degraded"
    if (args.length > 4) sys.props("graft.fs.rename.latencyMs") = args(4)
    // threads=0 exercises the shipped mode-aware default (round-11)
    if (threads > 0) sys.props("graft.fs.promote.threads") = threads.toString
    else sys.props.remove("graft.fs.promote.threads")
    val t0 = System.nanoTime()
    val moved = FsUtil.promote(src, dst)
    val ms = (System.nanoTime() - t0) / 1e6
    require(moved.size == n, s"expected $n moved, got ${moved.size}")
    println(f"promote n=$n threads=$threads bytes=$bytes " +
      f"degraded=$degraded wallMs=$ms%.1f")
    FsUtil.deleteRecursively(root)
  }
}
