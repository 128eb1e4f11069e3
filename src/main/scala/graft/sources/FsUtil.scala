package graft.sources

import java.io.File
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Local-filesystem helpers for the dataset layer. Paths are plain
  * local paths (the driver environment); the same operations map to
  * Hadoop FileSystem calls on s3a/hdfs — the dataset layer only needs
  * list / delete / atomic-rename.
  */
object FsUtil {

  /** Recursive listing of data files, absolute paths, sorted. Sidecar
    * and temp dirs (`_`-prefixed) are skipped — physical data files
    * are authoritative (reference ADR 0001).
    */
  def listParquet(root: String): Seq[String] = {
    val base = Paths.get(stripScheme(root))
    if (!Files.exists(base)) return Nil
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walk(p: Path): Unit = {
      val entries = Files.list(p).iterator().asScala.toSeq
      entries.foreach { e =>
        val n = e.getFileName.toString
        if (Files.isDirectory(e)) { if (!n.startsWith("_") && !n.startsWith(".")) walk(e) }
        else if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
          out += e.toString
      }
    }
    walk(base)
    out.sorted.toSeq
  }

  /** Dataset-relative form of an absolute or URI file path. */
  def relativize(root: String, file: String): String = {
    val r = stripScheme(root).stripSuffix("/")
    val f = stripScheme(file)
    if (f.startsWith(r + "/")) f.substring(r.length + 1) else f
  }

  def stripScheme(p: String): String =
    if (p.startsWith("file:")) {
      // file:/x, file:///x and URL-encoded forms all normalize to /x
      try new java.net.URI(p).getPath
      catch { case _: Exception => p.stripPrefix("file:").dropWhile(_ == '/').prepended('/') }
    } else p

  def delete(root: String, files: Seq[String]): Unit =
    files.foreach(f => Files.deleteIfExists(Paths.get(stripScheme(f))))

  def deleteRecursively(path: String): Unit = {
    val p = Paths.get(stripScheme(path))
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  /** Move every data file under `srcDir` into `dstDir`, preserving
    * relative (partition) subpaths. Per-file rename is atomic on a
    * local/HDFS filesystem; directory creation is idempotent.
    */
  def promote(srcDir: String, dstDir: String): Seq[String] = {
    val moved = listParquet(srcDir).map { f =>
      val rel = relativize(srcDir, f)
      val dst = Paths.get(stripScheme(dstDir), rel)
      Files.createDirectories(dst.getParent)
      Files.move(Paths.get(f), dst, StandardCopyOption.ATOMIC_MOVE)
      dst.toString
    }
    deleteRecursively(srcDir)
    moved
  }

  def exists(p: String): Boolean = Files.exists(Paths.get(stripScheme(p)))
}
