package graft.core

import org.apache.spark.sql.{DataFrame, Row}

/** Canonical value hashing for Verify's per-query `_canon_sha256`
  * artifact (the round-7 q294 driver-flake answer): columns sorted by
  * name, rows sorted by stringified values, SHA-256 over the line
  * set. Mirrors the driver-compare canonicalization closely enough
  * for RUN-TO-RUN self-comparison — never compared cross-engine.
  *
  * Rendering is binary-safe and collection-safe: `Array[Byte]`
  * hex-encodes (its toString is JVM identity — run-unstable), arrays
  * and seqs render element-wise, maps render entry-sorted (Spark map
  * iteration order is not canonical), nested rows recurse. Scalars
  * keep the round-7 `SimpleName<sep>value` form (U+0001 separator) so historical hashes
  * stay comparable.
  */
object CanonHash {

  def render(v: Any): String = v match {
    case null => "\u0000null"
    case b: Array[Byte] => "bin\u0001" + b.map("%02x".format(_)).mkString
    case a: Array[_] => "arr\u0001" + a.map(render).mkString("[", ",", "]")
    case sq: scala.collection.Seq[_] =>
      "arr\u0001" + sq.map(render).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      "map\u0001" + m.map { case (k, x) => render(k) + "=" + render(x) }
        .toSeq.sorted.mkString("{", ",", "}")
    case r: Row => "row\u0001" + r.toSeq.map(render).mkString("(", ",", ")")
    case other => s"${other.getClass.getSimpleName}\u0001$other"
  }

  /** Canonical SHA-256 of a DataFrame's values (collects — artifact
    * outputs are result-sized by contract, never corpus-sized).
    */
  def of(df: DataFrame): String = {
    val cols = df.columns.sorted
    val lines = df
      .select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => cols.indices.map(i => render(r.get(i))).mkString("\u0001"))
      .sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }
}
