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

  /** The exact sorted canonical lines the hash is computed over —
    * exposed (round-9) so Verify can persist them as
    * `_canon_rows.txt.gz`: a hash proves single-valuedness but cannot
    * localize a driver mismatch; the dumped lines turn the next red
    * cell into a row/column diff. Collects — artifact outputs are
    * result-sized by contract, never corpus-sized.
    */
  def lines(df: DataFrame): Array[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => cols.indices.map(i => render(r.get(i))).mkString("\u0001"))
      .sorted
  }

  def hashOfLines(ls: Array[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    ls.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Canonical SHA-256 of a DataFrame's values. */
  def of(df: DataFrame): String = hashOfLines(lines(df))

  /** The result-column type families CanonSeamSpec adversarially
    * round-trips through the full dump seam (Spark render → parquet →
    * read-back → DuckDB comparator). This list and the spec's row
    * fixtures move TOGETHER — round-10, verdict #7.
    */
  val CoveredFamilies: Set[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Set(LongType, IntegerType, ShortType, BooleanType, DoubleType,
      StringType, DateType, TimestampType, TimestampNTZType)
  }

  /** Fail LOUDLY if `schema` carries a type family the seam spec does
    * not cover (round-10, verdict #7): the r6–r8 red cells were a
    * rendering seam on a family nobody had pinned (HUGEINT via the
    * comparator); a new family (decimal, array output, …) must extend
    * CanonSeamSpec BEFORE it can ship through Verify, not after the
    * driver flags it.
    */
  def assertSeamCovered(name: String,
                        schema: org.apache.spark.sql.types.StructType): Unit = {
    val uncovered = schema.fields.filterNot(f => CoveredFamilies(f.dataType))
    require(uncovered.isEmpty,
      s"$name: result schema contains type families the canonical-seam " +
        s"spec does not cover: ${uncovered.map(f => s"${f.name}:${f.dataType.simpleString}")
          .mkString(", ")} — extend CanonSeamSpec (and CoveredFamilies) " +
        "with adversarial fixtures for the new family first")
  }
}
