package graft.functions

/** Human-readable sizes and counts (reference
  * pydala/helpers/misc.py:118-180).
  */
object Humanize {

  private val units = Seq("B", "KB", "MB", "GB", "TB", "PB")

  /** 1536 → "1.5 KB" (binary steps of 1024, one decimal). */
  def bytes(n: Long): String = {
    if (n < 1024) return s"$n B"
    var v = n.toDouble
    var u = 0
    while (v >= 1024 && u < units.size - 1) { v /= 1024; u += 1 }
    f"$v%.1f ${units(u)}"
  }

  /** "1.5 KB" → bytes (inverse, case-insensitive, tolerant spacing). */
  def parseBytes(s: String): Long = {
    val m = """(?i)^\s*([0-9.]+)\s*([KMGTP]?B?)\s*$""".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"bad size: $s"))
    val mult = m.group(2).toUpperCase.headOption match {
      case Some('K') => 1L << 10
      case Some('M') => 1L << 20
      case Some('G') => 1L << 30
      case Some('T') => 1L << 40
      case Some('P') => 1L << 50
      case _ => 1L
    }
    (m.group(1).toDouble * mult).toLong
  }

  /** 1234567 → "1.2M" style count. */
  def count(n: Long): String =
    if (n < 1000) n.toString
    else if (n < 1000000) f"${n / 1000.0}%.1fK"
    else if (n < 1000000000) f"${n / 1000000.0}%.1fM"
    else f"${n / 1000000000.0}%.1fB"
}
