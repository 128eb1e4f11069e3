package graft.functions

/** Dialect-paired SQL fragment builders for the DuckDB-oracle gate.
  *
  * The driver compares Spark results to DuckDB by hashing EXACT values,
  * floats included. For float pipelines (cosine similarity, quality
  * scores) we get bit-exactness by generating BOTH engines' SQL from
  * one template so each performs the exact same *sequence* of IEEE-754
  * operations: identical fold order, identical literal placement.
  * Every double op (+, *, /, sqrt) is correctly rounded per IEEE-754,
  * so an identical op sequence yields identical bits.
  *
  * Hashes are portable too: engine-native hash functions differ
  * (murmur3 vs DuckDB's), so both sides derive 60-bit integers from
  * the first 15 hex chars of md5 — positive in a signed 64-bit lane on
  * both engines.
  *
  * Reference behavior being reproduced: text dedup/fingerprinting ops
  * extend pydala2's dedup machinery (reference `pydala/io.py:242-259`,
  * `pydala/dataset.py:1549-1777`) to the document-pipeline domain.
  */
final case class SqlDialect(spark: Boolean) {

  /** 60-bit portable hash: decimal value of md5's first 15 hex chars.
    * The Spark side calls the codegen'd native expression (identical
    * value, no hex-string round-trip — see
    * [[graft.functions.PortableHash64]]); DuckDB parses the hex.
    */
  /** The q84/q100 split bucket: portable hash of the salted doc id,
    * mod 100.
    */
  def splitBucket: String = s"${hash64("concat('split:', doc_id)")} % 100"

  def hash64(e: String): String =
    if (spark) s"portable_hash64($e)"
    else s"CAST(('0x' || substr(md5($e),1,15)) AS BIGINT)"

  /** 60-bit lane of an already-computed md5 HEX STRING, starting at
    * 1-based hex offset `off` (an SQL expression evaluating to 1 or
    * 16) — one digest carries two independent lanes, halving md5
    * calls on hot paths.
    */
  def hash64At(md5Hex: String, off: String): String =
    if (spark) s"cast(conv(substr($md5Hex,$off,15),16,10) as bigint)"
    else s"CAST(('0x' || substr($md5Hex,$off,15)) AS BIGINT)"

  /** Integer division. */
  def intDiv(a: String, b: String): String =
    if (spark) s"($a div $b)" else s"($a // $b)"

  /** Cast into the 128-bit-capable integer lane — Spark DECIMAL(38,0),
    * DuckDB HUGEINT. Pair with [[intDiv]] for exact wide division
    * (never DECIMAL-divide on DuckDB: its DECIMAL `//` rounds), and
    * surface to float only through [[wideToDouble]].
    */
  def wide(e: String): String =
    if (spark) s"CAST($e AS DECIMAL(38,0))" else s"CAST($e AS HUGEINT)"

  /** Whitespace tokens of a string column, empties dropped. */
  def tokens(c: String): String =
    if (spark) s"filter(split(trim($c), '\\\\s+'), t -> t != '')"
    else s"list_filter(regexp_split_to_array(trim($c), '\\s+'), t -> t != '')"

  def transform(l: String, v: String, body: String): String =
    if (spark) s"transform($l, $v -> $body)"
    else s"list_transform($l, $v -> $body)"

  def filterL(l: String, v: String, pred: String): String =
    if (spark) s"filter($l, $v -> $pred)"
    else s"list_filter($l, $v -> $pred)"

  /** Left fold with explicit init — the sequential-order guarantee. */
  def fold(l: String, init: String, acc: String, x: String, body: String): String =
    if (spark) s"aggregate($l, $init, ($acc, $x) -> $body)"
    else s"list_reduce(list_prepend($init, $l), ($acc, $x) -> $body)"

  /** Inclusive integer range [a, b]. Callers must guarantee b >= a
    * (Spark's sequence() counts DOWN when b < a; DuckDB's range() is
    * empty — guard with a CASE at the call site).
    */
  def rangeIncl(a: String, b: String): String =
    if (spark) s"sequence($a, $b)" else s"range(($a)::BIGINT, ($b)::BIGINT + 1)"

  /** Inclusive stepped range [a, a+step, ... ≤ b]; b >= a required. */
  def rangeStep(a: String, b: String, step: String): String =
    if (spark) s"sequence($a, $b, $step)"
    else s"range(($a)::BIGINT, ($b)::BIGINT + 1, $step)"

  def size(l: String): String = if (spark) s"size($l)" else s"len($l)"

  def arrMin(l: String): String = if (spark) s"array_min($l)" else s"list_min($l)"

  /** 1-based slice of n elements starting at `start`. */
  def slice(l: String, start: String, n: String): String =
    if (spark) s"slice($l, $start, $n)"
    else s"($l)[($start):(($start)+($n)-1)]"

  /** Join array elements as strings (casts elements on the Spark side —
    * concat_ws wants array<string>; DuckDB's array_to_string casts).
    */
  def strJoin(l: String, sep: String): String =
    if (spark) s"concat_ws('$sep', transform($l, _v -> cast(_v as string)))"
    else s"array_to_string($l, '$sep')"

  def arrDistinct(l: String): String =
    if (spark) s"array_distinct($l)" else s"list_distinct($l)"

  def arrIntersect(a: String, b: String): String =
    if (spark) s"array_intersect($a, $b)" else s"list_intersect($a, $b)"

  def emptyStrArray: String =
    if (spark) "cast(array() as array<string>)" else "[]::VARCHAR[]"

  def shiftRight(e: String, i: String): String =
    if (spark) s"shiftright($e, $i)" else s"(($e) >> ($i))"

  def shiftLeft(e: String, i: String): String =
    if (spark) s"shiftleft($e, $i)" else s"(($e) << ($i))"

  def bxor(a: String, b: String): String =
    if (spark) s"($a ^ $b)" else s"xor($a, $b)"   // DuckDB's ^ is POWER

  def bitCount(e: String): String = s"bit_count($e)"

  def longLit(v: Long): String =
    if (spark) s"cast($v as bigint)" else s"$v::BIGINT"

  def dblZero: String = if (spark) "cast(0 as double)" else "0.0::DOUBLE"

  /** Replace ALL occurrences (DuckDB needs the 'g' flag). */
  def regexReplaceAll(e: String, pat: String, rep: String): String =
    if (spark) s"regexp_replace($e, '$pat', '$rep')"
    else s"regexp_replace($e, '$pat', '$rep', 'g')"

  def regexExtractAll(e: String, pat: String): String =
    if (spark) s"regexp_extract_all($e, '$pat', 0)"
    else s"regexp_extract_all($e, '$pat')"

  /** 1-based element access. */
  def idx(l: String, i: String): String =
    if (spark) s"element_at($l, $i)" else s"list_extract($l, $i)"

  def toDbl(e: String): String = s"CAST($e AS DOUBLE)"

  /** Portable wide-integer→DOUBLE for NON-NEGATIVE DECIMAL(38,0) /
    * HUGEINT lanes. DuckDB's HUGEINT→DOUBLE cast is NOT correctly
    * rounded above 2⁶⁴ (it splits into 64-bit halves and rounds
    * twice — ~11% of integers in [2⁶⁴, 2⁶⁶) convert differently from
    * the JVM's correctly-rounded BigDecimal cast), so `CAST(wide AS
    * DOUBLE)` silently breaks bit-exactness exactly where the wide
    * lanes matter. The one conversion both engines agree on is
    * BIGINT→DOUBLE: values < 2⁶² take it directly (exact-int cast,
    * correctly rounded once on both engines); wider values floor-
    * scale by a power of two FIRST (exact integer division on both
    * engines), convert as BIGINT, and rescale by an exactly-
    * representable power-of-two double. The result is deterministic
    * and engine-identical at every magnitude; above 2⁶² it is the
    * true value quantized to 2⁴⁰ (2⁸⁰ above 2¹⁰²) — at those
    * magnitudes double precision itself is coarser or comparable.
    */
  def wideToDouble(e: String): String = {
    val t1 = "4611686018427387904" // 2^62
    val d1 = "1099511627776" // 2^40
    val t2 = "5070602400912917605986812821504" // 2^102
    val d2 = "1208925819614629174706176" // 2^80
    s"CASE WHEN ($e) < $t1 THEN CAST(CAST(($e) AS BIGINT) AS DOUBLE) " +
      s"WHEN ($e) < $t2 THEN " +
      s"CAST(CAST(${intDiv(s"($e)", d1)} AS BIGINT) AS DOUBLE) * " +
      s"CAST($d1 AS DOUBLE) " +
      s"ELSE CAST(CAST(${intDiv(s"($e)", d2)} AS BIGINT) AS DOUBLE) * " +
      s"CAST($d2 AS DOUBLE) END"
  }

  // ---- composite fragments ----------------------------------------

  /** k-token shingles joined by single spaces; empty when < k tokens. */
  def shingles(toks: String, k: Int): String = {
    val body =
      if (spark) s"concat_ws(' ', ${slice(toks, "i", k.toString)})"
      else s"array_to_string(${slice(toks, "i", k.toString)}, ' ')"
    s"CASE WHEN ${size(toks)} < $k THEN $emptyStrArray ELSE " +
      transform(rangeIncl("1", s"${size(toks)} - ${k - 1}"), "i", body) + " END"
  }

  /** Sequential-fold dot product of two float arrays, in double. */
  def dot(a: String, b: String): String =
    if (spark)
      s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), $dblZero, (acc, v) -> acc + v)"
    else
      s"list_reduce(list_prepend($dblZero, list_transform(list_zip($a, $b), s -> (s[1]::DOUBLE) * (s[2]::DOUBLE))), (acc, v) -> acc + v)"

  /** Sequential-fold squared L2 norm of a float array, in double. */
  def norm2(a: String): String =
    fold(transform(a, "x", if (spark) "cast(x as double) * cast(x as double)" else "(x::DOUBLE) * (x::DOUBLE)"),
      dblZero, "acc", "v", "acc + v")

  /** Cosine similarity — one division of two identically-derived doubles. */
  def cosine(a: String, b: String): String =
    s"(${dot(a, b)}) / (sqrt(${norm2(a)}) * sqrt(${norm2(b)}))"

  /** Sequential-fold squared L2 distance of two float arrays, in double. */
  def sqdist(a: String, b: String): String =
    if (spark)
      s"aggregate(zip_with($a, $b, (x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), $dblZero, (acc, v) -> acc + v)"
    else
      s"list_reduce(list_prepend($dblZero, list_transform(list_zip($a, $b), s -> ((s[1]::DOUBLE) - (s[2]::DOUBLE)) * ((s[1]::DOUBLE) - (s[2]::DOUBLE)))), (acc, v) -> acc + v)"
}

object PortableSql {
  val Spark = SqlDialect(spark = true)
  val Duck  = SqlDialect(spark = false)

  /** Two-sided interpolated-quantile formula over the rank-window
    * bounds `lo`/`hi` at position `(n-1)·p` — the ONE op sequence that
    * bit-matches DuckDB's `quantile_cont` (the naive `lo + (hi-lo)·f`
    * does not; see q55). Every exact-quantile query (q55, q85, q92,
    * q100) must use this builder so the load-bearing sequence lives in
    * one place.
    */
  def interpQuantile(p: String, lo: String, hi: String, n: String): String = {
    val ps = s"($n - 1) * CAST($p AS DOUBLE)"
    s"CASE WHEN $lo = $hi THEN $lo ELSE " +
      s"$lo * (ceil($ps) - $ps) + $hi * ($ps - floor($ps)) END"
  }

  /** Rank position `(n-1)·p` (the argument quantile bounds are taken
    * at the floor/ceil of).
    */
  def quantilePos(p: String, n: String): String =
    s"($n - 1) * CAST($p AS DOUBLE)"

  /** Deterministic 90/5/5 split over the portable-hash bucket `hk`
    * (identical text on both engines — q84 and q100 must agree).
    */
  val SplitCase: String =
    "CASE WHEN hk < 90 THEN 'train' WHEN hk < 95 THEN 'val' ELSE 'test' END"
}
