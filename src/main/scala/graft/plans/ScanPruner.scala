package graft.plans

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Conservative statistics-based file pruning — the reference's
  * `_prune_metadata_files` (pydala/helpers/metadata.py:127-266) as
  * Column expressions over the stats sidecar.
  *
  * Contract (pinned by the reference's tests/test_table.py:35-224):
  *  - only a top-level AND conjunction is split; atoms are
  *    `col op literal` with op ∈ {> >= < <= =};
  *  - `>`/`>=` test the row-group max (null-stat tolerant), `<`/`<=`
  *    the min, `=` the [min, max] envelope;
  *  - ANY unsupported construct ⇒ no pruning at all (keep every file);
  *  - atoms on hive partition columns are evaluated against the
  *    partition values parsed from the file path;
  *  - selected files return ALL their rows — scan() is file-level
  *    pruning, not row filtering.
  */
object ScanPruner {

  sealed trait Op
  case object Gt extends Op
  case object Ge extends Op
  case object Lt extends Op
  case object Le extends Op
  case object Eq extends Op

  final case class Atom(column: String, op: Op, value: Any, valueIsString: Boolean)

  /** Parse a SQL predicate into conjunctive atoms; None ⇒ unsupported
    * somewhere ⇒ caller keeps all files.
    */
  def parse(sql: String): Option[Seq[Atom]] = {
    val e = try {
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(sql)
    } catch { case _: Exception => return None }
    val conjuncts = split(e)
    val atoms = conjuncts.map(parseAtom)
    if (atoms.exists(_.isEmpty)) None else Some(atoms.flatten)
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case x => Seq(x)
  }

  private def flip(op: Op): Op = op match {
    case Gt => Lt; case Ge => Le; case Lt => Gt; case Le => Ge; case Eq => Eq
  }

  private def parseAtom(e: Expression): Option[Atom] = {
    def mk(attr: Expression, lit: Expression, op: Op): Option[Atom] = (attr, lit) match {
      case (a: UnresolvedAttribute, l: Literal) =>
        val isStr = l.dataType == StringType
        val v = l.value match {
          case u: UTF8String => u.toString
          case other => other
        }
        Some(Atom(a.nameParts.mkString("."), op, v, isStr))
      case _ => None
    }
    e match {
      case GreaterThan(a, l: Literal) => mk(a, l, Gt)
      case GreaterThanOrEqual(a, l: Literal) => mk(a, l, Ge)
      case LessThan(a, l: Literal) => mk(a, l, Lt)
      case LessThanOrEqual(a, l: Literal) => mk(a, l, Le)
      case EqualTo(a, l: Literal) => mk(a, l, Eq)
      case GreaterThan(l: Literal, a) => mk(a, l, Lt)
      case GreaterThanOrEqual(l: Literal, a) => mk(a, l, Le)
      case LessThan(l: Literal, a) => mk(a, l, Gt)
      case LessThanOrEqual(l: Literal, a) => mk(a, l, Ge)
      case EqualTo(l: Literal, a) => mk(a, l, Eq)
      case _ => None
    }
  }

  // ---- temporal literal parsing ('YYYY-MM-DD[ HH:MM[:SS[.ffffff]]]') ----

  private val DateRe = """^(\d{4})-(\d{2})-(\d{2})$""".r
  private val TsRe = """^(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2})(:(\d{2})(\.(\d{1,6}))?)?$""".r

  /** (epochMicros, epochDays) when the string is a temporal literal. */
  def parseTemporal(s: String): Option[(Long, Int)] = s match {
    case DateRe(_*) =>
      val d = LocalDate.parse(s)
      Some((d.toEpochDay * 86400000000L, d.toEpochDay.toInt))
    case TsRe(_*) =>
      val norm = s.replace(' ', 'T')
      val fmt = DateTimeFormatter.ISO_LOCAL_DATE_TIME
      val dt = LocalDateTime.parse(
        if (norm.count(_ == ':') == 1) norm + ":00" else norm, fmt)
      val micros = dt.toEpochSecond(ZoneOffset.UTC) * 1000000L + dt.getNano / 1000L
      Some((micros, (micros / 86400000000L).toInt))
    case _ => None
  }

  // ---- stats-row predicates (null-stat tolerant) --------------------

  private def numPred(op: Op, v: Double): Column = op match {
    case Gt => col("max_num") > v || col("max_num").isNull
    case Ge => col("max_num") >= v || col("max_num").isNull
    case Lt => col("min_num") < v || col("min_num").isNull
    case Le => col("min_num") <= v || col("min_num").isNull
    case Eq => (col("min_num") <= v || col("min_num").isNull) &&
      (col("max_num") >= v || col("max_num").isNull)
  }

  /** Exact-bigint lane predicate: integral columns (long/date/timestamp/
    * bool) compare in the int64 domain, never through double — the
    * double lane rounds past 2^53 and a rounded bound could prune a file
    * whose true envelope contains matches. Sidecars written before the
    * exact lanes existed have all-null `min_int`/`max_int`: those rows
    * FALL BACK to the double lane (exact below 2^53) rather than losing
    * pruning entirely.
    */
  private def lanePresent: Column =
    col("min_int").isNotNull || col("max_int").isNotNull

  private def intPred(op: Op, v: Long): Column = {
    val exact = op match {
      case Gt => col("max_int") > v
      case Ge => col("max_int") >= v
      case Lt => col("min_int") < v
      case Le => col("min_int") <= v
      case Eq => col("min_int") <= v && col("max_int") >= v
    }
    when(lanePresent, exact).otherwise(numPred(op, v.toDouble))
  }

  /** A fractional literal against an integral lane, translated to the
    * equivalent exact integer comparison (x > 10.5 ⟺ x ≥ 11). Bounds
    * come from the EXACT BigDecimal — rounding the literal to double
    * first can move it by up to an ulp and reintroduce the unsound
    * pruning the integer lanes exist to prevent.
    */
  private def fracIntPred(op: Op, v: java.math.BigDecimal): Column = {
    import java.math.RoundingMode
    val lo =
      try v.setScale(0, RoundingMode.FLOOR).longValueExact
      catch { case _: ArithmeticException => return lit(true) } // out of int64
    val hi =
      try v.setScale(0, RoundingMode.CEILING).longValueExact
      catch { case _: ArithmeticException => return lit(true) }
    op match {
      case Gt => if (lo == Long.MaxValue) lit(false) else intPred(Ge, lo + 1)
      case Ge => intPred(Ge, hi)
      case Lt => if (hi == Long.MinValue) lit(false) else intPred(Le, hi - 1)
      case Le => intPred(Le, lo)
      case Eq => lit(false) // no integer equals a strictly fractional value
    }
  }

  private val IntLanes = Seq("long", "date", "timestamp", "bool")

  private def integralValue(v: Any): Option[Long] = v match {
    case b: java.lang.Byte => Some(b.toLong)
    case s: java.lang.Short => Some(s.toLong)
    case i: java.lang.Integer => Some(i.toLong)
    case l: java.lang.Long => Some(l)
    case d: java.math.BigDecimal =>
      try if (d.stripTrailingZeros.scale <= 0) Some(d.longValueExact) else None
      catch { case _: ArithmeticException => None }
    case d: org.apache.spark.sql.types.Decimal => integralValue(d.toJavaBigDecimal)
    // integral-VALUED float literals (`1e1`, `10.0D`) must take the
    // integral path: fracIntPred's Eq would prune every file
    case d: java.lang.Double if java.lang.Double.isFinite(d) =>
      try integralValue(new java.math.BigDecimal(d.doubleValue()))
      catch { case _: NumberFormatException => None }
    case f: java.lang.Float if java.lang.Float.isFinite(f) =>
      integralValue(java.lang.Double.valueOf(f.doubleValue()))
    case _ => None
  }

  private def strPred(op: Op, v: String): Column = op match {
    case Gt => col("max_str") > v || col("max_str").isNull
    case Ge => col("max_str") >= v || col("max_str").isNull
    case Lt => col("min_str") < v || col("min_str").isNull
    case Le => col("min_str") <= v || col("min_str").isNull
    case Eq => (col("min_str") <= v || col("min_str").isNull) &&
      (col("max_str") >= v || col("max_str").isNull)
  }

  /** Stats-row predicate for an atom, dispatching on the row's `typ`.
    * Integral lanes always compare through `min_int`/`max_int` (exact
    * for the full int64 domain); the double lane serves float/double
    * columns, whose parquet stats are already exact doubles.
    */
  def statsPredicate(a: Atom): Column = a.value match {
    case s: String =>
      parseTemporal(s) match {
        case Some((micros, days)) =>
          when(col("typ") === "timestamp", intPred(a.op, micros))
            .when(col("typ") === "date", intPred(a.op, days))
            .otherwise(strPred(a.op, s))
        case None => strPred(a.op, s)
      }
    case b: Boolean =>
      when(col("typ").isin(IntLanes: _*), intPred(a.op, if (b) 1L else 0L))
        .otherwise(numPred(a.op, if (b) 1.0 else 0.0))
    case v =>
      integralValue(v) match {
        case Some(l) =>
          when(col("typ").isin(IntLanes: _*), intPred(a.op, l))
            .otherwise(numPred(a.op, l.toDouble))
        case None =>
          // strictly-fractional numeric literal: keep its EXACT decimal
          // value for the integral-lane floor/ceil translation
          val bd: Option[java.math.BigDecimal] = v match {
            case b: java.math.BigDecimal => Some(b)
            case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
            case d: java.lang.Double if java.lang.Double.isFinite(d) =>
              Some(new java.math.BigDecimal(d.doubleValue()))
            case f: java.lang.Float if java.lang.Float.isFinite(f) =>
              Some(new java.math.BigDecimal(f.doubleValue()))
            case _ => None
          }
          bd match {
            case Some(b) =>
              when(col("typ").isin(IntLanes: _*), fracIntPred(a.op, b))
                .otherwise(numPred(a.op, b.doubleValue()))
            case None => lit(true) // unknown literal kind: never prune on it
          }
      }
  }

  // ---- partition-value atoms ---------------------------------------

  /** key=value partition values parsed from a dataset-relative path. */
  def partitionValues(relPath: String): Map[String, String] =
    relPath.split("/").dropRight(1).toSeq.flatMap { seg =>
      val i = seg.indexOf('=')
      if (i > 0) Some(seg.substring(0, i) -> seg.substring(i + 1)) else None
    }.toMap

  /** Evaluate an atom against a partition value (numeric when both
    * sides parse, else lexicographic).
    */
  def evalPartition(a: Atom, value: String): Boolean = {
    val numericLit: Option[Double] = a.value match {
      case n: Number => Some(n.doubleValue())
      case s: String => s.toDoubleOption
      case b: Boolean => Some(if (b) 1.0 else 0.0)
      case _ => None
    }
    (numericLit, value.toDoubleOption) match {
      case (Some(l), Some(pv)) => cmp(a.op, pv.compareTo(l))
      case _ => cmp(a.op, value.compareTo(a.value.toString))
    }
  }

  private def cmp(op: Op, c: Int): Boolean = op match {
    case Gt => c > 0; case Ge => c >= 0; case Lt => c < 0; case Le => c <= 0; case Eq => c == 0
  }

  /** Select the dataset-relative files that may contain matching rows.
    *
    * `statsDF` is the sidecar (may be empty); `allRelFiles` is the
    * authoritative physical listing. Files without stats survive.
    * Returns None when the predicate cannot prune (keep all).
    */
  def selectFiles(statsDF: Option[DataFrame], allRelFiles: Seq[String],
                  filterSql: String): Option[Seq[String]] = {
    val atoms = parse(filterSql) match {
      case None => return None
      case Some(Nil) => return None
      case Some(as) => as
    }

    val statCols: Set[String] = statsDF
      .map(df => df.select("column").distinct().collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty)
    val partCols: Set[String] =
      allRelFiles.flatMap(f => partitionValues(f).keys).toSet

    // a column we know nothing about makes the whole predicate unsafe
    if (atoms.exists(a => !statCols.contains(a.column) && !partCols.contains(a.column)))
      return None

    // 1) partition-value pruning (driver-side: the file list is metadata)
    val afterPart = allRelFiles.filter { f =>
      val pv = partitionValues(f)
      atoms.forall { a =>
        pv.get(a.column) match {
          case Some(v) => evalPartition(a, v)
          case None => true
        }
      }
    }

    // 2) stats pruning: a row group survives iff every stats atom is
    // possibly-true; a file survives iff some row group survives
    val statAtoms = atoms.filter(a => statCols.contains(a.column))
    val survivors: Set[String] = statsDF match {
      case None => afterPart.toSet
      case Some(df) if statAtoms.isEmpty => afterPart.toSet
      case Some(df0) =>
        // sidecars written before the exact-bigint lanes existed: treat the
        // lanes as all-null (predicates fall back to "keep")
        val df = if (df0.columns.contains("min_int")) df0
          else df0.withColumn("min_int", lit(null).cast("long"))
            .withColumn("max_int", lit(null).cast("long"))
        var rg = df.select("file_path", "row_group").distinct()
        statAtoms.zipWithIndex.foreach { case (a, i) =>
          val ok = df.filter(col("column") === a.column)
            .select(col("file_path"), col("row_group"),
              statsPredicate(a).as(s"ok_$i"))
          rg = rg.join(ok, Seq("file_path", "row_group"), "left")
        }
        val allOk = statAtoms.indices
          .map(i => coalesce(col(s"ok_$i"), lit(true)))
          .reduce(_ && _)
        val withStats = rg.filter(allOk).select("file_path")
          .distinct().collect().map(_.getString(0)).toSet
        val statFiles = df.select("file_path").distinct()
          .collect().map(_.getString(0)).toSet
        // files unknown to the sidecar are kept (physical authoritative)
        afterPart.filter(f => withStats.contains(f) || !statFiles.contains(f)).toSet
    }
    Some(allRelFiles.filter(survivors.contains))
  }
}
