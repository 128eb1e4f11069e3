package graft.catalog

import java.io.{FileInputStream, FileWriter}
import java.util.{LinkedHashMap => JLinkedMap, Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.yaml.snakeyaml.{DumperOptions, Yaml}

/** One catalog table entry (reference pydala/catalog.py:87-95: path,
  * format, filesystem, write_args per table, grouped in namespaces).
  */
final case class TableEntry(
    namespace: String,
    name: String,
    path: String,
    format: String = "parquet",
    writeArgs: Map[String, String] = Map.empty,
    /** Hadoop FS settings for this table's storage (the reference's
      * per-table fsspec filesystem registration,
      * pydala/catalog.py:139-166) — e.g. fs.s3a endpoint/credentials.
      */
    fsConf: Map[String, String] = Map.empty) {
  def qualified: String = s"$namespace.$name"
  /** Temp-view-safe name (dots are not allowed in view names). */
  def viewName: String = s"${namespace}__$name"
}

/** YAML-driven table registry with namespaces and auto-registering SQL —
  * the Spark rendition of the reference Catalog
  * (pydala/catalog.py:23-557).
  *
  * `sql(q)` extracts referenced table names, lazily registers each as a
  * temp view over its source, then runs the query through Catalyst.
  */
final class Catalog(val spark: SparkSession, val yamlPath: String) {

  private var entries: Map[String, TableEntry] = load()
  private val registered = scala.collection.mutable.Set[String]()

  private def load(): Map[String, TableEntry] = {
    if (!new java.io.File(yamlPath).exists()) return Map.empty
    val yaml = new Yaml()
    val in = new FileInputStream(yamlPath)
    try {
      val root = Option(yaml.load[JMap[String, Object]](in)).getOrElse(
        new JLinkedMap[String, Object]())
      val tables = Option(root.get("tables")).map(_.asInstanceOf[JMap[String, Object]])
        .getOrElse(new JLinkedMap[String, Object]())
      tables.asScala.flatMap { case (ns, tsObj) =>
        tsObj.asInstanceOf[JMap[String, Object]].asScala.map { case (name, cfg) =>
          val m = cfg.asInstanceOf[JMap[String, Object]].asScala
          def strMap(key: String): Map[String, String] = m.get(key)
            .map(_.asInstanceOf[JMap[String, Object]].asScala
              .map { case (k, v) => k -> String.valueOf(v) }.toMap)
            .getOrElse(Map.empty[String, String])
          val e = TableEntry(ns, name,
            String.valueOf(m.getOrElse("path", "")),
            String.valueOf(m.getOrElse("format", "parquet")),
            strMap("write_args"), strMap("filesystem"))
          e.qualified -> e
        }
      }.toMap
    } finally in.close()
  }

  private def save(): Unit = {
    val root = new JLinkedMap[String, Object]()
    val tables = new JLinkedMap[String, Object]()
    entries.values.groupBy(_.namespace).toSeq.sortBy(_._1).foreach { case (ns, ts) =>
      val nsMap = new JLinkedMap[String, Object]()
      ts.toSeq.sortBy(_.name).foreach { t =>
        val m = new JLinkedMap[String, Object]()
        m.put("path", t.path)
        m.put("format", t.format)
        if (t.writeArgs.nonEmpty) {
          val wa = new JLinkedMap[String, Object]()
          t.writeArgs.foreach { case (k, v) => wa.put(k, v) }
          m.put("write_args", wa)
        }
        if (t.fsConf.nonEmpty) {
          val fc = new JLinkedMap[String, Object]()
          t.fsConf.foreach { case (k, v) => fc.put(k, v) }
          m.put("filesystem", fc)
        }
        nsMap.put(t.name, m)
      }
      tables.put(ns, nsMap)
    }
    root.put("tables", tables)
    val opts = new DumperOptions()
    opts.setDefaultFlowStyle(DumperOptions.FlowStyle.BLOCK)
    val w = new FileWriter(yamlPath)
    try new Yaml(opts).dump(root, w) finally w.close()
  }

  def tableNames: Seq[String] = entries.keys.toSeq.sorted

  def get(name: String): Option[TableEntry] =
    entries.get(name).orElse {
      // unqualified lookup if unambiguous
      val hits = entries.values.filter(_.name == name).toSeq
      if (hits.size == 1) Some(hits.head) else None
    }

  def schema(name: String) = loadTable(name).schema

  /** Eagerly load a table as a DataFrame. `includeFilePath` mirrors the
    * reference's include_file_path (pydala/catalog.py:344-363).
    */
  def loadTable(name: String, includeFilePath: Boolean = false): DataFrame = {
    val e = get(name).getOrElse(
      throw new IllegalArgumentException(s"unknown catalog table: $name"))
    // register the table's filesystem settings on the hadoop conf
    e.fsConf.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
    val df = e.format match {
      case "parquet" => spark.read.parquet(e.path)
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(e.path)
      case "json" => spark.read.json(e.path)
      case f => throw new IllegalArgumentException(s"unsupported format: $f")
    }
    if (includeFilePath) df.withColumn("file_path", input_file_name()) else df
  }

  /** Register a table as a temp view (idempotent). */
  def register(name: String): String = {
    val e = get(name).getOrElse(
      throw new IllegalArgumentException(s"unknown catalog table: $name"))
    if (!registered.contains(e.qualified)) {
      loadTable(e.qualified).createOrReplaceTempView(e.viewName)
      registered += e.qualified
    }
    e.viewName
  }

  /** Run SQL, auto-registering any referenced catalog tables first
    * (reference pydala/catalog.py:530-557). The query is PARSED and
    * relation identifiers are rewritten on the logical plan — a textual
    * regex would also rewrite matches inside string literals (e.g.
    * `WHERE status = 'orders'`); the reference uses a real SQL parser
    * (sqlglot) for the same reason. CTE names shadow catalog tables
    * naturally because only `UnresolvedRelation` nodes are touched and
    * CTE resolution wins during analysis.
    */
  def sql(query: String): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}
    val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parsePlan(query)
    // scope-aware rewrite: a CTE name shadows a catalog table only
    // INSIDE the WITH it is declared in (including expression
    // subqueries); a flat name set would skip catalog references in
    // disjoint scopes that merely share a name
    def rewrite(plan: LogicalPlan, scope: Set[String]): LogicalPlan = plan match {
      case w: UnresolvedWith =>
        // CTEs resolve in declaration order with no forward references:
        // definition i sees only definitions < i (plus itself under
        // WITH RECURSIVE); a flat all-names scope would wrongly shadow
        // a catalog table referenced by an EARLIER definition that a
        // LATER definition happens to be named after. The main child
        // sees every definition.
        var seen = scope
        val defs = w.cteRelations.map { case (n, sub, maxRec) =>
          val defScope = if (w.allowRecursion) seen + n.toLowerCase else seen
          val out = (n, rewrite(sub, defScope)
            .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias],
            maxRec)
          seen += n.toLowerCase
          out
        }
        w.copy(child = rewrite(w.child, seen), cteRelations = defs)
      case r: UnresolvedRelation =>
        val ident = r.multipartIdentifier.mkString(".")
        if (r.multipartIdentifier.size == 1 && scope.contains(ident.toLowerCase)) r
        else get(ident) match {
          case Some(e) =>
            register(e.qualified)
            r.copy(multipartIdentifier = Seq(e.viewName))
          case None => r
        }
      case other =>
        // recurse children first, then this node's OWN expression
        // subqueries (node-local, so inner scopes are not revisited)
        other.mapChildren(c => rewrite(c, scope))
          .mapExpressions(_.transformUp {
            case sub: SubqueryExpression => sub.withNewPlan(rewrite(sub.plan, scope))
          })
    }
    org.apache.spark.sql.graftshim.Bridge.ofRows(spark, rewrite(parsed, Set.empty))
  }

  def createTable(namespace: String, name: String, path: String,
                  format: String = "parquet",
                  writeArgs: Map[String, String] = Map.empty): TableEntry = {
    val e = TableEntry(namespace, name, path, format, writeArgs)
    entries += e.qualified -> e
    save()
    e
  }

  def deleteTable(name: String, vacuum: Boolean = false): Unit = {
    get(name).foreach { e =>
      entries -= e.qualified
      registered -= e.qualified
      spark.catalog.dropTempView(e.viewName)
      if (vacuum) graft.sources.FsUtil.deleteRecursively(e.path)
      save()
    }
  }

  /** Write a DataFrame to a table's storage with its persisted
    * write_args, registering the table if new.
    */
  def writeTable(name: String, df: DataFrame, mode: String = "append"): Unit = {
    val e = get(name).getOrElse(
      throw new IllegalArgumentException(s"unknown catalog table: $name"))
    val w = df.write.mode(mode)
      .option("compression", e.writeArgs.getOrElse("compression", "zstd"))
    val parts = e.writeArgs.get("partition_by").map(_.split(",").toSeq).getOrElse(Nil)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(e.path)
    if (registered.contains(e.qualified))
      loadTable(e.qualified).createOrReplaceTempView(e.viewName)
  }

  /** Reload the YAML from disk. */
  def refresh(): Unit = { entries = load() }
}

object Catalog {

  private val CteRe = """(?is)\bwith\s+(.*?)\bselect\b""".r
  private val NameRe = """(?i)\b(?:from|join)\s+([A-Za-z_][\w.]*)""".r

  /** Table names referenced by FROM/JOIN, minus CTE names — the
    * reference extracts these with sqlglot incl. CTE/subquery rules
    * (tests/test_sql_contract.py:112-135); a regex covers the same
    * grammar for FROM/JOIN/CTE shapes.
    */
  def referencedTables(sql: String): Seq[String] = {
    val cteNames: Set[String] =
      """(?i)(?:\bwith\s+|,\s*)([A-Za-z_]\w*)\s+as\s*\(""".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
    NameRe.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct
      .filterNot(n => cteNames.contains(n.toLowerCase))
  }
}
