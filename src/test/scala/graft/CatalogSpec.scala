package graft

import java.nio.file.{Files, Paths}

import graft.catalog.Catalog

/** Pins the catalog contract (reference pydala/catalog.py,
  * tests/test_sql_contract.py:112-135 table-name extraction).
  */
class CatalogSpec extends SparkSpecBase {

  import spark.implicits._

  test("referencedTables: FROM/JOIN incl. CTE exclusion") {
    assert(Catalog.referencedTables("SELECT * FROM a JOIN b ON a.x = b.x")
      == Seq("a", "b"))
    assert(Catalog.referencedTables(
      "WITH t AS (SELECT * FROM real1) SELECT * FROM t JOIN real2 USING (x)")
      == Seq("real1", "real2"))
    assert(Catalog.referencedTables("SELECT * FROM ns.tbl") == Seq("ns.tbl"))
  }

  private def mkCatalog(): Catalog = {
    val dataDir = tmpDir("catdata")
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.parquet(s"$dataDir/t1")
    Seq((1, 10.0), (2, 20.0)).toDF("id", "w").write.parquet(s"$dataDir/t2")
    val yml = tmpDir("cat") + "/catalog.yaml"
    Files.writeString(Paths.get(yml),
      s"""tables:
         |  main:
         |    t1:
         |      path: $dataDir/t1
         |      format: parquet
         |    t2:
         |      path: $dataDir/t2
         |      format: parquet
         |""".stripMargin)
    new Catalog(spark, yml)
  }

  test("yaml load + sql auto-registration + join across tables") {
    val cat = mkCatalog()
    assert(cat.tableNames == Seq("main.t1", "main.t2"))
    val out = cat.sql(
      "SELECT t1.id, v, w FROM main.t1 t1 JOIN main.t2 t2 ON t1.id = t2.id ORDER BY t1.id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1, "a", 10.0), (2, "b", 20.0)))
  }

  test("table names inside string literals are not rewritten") {
    // plan-level identifier rewrite: a textual regex would corrupt the
    // literal 't1' (and the alias-named column) into the view name
    val cat = mkCatalog()
    val out = cat.sql("SELECT id, v FROM main.t1 WHERE v <> 't1' ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "a"), (2, "b")))
    // CTE named like a catalog table shadows it
    val cte = cat.sql(
      "WITH t1 AS (SELECT 99 AS id) SELECT id FROM t1")
      .collect().map(_.getInt(0))
    assert(cte.toSeq == Seq(99))
    // ...including CTEs declared INSIDE expression subqueries
    val sub = cat.sql(
      "SELECT id FROM main.t1 WHERE id IN " +
        "(WITH t2 AS (SELECT 1 AS id) SELECT id FROM t2)")
      .collect().map(_.getInt(0))
    assert(sub.toSeq == Seq(1))
    // ...and the shadowing is SCOPED: the outer t1 (no CTE in scope)
    // still resolves to the catalog table while the inner one is the CTE
    val scoped = cat.sql(
      "SELECT id FROM t1 WHERE id IN " +
        "(WITH t1 AS (SELECT 2 AS id) SELECT id FROM t1)")
      .collect().map(_.getInt(0))
    assert(scoped.toSeq == Seq(2))
  }

  test("CTE scope is declaration-ordered: no forward shadowing") {
    // `a` is declared BEFORE the CTE named t1, so the t1 it references
    // is the catalog table (Spark resolves CTEs in order with no
    // forward references); only the main child sees the CTE
    val cat = mkCatalog()
    val out = cat.sql(
      "WITH a AS (SELECT id FROM t1), t1 AS (SELECT 99 AS id) " +
        "SELECT (SELECT count(*) FROM a) AS na, (SELECT max(id) FROM t1) AS m")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq == Seq((2L, 99)))
    // a LATER definition referencing an EARLIER one still sees the CTE
    val chained = cat.sql(
      "WITH b AS (SELECT 7 AS id), c AS (SELECT id + 1 AS id FROM b) " +
        "SELECT id FROM c").collect().map(_.getInt(0))
    assert(chained.toSeq == Seq(8))
  }

  test("recursive CTE: self-reference is never rewritten, catalog tables inside are") {
    // a catalog table named like the CTE must NOT capture the
    // recursive self-reference — while the same recursive term still
    // resolves OTHER catalog names; this is the allowRecursion branch
    // of the scope builder
    val cat = mkCatalog()
    val dataDir = tmpDir("catrec")
    Seq((1, "x")).toDF("id", "v").write.parquet(s"$dataDir/tree")
    cat.createTable("main", "tree", s"$dataDir/tree")
    val out = cat.sql(
      """WITH RECURSIVE tree(n) AS (
        |  SELECT 1 UNION ALL
        |  SELECT n + id FROM tree JOIN main.t1 ON id = 1 WHERE n < 4
        |)
        |SELECT SUM(n) AS s FROM tree""".stripMargin)
      .collect()
    // 1+2+3+4 = 10: recursion ran over the CTE, not the 1-row
    // catalog table named `tree`
    assert(out.head.getLong(0) == 10L)
  }

  test("unqualified names resolve when unambiguous") {
    val cat = mkCatalog()
    assert(cat.loadTable("t1").count() == 2)
    assert(cat.schema("t2").fieldNames.toSeq == Seq("id", "w"))
  }

  test("create/delete table round-trips through the YAML") {
    val cat = mkCatalog()
    val dir = tmpDir("catnew")
    Seq((5, "z")).toDF("id", "v").write.parquet(s"$dir/t3")
    cat.createTable("main", "t3", s"$dir/t3")
    val reloaded = new Catalog(spark, cat.yamlPath)
    assert(reloaded.tableNames.contains("main.t3"))
    assert(reloaded.sql("SELECT count(*) AS n FROM main.t3").collect()(0).getLong(0) == 1)
    reloaded.deleteTable("main.t3")
    assert(!new Catalog(spark, cat.yamlPath).tableNames.contains("main.t3"))
  }

  test("writeTable applies persisted write_args") {
    val cat = mkCatalog()
    val dir = tmpDir("catw")
    cat.createTable("main", "t4", s"$dir/t4",
      writeArgs = Map("partition_by" -> "v"))
    cat.writeTable("main.t4", Seq((1, "x"), (2, "y")).toDF("id", "v"))
    val files = graft.sources.FsUtil.listParquet(s"$dir/t4")
    assert(files.forall(f => f.contains("v=x") || f.contains("v=y")))
  }
}
