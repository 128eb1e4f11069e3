package graft

import org.apache.spark.sql.functions._
import graft.operators.{Delete, Maintenance, Merge}
import graft.sources.{ParquetDataset, WriteConfig}

/** The ParquetDataset resolved-schema memo (round-12, verdict #2):
  * `df` must plan with the remembered schema AND every mutating path
  * must invalidate it — a stale memo would read evolved columns as
  * all-null instead of failing, the exact bug class the Tables.load
  * memo guard exists for.
  */
class ParquetDatasetSchemaSpec extends SparkSpecBase {

  import spark.implicits._

  test("df memoizes the resolved schema and write() invalidates it") {
    val dir = tmpDir("pds-memo")
    val ds = new ParquetDataset(spark, dir)
    ds.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), WriteConfig())
    val sc1 = ds.df.schema
    assert(sc1.fieldNames.toSeq == Seq("id", "s"))
    // schema-evolving append: a NEW column arrives. The contract is
    // not which footer inference picks (mergeSchema is off) but that
    // the memoized instance NEVER diverges from what a fresh resolve
    // of the same path would return.
    ds.write(Seq((3L, "c", 9L)).toDF("id", "s", "extra"), WriteConfig())
    val fresh = new ParquetDataset(spark, dir).df.schema
    assert(ds.df.schema == fresh,
      "write() must drop the memoized schema — a stale memo diverges " +
        "from a fresh resolve after an evolving append")
  }

  test("merge and delete leave the memo consistent with the files") {
    val dir = tmpDir("pds-memo-ops")
    val ds = new ParquetDataset(spark, dir)
    ds.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), WriteConfig())
    ds.df.count() // populate the memo
    val r = Merge(ds, Seq((2L, 21L), (3L, 30L)).toDF("k", "v"),
      Seq("k"), "upsert")
    assert(r.updated == 1 && r.inserted == 1)
    assert(ds.df.orderBy("k").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 21L), (3L, 30L)))
    val d = Delete.where(ds, "v >= 30")
    assert(d.deleted == 1)
    assert(ds.df.count() == 2)
  }

  test("maintenance rewrites invalidate the memo (dtype narrowing)") {
    val dir = tmpDir("pds-memo-maint")
    val ds = new ParquetDataset(spark, dir)
    ds.write(Seq((1L, 100L), (2L, 200L)).toDF("id", "v"), WriteConfig())
    ds.df.count() // populate the memo with (id: long, v: long)
    val plan = Maintenance.optimizeDtypes(ds)
    assert(plan.changes.nonEmpty, "the long columns should narrow")
    // a stale memo would supply LongType over SMALLINT-backed files
    val sc = ds.df.schema
    assert(sc("v").dataType != org.apache.spark.sql.types.LongType,
      s"memo must reflect the narrowed schema, got ${sc("v").dataType}")
    assert(ds.df.orderBy("id").select(col("v").cast("long"))
      .as[Long].collect().toSeq == Seq(100L, 200L))
  }
}
