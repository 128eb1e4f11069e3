package graft

import org.apache.spark.sql.types._
import graft.functions.SchemaOps
import graft.operators.Merge
import graft.sources.ParquetDataset

/** Algebraic laws the dataset layer relies on (SURVEY §5). The type
  * lattice is small, so the laws are checked EXHAUSTIVELY over it —
  * stronger than sampling.
  */
class LawsSpec extends SparkSpecBase {

  import spark.implicits._

  private val allTypes: Seq[DataType] = Seq(
    NullType, ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, StringType, BooleanType, TimestampType, DateType)

  private val ladder: Seq[DataType] = Seq(
    NullType, ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, StringType)

  test("promote is idempotent, commutative, null-identity (exhaustive)") {
    for (a <- allTypes; b <- allTypes) {
      assert(SchemaOps.promote(a, a) == a, s"idempotence for $a")
      assert(SchemaOps.promote(a, b) == SchemaOps.promote(b, a), s"commutativity $a,$b")
    }
    allTypes.foreach(a => assert(SchemaOps.promote(NullType, a) == a))
  }

  test("promote is associative on the full ladder (exhaustive triples)") {
    for (a <- ladder; b <- ladder; c <- ladder)
      assert(SchemaOps.promote(SchemaOps.promote(a, b), c) ==
        SchemaOps.promote(a, SchemaOps.promote(b, c)), s"associativity $a,$b,$c")
  }

  test("unify is order-insensitive on field types (exhaustive pairs)") {
    for (t1 <- ladder; t2 <- ladder) {
      val s1 = StructType(Seq(StructField("a", t1), StructField("b", t2)))
      val s2 = StructType(Seq(StructField("b", t2), StructField("a", t1)))
      val u12 = SchemaOps.unify(Seq(s1, s2))
      val u21 = SchemaOps.unify(Seq(s2, s1))
      assert(u12.fields.map(f => f.name -> f.dataType).toMap ==
        u21.fields.map(f => f.name -> f.dataType).toMap)
    }
  }

  test("merge upsert is idempotent: same source twice == once") {
    val dir = tmpDir("law-upsert")
    val ds = new ParquetDataset(spark, dir)
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val src = Seq((2, "B"), (9, "i")).toDF("id", "v")
    Merge(ds, src, Seq("id"), "upsert")
    val once = ds.df.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val r2 = Merge(ds, src, Seq("id"), "upsert")
    val twice = ds.df.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(once == twice)
    assert(r2.inserted == 0) // second pass inserts nothing new
  }

  test("merge insert then insert of the same source is a no-op") {
    val dir = tmpDir("law-insert")
    val ds = new ParquetDataset(spark, dir)
    Seq((1, "a")).toDF("id", "v").coalesce(1).write.mode("append").parquet(dir)
    val src = Seq((5, "e"), (6, "f")).toDF("id", "v")
    Merge(ds, src, Seq("id"), "insert")
    val r2 = Merge(ds, src, Seq("id"), "insert")
    assert(r2.inserted == 0)
    assert(ds.df.count() == 3)
  }

  test("scan pruning is sound on randomized data and predicates") {
    // soundness law: for ANY supported predicate, scan(p).filter(p)
    // returns exactly the rows df.filter(p) returns — pruning may keep
    // extra files but must never drop a matching row. Randomized files
    // (overlapping ranges, negatives, bigints past 2^53, strings, nulls)
    // hunt the class of bug exact-lane pruning exists to prevent.
    val rnd = new scala.util.Random(7)
    val dir = tmpDir("law-prune")
    val big = 1L << 61
    (1 to 6).foreach { _ =>
      val base = rnd.nextInt(2000) - 1000
      val rows = (1 to 40).map { i =>
        val v = base + rnd.nextInt(300)
        val b = big + base * 1000L + rnd.nextInt(500)
        val s = if (rnd.nextBoolean()) s"k${rnd.nextInt(50)}" else s"m${rnd.nextInt(50)}"
        (v, b, if (rnd.nextInt(10) == 0) null else s, rnd.nextDouble() * 100 - 50)
      }
      rows.toDF("v", "b", "s", "d").coalesce(1).write.mode("append").parquet(dir)
    }
    val ds = new ParquetDataset(spark, dir)
    ds.updateStats()
    val preds = Seq(
      s"v > ${rnd.nextInt(600) - 300}", s"v <= ${rnd.nextInt(600) - 300}",
      s"v = ${rnd.nextInt(600) - 300}", s"v >= -100 AND v < 200",
      s"b > ${big - 500000}", s"b <= ${big + 200000}", s"b = ${big + 123}",
      "s > 'k20'", "s <= 'm25'", "s = 'k7'",
      "d > 0.5", "d <= -10.25", "v > 100 AND s < 'm0'")
    preds.foreach { p =>
      val expected = ds.df.filter(p).count()
      val got = ds.scan(p).filter(p).count()
      assert(got == expected, s"pruning dropped rows for [$p]: $got != $expected")
    }
  }
}
