package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Second relational inventory slice: set operations, cube/grouping
  * sets, string & math scalar functions, subqueries (scalar / EXISTS /
  * IN) via the SQL passthrough surface, and conditional aggregation.
  * Same determinism contract as [[Relational]].
  */
object Relational2 {

  private def dec(name: String, p: Int, s: Int): Column =
    col(name).cast(DecimalType(p, s))

  /** Register the tables a spark.sql passthrough query needs. */
  private def reg(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => Tables.load(s, d, n).createOrReplaceTempView(n))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // INTERSECT (distinct semantics on both engines).
    "q36_intersect" -> { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // EXCEPT (distinct semantics).
    "q37_except" -> { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // CUBE over two dimensions.
    "q38_cube" -> { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // String scalar functions.
    "q39_string_funcs" -> { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        reverse(col("p_brand")).as("rev_brand"),
        instr(col("p_name"), "a").cast("int").as("first_a"),
        substring(col("p_name"), 3, 5).as("mid"),
        concat_ws("/", col("p_brand"), col("p_type")).as("joined"))
        .orderBy("p_partkey")
    },

    // Math scalar functions on exact types.
    "q40_math_funcs" -> { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        (col("p_partkey") % 7).as("m7"),
        abs(col("p_size") - 25).as("dist25"),
        floor(dec("p_retailprice", 12, 2)).cast("long").as("price_floor"),
        ceil(dec("p_retailprice", 12, 2)).cast("long").as("price_ceil"),
        greatest(col("p_size"), lit(10)).as("size_min10"),
        least(col("p_size"), lit(40)).as("size_max40"),
        pow(lit(2.0), (col("p_size") % 10).cast("double")).as("pow2"))
        .orderBy("p_partkey")
    },

    // Scalar subquery via the SQL passthrough surface: orders above
    // the global average price (average = exact decimal sum / count).
    "q41_scalar_subquery" -> { (s, d) =>
      reg(s, d, "orders")
      s.sql(
        """SELECT o_orderkey, o_totalprice
          |FROM orders
          |WHERE o_totalprice > (
          |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
          |  FROM orders)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // Correlated EXISTS (decorrelated by Catalyst).
    "q42_exists_subquery" -> { (s, d) =>
      reg(s, d, "nation", "supplier")
      s.sql(
        """SELECT n_nationkey, n_name
          |FROM nation
          |WHERE EXISTS (
          |  SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey AND s_acctbal > 9000)
          |ORDER BY n_nationkey""".stripMargin)
    },

    // GROUPING SETS via SQL.
    "q43_grouping_sets" -> { (s, d) =>
      reg(s, d, "orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    },

    // Conditional aggregation (CASE inside aggregates).
    "q44_conditional_agg" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_totalprice") > 200000, 1).otherwise(0)).cast("long").as("n_big"),
          sum(when(col("o_totalprice") <= 200000, 1).otherwise(0)).cast("long").as("n_small"),
          sum(when(col("o_totalprice") > 200000, dec("o_totalprice", 14, 2)))
            .cast("double").as("big_total"))
        .orderBy("o_orderstatus")
    },

    // Interval/range join: follow-up orders by the same customer
    // within 7 days. The equi key (custkey) makes this a hash join
    // with a range residual; pure point-in-interval joins without an
    // equi key go through graft.operators.RangeJoin's bucketing.
    "q51_range_join" -> { (s, d) =>
      val o1 = Tables.orders(s, d).select(
        col("o_orderkey").as("k1"), col("o_custkey").as("c1"),
        col("o_orderdate").as("d1"))
      val o2 = Tables.orders(s, d).select(
        col("o_orderkey").as("k2"), col("o_custkey").as("c2"),
        col("o_orderdate").as("d2"))
      o1.join(o2,
          col("c1") === col("c2") && col("d2") > col("d1") &&
            col("d2") <= col("d1") + expr("INTERVAL 7 DAYS"))
        .groupBy(col("k1").as("o_orderkey"))
        .agg(count(lit(1)).as("n_followups"))
        .orderBy("o_orderkey")
    },

    // Exact percentiles: both engines interpolate
    // lo + (hi - lo) * frac over the sorted doubles — identical op
    // sequence ⇒ identical bits.
    "q55_percentiles" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"),
          min("o_totalprice").as("lo"),
          max("o_totalprice").as("hi"))
        .orderBy("o_orderstatus")
    },

    // Array access parity on the embeddings table (no arithmetic:
    // stored floats compare bit-exactly).
    "q45_array_access" -> { (s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first"),
        element_at(col("embedding"), 64).cast("double").as("last"))
        .orderBy("vec_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "q36_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q37_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q38_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q39_string_funcs" ->
      """SELECT p_partkey,
        | lpad(p_brand, 12, '*') AS padded,
        | regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
        | reverse(p_brand) AS rev_brand,
        | CAST(instr(p_name, 'a') AS INTEGER) AS first_a,
        | substring(p_name, 3, 5) AS mid,
        | concat_ws('/', p_brand, p_type) AS joined
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q40_math_funcs" ->
      """SELECT p_partkey,
        | p_partkey % 7 AS m7,
        | abs(p_size - 25) AS dist25,
        | CAST(floor(CAST(p_retailprice AS DECIMAL(12,2))) AS BIGINT) AS price_floor,
        | CAST(ceil(CAST(p_retailprice AS DECIMAL(12,2))) AS BIGINT) AS price_ceil,
        | greatest(p_size, 10) AS size_min10,
        | least(p_size, 40) AS size_max40,
        | pow(2.0, CAST(p_size % 10 AS DOUBLE)) AS pow2
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q41_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q42_exists_subquery" ->
      """SELECT n_nationkey, n_name
        |FROM nation
        |WHERE EXISTS (
        |  SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey AND s_acctbal > 9000)
        |ORDER BY n_nationkey""".stripMargin,

    "q43_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q44_conditional_agg" ->
      """SELECT o_orderstatus,
        | CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        | CAST(SUM(CASE WHEN o_totalprice <= 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
        | CAST(SUM(CASE WHEN o_totalprice > 200000 THEN CAST(o_totalprice AS DECIMAL(14,2)) END) AS DOUBLE) AS big_total
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q51_range_join" ->
      """SELECT o1.o_orderkey, COUNT(*) AS n_followups
        |FROM orders o1 JOIN orders o2
        |  ON o1.o_custkey = o2.o_custkey
        | AND o2.o_orderdate > o1.o_orderdate
        | AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 7 DAY
        |GROUP BY o1.o_orderkey
        |ORDER BY o1.o_orderkey""".stripMargin,

    "q55_percentiles" ->
      """SELECT o_orderstatus,
        | quantile_cont(o_totalprice, 0.5) AS p50,
        | quantile_cont(o_totalprice, 0.9) AS p90,
        | min(o_totalprice) AS lo,
        | max(o_totalprice) AS hi
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q45_array_access" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS INTEGER) AS dim,
        | CAST(embedding[1] AS DOUBLE) AS first,
        | CAST(embedding[64] AS DOUBLE) AS last
        |FROM embeddings ORDER BY vec_id""".stripMargin
  )
}
