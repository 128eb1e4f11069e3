package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Relational query inventory (scan/filter/project/join/agg/window/sort/
  * set-ops) over the TPC-H-ish test tables — the Spark side of the
  * DuckDB-oracle correctness gate.
  *
  * Numeric determinism contract: any aggregated DOUBLE is first cast to
  * a tight DECIMAL, aggregated exactly (decimal arithmetic is
  * associative, so Spark's partial aggregation order and DuckDB's scan
  * order produce the same rational number), and only the final result is
  * cast back to DOUBLE. Averages are computed as exact-decimal-sum →
  * double → divide by count, one deterministic float op. Every query
  * ends in a total ORDER BY so row order is reproducible too.
  */
object Relational {

  private def dec(name: String, p: Int, s: Int): Column =
    col(name).cast(DecimalType(p, s))

  /** Literal 1 as a tight DECIMAL(5,4): an int literal would widen to
    * DECIMAL(10,0), pushing (price * (1-disc)) * (1+tax) past precision
    * 38 and triggering Spark's precision-loss rounding — which then
    * disagrees with DuckDB's exact arithmetic by one ulp after the
    * double cast.
    */
  private def one: Column = lit(BigDecimal(1)).cast(DecimalType(5, 4))

  /** l_extendedprice * (1 - l_discount), exact decimal (20,6). */
  private def discPrice: Column =
    dec("l_extendedprice", 12, 2) * (one - dec("l_discount", 6, 4))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full-scan aggregation with grouped sums/averages (TPC-H Q1 shape).
    // All sums except sum_charge aggregate SCALED BIGINTs (cents /
    // basis points): the decimal cast recovers the exact 2/4-decimal
    // value, ×100/×10000 keeps it integral, and Spark's long sum is a
    // codegen'd primitive — a DECIMAL(p>18) sum buffer is a boxed
    // BigDecimal and dominated this query's runtime. sum_disc_price
    // exceeds 2^53, so both engines rebuild the double from a hi/lo
    // integer split (every operand exact, then an identical rounded
    // multiply-add). sum_charge would overflow int64 (scale-10 rows ×
    // 600k) and stays on the exact-decimal path.
    "q01_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
        .withColumn("qi", expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .withColumn("epi", expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .withColumn("di", expr("CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT)"))
        .withColumn("ti", expr("CAST(CAST(l_tax AS DECIMAL(6,4)) * 10000 AS BIGINT)"))
        .withColumn("dpi", expr("epi * (10000 - di)"))
        // per-row scale-10 charge ≤ 6e15: fits int64; its SUM does
        // not, so hi/lo parts are summed separately (each < 2^53)
        .withColumn("ci", expr("epi * (10000 - di) * (10000 + ti)"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("qi").as("sq"),
          sum("epi").as("sbp"),
          sum("dpi").as("sdp"),
          sum(expr("ci div 100000000")).as("chi"),
          sum(expr("ci % 100000000")).as("clo"),
          sum("di").as("sd"),
          count(lit(1)).as("count_order"))
        .selectExpr("l_returnflag", "l_linestatus",
          "CAST(sq AS DOUBLE) / 100.0 AS sum_qty",
          "CAST(sbp AS DOUBLE) / 100.0 AS sum_base_price",
          "(CAST(sdp div 1000000 AS DOUBLE) * 1000000.0 + CAST(sdp % 1000000 AS DOUBLE)) / 1000000.0 AS sum_disc_price",
          "(CAST(chi AS DOUBLE) * 100000000.0 + CAST(clo AS DOUBLE)) / 10000000000.0 AS sum_charge",
          "CAST(sq AS DOUBLE) / 100.0 / count_order AS avg_qty",
          "CAST(sbp AS DOUBLE) / 100.0 / count_order AS avg_price",
          "CAST(sd AS DOUBLE) / 10000.0 / count_order AS avg_disc",
          "count_order")
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Selective filter + projection; predicate/column pushdown to parquet.
    "q02_filter_project" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 30 && col("l_discount") >= 0.05)
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
          "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // 3-way join + grouped revenue + top-k (TPC-H Q3 shape).
    "q03_join_agg_topk" -> { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
    },

    // Broadcast dimension join + agg by brand.
    "q04_broadcast_join_agg" -> { (s, d) =>
      // scaled-int sums (see q01): per-row discounted price fits
      // int64 at scale 6; revenue sums past 2^53, so hi/lo parts are
      // summed separately and the double is rebuilt from exact parts
      Tables.lineitem(s, d)
        .withColumn("qi", expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .withColumn("dpi", expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * " +
          "(10000 - CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT))"))
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          sum("qi").as("sq"),
          sum(expr("dpi div 1000000")).as("rhi"),
          sum(expr("dpi % 1000000")).as("rlo"))
        .selectExpr("p_brand", "n_items",
          "CAST(sq AS DOUBLE) / 100.0 AS sum_qty",
          "(CAST(rhi AS DOUBLE) * 1000000.0 + CAST(rlo AS DOUBLE)) / 1000000.0 AS revenue")
        .orderBy("p_brand")
    },

    // 6-way star join, revenue per nation (TPC-H Q5 shape).
    "q05_local_supplier_volume" -> { (s, d) =>
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
        .withColumn("dpi", expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * " +
          "(10000 - CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT))"))
      val su = Tables.supplier(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(expr("dpi div 1000000")).as("rhi"),
          sum(expr("dpi % 1000000")).as("rlo"))
        .selectExpr("n_name",
          "(CAST(rhi AS DOUBLE) * 1000000.0 + CAST(rlo AS DOUBLE)) / 1000000.0 AS revenue")
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Highly selective single-row aggregate (TPC-H Q6 shape).
    "q06_forecast_revenue" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
            col("l_discount") >= 0.04 && col("l_discount") <= 0.08 &&
            col("l_quantity") < 25)
        .agg(sum(dec("l_extendedprice", 12, 2) * dec("l_discount", 6, 4))
          .cast("double").as("revenue"))
    },

    // Window: top-3 orders per customer by price (row_number).
    "q07_window_topn" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },

    // Sort + limit top-k.
    "q11_topk_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    },

    // Distinct over a projection.
    "q10_distinct_segments" -> { (s, d) =>
      Tables.customer(s, d)
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    },

    // Left-semi join (EXISTS).
    "q12_semi_join" -> { (s, d) =>
      val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      Tables.customer(s, d)
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // Left-anti join (NOT EXISTS) — the reference's `delta` operator
    // shape (pydala/io.py:364-379).
    "q13_anti_join" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Union-distinct of two projections.
    "q14_union_nations" -> { (s, d) =>
      val a = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val b = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      a.union(b).distinct().orderBy("nationkey")
    },

    // COUNT(DISTINCT) per group.
    "q15_count_distinct" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    },

    // GROUP BY + HAVING.
    "q16_having" -> { (s, d) =>
      Tables.part(s, d)
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_parts"),
          sum(dec("p_retailprice", 12, 2)).cast("double").as("total_price"))
        .filter(col("n_parts") >= 5)
        .orderBy("p_brand")
    },

    // Scalar string functions + CASE WHEN.
    "q17_case_string" -> { (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 10)).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          when(col("p_size") < 10, "small")
            .when(col("p_size") < 30, "medium")
            .otherwise("large").as("size_class"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey")
    },

    // Date-part derivation (the reference's datepart partition columns,
    // pydala/io.py:261-320).
    "q18_dateparts" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("wk"),
          weekday(col("o_orderdate")).as("wd"))
        .orderBy("o_orderkey")
    },

    // ROLLUP grouping sets.
    "q19_rollup" -> { (s, d) =>
      // rollup takes functions.col Columns, not the String overload: the
      // String form goes through Dataset.col, whose dataset-id metadata
      // trips Spark's ambiguous-self-join detector on the Expand copies
      // of the grouping attributes after a join.
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },

    // Window aggregate as correlated-subquery replacement:
    // parts priced above their brand average.
    "q20_above_brand_avg" -> { (s, d) =>
      val w = Window.partitionBy("p_brand")
      Tables.part(s, d)
        .withColumn("brand_avg",
          sum(dec("p_retailprice", 12, 2)).over(w).cast("double") /
            count(lit(1)).over(w))
        .filter(col("p_retailprice") > col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice", "brand_avg")
        .orderBy("p_partkey")
    },

    // The reference's own quick-start query, routed through the
    // managed-dataset layer (ParquetDataset → SQL-string filter via
    // Sanitize → Table sort-spec parsing) instead of raw
    // spark.read — so the dataset API itself sits in the oracle gate.
    // Mirrors /root/reference/README.md:64-75.
    "q61_dataset_api" -> { (s, d) =>
      val ds = new graft.sources.ParquetDataset(s, s"$d/lineitem.parquet")
      graft.sources.Table(ds.filter("l_returnflag IN ('A', 'R') AND l_quantity > 45"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .sort("l_orderkey, l_linenumber")
        .df
    }
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qi,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS epi,
        |    CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT) AS di,
        |    CAST(CAST(l_tax AS DECIMAL(6,4)) * 10000 AS BIGINT) AS ti
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'),
        |r2 AS (
        |  SELECT l_returnflag, l_linestatus, qi, epi, di,
        |    epi * (10000 - di) AS dpi,
        |    epi * (10000 - di) * (10000 + ti) AS ci
        |  FROM r),
        |a AS (
        |  SELECT l_returnflag, l_linestatus,
        |    SUM(qi) AS sq, SUM(epi) AS sbp, SUM(dpi) AS sdp,
        |    SUM(ci // 100000000) AS chi, SUM(ci % 100000000) AS clo,
        |    SUM(di) AS sd, COUNT(*) AS count_order
        |  FROM r2 GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus,
        | CAST(sq AS DOUBLE) / 100.0 AS sum_qty,
        | CAST(sbp AS DOUBLE) / 100.0 AS sum_base_price,
        | (CAST(sdp // 1000000 AS DOUBLE) * 1000000.0 + CAST(sdp % 1000000 AS DOUBLE)) / 1000000.0 AS sum_disc_price,
        | (CAST(chi AS DOUBLE) * 100000000.0 + CAST(clo AS DOUBLE)) / 10000000000.0 AS sum_charge,
        | CAST(sq AS DOUBLE) / 100.0 / count_order AS avg_qty,
        | CAST(sbp AS DOUBLE) / 100.0 / count_order AS avg_price,
        | CAST(sd AS DOUBLE) / 10000.0 / count_order AS avg_disc,
        | count_order
        |FROM a
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity >= 30 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_agg_topk" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q04_broadcast_join_agg" ->
      """WITH r AS (
        |  SELECT l_partkey,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qi,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
        |      (10000 - CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT)) AS dpi
        |  FROM lineitem),
        |a AS (
        |  SELECT p_brand, COUNT(*) AS n_items, SUM(qi) AS sq,
        |    SUM(dpi // 1000000) AS rhi, SUM(dpi % 1000000) AS rlo
        |  FROM r JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand)
        |SELECT p_brand, n_items,
        | CAST(sq AS DOUBLE) / 100.0 AS sum_qty,
        | (CAST(rhi AS DOUBLE) * 1000000.0 + CAST(rlo AS DOUBLE)) / 1000000.0 AS revenue
        |FROM a
        |ORDER BY p_brand""".stripMargin,

    "q05_local_supplier_volume" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
        |      (10000 - CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT)) AS dpi
        |  FROM lineitem),
        |a AS (
        |  SELECT n_name,
        |    SUM(dpi // 1000000) AS rhi, SUM(dpi % 1000000) AS rlo
        |  FROM li
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY n_name)
        |SELECT n_name,
        | (CAST(rhi AS DOUBLE) * 1000000.0 + CAST(rlo AS DOUBLE)) / 1000000.0 AS revenue
        |FROM a
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.04 AND l_discount <= 0.08
        |  AND l_quantity < 25""".stripMargin,

    "q07_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q11_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q10_distinct_segments" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "q12_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q13_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q14_union_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q15_count_distinct" ->
      """SELECT o_orderstatus,
        | COUNT(DISTINCT o_custkey) AS n_customers,
        | COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q16_having" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        | CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM part
        |GROUP BY p_brand
        |HAVING COUNT(*) >= 5
        |ORDER BY p_brand""".stripMargin,

    "q17_case_string" ->
      """SELECT p_partkey,
        | upper(substring(p_name, 1, 10)) AS name_prefix,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | CASE WHEN p_size < 10 THEN 'small'
        |      WHEN p_size < 30 THEN 'medium'
        |      ELSE 'large' END AS size_class,
        | p_brand || ':' || p_type AS brand_type
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q18_dateparts" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS y,
        | CAST(quarter(o_orderdate) AS INTEGER) AS q,
        | CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        | CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        | CAST(weekofyear(o_orderdate) AS INTEGER) AS wk,
        | CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q19_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_rows
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q20_above_brand_avg" ->
      """SELECT p_partkey, p_brand, p_retailprice, brand_avg FROM (
        |  SELECT p_partkey, p_brand, p_retailprice,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) OVER (PARTITION BY p_brand) AS DOUBLE)
        |      / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
        |  FROM part) t
        |WHERE p_retailprice > brand_avg
        |ORDER BY p_partkey""".stripMargin,

    "q61_dataset_api" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R') AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
