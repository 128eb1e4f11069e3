package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Time-series / event-log query inventory over the `events` table:
  * running windows, lag/delta, sessionization, tumbling time buckets,
  * JSON extraction. All timestamps are compared at microsecond
  * precision (see [[graft.core.Tables]] for the nanos handling).
  */
object Events {

  private def dec(name: String, p: Int, s: Int): Column =
    col(name).cast(DecimalType(p, s))

  /** (user_id, event_id, event_type, tsu, session_id) — the 30-min-gap
    * sessionization (gap-and-island over integer microseconds), shared
    * by q21, the concurrency sweep q104, and the transition matrix
    * q155 (the only consumer of event_type — column pruning drops it
    * from the others' plans); its oracle twin is [[duckSessionCtes]].
    */
  private def sessionized(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("tsu"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("tsu", expr("unix_micros(ts)"))
      .withColumn("prev", lag("tsu", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev").isNull || col("tsu") - col("prev") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(run))
      .select("user_id", "event_id", "event_type", "tsu", "session_id")
  }

  /** Shared oracle text: e → flagged → g session CTEs (q21, q104, q155). */
  private val duckSessionCtes: String =
    """e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS tsu FROM events
      |), flagged AS (
      |  SELECT user_id, event_id, event_type, tsu,
      |    CASE WHEN LAG(tsu) OVER w IS NULL OR tsu - LAG(tsu) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
      |), g AS (
      |  SELECT user_id, event_id, event_type, tsu,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged
      |)""".stripMargin

  /** clicks (user_id, event_id, tsu) and purchases deduped to one row
    * per (user, instant) — the shared operands of the as-of family
    * (q50, q105, q106); oracle twin [[duckClickPurchCtes]].
    */
  private def clicksAndPurchases(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val e = Tables.events(s, d).withColumn("tsu", expr("unix_micros(ts)"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("tsu"))
    val purch = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("tsu").as("ptsu"))
      .agg(max("event_id").as("pid"))
      .select("user_id", "pid", "ptsu")
    (clicks, purch)
  }

  /** Shared oracle text: e → clicks → purch CTEs (q50, q105, q106). */
  private val duckClickPurchCtes: String =
    """e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS tsu FROM events
      |), clicks AS (
      |  SELECT user_id, event_id, tsu FROM e WHERE event_type = 'click'
      |), purch AS (
      |  SELECT user_id, tsu AS ptsu, MAX(event_id) AS pid FROM e
      |  WHERE event_type = 'purchase' GROUP BY user_id, tsu
      |)""".stripMargin

  /** Two-proportion z-test pieces — identical formula TEXT on both
    * engines over exact integer counts, so every double op is the
    * same IEEE-754 sequence (the moment-statistics convention).
    */
  private val AbRate0F =
    "CASE WHEN n0 = 0 THEN NULL ELSE CAST(c0 AS DOUBLE) / n0 END"
  private val AbRate1F =
    "CASE WHEN n1 = 0 THEN NULL ELSE CAST(c1 AS DOUBLE) / n1 END"
  private val AbPoolF = "(CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))"
  private val AbZF = // 1/n spelled via a DOUBLE cast: a bare 1.0
    // literal is DECIMAL in DuckDB and would divide decimal-wise.
    // Degenerate guards are INTEGER predicates (empty arm, pooled
    // rate 0 or 1 → variance 0): Spark-4 ANSI raises DIVIDE_BY_ZERO
    // even for DOUBLE/0 while DuckDB yields NULL — the CASE makes
    // both engines return NULL.
    "CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1 " +
      "THEN NULL ELSE " +
      s"(($AbRate1F) - ($AbRate0F)) / sqrt(($AbPoolF) * (1.0 - ($AbPoolF)) * " +
      "(CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)) END"

  /** Benford expected share per first digit, pre-quantized to micro
    * (⌊log10(1+1/d)·10⁶+0.5⌋ computed OFFLINE — no runtime log10, so
    * no libm divergence). Shared formula text for both engines.
    */
  private[queries] val BenfordMicroF =
    """CASE d WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
      |WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
      |WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END""".stripMargin
      .replace("\n", " ")

  /** Fano factor (population var / mean) from exact power sums —
    * identical text both engines; mean > 0 by construction.
    */
  private val FanoF =
    "(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / " +
      "(CAST(s1 AS DOUBLE) / n)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Running (prefix) sum per user. Accumulates SCALED BIGINT cents:
    // a DECIMAL(12,2) running sum widens to precision 22, whose window
    // buffer is a boxed BigDecimal updated per row per frame step — the
    // same trap q01's group-aggs hit. The long sum is a codegen'd
    // primitive; the double is rebuilt from an exact hi/lo split with
    // the identical formula on both engines (value ≥ 0, so Spark `div`
    // and DuckDB `//` agree).
    "q08_window_running" -> { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("vc", expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .withColumn("rc", sum("vc").over(w))
        .withColumn("running_value",
          expr("(CAST(rc div 1000000 AS DOUBLE) * 1000000.0 + CAST(rc % 1000000 AS DOUBLE)) / 100.0"))
        .select("user_id", "event_id", "ts", "running_value")
        .orderBy("user_id", "event_id")
    },

    // LAG + per-row delta.
    "q09_window_lag" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("value_delta", col("value") - lag("value", 1).over(w))
        .select("user_id", "event_id", "ts", "value", "value_delta")
        .orderBy("user_id", "event_id")
    },

    // Sessionization: a >30min gap starts a new session (gap-and-island
    // via lag + running sum over integer microseconds — deterministic).
    "q21_sessionize" -> { (s, d) =>
      sessionized(s, d)
        .groupBy("user_id")
        .agg(
          max("session_id").cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // Peak concurrent sessions per day via the classic +1/−1 sweep:
    // sessions (30-min-gap, as in q21) become (start, +1) and
    // (end+1µs, −1) points; a running sum over the global (t, delta)
    // order is the live-concurrency curve, and its per-day max is the
    // capacity-planning number. All integers; ties are pinned by
    // sorting −1 before +1 at equal timestamps on both engines. The
    // sweep is two rows per SESSION (≪ events), and the prefix sum is
    // the two-phase distributed one — exact with no single-partition
    // window, so the sweep holds at 100 TB as-is.
    "q104_peak_concurrency" -> { (s, d) =>
      val sess = sessionized(s, d)
        .groupBy("user_id", "session_id")
        .agg(min("tsu").as("st"), max("tsu").as("en"))
      // one pass: exploding both sweep points from each session row
      // avoids executing the sessionization once per union branch
      val sweep = sess.select(explode(expr(
          "array(named_struct('t', st, 'delta', 1), named_struct('t', en + 1, 'delta', -1))")).as("p"))
        .select(col("p.t").as("t"), col("p.delta").as("delta"))
      // exact global prefix sum via the two-phase distributed running
      // sum (GlobalOrder): bucketed by t, no single-partition window
      graft.plans.GlobalOrder.withRunningSum(sweep,
          Seq(col("t").asc, col("delta").asc), col("t"), col("delta"), "cur")
        .withColumn("day", expr("CAST(t div 86400000000 AS BIGINT)"))
        .groupBy("day")
        .agg(max("cur").cast("long").as("peak"), count(lit(1)).as("n_points"))
        .orderBy("day")
    },

    // Tumbling 1h windows per event type.
    "q22_time_buckets" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(
          date_trunc("hour", col("ts")).as("hour_ts"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(dec("value", 12, 2)).cast("double").as("total_value"))
        .orderBy("hour_ts", "event_type")
    },

    // Funnel: per user, first click followed by a purchase within 1h;
    // count conversions and report the (integer-µs) time-to-convert.
    "q49_event_funnel" -> { (s, d) =>
      val e = Tables.events(s, d).withColumn("tsu", expr("unix_micros(ts)"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min("tsu").as("first_click"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tsu").as("buy_ts"))
      clicks.join(buys, Seq("user_id"))
        .filter(col("buy_ts") >= col("first_click") &&
          col("buy_ts") - col("first_click") <= 3600000000L)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_purchases_1h"),
          (min("buy_ts") - min("first_click")).as("first_convert_us"))
        .orderBy("user_id")
    },

    // As-of join: each click picks up the user's most recent prior
    // (or simultaneous) purchase — graft.operators.AsofJoin composed
    // from union + last-non-null window; DuckDB's native ASOF JOIN is
    // the oracle.
    "q50_asof_join" -> { (s, d) =>
      val (clicks, purch) = clicksAndPurchases(s, d)
      graft.operators.AsofJoin(clicks, purch, Seq("user_id"), "tsu", "ptsu",
          Seq("pid", "ptsu"))
        .select(
          col("event_id"), col("user_id"),
          col("pid").as("purchase_id"),
          (col("tsu") - col("ptsu")).as("gap_us"))
        .orderBy("event_id")
    },

    // As-of with a tolerance: the attribution window — clicks match
    // their latest preceding purchase only within one hour; beyond it
    // the payload nulls out (left-join semantics). Same single-pass
    // union + last(ignoreNulls) carry as q50; the tolerance is one
    // extra comparison per row.
    "q105_asof_tolerance" -> { (s, d) =>
      val (clicks, purch) = clicksAndPurchases(s, d)
      graft.operators.AsofJoin(clicks, purch, Seq("user_id"), "tsu", "ptsu",
          Seq("pid", "ptsu"), tolerance = Some(3600000000L))
        .select(
          col("event_id"), col("user_id"),
          col("pid").as("purchase_id"),
          (col("tsu") - col("ptsu")).as("gap_us"))
        .orderBy("event_id")
    },

    // Forward as-of: each click matched to the NEXT purchase — the
    // time-to-conversion join. Same operator, direction flipped; the
    // oracle flips the ASOF inequality.
    "q106_asof_forward" -> { (s, d) =>
      val (clicks, purch) = clicksAndPurchases(s, d)
      graft.operators.AsofJoin(clicks, purch, Seq("user_id"), "tsu", "ptsu",
          Seq("pid", "ptsu"), direction = "forward")
        .select(
          col("event_id"), col("user_id"),
          col("pid").as("purchase_id"),
          (col("ptsu") - col("tsu")).as("wait_us"))
        .orderBy("event_id")
    },

    // Nearest as-of: each click matched to the closest purchase in
    // EITHER direction (ties to the preceding one) — merge_asof
    // direction='nearest'. One hash exchange carries both the
    // latest-preceding and earliest-following candidates (two sorted
    // window passes); the oracle computes both DuckDB ASOF joins and
    // picks the smaller gap with the same tie rule.
    "q124_asof_nearest" -> { (s, d) =>
      val (clicks, purch) = clicksAndPurchases(s, d)
      graft.operators.AsofJoin(clicks, purch, Seq("user_id"), "tsu", "ptsu",
          Seq("pid", "ptsu"), direction = "nearest")
        .select(
          col("event_id"), col("user_id"),
          col("pid").as("purchase_id"),
          abs(col("tsu") - col("ptsu")).as("gap_us"))
        .orderBy("event_id")
    },

    // Time-series regularization: zero-fill missing (user, day) cells
    // against a date spine and carry the last observed daily max
    // forward across gaps — the resample-to-grid shape that precedes
    // any per-entity trend feature. The spine is data-relative (one
    // 2-column aggregate broadcast), the grid is users × days (tiny
    // next to the event table), and the fill is one partitioned
    // window — no driver loops, no per-day queries.
    "q138_gap_fill" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d).filter("user_id % 10 = 0")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("value").cast("decimal(15,3)").as("v"))
      val daily = ev.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"), max("v").as("vmax"))
      val spine = ev.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val grid = ev.select("user_id").distinct().crossJoin(broadcast(spine))
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          col("vmax").cast("double").as("vmax"),
          last(col("vmax"), ignoreNulls = true)
            .over(Window.partitionBy("user_id").orderBy("day"))
            .cast("double").as("filled"))
        .orderBy("user_id", "day")
    },

    // Overlapping-interval merge (coalesce): each event projects a
    // 5-minute activity span; overlapping spans per user fuse into
    // islands (running-max-end + island-id cumsum — one partitioned
    // window, no self-join), then per-user coverage stats. The
    // interval-union primitive behind "total active time" and storage
    // range coalescing; all arithmetic is integer micros.
    "q142_interval_merge" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("st", "en")
      val iv = Tables.events(s, d).select(col("user_id"),
          expr("unix_micros(ts)").as("st"))
        .withColumn("en", col("st") + lit(300000000L))
      val spans = iv
        .withColumn("pmax",
          max("en").over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("fresh",
          when(col("pmax").isNull || col("st") > col("pmax"), 1L).otherwise(0L))
        .withColumn("grp",
          sum("fresh").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "grp")
        .agg(min("st").as("s0"), max("en").as("e1"))
      spans.groupBy("user_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("e1") - col("s0")).as("covered_us"),
          max(col("e1") - col("s0")).as("max_span_us"))
        .orderBy("user_id")
    },

    // with_strftime_columns / with_truncated_columns through the
    // actual FrameOps API (reference pydala/helpers/polars.py
    // strftime/truncate derivations, pinned relationally here): a
    // formatted-string month key and an hour-truncated timestamp,
    // aggregated so the derived values themselves form the group
    // keys. Portable format subset: Spark `yyyy-MM-dd HH` renders
    // identically to DuckDB strftime `%Y-%m-%d %H` in the UTC session.
    "q143_strftime_truncate" -> { (s, d) =>
      val base = Tables.events(s, d).select(col("event_id"), col("ts"))
      val derived = graft.functions.FrameOps.withTruncatedColumns(
        graft.functions.FrameOps.withStrftimeColumns(
          base, "ts", Map("month_key" -> "yyyy-MM", "hour_key" -> "yyyy-MM-dd HH")),
        "ts", Seq("hour"))
      derived.groupBy("month_key", "hour_key")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("ts_hour")).as("n_hours"))
        .orderBy("month_key", "hour_key")
    },

    // JSON property extraction from the string `props` column.
    "q23_json_extract" -> { (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    },

    // Weekly cohort retention: users active in week w AND w+1. The
    // (user, week) frame is distinct'd once and cached — the activity
    // count and the self-join read the same shuffle output. Week index
    // is integer µs division (no timestamp arithmetic to diverge).
    "q64_retention" -> { (s, d) =>
      val w = Tables.memo(s, s"$d#q64weeks") {
        Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
          .distinct()
      }
      val act = w.groupBy("wk").agg(count(lit(1)).as("n_active"))
      val ret = w.as("a").join(w.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.wk") === col("a.wk") + 1)
        .groupBy(col("a.wk").as("wk"))
        .agg(count(lit(1)).as("n_retained"))
      act.join(ret, Seq("wk"), "left")
        .select(col("wk"), col("n_active"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          (coalesce(col("n_retained"), lit(0L)).cast("double") / col("n_active"))
            .as("retention"))
        .orderBy("wk")
    },

    // Zero-filled weekly spine: generate the full week range between the
    // observed min and max and left-join the counts — gap weeks appear
    // with an explicit 0 (the standard time-series densification).
    "q78_date_spine" -> { (s, d) =>
      val e = Tables.memo(s, s"$d#q78weeks") {
        Tables.events(s, d)
          .select(expr("unix_micros(ts) div 604800000000").as("wk"))
      }
      val counts = e.groupBy("wk").agg(count(lit(1)).as("n_events"))
      val spine = e.agg(min("wk").as("lo"), max("wk").as("hi"))
        .select(explode(expr("sequence(lo, hi)")).as("wk"))
      spine.join(counts, Seq("wk"), "left")
        .select(col("wk"), coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("wk")
    },

    // Last-touch revenue attribution: every purchase credits the
    // user's most recent preceding non-purchase event (the marketing
    // "last touch"); revenue rolls up per touch type, with purchases
    // that have no prior touch landing in an explicit 'none' bucket.
    // The match is the same backward as-of operator as q50 (one
    // union + last-non-null carry — never a per-purchase probe), and
    // money stays in BIGINT cents until one hi/lo double rebuild at
    // the end (the q08 formula), so the aggregation is codegen'd
    // primitive math.
    "q154_attribution" -> { (s, d) =>
      val e = Tables.events(s, d).withColumn("tsu", expr("unix_micros(ts)"))
      // one deterministic touch per (user, instant): the max-event_id
      // row's type (event_id is unique, so max_by never ties)
      val touches = e.filter(col("event_type") =!= "purchase")
        .groupBy(col("user_id"), col("tsu").as("ttsu"))
        .agg(max_by(col("event_type"), col("event_id")).as("touch_type"))
      val purch = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("tsu").as("ptsu"))
        .agg(expr("CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT)").as("vc"))
      graft.operators.AsofJoin(purch, touches, Seq("user_id"), "ptsu", "ttsu",
          Seq("touch_type"))
        .groupBy(coalesce(col("touch_type"), lit("none")).as("touch_type"))
        .agg(count(lit(1)).as("n_purchases"), sum("vc").as("rc"))
        .select(col("touch_type"), col("n_purchases"),
          expr("(CAST(rc div 1000000 AS DOUBLE) * 1000000.0 + CAST(rc % 1000000 AS DOUBLE)) / 100.0")
            .as("revenue"))
        .orderBy("touch_type")
    },

    // Session Markov transitions: within each 30-min session, count
    // consecutive event-type bigrams and report each transition's
    // probability in exact milli-units (integer division — no floats).
    // Rides the shared sessionized frame: one window pass for the lag,
    // one aggregation, and a broadcast-sized result (|types|²·sessions'
    // distinct transitions). The per-row state that a Markov chain
    // needs is exactly what lag() expresses — no self-join.
    "q155_transitions" -> { (s, d) =>
      val w = Window.partitionBy("user_id", "session_id")
        .orderBy(col("tsu"), col("event_id"))
      val pairs = sessionized(s, d)
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
      pairs.groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum("n").over(Window.partitionBy("prev_type")))
        .select(col("prev_type"), col("next_type"), col("n"),
          col("tot").cast("long").as("row_total"),
          expr("n * 1000 div tot").as("p_milli"))
        .orderBy("prev_type", "next_type")
    },

    // Exponentially-weighted moving average over each user's last 16
    // events, dyadic weights (w_k = 2^-k): EVERY arithmetic step is
    // either exact (cents scaling, division by a power of two) or a
    // correctly-rounded IEEE-754 add applied in the same pinned
    // left-to-right order on both engines, so the doubles match
    // bit-for-bit without a rational workaround. 16 lag() terms over
    // one window spec collapse into a single window exchange; the
    // fold is plain codegen'd double math — no per-row array state.
    "q156_ewma" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("tsu"), col("event_id"))
      val base = Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("vc", expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
      val ewmaCents = (0 until 16)
        .map {
          case 0 => col("vc").cast("double")
          case k => coalesce(lag(col("vc"), k).over(w), lit(0L)).cast("double") /
            lit((1L << k).toDouble)
        }
        .reduceLeft(_ + _) // left fold — the pinned add order
      base
        .withColumn("ewma", ewmaCents / lit(100.0))
        .select("user_id", "event_id", "tsu", "ewma")
        .orderBy("user_id", "event_id")
    },

    // Robust rolling-median spike detection: each event compares its
    // value against the median of the user's trailing 15 events (full
    // windows only, so the frame always holds an odd count and the
    // median is an EXACT member element — integer cents, no
    // interpolation formula to reconcile). The deviation and the
    // spike flag are therefore pure integer arithmetic. Median-based
    // outlier flags resist the exact skew that breaks mean/stddev
    // z-scores (one whale purchase drags the mean); the 15-row frame
    // keeps the window state bounded — percentile over a ROWS frame
    // buffers 15 values per step, not the partition.
    "q160_rolling_median" -> { (s, d) =>
      val wOrd = Window.partitionBy("user_id").orderBy(col("tsu"), col("event_id"))
      val wMed = wOrd.rowsBetween(-14, Window.currentRow)
      Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("vc", expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("med_c", expr("percentile(vc, 0.5)").over(wMed).cast("long"))
        .filter(col("rn") >= 15)
        .withColumn("dev_c", col("vc") - col("med_c"))
        .select(col("user_id"), col("event_id"), col("vc"), col("med_c"),
          col("dev_c"), (abs(col("dev_c")) > 5000L).as("is_spike"))
        .orderBy("user_id", "event_id")
    },

    // Rolling 7-day active users (the DAU/WAU/stickiness triple):
    // instead of re-scanning a 7-day range per output day (7× the
    // data, or a range self-join), each distinct (user, day) activity
    // row is exploded to the ≤7 window-end days it contributes to and
    // the count-distinct runs once per window — the standard
    // contribute-forward rewrite that keeps sliding distinct counts
    // one shuffle. Stickiness (DAU/WAU) is exact milli by integer
    // division.
    "q161_rolling_wau" -> { (s, d) =>
      val ud = Tables.memo(s, s"$d#q161udays") {
        Tables.events(s, d)
          .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
      }
      val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
      // data-relative upper bound stays a lazy broadcast scalar — no
      // driver-side collect inside the (re-executed) query builder
      val bounds = ud.agg(max("day").as("hi"))
      val wau = ud
        .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("day"))
        .groupBy("day").agg(countDistinct("user_id").as("wau"))
        .crossJoin(broadcast(bounds))
        .filter(col("day") <= col("hi")).drop("hi")
      // left join on wau's spine: every day in [min+0, hi] with any
      // activity in its trailing week appears, even zero-DAU days
      wau.join(dau, Seq("day"), "left")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
          expr("coalesce(dau, 0) * 1000 div wau").as("stickiness_milli"))
        .orderBy("day")
    },

    // Ordered three-step funnel within a session: signup, then a
    // click strictly at-or-after it, then a purchase at-or-after that
    // click — each stage's timestamp is the conditional min AFTER the
    // previous stage's, so out-of-order events never count (the
    // difference between an ordered funnel and three filters). Two
    // co-partitioned joins back onto the session frame (same keys →
    // no extra exchange); all comparisons integer micros.
    "q162_funnel_ordered" -> { (s, d) =>
      // cached: the session frame feeds ns + three stage branches (s2
      // and s3 embed it twice and three times respectively) — without
      // the cache the sessionization window re-executes per branch
      // (the q104 anti-pattern)
      val sess = Tables.memo(s, s"$d#sessions")(sessionized(s, d))
      val keys = Seq("user_id", "session_id")
      val s1 = sess.filter(col("event_type") === "signup")
        .groupBy(keys.map(col): _*).agg(min("tsu").as("t1"))
      val s2 = sess.join(s1, keys)
        .filter(col("event_type") === "click" && col("tsu") >= col("t1"))
        .groupBy(keys.map(col): _*).agg(min("tsu").as("t2"))
      val s3 = sess.join(s2, keys)
        .filter(col("event_type") === "purchase" && col("tsu") >= col("t2"))
        .groupBy(keys.map(col): _*).agg(min("tsu").as("t3"))
      sess.groupBy("user_id")
        .agg(countDistinct("session_id").as("n_sessions"))
        .join(s1.groupBy("user_id").agg(count(lit(1)).as("n_signup")),
          Seq("user_id"), "left")
        .join(s2.groupBy("user_id").agg(count(lit(1)).as("n_click_after")),
          Seq("user_id"), "left")
        .join(s3.groupBy("user_id").agg(count(lit(1)).as("n_full_funnel")),
          Seq("user_id"), "left")
        .select(col("user_id"), col("n_sessions"),
          coalesce(col("n_signup"), lit(0L)).as("n_signup"),
          coalesce(col("n_click_after"), lit(0L)).as("n_click_after"),
          coalesce(col("n_full_funnel"), lit(0L)).as("n_full_funnel"))
        .orderBy("user_id")
    },

    // SCD2 dimension build — run-length collapse of each user's
    // event_type history into type-2 validity intervals
    // (valid_from_us, valid_to_us): the slowly-changing-dimension
    // derivation every warehouse pipeline runs over a change log.
    // Gaps-and-islands per user (lag → change flag → running island
    // sum), one row per island, then lead(valid_from) across islands
    // as the exclusive end; the current (last) run carries NULL
    // valid_to. Every window partitions by user_id — no global frame,
    // a per-key linear pass at any scale; interval bounds stay in
    // integer microseconds so the hash gate is exact.
    "q199_scd2_intervals" -> { (s, d) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("tsu"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byIsland = Window.partitionBy("user_id").orderBy(col("island"))
      Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("prev_t", lag("event_type", 1).over(byUser))
        .withColumn("chg",
          when(col("prev_t").isNull || col("prev_t") =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("island", sum("chg").over(run))
        .groupBy("user_id", "island")
        .agg(max("event_type").as("event_type"),
          min("tsu").as("valid_from_us"),
          count(lit(1)).as("n_events"))
        .withColumn("valid_to_us", lead("valid_from_us", 1).over(byIsland))
        .select("user_id", "island", "event_type",
          "valid_from_us", "valid_to_us", "n_events")
        .orderBy("user_id", "island")
    },

    // Time-weighted average (TWAP): each event's value holds until
    // the user's next event, with the holding interval capped at one
    // hour (the standard staleness bound), and the per-user TWAP
    // ships as an exact integer numerator/denominator pair plus the
    // floor-divided milli quote — integer seconds keep every product
    // far inside the bigint range, and all operands are non-negative
    // so truncating (Spark div) and flooring (DuckDB //) division
    // agree. One per-user window pass; same partition the SCD2 build
    // rides.
    "q209_twap" -> { (s, d) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("tsu"), col("event_id"))
      Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("vmilli",
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)"))
        .withColumn("nxt", lead("tsu", 1).over(byUser))
        .filter(col("nxt").isNotNull)
        .withColumn("dur_s", least(expr("(nxt - tsu) div 1000000"), lit(3600L)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_iv"),
          sum("dur_s").as("dur_s_sum"),
          sum(expr("vmilli * dur_s")).as("wsum"))
        .withColumn("twap_milli",
          expr("CASE WHEN dur_s_sum = 0 THEN NULL ELSE wsum div dur_s_sum END"))
        .orderBy("user_id")
    },

    // Point-in-time ("as of T") state lookup over the SCD2 intervals:
    // for three probe instants at fixed fractions of the corpus' time
    // range, how many users sat in each event_type state — the query
    // shape SCD2 tables exist to serve. The probe set is 3 broadcast
    // rows joined against the intervals with the half-open
    // containment predicate (valid_from ≤ p < valid_to, open last
    // interval = +∞); at 100 TB this stays one broadcast join over
    // the interval table, no shuffle of the probes.
    "q213_asof_state" -> { (s, d) =>
      val byUser = Window.partitionBy("user_id").orderBy(col("tsu"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byIsland = Window.partitionBy("user_id").orderBy(col("island"))
      val iv = Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("prev_t", lag("event_type", 1).over(byUser))
        .withColumn("chg",
          when(col("prev_t").isNull || col("prev_t") =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("island", sum("chg").over(run))
        .groupBy("user_id", "island")
        .agg(max("event_type").as("event_type"),
          min("tsu").as("vf"), count(lit(1)).as("ne"))
        .withColumn("vt", lead("vf", 1).over(byIsland))
      val probes = Tables.events(s, d)
        .agg(min(expr("unix_micros(ts)")).as("lo"),
          max(expr("unix_micros(ts)")).as("hi"))
        .select(explode(expr(
          "array(lo + (hi - lo) div 4, lo + (hi - lo) div 2, " +
            "lo + (3 * (hi - lo)) div 4)")).as("p"))
      iv.join(broadcast(probes),
          col("vf") <= col("p") && (col("vt").isNull || col("p") < col("vt")))
        .groupBy("p", "event_type")
        .agg(count(lit(1)).as("n_users"), sum("ne").as("n_run_events"))
        .orderBy("p", "event_type")
    },

    // Hopping (sliding) window aggregation in BATCH — the
    // multi-assignment semantics of `window(ts, size, slide)`: with
    // a 2 h window sliding every 1 h each event lands in exactly two
    // windows (epoch-aligned starts floor₁ₕ(ts) and floor₁ₕ(ts)−1 h,
    // UTC session), which the oracle reproduces by explicit
    // enumeration. Narrow 2× row expansion then one partial-combined
    // aggregate — the batch twin of the q150 streaming gate's
    // tumbling rollup.
    "q211_hopping_window" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("vmilli",
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)"))
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("win"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum("vmilli").as("vmilli_sum"))
        .select(expr("unix_micros(win.start)").as("win_start_us"),
          col("event_type"), col("n"), col("vmilli_sum"))
        .orderBy("win_start_us", "event_type")
    },

    // Weekly churn: users active in week w but silent in w+1 — the
    // temporal anti-join every growth dashboard runs. Distinct
    // (user, week) pairs once, then churn is a LEAD over the
    // per-user week sequence (next active week ≠ w+1 ⇒ churned
    // after w; the corpus' last week is excluded — churn there is
    // right-censored, not observed). The week index is the exact
    // integer epoch-day div 7; one hash exchange on user_id plus a
    // bounded week rollup. (Weekly, not monthly: the synthetic
    // corpus spans ~one month — a monthly grain would gate zero
    // rows.)
    "q245_weekly_churn" -> { (s, d) =>
      val months = Tables.events(s, d)
        .select(col("user_id"),
          expr("(unix_micros(ts) div 86400000000) div 7").as("mi"))
        .distinct()
      val nxt = Window.partitionBy("user_id").orderBy("mi")
      val lastM = months.agg(max("mi").as("last_mi"))
      months
        .withColumn("next_mi", lead("mi", 1).over(nxt))
        .crossJoin(broadcast(lastM))
        .filter(col("mi") < col("last_mi")) // censored tail excluded
        .withColumn("churned",
          when(col("next_mi").isNull || col("next_mi") > col("mi") + 1, 1L)
            .otherwise(0L))
        .groupBy("mi")
        .agg(count(lit(1)).as("n_active"), sum("churned").as("n_churned"))
        .withColumn("churn_milli", expr("n_churned * 1000 div n_active"))
        .orderBy("mi")
    },

    // Cohort retention matrix (first-active week × week offset): the
    // product-analytics triangle. Cohort = the user's first active
    // week; each later active week contributes at its integer
    // offset; cells carry exact counts and a milli share of the
    // cohort. Two narrow aggregates on user_id and one bounded-matrix
    // rollup — offsets are calendar-bounded, so the output frame is
    // tiny by construction.
    "q248_cohort_retention" -> { (s, d) =>
      val months = Tables.events(s, d)
        .select(col("user_id"),
          expr("(unix_micros(ts) div 86400000000) div 7").as("mi"))
        .distinct()
      val cohort = months.groupBy("user_id").agg(min("mi").as("c0"))
      val sizes = cohort.groupBy("c0").agg(count(lit(1)).as("n_cohort"))
      months.join(cohort, "user_id")
        .withColumn("off", col("mi") - col("c0"))
        .groupBy("c0", "off")
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), "c0")
        .withColumn("ret_milli", expr("n_active * 1000 div n_cohort"))
        .select("c0", "off", "n_cohort", "n_active", "ret_milli")
        .orderBy("c0", "off")
    },

    // Interval SUBTRACTION (calendar-gap analysis): each event holds
    // the user "busy" for 5 minutes; the idle report is the
    // complement of the merged busy set inside the user's own span.
    // Sweep-line form: +1/−1 boundary rows, running coverage ordered
    // with starts BEFORE ends at the same instant (abutting intervals
    // never open a zero-width gap), a gap wherever coverage returns
    // to 0 before another boundary follows. Everything is exact
    // integer µs on the per-user partition — one hash exchange, the
    // q104 sweep shape with subtraction semantics. Complements q142's
    // interval MERGE.
    "q236_idle_gaps" -> { (s, d) =>
      val e = Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .select(col("user_id"), col("event_id"), col("tsu"))
      val bounds = e.select(col("user_id"), col("tsu").as("bt"),
          lit(1L).as("delta"), col("event_id"))
        .unionByName(e.select(col("user_id"),
          (col("tsu") + 300000000L).as("bt"), lit(-1L).as("delta"),
          col("event_id")))
      val ord = Window.partitionBy("user_id")
        .orderBy(col("bt"), col("delta").desc, col("event_id"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds
        .withColumn("cov", sum("delta").over(run))
        .withColumn("nxt", lead("bt", 1).over(ord))
        .withColumn("gap_us",
          when(col("cov") === 0 && col("nxt").isNotNull,
            col("nxt") - col("bt")).otherwise(lit(0L)))
        .groupBy("user_id")
        .agg(sum(expr("CASE WHEN gap_us > 0 THEN 1 ELSE 0 END")).as("n_gaps"),
          sum("gap_us").as("idle_us_sum"),
          max(expr("CASE WHEN gap_us > 0 THEN gap_us ELSE 0 END"))
            .as("max_gap_us"))
        .orderBy("user_id")
    },

    // Inter-arrival latency histogram in log₂ buckets — the
    // heavy-tail profile every event pipeline reads before picking
    // watermarks and session gaps. The bucket is length(bin(gap_us)):
    // the BINARY-STRING length of the exact integer gap, i.e.
    // ⌊log₂⌋+1 with ZERO floating point anywhere — both engines
    // render BIGINT binary identically. One per-user lag + one
    // map-side-combined aggregate.
    "q238_gap_histogram" -> { (s, d) =>
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("tsu"), col("event_id"))
      Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("gap_us", col("tsu") - lag("tsu", 1).over(byUser))
        .filter(col("gap_us").isNotNull && col("gap_us") > 0)
        .withColumn("bucket",
          expr("CAST(length(bin(gap_us)) AS BIGINT)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("gap_us").as("min_gap_us"),
          max("gap_us").as("max_gap_us"))
        .orderBy("bucket")
    },

    // Longest consecutive-day activity streak per user — the
    // gaps-and-islands idiom at DATE granularity: distinct active
    // days, row_number along them, and day − rn is CONSTANT exactly
    // within a consecutive run (each day forward steps both by one),
    // so grouping on it yields the runs with zero self-joins. Longest
    // run picked with an earliest-start tie-break. Both windows and
    // the island aggregate cluster on user_id — one hash exchange.
    "q230_longest_streak" -> { (s, d) =>
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val streaks = days
        .withColumn("rn", row_number().over(w))
        .withColumn("grp", expr("date_sub(day, rn)"))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("streak_days"), min("day").as("start_day"))
      streaks.withColumn("rk", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(col("streak_days").desc, col("start_day").asc)))
        .filter(col("rk") === 1)
        .select("user_id", "streak_days", "start_day")
        .orderBy("user_id")
    },

    // Benford first-digit profile of order totals — the fraud/quality
    // screen over any monetary column. First digit via the decimal
    // string of the exact cents integer (identical rendering of
    // BIGINT on both engines — no float log10 anywhere); expected
    // Benford shares are PRE-QUANTIZED micro literals, so the
    // deviation column is pure integer arithmetic. One
    // map-side-combined aggregate.
    "q231_benford" -> { (s, d) =>
      Tables.orders(s, d)
        .select(expr(
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("pc"))
        .withColumn("d", expr(
          "CAST(substr(CAST(pc AS STRING), 1, 1) AS BIGINT)"))
        .groupBy("d").agg(count(lit(1)).as("n_obs"))
        .withColumn("n_tot", sum("n_obs").over(Window.partitionBy()))
        .withColumn("share_micro", expr("n_obs * 1000000 div n_tot"))
        .withColumn("benford_micro", expr(BenfordMicroF))
        .withColumn("dev_micro", expr("abs(share_micro - benford_micro)"))
        .select("d", "n_obs", "share_micro", "benford_micro", "dev_micro")
        .orderBy("d")
    },

    // Session entry-type rollup with bounce rate: per session the
    // first event (entry), whether it was the ONLY event (bounce),
    // and the session's time span — all carried as window columns on
    // the same (user, session) partition the sessionizer built, so
    // the entire readout stays on one hash exchange. Bounce rate and
    // average span ship as exact integer milli/µs divisions
    // (non-negative — div and // agree).
    "q232_session_entry" -> { (s, d) =>
      val bySess = Window.partitionBy("user_id", "session_id")
      val g = sessionized(s, d)
        .withColumn("rn_a", row_number().over(
          bySess.orderBy(col("tsu"), col("event_id"))))
        .withColumn("n_ev", count(lit(1)).over(bySess))
        .withColumn("span_us",
          max("tsu").over(bySess) - min("tsu").over(bySess))
      g.filter(col("rn_a") === 1)
        .groupBy(col("event_type").as("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounce"),
          sum("span_us").as("span_us_sum"))
        .withColumn("bounce_milli", expr("n_bounce * 1000 div n_sessions"))
        .withColumn("avg_span_us", expr("span_us_sum div n_sessions"))
        .orderBy("entry_type")
    },

    // Sequential-pattern mining, order 3: the top event-type trigrams
    // across user timelines (the path-mining step behind "what do
    // users do right before erroring"). Two leads over the per-user
    // window (same partition the whole Events family rides), one
    // count + distinct-users aggregate, and a FULLY tie-broken top-20
    // (n desc, then the lexicographic trigram) so the cut is
    // deterministic on both engines. Extends q155's transition
    // bigrams one order up; at scale it is one window pass + one
    // map-side-combined aggregate.
    "q225_event_trigrams" -> { (s, d) =>
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("tsu"), col("event_id"))
      Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("e2", lead("event_type", 1).over(byUser))
        .withColumn("e3", lead("event_type", 2).over(byUser))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
    },

    // Funnel latency by cohort: median-free exact readout of
    // signup→first-purchase conversion — per user the first signup
    // instant, the first purchase AT OR AFTER it, cohorted by signup
    // month (yyyymm int). Latencies are exact integer microseconds;
    // the average ships as the truncating integer division of
    // non-negative sums (div and // agree). Two narrow per-user
    // aggregates and one join — no windows over the event stream at
    // all.
    "q229_conversion_latency" -> { (s, d) =>
      val e = Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
      val signups = e.filter(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(min("tsu").as("s_tsu"))
        .withColumn("cohort",
          (year(expr("timestamp_micros(s_tsu)")) * 100 +
            month(expr("timestamp_micros(s_tsu)"))).cast("long"))
      val firstPurch = e.filter(col("event_type") === "purchase")
        .join(signups.select("user_id", "s_tsu"), "user_id")
        .filter(col("tsu") >= col("s_tsu"))
        .groupBy("user_id").agg(min("tsu").as("p_tsu"))
      signups.join(firstPurch, Seq("user_id"), "left")
        .groupBy("cohort")
        .agg(count(lit(1)).as("n_signup"),
          count(col("p_tsu")).as("n_converted"),
          sum(expr("CASE WHEN p_tsu IS NULL THEN 0 ELSE p_tsu - s_tsu END"))
            .as("lat_us_sum"))
        .withColumn("avg_lat_us",
          expr("CASE WHEN n_converted = 0 THEN NULL " +
            "ELSE lat_us_sum div n_converted END"))
        .orderBy("cohort")
    },

    // Behavioral diversity histogram: how many users touch exactly k
    // of the event types — the engagement-breadth readout (all-type
    // users are power users; single-type users are drive-bys). Two
    // stacked aggregates, share in exact milli.
    "q288_type_diversity" -> { (s, d) =>
      val per = Tables.events(s, d)
        .select("user_id", "event_type").distinct()
        .groupBy("user_id").agg(count(lit(1)).as("k"))
      val tot = per.agg(count(lit(1)).as("n_users"))
      per.groupBy("k").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .withColumn("share_milli", expr("n * 1000 div n_users"))
        .select("k", "n", "n_users", "share_milli")
        .orderBy("k")
    },

    // Second-order transitions: the next-event distribution
    // conditioned on the previous TWO event types — one step up from
    // q155's bigram matrix (the Markov-order question: does (a,b)→c
    // differ from b→c). Two lags on the per-user window, counts +
    // context shares in exact milli, contexts with ≥ 10 observations.
    "q284_second_order_transitions" -> { (s, d) =>
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("tsu"), col("event_id"))
      val byCtx = Window.partitionBy("p2", "p1")
      Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("p1", lag("event_type", 1).over(byUser))
        .withColumn("p2", lag("event_type", 2).over(byUser))
        .filter(col("p2").isNotNull)
        .groupBy(col("p2"), col("p1"), col("event_type").as("nxt"))
        .agg(count(lit(1)).as("n"))
        .withColumn("n_ctx", sum("n").over(byCtx))
        .filter(col("n_ctx") >= 10)
        .withColumn("share_milli", expr("n * 1000 div n_ctx"))
        .orderBy("p2", "p1", "nxt")
    },

    // Audience overlap between event types: exact Jaccard of the
    // distinct-user sets per type pair — "do error-ers also purchase"
    // in one number per pair. Distinct (type, user) rows once, one
    // self-join on user (types ordered), set sizes joined back, all
    // integer with a milli Jaccard.
    "q282_audience_overlap" -> { (s, d) =>
      val tu = Tables.events(s, d)
        .select(col("event_type").as("t"), col("user_id")).distinct()
      val sizes = tu.groupBy("t").agg(count(lit(1)).as("n"))
      val inter = tu.as("a").join(tu.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("t_a"), col("b.t").as("t_b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.select(col("t").as("t_a"), col("n").as("n_a"))), "t_a")
        .join(broadcast(sizes.select(col("t").as("t_b"), col("n").as("n_b"))), "t_b")
        .withColumn("n_union", expr("n_a + n_b - n_inter"))
        .withColumn("jaccard_milli", expr("n_inter * 1000 div n_union"))
        .select("t_a", "t_b", "n_a", "n_b", "n_inter", "n_union",
          "jaccard_milli")
        .orderBy("t_a", "t_b")
    },

    // Burstiness (Fano factor) per user: variance-to-mean ratio of
    // daily event counts — ≈1 for Poisson-like usage, ≫1 for bursty
    // sessions-then-silence. Exact integer power sums over the
    // per-(user, day) counts; the ratio is identical IEEE text on
    // both engines (mean > 0 always: days with zero events don't
    // exist in the frame).
    "q277_burstiness" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("c").as("s1"),
          sum(expr("c * c")).as("s2"))
        .withColumn("fano", expr(FanoF))
        .orderBy("user_id")
    },

    // Hour-of-day seasonality profile per event type — counts per
    // (type, hour 0–23), each type's share of its own day in exact
    // milli, and the peak hour picked with a deterministic tie-break.
    // One map-side-combined aggregate over a 120-cell frame.
    "q265_hourly_profile" -> { (s, d) =>
      val byType = Window.partitionBy("event_type")
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hh"))
        .agg(count(lit(1)).as("n"))
      cells
        .withColumn("n_type", sum("n").over(byType))
        .withColumn("share_milli", expr("n * 1000 div n_type"))
        .withColumn("is_peak", row_number().over(
          byType.orderBy(col("n").desc, col("hh"))) === 1)
        .select("event_type", "hh", "n", "share_milli", "is_peak")
        .orderBy("event_type", "hh")
    },

    // As-of tolerance sweep: the tuning table for attribution windows
    // — ONE as-of join (q50's single-pass carry), then the match rate
    // at three candidate tolerances from the same gap column. This is
    // how the 1 h cutoff in q105 gets CHOSEN rather than guessed.
    // Exact milli rates; the sweep adds zero extra joins.
    "q261_asof_tolerance" -> { (s, d) =>
      val (clicks, purch) = clicksAndPurchases(s, d)
      val gaps = graft.operators.AsofJoin(clicks, purch, Seq("user_id"),
          "tsu", "ptsu", Seq("pid", "ptsu"))
        .withColumn("gap_us",
          when(col("pid").isNotNull, col("tsu") - col("ptsu")))
      val tols = Seq(60L, 300L, 3600L).map(_ * 1000000L)
      val aggs = tols.map(t =>
        sum(expr(s"CASE WHEN gap_us IS NOT NULL AND gap_us <= $t " +
          "THEN 1 ELSE 0 END")).as(s"n_le_${t / 1000000L}s"))
      // n_clicks = 0 guard: an empty clicks frame still yields one
      // agg row, and Spark-4 ANSI raises DIVIDE_BY_ZERO where the
      // DuckDB oracle would error too — NULL on both sides instead
      // (q259/q237/q223 degenerate-guard convention).
      val shares = tols.map { t =>
        val k = t / 1000000L
        expr(s"CASE WHEN n_clicks = 0 THEN NULL " +
          s"ELSE n_le_${k}s * 1000 div n_clicks END").as(s"rate_${k}s_milli")
      }
      gaps.agg(count(lit(1)).as("n_clicks"), aggs: _*)
        .select(Seq(col("n_clicks")) ++
          tols.map(t => col(s"n_le_${t / 1000000L}s")) ++ shares: _*)
    },

    // Session penetration per event type: the share of sessions that
    // contain the type at least once — the "reach" metric. Distinct
    // (session, type) once on the sessionizer's partition, a bounded
    // per-type rollup, and exact milli shares against the session
    // total.
    "q262_session_penetration" -> { (s, d) =>
      val st = sessionized(s, d)
        .select(col("user_id"), col("session_id"), col("event_type"))
        .distinct()
      val nSess = st.select("user_id", "session_id").distinct()
        .agg(count(lit(1)).as("n_sessions"))
      st.groupBy("event_type")
        .agg(count(lit(1)).as("n_with"))
        .crossJoin(broadcast(nSess))
        .withColumn("pen_milli", expr("n_with * 1000 div n_sessions"))
        .orderBy("event_type")
    },

    // Freshness / staleness report: how far each event stream's
    // newest record lags the corpus' global high-water mark — the
    // first page of any ingestion dashboard. Exact integer seconds;
    // one map-side-combined max per type plus a broadcast scalar.
    "q257_freshness" -> { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_type"), expr("unix_micros(ts)").as("tsu"))
      val hw = e.agg(max("tsu").as("hw_tsu"))
      e.groupBy("event_type")
        .agg(count(lit(1)).as("n"), max("tsu").as("last_tsu"))
        .crossJoin(broadcast(hw))
        .withColumn("lag_s", expr("(hw_tsu - last_tsu) div 1000000"))
        .withColumn("stale", col("lag_s") > 3600L)
        .select("event_type", "n", "last_tsu", "lag_s", "stale")
        .orderBy("event_type")
    },

    // Day-over-day volume anomaly flags: the ±2× ingest monitor.
    // Ratio in exact milli (non-negative counts — div/floor agree);
    // the days frame is calendar-bounded, so the lag window is a
    // legitimate tiny ordered frame.
    "q258_volume_anomaly" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prev_n", lag("n", 1).over(Window.orderBy("day")))
        .withColumn("ratio_milli",
          expr("CASE WHEN prev_n IS NULL OR prev_n = 0 THEN NULL " +
            "ELSE n * 1000 div prev_n END"))
        .withColumn("anomalous",
          expr("CASE WHEN ratio_milli IS NULL THEN NULL " +
            "ELSE ratio_milli > 2000 OR ratio_milli < 500 END"))
        .orderBy("day")
    },

    // Empirical CDF sampled at fixed probe points per event_type —
    // the inverse readout of the quantile family (q241 answers "what
    // value at P?", this answers "what P at value x?"). One
    // conditional aggregate, shares in exact milli; the probe points
    // are compile-time constants so both engines run the identical
    // predicate set.
    "q253_ecdf_probes" -> { (s, d) =>
      val probes = Seq(100000L, 250000L, 500000L, 900000L)
      val aggs = probes.map(x =>
        sum(expr(s"CASE WHEN vmilli <= $x THEN 1 ELSE 0 END")).as(s"le_$x"))
      val shares = probes.map(x =>
        expr(s"le_$x * 1000 div n").as(s"p_le_${x}_milli"))
      Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)")
            .as("vmilli"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), aggs: _*)
        .select(Seq(col("event_type"), col("n")) ++
          probes.map(x => col(s"le_$x")) ++ shares: _*)
        .orderBy("event_type")
    },

    // Exact grouped quartiles (the describe() block): p25/p50/p75 per
    // event_type by the rank-crossing identity k = ⌈q·n⌉ ⟺ 4·rn ≥ q·4·n
    // band — one ranked window pass, one conditional aggregate, all in
    // the exact milli lane (type-1 quantiles: actual data values, no
    // interpolation to reconcile).
    "q241_group_quartiles" -> { (s, d) =>
      val ord = Window.partitionBy("event_type")
        .orderBy(col("vmilli"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)")
            .as("vmilli"))
        .withColumn("rn", row_number().over(ord).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(max("n").as("n"),
          max(when(expr("rn * 4 >= n AND (rn - 1) * 4 < n"),
            col("vmilli"))).as("p25"),
          max(when(expr("rn * 4 >= 2 * n AND (rn - 1) * 4 < 2 * n"),
            col("vmilli"))).as("p50"),
          max(when(expr("rn * 4 >= 3 * n AND (rn - 1) * 4 < 3 * n"),
            col("vmilli"))).as("p75"))
        .orderBy("event_type")
    },

    // Raw autocovariance numerators at lags 1..3 per event_type:
    // Σ v_t·v_{t−k} over the (tsu, event_id)-ordered series, exact in
    // milli² integers (magnitudes ≲ 10¹² per term × 10⁶ rows = 10¹⁸ —
    // inside BIGINT; the mean-centered ACF is one identical-text
    // double step away for any consumer). Three lags ride ONE window
    // partition — no self-joins.
    "q243_acf_lags" -> { (s, d) =>
      val ord = Window.partitionBy("event_type")
        .orderBy(col("tsu"), col("event_id"))
      val e = Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("v",
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)"))
      val lagged = (1 to 3).foldLeft(e) { (df, k) =>
        df.withColumn(s"v_$k", lag("v", k).over(ord))
      }
      lagged.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(expr("v * v")).as("s0"),
          sum(expr("v * v_1")).as("s1"), count(col("v_1")).as("n1"),
          sum(expr("v * v_2")).as("s2"), count(col("v_2")).as("n2"),
          sum(expr("v * v_3")).as("s3"), count(col("v_3")).as("n3"))
        .orderBy("event_type")
    },

    // Exact winsorized robust stats per event_type: rank-based (type-1)
    // p05/p95 picked by tie-broken row_number (k = ⌈q·n⌉ via the
    // integer 20·k ≥ n ⟺ k ≥ ⌈n/20⌉ identity), then every value
    // clipped into [p05, p95] and re-aggregated in the exact milli
    // lane. One partitioned window pass + one conditional aggregate to
    // a per-type bounds frame + one broadcast join back — the robust
    // mean at any scale without sampling or sketches.
    "q222_winsorize" -> { (s, d) =>
      val ord = Window.partitionBy("event_type")
        .orderBy(col("vmilli"), col("event_id"))
      val base = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)")
            .as("vmilli"))
      // ONE ranked-window pass feeds the bounds aggregate; the rejoin
      // side reads the cheap narrow `base` (no windows) — clipping
      // only needs vmilli + the broadcast bounds, so the partitioned
      // sort is never executed twice
      val bounds = base
        .withColumn("rn", row_number().over(ord).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(max("n").as("n"),
          max(when(expr("rn * 20 >= n AND (rn - 1) * 20 < n"),
            col("vmilli"))).as("p05"),
          max(when(expr("rn * 20 >= 19 * n AND (rn - 1) * 20 < 19 * n"),
            col("vmilli"))).as("p95"))
      base.join(broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(max("n").as("n"), max("p05").as("p05"), max("p95").as("p95"),
          sum(expr("CASE WHEN vmilli < p05 THEN 1 ELSE 0 END")).as("n_lo"),
          sum(expr("CASE WHEN vmilli > p95 THEN 1 ELSE 0 END")).as("n_hi"),
          sum(expr("LEAST(GREATEST(vmilli, p05), p95)")).as("wsum"))
        .orderBy("event_type")
    },

    // Hash-split A/B readout: users assigned to arms by the portable
    // 60-bit hash (the SAME deterministic split both engines compute),
    // conversion = did the user ever 'purchase'. Counts are exact
    // integers; lift and the two-proportion z-score are the identical
    // IEEE formula text over the exact-count casts (the moment-stats
    // convention). The whole readout is two narrow aggregates — no
    // per-user state leaves the executors.
    "q223_ab_lift" -> { (s, d) =>
      val S = graft.functions.PortableSql.Spark
      // conversion = a HIGH-VALUE purchase (value > 150): a bare "ever
      // purchased" saturates at small SF (every user converts → pooled
      // variance 0 → z undefined)
      val users = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" &&
            expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)") > 150000L,
          1L).otherwise(0L)).as("conv"))
        .withColumn("arm", expr(s"${S.hash64("concat('ab:', user_id)")} % 2"))
      users.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c1"))
        .withColumn("rate0", expr(AbRate0F))
        .withColumn("rate1", expr(AbRate1F))
        .withColumn("z", expr(AbZF))
    },

    // CUSUM changepoint detection per event_type: the cumulative sum
    // of deviations from the series mean, S_k = Σ_{i≤k}(v_i − μ),
    // peaks (in |·|) at the most likely level-shift point. Kept
    // EXACT by scaling by n: n·S_k = n·cumsum_k − k·T (cumsum, k, T
    // all integral in the milli lane — no float mean enters). One
    // partitioned window pass for the running sum + row_number, one
    // WindowGroupLimit-shaped pick of the argmax row per type with a
    // full (abs desc, tsu, event_id) tie-break. Magnitudes: n·v ≲
    // 10¹¹ at sf0.1, ·k ≲ 10¹⁶ — inside BIGINT with 100× headroom.
    // HONEST CEILING: the statistic grows ~n²·v̄, so BIGINT overflows
    // (ANSI-fatal, not silent) at roughly n ≈ 3·10⁸ rows per series
    // with milli values — beyond that, swap the ns lane to
    // DECIMAL(38,0) (same formula; ~2× agg cost) or pre-aggregate to
    // a coarser grain before the CUSUM.
    "q219_cusum" -> { (s, d) =>
      val byType = Window.partitionBy("event_type")
      val ord = byType.orderBy(col("tsu"), col("event_id"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("vmilli",
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)"))
        .withColumn("cumv", sum("vmilli").over(run))
        .withColumn("k", row_number().over(ord).cast("long"))
        .withColumn("n", count(lit(1)).over(byType))
        .withColumn("tot", sum("vmilli").over(byType))
        .withColumn("ns", col("n") * col("cumv") - col("k") * col("tot"))
        .withColumn("pick", row_number().over(byType.orderBy(
          abs(col("ns")).desc, col("tsu"), col("event_id"))))
        .filter(col("pick") === 1)
        .select(col("event_type"), col("n"), col("k").as("cp_k"),
          col("tsu").as("cp_tsu"), col("ns").as("n_s_at_cp"),
          abs(col("ns")).as("abs_n_s"))
        .orderBy("event_type")
    },

    // Cumulative distinct users to date — the growth-curve metric
    // ("total unique users ever, by day") computed the scalable way:
    // NOT a per-day COUNT(DISTINCT over all history) rescan (O(days ×
    // events) and a giant distinct per day), but one first-seen-day
    // aggregate per user, a per-day count of first appearances, and a
    // running sum over the DAYS frame — whose cardinality is the
    // corpus' span in days, bounded by construction, so the ordered
    // window is a legitimate tiny frame (the vocab/top-k rule), not a
    // row-scale global window. n_active (plain per-day distinct)
    // rides along to give the DAU/growth pair.
    "q218_cum_distinct" -> { (s, d) =>
      val byDay = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val firstSeen = byDay.groupBy("user_id").agg(min("day").as("day"))
        .groupBy("day").agg(count(lit(1)).as("n_new"))
      val active = byDay.groupBy("day")
        .agg(count_distinct(col("user_id")).as("n_active"))
      active.join(firstSeen, Seq("day"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        .withColumn("cum_users",
          sum("n_new").over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("day", "n_new", "cum_users", "n_active")
        .orderBy("day")
    },

    // OHLC resampling bars — the time-series downsample every quote
    // pipeline ships: per (event_type, 1 h bucket) the first/last/
    // min/max value plus volume. Open/close are picked by row_number
    // over the fully tie-broken (tsu, event_id) order — the SAME
    // window text on both engines, no argmin struct-ordering dialect
    // risk — and ride as untouched doubles (no arithmetic → bit
    // identity). high/low are double min/max (exact); volume is the
    // decimal-milli integer lane. Both windows and the aggregate
    // cluster on the same (event_type, bucket) key, so the whole bar
    // build is ONE hash exchange at any scale.
    "q215_ohlc" -> { (s, d) =>
      val e = Tables.events(s, d)
        .withColumn("tsu", expr("unix_micros(ts)"))
        .withColumn("bucket_us", expr("(tsu div 3600000000) * 3600000000"))
        .withColumn("vmilli",
          expr("CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT)"))
      val grp = Window.partitionBy("event_type", "bucket_us")
      e.withColumn("rn_a",
          row_number().over(grp.orderBy(col("tsu"), col("event_id"))))
        .withColumn("rn_d",
          row_number().over(grp.orderBy(col("tsu").desc, col("event_id").desc)))
        .groupBy("event_type", "bucket_us")
        .agg(max(when(col("rn_a") === 1, col("value"))).as("open"),
          max("value").as("high"), min("value").as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"),
          count(lit(1)).as("n"), sum("vmilli").as("vol_milli"))
        .orderBy("event_type", "bucket_us")
    }
  )

  val oracles: Map[String, String] = Map(
    "q245_weekly_churn" ->
      """WITH m AS (
        |  SELECT DISTINCT user_id,
        |    (epoch_us(ts::TIMESTAMP) // 86400000000) // 7 AS mi
        |  FROM events),
        |x AS (
        |  SELECT user_id, mi,
        |    LEAD(mi) OVER (PARTITION BY user_id ORDER BY mi) AS next_mi
        |  FROM m),
        |t AS (SELECT MAX(mi) AS last_mi FROM m)
        |SELECT mi, COUNT(*) AS n_active,
        |  CAST(SUM(CASE WHEN next_mi IS NULL OR next_mi > mi + 1
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
        |  CAST(SUM(CASE WHEN next_mi IS NULL OR next_mi > mi + 1
        |               THEN 1 ELSE 0 END) AS BIGINT) * 1000 // COUNT(*)
        |    AS churn_milli
        |FROM x, t WHERE mi < last_mi
        |GROUP BY mi ORDER BY mi""".stripMargin,

    "q248_cohort_retention" ->
      """WITH m AS (
        |  SELECT DISTINCT user_id,
        |    (epoch_us(ts::TIMESTAMP) // 86400000000) // 7 AS mi
        |  FROM events),
        |c AS (SELECT user_id, MIN(mi) AS c0 FROM m GROUP BY 1),
        |s AS (SELECT c0, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM c GROUP BY 1),
        |a AS (
        |  SELECT c.c0, m.mi - c.c0 AS off, COUNT(*) AS n_active
        |  FROM m JOIN c ON m.user_id = c.user_id
        |  GROUP BY 1, 2)
        |SELECT a.c0, off, n_cohort, n_active,
        |       n_active * 1000 // n_cohort AS ret_milli
        |FROM a JOIN s ON a.c0 = s.c0
        |ORDER BY a.c0, off""".stripMargin,

    "q236_idle_gaps" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events),
        |b AS (
        |  SELECT user_id, tsu AS bt, CAST(1 AS BIGINT) AS delta, event_id FROM e
        |  UNION ALL
        |  SELECT user_id, tsu + 300000000, CAST(-1 AS BIGINT), event_id FROM e),
        |c AS (
        |  SELECT user_id, bt,
        |    CAST(SUM(delta) OVER w AS BIGINT) AS cov,
        |    LEAD(bt) OVER w2 AS nxt
        |  FROM b
        |  WINDOW w AS (PARTITION BY user_id ORDER BY bt, delta DESC, event_id
        |               ROWS UNBOUNDED PRECEDING),
        |         w2 AS (PARTITION BY user_id ORDER BY bt, delta DESC, event_id)),
        |g AS (
        |  SELECT user_id,
        |    CASE WHEN cov = 0 AND nxt IS NOT NULL THEN nxt - bt
        |         ELSE 0 END AS gap_us
        |  FROM c)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN gap_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
        |  CAST(SUM(gap_us) AS BIGINT) AS idle_us_sum,
        |  CAST(MAX(CASE WHEN gap_us > 0 THEN gap_us ELSE 0 END) AS BIGINT)
        |    AS max_gap_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q238_gap_histogram" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events),
        |g AS (
        |  SELECT tsu - LAG(tsu) OVER (PARTITION BY user_id
        |                              ORDER BY tsu, event_id) AS gap_us
        |  FROM e)
        |SELECT CAST(length(bin(gap_us)) AS BIGINT) AS bucket,
        |  COUNT(*) AS n, MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us
        |FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q230_longest_streak" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
        |               AS INTEGER) AS grp
        |  FROM days),
        |runs AS (
        |  SELECT user_id, grp, COUNT(*) AS streak_days,
        |         MIN(day) AS start_day
        |  FROM r GROUP BY 1, 2),
        |best AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |            ORDER BY streak_days DESC, start_day) AS rk
        |  FROM runs)
        |SELECT user_id, streak_days, start_day
        |FROM best WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "q231_benford" ->
      s"""WITH p AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
        |  FROM orders),
        |c AS (
        |  SELECT CAST(substr(CAST(pc AS VARCHAR), 1, 1) AS BIGINT) AS d,
        |         COUNT(*) AS n_obs
        |  FROM p GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_tot FROM c)
        |SELECT d, n_obs,
        |  n_obs * 1000000 // n_tot AS share_micro,
        |  $BenfordMicroF AS benford_micro,
        |  ABS(n_obs * 1000000 // n_tot - ($BenfordMicroF)) AS dev_micro
        |FROM c, t ORDER BY d""".stripMargin,

    "q232_session_entry" ->
      s"""WITH $duckSessionCtes,
        |x AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, session_id
        |                       ORDER BY tsu, event_id) AS rn_a,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id, session_id)
        |         AS BIGINT) AS n_ev,
        |    MAX(tsu) OVER (PARTITION BY user_id, session_id)
        |      - MIN(tsu) OVER (PARTITION BY user_id, session_id) AS span_us
        |  FROM g)
        |SELECT event_type AS entry_type, COUNT(*) AS n_sessions,
        |  CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
        |  CAST(SUM(span_us) AS BIGINT) AS span_us_sum,
        |  CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000
        |    // COUNT(*) AS bounce_milli,
        |  CAST(SUM(span_us) AS BIGINT) // COUNT(*) AS avg_span_us
        |FROM x WHERE rn_a = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q225_event_trigrams" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events),
        |t AS (
        |  SELECT event_type AS e1,
        |    LEAD(event_type, 1) OVER w AS e2,
        |    LEAD(event_type, 2) OVER w AS e3,
        |    user_id
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id))
        |SELECT e1, e2, e3, COUNT(*) AS n,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM t WHERE e3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin,

    "q229_conversion_latency" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events),
        |s AS (
        |  SELECT user_id, MIN(tsu) AS s_tsu,
        |    CAST(year(make_timestamp(MIN(tsu))) * 100
        |         + month(make_timestamp(MIN(tsu))) AS BIGINT) AS cohort
        |  FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, MIN(tsu) AS p_tsu
        |  FROM e JOIN s ON e.user_id = s.user_id
        |  WHERE event_type = 'purchase' AND tsu >= s_tsu
        |  GROUP BY e.user_id)
        |SELECT cohort, COUNT(*) AS n_signup,
        |  COUNT(p_tsu) AS n_converted,
        |  CAST(SUM(CASE WHEN p_tsu IS NULL THEN 0 ELSE p_tsu - s_tsu END)
        |       AS BIGINT) AS lat_us_sum,
        |  CASE WHEN COUNT(p_tsu) = 0 THEN NULL
        |       ELSE CAST(SUM(CASE WHEN p_tsu IS NULL THEN 0
        |                          ELSE p_tsu - s_tsu END)
        |            // COUNT(p_tsu) AS BIGINT) END AS avg_lat_us
        |FROM s LEFT JOIN p ON s.user_id = p.user_id
        |GROUP BY cohort ORDER BY cohort""".stripMargin,

    "q288_type_diversity" ->
      """WITH per AS (
        |  SELECT user_id, COUNT(*) AS k FROM (
        |    SELECT DISTINCT user_id, event_type FROM events)
        |  GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM per)
        |SELECT k, COUNT(*) AS n, n_users,
        |  CAST(COUNT(*) AS BIGINT) * 1000 // n_users AS share_milli
        |FROM per, t GROUP BY k, n_users ORDER BY k""".stripMargin,

    "q284_second_order_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events),
        |l AS (
        |  SELECT event_type AS nxt,
        |    LAG(event_type, 1) OVER w AS p1,
        |    LAG(event_type, 2) OVER w AS p2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
        |c AS (
        |  SELECT p2, p1, nxt, COUNT(*) AS n
        |  FROM l WHERE p2 IS NOT NULL GROUP BY 1, 2, 3),
        |x AS (
        |  SELECT *, CAST(SUM(n) OVER (PARTITION BY p2, p1) AS BIGINT) AS n_ctx
        |  FROM c)
        |SELECT p2, p1, nxt, n, n_ctx, n * 1000 // n_ctx AS share_milli
        |FROM x WHERE n_ctx >= 10
        |ORDER BY p2, p1, nxt""".stripMargin,

    "q282_audience_overlap" ->
      """WITH tu AS (
        |  SELECT DISTINCT event_type AS t, user_id FROM events),
        |sz AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY 1),
        |iv AS (
        |  SELECT a.t AS t_a, b.t AS t_b, CAST(COUNT(*) AS BIGINT) AS n_inter
        |  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT t_a, t_b, sa.n AS n_a, sb.n AS n_b, n_inter,
        |  sa.n + sb.n - n_inter AS n_union,
        |  n_inter * 1000 // (sa.n + sb.n - n_inter) AS jaccard_milli
        |FROM iv
        |JOIN sz sa ON t_a = sa.t
        |JOIN sz sb ON t_b = sb.t
        |ORDER BY t_a, t_b""".stripMargin,

    "q277_burstiness" -> {
      s"""WITH c AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2
        |  FROM c GROUP BY 1)
        |SELECT user_id, n, s1, s2, $FanoF AS fano
        |FROM a ORDER BY user_id""".stripMargin
    },

    "q265_hourly_profile" ->
      """WITH c AS (
        |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hh,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |x AS (
        |  SELECT *,
        |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_type,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |                       ORDER BY n DESC, hh) AS pk
        |  FROM c)
        |SELECT event_type, hh, n,
        |  n * 1000 // n_type AS share_milli,
        |  pk = 1 AS is_peak
        |FROM x ORDER BY event_type, hh""".stripMargin,

    "q261_asof_tolerance" ->
      s"""WITH $duckClickPurchCtes,
         |g AS (
         |  SELECT c.event_id,
         |    CASE WHEN p.pid IS NOT NULL THEN c.tsu - p.ptsu END AS gap_us
         |  FROM clicks c ASOF LEFT JOIN purch p
         |    ON c.user_id = p.user_id AND c.tsu >= p.ptsu)
         |SELECT COUNT(*) AS n_clicks,
         |  CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 60000000
         |               THEN 1 ELSE 0 END) AS BIGINT) AS n_le_60s,
         |  CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 300000000
         |               THEN 1 ELSE 0 END) AS BIGINT) AS n_le_300s,
         |  CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 3600000000
         |               THEN 1 ELSE 0 END) AS BIGINT) AS n_le_3600s,
         |  CASE WHEN COUNT(*) = 0 THEN NULL ELSE
         |    CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 60000000
         |                 THEN 1 ELSE 0 END) AS BIGINT) * 1000 // COUNT(*)
         |    END AS rate_60s_milli,
         |  CASE WHEN COUNT(*) = 0 THEN NULL ELSE
         |    CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 300000000
         |                 THEN 1 ELSE 0 END) AS BIGINT) * 1000 // COUNT(*)
         |    END AS rate_300s_milli,
         |  CASE WHEN COUNT(*) = 0 THEN NULL ELSE
         |    CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 3600000000
         |                 THEN 1 ELSE 0 END) AS BIGINT) * 1000 // COUNT(*)
         |    END AS rate_3600s_milli
         |FROM g""".stripMargin,

    "q262_session_penetration" ->
      s"""WITH $duckSessionCtes,
         |st AS (
         |  SELECT DISTINCT user_id, session_id, event_type FROM g),
         |t AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions
         |  FROM (SELECT DISTINCT user_id, session_id FROM st))
         |SELECT event_type, COUNT(*) AS n_with, n_sessions,
         |  CAST(COUNT(*) AS BIGINT) * 1000 // n_sessions AS pen_milli
         |FROM st, t GROUP BY event_type, n_sessions
         |ORDER BY event_type""".stripMargin,

    "q257_freshness" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts::TIMESTAMP) AS tsu FROM events),
        |h AS (SELECT MAX(tsu) AS hw_tsu FROM e)
        |SELECT event_type, COUNT(*) AS n, MAX(tsu) AS last_tsu,
        |  (hw_tsu - MAX(tsu)) // 1000000 AS lag_s,
        |  (hw_tsu - MAX(tsu)) // 1000000 > 3600 AS stale
        |FROM e, h GROUP BY event_type, hw_tsu
        |ORDER BY event_type""".stripMargin,

    "q258_volume_anomaly" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |x AS (
        |  SELECT day, n, LAG(n) OVER (ORDER BY day) AS prev_n FROM d)
        |SELECT day, n, prev_n,
        |  CASE WHEN prev_n IS NULL OR prev_n = 0 THEN NULL
        |       ELSE n * 1000 // prev_n END AS ratio_milli,
        |  CASE WHEN prev_n IS NULL OR prev_n = 0 THEN NULL
        |       ELSE n * 1000 // prev_n > 2000 OR n * 1000 // prev_n < 500
        |  END AS anomalous
        |FROM x ORDER BY day""".stripMargin,

    "q253_ecdf_probes" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS vmilli
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN vmilli <= 100000 THEN 1 ELSE 0 END) AS BIGINT) AS le_100000,
        |  CAST(SUM(CASE WHEN vmilli <= 250000 THEN 1 ELSE 0 END) AS BIGINT) AS le_250000,
        |  CAST(SUM(CASE WHEN vmilli <= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS le_500000,
        |  CAST(SUM(CASE WHEN vmilli <= 900000 THEN 1 ELSE 0 END) AS BIGINT) AS le_900000,
        |  CAST(SUM(CASE WHEN vmilli <= 100000 THEN 1 ELSE 0 END) AS BIGINT) * 1000 // COUNT(*) AS p_le_100000_milli,
        |  CAST(SUM(CASE WHEN vmilli <= 250000 THEN 1 ELSE 0 END) AS BIGINT) * 1000 // COUNT(*) AS p_le_250000_milli,
        |  CAST(SUM(CASE WHEN vmilli <= 500000 THEN 1 ELSE 0 END) AS BIGINT) * 1000 // COUNT(*) AS p_le_500000_milli,
        |  CAST(SUM(CASE WHEN vmilli <= 900000 THEN 1 ELSE 0 END) AS BIGINT) * 1000 // COUNT(*) AS p_le_900000_milli
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    "q241_group_quartiles" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS vmilli
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |         ORDER BY vmilli, event_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM e)
        |SELECT event_type, MAX(n) AS n,
        |  MAX(CASE WHEN rn * 4 >= n AND (rn - 1) * 4 < n
        |           THEN vmilli END) AS p25,
        |  MAX(CASE WHEN rn * 4 >= 2 * n AND (rn - 1) * 4 < 2 * n
        |           THEN vmilli END) AS p50,
        |  MAX(CASE WHEN rn * 4 >= 3 * n AND (rn - 1) * 4 < 3 * n
        |           THEN vmilli END) AS p75
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q243_acf_lags" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts::TIMESTAMP) AS tsu,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS v
        |  FROM events),
        |l AS (
        |  SELECT event_type, v,
        |    LAG(v, 1) OVER w AS v_1,
        |    LAG(v, 2) OVER w AS v_2,
        |    LAG(v, 3) OVER w AS v_3
        |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY tsu, event_id))
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(v * v) AS BIGINT) AS s0,
        |  CAST(SUM(v * v_1) AS BIGINT) AS s1, COUNT(v_1) AS n1,
        |  CAST(SUM(v * v_2) AS BIGINT) AS s2, COUNT(v_2) AS n2,
        |  CAST(SUM(v * v_3) AS BIGINT) AS s3, COUNT(v_3) AS n3
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,

    "q222_winsorize" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS vmilli
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |         ORDER BY vmilli, event_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM e),
        |b AS (
        |  SELECT event_type,
        |    MAX(CASE WHEN rn * 20 >= n AND (rn - 1) * 20 < n
        |             THEN vmilli END) AS p05,
        |    MAX(CASE WHEN rn * 20 >= 19 * n AND (rn - 1) * 20 < 19 * n
        |             THEN vmilli END) AS p95
        |  FROM r GROUP BY 1)
        |SELECT r.event_type, MAX(n) AS n, MAX(p05) AS p05, MAX(p95) AS p95,
        |  CAST(SUM(CASE WHEN vmilli < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(SUM(CASE WHEN vmilli > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        |  CAST(SUM(LEAST(GREATEST(vmilli, p05), p95)) AS BIGINT) AS wsum
        |FROM r JOIN b ON r.event_type = b.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q223_ab_lift" -> {
      val D = graft.functions.PortableSql.Duck
      s"""WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase'
        |             AND CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) > 150000
        |        THEN 1 ELSE 0 END) AS conv,
        |    ${D.hash64("concat('ab:', user_id)")} % 2 AS arm
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
        |  FROM u)
        |SELECT n0, c0, n1, c1,
        |  $AbRate0F AS rate0, $AbRate1F AS rate1, $AbZF AS z
        |FROM a""".stripMargin
    },

    "q219_cusum" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts::TIMESTAMP) AS tsu,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS vmilli
        |  FROM events),
        |c AS (
        |  SELECT event_type, event_id, tsu,
        |    CAST(SUM(vmilli) OVER (PARTITION BY event_type
        |         ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumv,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |         ORDER BY tsu, event_id) AS BIGINT) AS k,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(SUM(vmilli) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |  FROM e),
        |s AS (
        |  SELECT *, n * cumv - k * tot AS ns,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |         ORDER BY ABS(n * cumv - k * tot) DESC, tsu, event_id) AS pick
        |  FROM c)
        |SELECT event_type, n, k AS cp_k, tsu AS cp_tsu,
        |       ns AS n_s_at_cp, ABS(ns) AS abs_n_s
        |FROM s WHERE pick = 1 ORDER BY event_type""".stripMargin,

    "q218_cum_distinct" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |fs AS (
        |  SELECT day, COUNT(*) AS n_new FROM (
        |    SELECT user_id, MIN(day) AS day FROM e GROUP BY 1)
        |  GROUP BY 1),
        |act AS (
        |  SELECT day, COUNT(DISTINCT user_id) AS n_active FROM e GROUP BY 1)
        |SELECT act.day,
        |  CAST(COALESCE(fs.n_new, 0) AS BIGINT) AS n_new,
        |  CAST(SUM(COALESCE(fs.n_new, 0)) OVER (ORDER BY act.day
        |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users,
        |  n_active
        |FROM act LEFT JOIN fs ON act.day = fs.day
        |ORDER BY act.day""".stripMargin,

    "q215_ohlc" ->
      """WITH e AS (
        |  SELECT event_type, event_id, value,
        |    epoch_us(ts::TIMESTAMP) AS tsu,
        |    (epoch_us(ts::TIMESTAMP) // 3600000000) * 3600000000 AS bucket_us,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS vmilli
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket_us
        |                       ORDER BY tsu, event_id) AS rn_a,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket_us
        |                       ORDER BY tsu DESC, event_id DESC) AS rn_d
        |  FROM e)
        |SELECT event_type, bucket_us,
        |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  COUNT(*) AS n, CAST(SUM(vmilli) AS BIGINT) AS vol_milli
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q213_asof_state" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |                   OR lag(event_type) OVER w != event_type
        |            THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        |), g AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS island
        |  FROM f
        |), h AS (
        |  SELECT user_id, island, MAX(event_type) AS event_type,
        |         MIN(tsu) AS vf, COUNT(*) AS ne
        |  FROM g GROUP BY 1, 2
        |), iv AS (
        |  SELECT user_id, event_type, vf, ne,
        |         LEAD(vf) OVER (PARTITION BY user_id ORDER BY island) AS vt
        |  FROM h
        |), r AS (SELECT MIN(tsu) AS lo, MAX(tsu) AS hi FROM e),
        |probes AS (
        |  SELECT unnest(ARRAY[lo + (hi - lo) // 4, lo + (hi - lo) // 2,
        |                      lo + (3 * (hi - lo)) // 4]) AS p
        |  FROM r)
        |SELECT p, event_type, COUNT(*) AS n_users,
        |       CAST(SUM(ne) AS BIGINT) AS n_run_events
        |FROM iv JOIN probes
        |  ON vf <= p AND (vt IS NULL OR p < vt)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q211_hopping_window" ->
      """WITH e AS (
        |  SELECT epoch_us(ts::TIMESTAMP) AS tsu, event_type,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS vmilli
        |  FROM events),
        |x AS (
        |  SELECT (tsu // 3600000000) * 3600000000 - s.k * 3600000000
        |           AS win_start_us,
        |         event_type, vmilli
        |  FROM e, (SELECT unnest(range(0, 2)) AS k) s)
        |SELECT win_start_us, event_type, COUNT(*) AS n,
        |       CAST(SUM(vmilli) AS BIGINT) AS vmilli_sum
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q209_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS tsu,
        |    CAST(CAST(value AS DECIMAL(15,3)) * 1000 AS BIGINT) AS vmilli
        |  FROM events),
        |f AS (
        |  SELECT *, LEAD(tsu) OVER (PARTITION BY user_id
        |                            ORDER BY tsu, event_id) AS nxt
        |  FROM e),
        |g AS (
        |  SELECT user_id, vmilli,
        |         LEAST((nxt - tsu) // 1000000, 3600) AS dur_s
        |  FROM f WHERE nxt IS NOT NULL)
        |SELECT user_id, COUNT(*) AS n_iv,
        |  CAST(SUM(dur_s) AS BIGINT) AS dur_s_sum,
        |  CAST(SUM(vmilli * dur_s) AS BIGINT) AS wsum,
        |  CASE WHEN SUM(dur_s) = 0 THEN NULL
        |       ELSE CAST(SUM(vmilli * dur_s) // SUM(dur_s) AS BIGINT)
        |  END AS twap_milli
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q199_scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |                   OR lag(event_type) OVER w != event_type
        |            THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        |), g AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS island
        |  FROM f
        |), h AS (
        |  SELECT user_id, CAST(island AS BIGINT) AS island,
        |         MAX(event_type) AS event_type,
        |         MIN(tsu) AS valid_from_us, COUNT(*) AS n_events
        |  FROM g GROUP BY 1, 2
        |)
        |SELECT user_id, island, event_type, valid_from_us,
        |       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY island)
        |         AS valid_to_us,
        |       n_events
        |FROM h ORDER BY user_id, island""".stripMargin,
    "q78_date_spine" ->
      """WITH e AS (
        |  SELECT epoch_us(ts::TIMESTAMP) // 604800000000 AS wk FROM events),
        |c AS (SELECT wk, count(*) AS n_events FROM e GROUP BY wk),
        |r AS (SELECT min(wk) AS lo, max(wk) AS hi FROM e),
        |s AS (SELECT unnest(range(lo, hi + 1)) AS wk FROM r)
        |SELECT s.wk AS wk, COALESCE(c.n_events, 0) AS n_events
        |FROM s LEFT JOIN c USING (wk)
        |ORDER BY wk""".stripMargin,
    "q08_window_running" ->
      """WITH v AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, ts,
        |    SUM(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc
        |  FROM v)
        |SELECT user_id, event_id, ts,
        |  (CAST(rc // 1000000 AS DOUBLE) * 1000000.0 + CAST(rc % 1000000 AS DOUBLE)) / 100.0 AS running_value
        |FROM r
        |ORDER BY user_id, event_id""".stripMargin,

    "q09_window_lag" ->
      """SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
        | value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS value_delta
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "q21_sessionize" ->
      s"""WITH $duckSessionCtes
         |SELECT user_id, MAX(session_id) AS n_sessions, COUNT(*) AS n_events
         |FROM g
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin,

    "q104_peak_concurrency" ->
      s"""WITH $duckSessionCtes, sess AS (
        |  SELECT user_id, session_id, min(tsu) AS st, max(tsu) AS en
        |  FROM g GROUP BY user_id, session_id
        |), sw AS (
        |  SELECT st AS t, 1 AS delta FROM sess
        |  UNION ALL
        |  SELECT en + 1 AS t, -1 AS delta FROM sess
        |), c AS (
        |  SELECT t, delta,
        |    CAST(SUM(delta) OVER (ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cur
        |  FROM sw)
        |SELECT t // 86400000000 AS day, max(cur) AS peak, count(*) AS n_points
        |FROM c GROUP BY day ORDER BY day""".stripMargin,

    "q22_time_buckets" ->
      """SELECT date_trunc('hour', ts::TIMESTAMP) AS hour_ts, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q49_event_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS tsu FROM events
        |), clicks AS (
        |  SELECT user_id, MIN(tsu) AS first_click FROM e
        |  WHERE event_type = 'click' GROUP BY user_id
        |), buys AS (
        |  SELECT user_id, tsu AS buy_ts FROM e WHERE event_type = 'purchase'
        |)
        |SELECT c.user_id, COUNT(*) AS n_purchases_1h,
        |  MIN(b.buy_ts) - MIN(c.first_click) AS first_convert_us
        |FROM clicks c JOIN buys b ON c.user_id = b.user_id
        |WHERE b.buy_ts >= c.first_click AND b.buy_ts - c.first_click <= 3600000000
        |GROUP BY c.user_id
        |ORDER BY c.user_id""".stripMargin,

    "q50_asof_join" ->
      s"""WITH $duckClickPurchCtes
         |SELECT c.event_id, c.user_id, p.pid AS purchase_id,
        |  c.tsu - p.ptsu AS gap_us
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.tsu >= p.ptsu
        |ORDER BY event_id""".stripMargin,

    "q105_asof_tolerance" ->
      s"""WITH $duckClickPurchCtes
         |SELECT c.event_id, c.user_id,
        |  CASE WHEN c.tsu - p.ptsu <= 3600000000 THEN p.pid END AS purchase_id,
        |  CASE WHEN c.tsu - p.ptsu <= 3600000000 THEN c.tsu - p.ptsu END AS gap_us
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.tsu >= p.ptsu
        |ORDER BY event_id""".stripMargin,

    "q106_asof_forward" ->
      s"""WITH $duckClickPurchCtes
         |SELECT c.event_id, c.user_id, p.pid AS purchase_id,
        |  p.ptsu - c.tsu AS wait_us
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.tsu <= p.ptsu
        |ORDER BY event_id""".stripMargin,

    "q124_asof_nearest" ->
      s"""WITH $duckClickPurchCtes,
         |b AS (
         |  SELECT c.event_id, c.user_id, c.tsu, p.pid AS bpid, p.ptsu AS bptsu
         |  FROM clicks c ASOF LEFT JOIN purch p
         |    ON c.user_id = p.user_id AND c.tsu >= p.ptsu),
         |f AS (
         |  SELECT c.event_id, p.pid AS fpid, p.ptsu AS fptsu
         |  FROM clicks c ASOF LEFT JOIN purch p
         |    ON c.user_id = p.user_id AND c.tsu <= p.ptsu)
         |SELECT b.event_id, b.user_id,
         |  CASE WHEN bpid IS NOT NULL AND (fpid IS NULL OR b.tsu - bptsu <= fptsu - b.tsu)
         |       THEN bpid ELSE fpid END AS purchase_id,
         |  CASE WHEN bpid IS NOT NULL AND (fpid IS NULL OR b.tsu - bptsu <= fptsu - b.tsu)
         |       THEN b.tsu - bptsu ELSE fptsu - b.tsu END AS gap_us
         |FROM b JOIN f ON b.event_id = f.event_id
         |ORDER BY b.event_id""".stripMargin,

    "q138_gap_fill" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(value AS DECIMAL(15,3)) AS v
        |  FROM events WHERE user_id % 10 = 0),
        |daily AS (
        |  SELECT user_id, day, count(*) AS n, max(v) AS vmax
        |  FROM ev GROUP BY user_id, day),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |g AS (
        |  SELECT u.user_id, s.day
        |  FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN spine s)
        |SELECT g.user_id, g.day,
        |  COALESCE(d.n, 0) AS n,
        |  CAST(d.vmax AS DOUBLE) AS vmax,
        |  CAST(last_value(d.vmax IGNORE NULLS)
        |    OVER (PARTITION BY g.user_id ORDER BY g.day) AS DOUBLE) AS filled
        |FROM g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
        |ORDER BY g.user_id, g.day""".stripMargin,

    "q142_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS st,
        |    epoch_us(ts::TIMESTAMP) + 300000000 AS en
        |  FROM events),
        |f AS (
        |  SELECT user_id, st, en,
        |    max(en) OVER (PARTITION BY user_id ORDER BY st, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |g AS (
        |  SELECT user_id, st, en,
        |    SUM(CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY st, en
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM f),
        |sp AS (
        |  SELECT user_id, grp, min(st) AS s0, max(en) AS e1
        |  FROM g GROUP BY user_id, grp)
        |SELECT user_id, count(*) AS n_spans,
        |  CAST(sum(e1 - s0) AS BIGINT) AS covered_us,
        |  max(e1 - s0) AS max_span_us
        |FROM sp GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q143_strftime_truncate" ->
      """SELECT strftime(ts::TIMESTAMP, '%Y-%m') AS month_key,
        | strftime(ts::TIMESTAMP, '%Y-%m-%d %H') AS hour_key,
        | count(*) AS n,
        | COUNT(DISTINCT date_trunc('hour', ts::TIMESTAMP)) AS n_hours
        |FROM events
        |GROUP BY month_key, hour_key
        |ORDER BY month_key, hour_key""".stripMargin,

    "q23_json_extract" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q154_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_us(ts::TIMESTAMP) AS tsu
        |  FROM events
        |), touch AS (
        |  SELECT user_id, tsu AS ttsu, max_by(event_type, event_id) AS touch_type
        |  FROM e WHERE event_type <> 'purchase' GROUP BY user_id, tsu
        |), purch AS (
        |  SELECT user_id, tsu AS ptsu,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS vc
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, tsu
        |), j AS (
        |  SELECT p.vc, t.touch_type
        |  FROM purch p ASOF LEFT JOIN touch t
        |    ON p.user_id = t.user_id AND p.ptsu >= t.ttsu
        |)
        |SELECT coalesce(touch_type, 'none') AS touch_type,
        |  count(*) AS n_purchases,
        |  (CAST(SUM(vc) // 1000000 AS DOUBLE) * 1000000.0
        |    + CAST(SUM(vc) % 1000000 AS DOUBLE)) / 100.0 AS revenue
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q155_transitions" ->
      s"""WITH $duckSessionCtes,
         |p AS (
         |  SELECT event_type,
         |    LAG(event_type) OVER (PARTITION BY user_id, session_id
         |      ORDER BY tsu, event_id) AS prev_type
         |  FROM g),
         |c AS (
         |  SELECT prev_type, event_type AS next_type, count(*) AS n
         |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         |SELECT prev_type, next_type, n,
         |  CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total,
         |  n * 1000 // CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_milli
         |FROM c ORDER BY prev_type, next_type""".stripMargin,

    "q156_ewma" -> {
      val terms = (0 until 16).map {
        case 0 => "CAST(vc AS DOUBLE)"
        case k => s"CAST(COALESCE(LAG(vc, $k) OVER w, 0) AS DOUBLE) / ${1L << k}.0"
      }.mkString(" + ") // left-assoc parse = the Spark fold order
      s"""WITH v AS (
         |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS tsu,
         |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
         |  FROM events)
         |SELECT user_id, event_id, tsu,
         |  ($terms) / 100.0 AS ewma
         |FROM v WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
         |ORDER BY user_id, event_id""".stripMargin
    },

    "q160_rolling_median" ->
      """WITH v AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS tsu,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, vc,
        |    row_number() OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS rn,
        |    CAST(quantile_cont(vc, 0.5) OVER (PARTITION BY user_id
        |      ORDER BY tsu, event_id
        |      ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS BIGINT) AS med_c
        |  FROM v)
        |SELECT user_id, event_id, vc, med_c, vc - med_c AS dev_c,
        |  abs(vc - med_c) > 5000 AS is_spike
        |FROM r WHERE rn >= 15 ORDER BY user_id, event_id""".stripMargin,

    "q161_rolling_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts::TIMESTAMP) // 86400000000 AS day
        |  FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY day),
        |b AS (SELECT max(day) AS hi FROM ud),
        |wx AS (
        |  SELECT user_id, unnest(range(day, day + 7)) AS day FROM ud),
        |wau AS (
        |  SELECT day, count(DISTINCT user_id) AS wau FROM wx
        |  WHERE day <= (SELECT hi FROM b) GROUP BY day)
        |SELECT w.day AS day, coalesce(d.dau, 0) AS dau, w.wau AS wau,
        |  coalesce(d.dau, 0) * 1000 // w.wau AS stickiness_milli
        |FROM wau w LEFT JOIN dau d ON w.day = d.day
        |ORDER BY day""".stripMargin,

    "q162_funnel_ordered" ->
      s"""WITH $duckSessionCtes,
         |s1 AS (
         |  SELECT user_id, session_id, min(tsu) AS t1
         |  FROM g WHERE event_type = 'signup' GROUP BY user_id, session_id),
         |s2 AS (
         |  SELECT g.user_id, g.session_id, min(g.tsu) AS t2
         |  FROM g JOIN s1 ON g.user_id = s1.user_id AND g.session_id = s1.session_id
         |  WHERE g.event_type = 'click' AND g.tsu >= s1.t1
         |  GROUP BY g.user_id, g.session_id),
         |s3 AS (
         |  SELECT g.user_id, g.session_id, min(g.tsu) AS t3
         |  FROM g JOIN s2 ON g.user_id = s2.user_id AND g.session_id = s2.session_id
         |  WHERE g.event_type = 'purchase' AND g.tsu >= s2.t2
         |  GROUP BY g.user_id, g.session_id),
         |ns AS (
         |  SELECT user_id, count(DISTINCT session_id) AS n_sessions
         |  FROM g GROUP BY user_id),
         |c1 AS (SELECT user_id, count(*) AS n_signup FROM s1 GROUP BY user_id),
         |c2 AS (SELECT user_id, count(*) AS n_click_after FROM s2 GROUP BY user_id),
         |c3 AS (SELECT user_id, count(*) AS n_full_funnel FROM s3 GROUP BY user_id)
         |SELECT ns.user_id AS user_id, ns.n_sessions,
         |  coalesce(c1.n_signup, 0) AS n_signup,
         |  coalesce(c2.n_click_after, 0) AS n_click_after,
         |  coalesce(c3.n_full_funnel, 0) AS n_full_funnel
         |FROM ns LEFT JOIN c1 ON ns.user_id = c1.user_id
         |        LEFT JOIN c2 ON ns.user_id = c2.user_id
         |        LEFT JOIN c3 ON ns.user_id = c3.user_id
         |ORDER BY ns.user_id""".stripMargin,

    "q64_retention" ->
      """WITH w AS (
        |  SELECT DISTINCT user_id, epoch_us(ts::TIMESTAMP) // 604800000000 AS wk
        |  FROM events),
        |act AS (SELECT wk, count(*) AS n_active FROM w GROUP BY wk),
        |ret AS (
        |  SELECT a.wk, count(*) AS n_retained
        |  FROM w a JOIN w b ON a.user_id = b.user_id AND b.wk = a.wk + 1
        |  GROUP BY a.wk)
        |SELECT act.wk AS wk, n_active,
        | coalesce(n_retained, 0) AS n_retained,
        | CAST(coalesce(n_retained, 0) AS DOUBLE) / n_active AS retention
        |FROM act LEFT JOIN ret ON act.wk = ret.wk
        |ORDER BY act.wk""".stripMargin
  )
}
