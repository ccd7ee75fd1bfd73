package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Core relational operator surface (SURVEY.md §2.2, §2.4, §2.5 analogs on
  * the driver testdata): scan + filter pushdown, projection, aggregation,
  * broadcast and shuffle joins, semi/anti joins, window dedup
  * (closest-match pattern of `ztf/xmatch/processor.py:168`), top-k,
  * explode, union/distinct, when-cascade classification
  * (`ztf/asteroids/processor.py:120-166` shape), higher-order array
  * functions (`ztf/nalerthist/processor.py:66` shape), time-bucketed
  * aggregation, and regexp scalar extraction.
  */
object Relational extends QueryPack {

  // q1: TPC-H Q1-style full-scan aggregation; partial (map-side) agg +
  // single shuffle on the 9 group keys. Exact decimal sums -> stable hash.
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // q2: revenue per nation — two broadcast joins (supplier, nation are
  // tiny dims; at 100 TB lineitem they must NOT shuffle the fact table).
  private def q2NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val su = t(s, dir, "supplier")
    val na = t(s, dir, "nation")
    li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  // q3: shuffle join orders x lineitem (both large at scale; AQE handles
  // skew), date-range filter pushed to the orders parquet scan.
  private def q3PriorityRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1996-01-01"))
    val li = t(s, dir, "lineitem")
    o.join(li, o("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        sumd(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  // q4: TPC-H Q6-style selective scan — predicate must reach PushedFilters.
  private def q4FilterPushdown(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1994-01-01") && col("l_shipdate") < lit("1995-01-01") &&
        col("l_discount") >= 0.04 && col("l_discount") <= 0.06 && col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          col("l_discount").cast("decimal(4,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  // q5: closest-match window dedup — the reference's groupby-idxmin dedup
  // (`ztf/xmatch/processor.py:168`) as row_number over a window.
  private def q5WindowDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy("l_orderkey")
  }

  // q6: global top-k with total-order tie-break (TakeOrderedAndProject —
  // no full sort at scale).
  private def q6TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), col("o_totalprice"))

  // q7: left-semi join (EXISTS).
  private def q7SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  // q8: left-anti join (NOT EXISTS) — customers with no high-value order.
  private def q8AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  // q9: union + distinct (`pd.concat` analog, SURVEY §2.5).
  private def q9UnionDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")

  // q10: explode/token-count (explode(arrays_zip) analog, SURVEY §2.5).
  private def q10ExplodeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(org.apache.spark.sql.graft.TokenizeSpace
        .pinned(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(20)

  // q11: when-cascade classification — the `roid_catcher` flag shape
  // (`ztf/asteroids/processor.py:120-166`) on the events table.
  private def q11CaseCascade(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("klass",
        when(col("event_type") === "error" && col("value") > 150.0, 3)
          .when(col("event_type") === "purchase" && col("value") > 100.0, 2)
          .when(col("value") > 50.0, 1)
          .otherwise(0))
      .groupBy(col("klass"))
      .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
      .orderBy("klass")

  // q12: per-key array assembly + higher-order functions — concat_col +
  // nalerthist shape (`size(filter(arr, pred))`, SURVEY §1.4/§2.3) over
  // collect_list; sort_array gives a deterministic array.
  private def q12HofArray(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("value"))).as("vals"))
      .select(
        col("user_id"),
        size(col("vals")).cast("long").as("n_total"),
        size(expr("filter(vals, x -> x > 100.0)")).cast("long").as("n_gt100"),
        element_at(col("vals"), -1).as("max_value"))
      .orderBy("user_id")

  // q13: event-time bucketed aggregation (streaming-window analog run in
  // batch; epoch seconds out to avoid timestamp encoding mismatches).
  private def q13TimeBucket(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("HOUR", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
      .select(unix_timestamp(col("h")).as("h_epoch"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("h_epoch", "event_type")

  // q14: scalar regexp extraction from a string payload (split/cast
  // unpack shape, `ztf/xmatch/processor.py:287-294`).
  private def q14RegexpExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  // q15: boolean DNF over many columns — the `real_transient` shape
  // (`ztf/transient_features/processor.py:187-250`).
  private def q15BooleanDnf(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("flagged",
        ((col("l_returnflag") === "R" && col("l_discount") > 0.05) ||
         (col("l_quantity") >= 30.0 && col("l_tax") < 0.03) ||
         (col("l_extendedprice") > 50000.0 && !(col("l_linestatus") === "F"))).cast("int"))
      .groupBy(col("l_linestatus"))
      .agg(sum(col("flagged")).as("n_flagged"), count(lit(1)).as("n_total"))
      .orderBy("l_linestatus")

  // q18: multi-level ROLLUP aggregation with grouping_id — subtotal
  // tables in one pass (Catalyst expands the grouping sets into a
  // single partial-aggregatable hash aggregate, not one scan per
  // level). Exact decimal sum -> stable cross-engine hash.
  private def q18Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        sumd(col("l_quantity")).as("sum_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  // q21: pivot — long-to-wide reshaping with an EXPLICIT value list
  // (pivot without one pays a distinct-scan to discover columns, and
  // an unbounded value set is a schema-explosion hazard at scale);
  // compiles to ONE pass with conditional aggregates, not one scan
  // per pivot value. Exact decimal sums keep the cells hash-stable.
  private def q21Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sumd(col("l_quantity")))
      .orderBy("l_linestatus")

  // q20: point-in-interval join — each URGENT order's date against the
  // 2-day ship window [l_shipdate, l_shipdate + 2d) of every lineitem.
  // A raw range theta-join gives Catalyst no equi-key and compiles to
  // a nested-loop O(|orders| x |lineitem|) plan; ScaleJoins.intervalJoin
  // explodes each window into coarse day buckets and equi-joins on the
  // bucket key instead (plan-pinned BNLJ-free in PlanSpec). Day numbers
  // keep every comparison integer-exact across engines.
  private def q20IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("o_day"))
    // EAGER AGGREGATION below the interval join: the per-order rollup
    // needs only per-ship-day partials (a count and an exact decimal
    // sum — both reassociate exactly), so lineitem collapses to one
    // row per distinct ship day BEFORE bucket expansion. The matched
    // intermediate becomes |orders| x <= (window/bucket + 1) day rows,
    // independent of per-day item density — joining raw items instead
    // grows with density^2 when more data lands on the same date range
    // (measured 18x runtime at the 10x same-range sf1 stress before
    // this collapse; ~1.44B matched item pairs vs ~600k day pairs).
    val liDay = t(s, dir, "lineitem")
      .select(
        datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("ship_day"),
        dec(col("l_quantity")).as("qd"))
      .groupBy("ship_day")
      .agg(count(lit(1)).as("day_cnt"), sum(col("qd")).as("day_qty"))
      .withColumn("ship_end", col("ship_day") + lit(2L))
    graft.functions.ScaleJoins
      .intervalJoin(ord, "o_day", liDay, "ship_day", "ship_end", bucketWidth = 2L)
      .groupBy("o_orderkey")
      .agg(sum(col("day_cnt")).as("n_shipped"),
        sum(col("day_qty")).cast("double").as("sum_qty"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_join_broadcast" -> (q2NationRevenue _),
    "q3_join_shuffle" -> (q3PriorityRevenue _),
    "q4_filter_pushdown" -> (q4FilterPushdown _),
    "q5_window_dedup" -> (q5WindowDedup _),
    "q6_topk" -> (q6TopK _),
    "q7_semi_join" -> (q7SemiJoin _),
    "q8_anti_join" -> (q8AntiJoin _),
    "q9_union_distinct" -> (q9UnionDistinct _),
    "q10_explode_tokens" -> (q10ExplodeTokens _),
    "q11_case_cascade" -> (q11CaseCascade _),
    "q12_hof_array" -> (q12HofArray _),
    "q13_time_bucket" -> (q13TimeBucket _),
    "q14_regexp_extract" -> (q14RegexpExtract _),
    "q15_boolean_dnf" -> (q15BooleanDnf _),
    "q18_rollup" -> (q18Rollup _),
    "q20_interval_join" -> (q20IntervalJoin _),
    "q21_pivot" -> (q21Pivot _))

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${sqlSumd("l_quantity")} AS sum_qty,
         |${sqlSumd("l_extendedprice")} AS sum_base_price,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
         |CAST(SUM(${sqlDec("l_discount")}) AS DOUBLE) / COUNT(*) AS avg_disc,
         |COUNT(*) AS count_order
         |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_join_broadcast" ->
      s"""SELECT n_name,
         |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
         |COUNT(*) AS n_items
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q3_join_shuffle" ->
      s"""SELECT o_orderpriority,
         |COUNT(DISTINCT o_orderkey) AS n_orders,
         |${sqlSumd("l_extendedprice")} AS sum_price
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q4_filter_pushdown" ->
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         |COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
         |AND l_discount >= 0.04 AND l_discount <= 0.06 AND l_quantity < 24""".stripMargin,
    "q5_window_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber ASC) = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q6_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q7_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q9_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
        |SELECT c_nationkey AS nationkey FROM customer
        |UNION ALL SELECT s_nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "q10_explode_tokens" ->
      """SELECT token, COUNT(*) AS cnt FROM (
        |SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
        |GROUP BY 1 ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin,
    "q11_case_cascade" ->
      s"""SELECT CASE
         |WHEN event_type = 'error' AND value > 150.0 THEN 3
         |WHEN event_type = 'purchase' AND value > 100.0 THEN 2
         |WHEN value > 50.0 THEN 1 ELSE 0 END AS klass,
         |COUNT(*) AS n, ${sqlSumd("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_hof_array" ->
      """SELECT user_id, CAST(len(vals) AS BIGINT) AS n_total,
        |CAST(len(list_filter(vals, x -> x > 100.0)) AS BIGINT) AS n_gt100,
        |vals[-1] AS max_value
        |FROM (SELECT user_id, list_sort(list(value)) AS vals FROM events GROUP BY 1)
        |ORDER BY user_id""".stripMargin,
    "q13_time_bucket" ->
      s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h_epoch, event_type,
         |COUNT(*) AS n, ${sqlSumd("value")} AS sum_value
         |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q14_regexp_extract" ->
      """SELECT event_type,
        |CAST(SUM(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |CAST(MAX(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS max_k,
        |COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |COUNT(*) AS n,
         |${sqlSumd("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY gid, 1, 2""".stripMargin,
    "q15_boolean_dnf" ->
      """SELECT l_linestatus,
        |CAST(SUM(CAST(((l_returnflag = 'R' AND l_discount > 0.05)
        |OR (l_quantity >= 30.0 AND l_tax < 0.03)
        |OR (l_extendedprice > 50000.0 AND NOT (l_linestatus = 'F'))) AS INT)) AS BIGINT) AS n_flagged,
        |COUNT(*) AS n_total
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // q20: DuckDB evaluates the range predicate directly (its IEJoin
    // handles interval joins natively); dates are day-granular so the
    // timestamp comparison equals the Spark side's day-number one.
    "q20_interval_join" ->
      s"""SELECT o_orderkey, COUNT(*) AS n_shipped, ${sqlSumd("l_quantity")} AS sum_qty
         |FROM orders JOIN lineitem
         |ON o_orderdate >= l_shipdate AND o_orderdate < l_shipdate + INTERVAL 2 DAY
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q21: pivot = conditional aggregation; Spark names single-agg
    // pivot columns by the bare pivot value.
    "q21_pivot" ->
      s"""SELECT l_linestatus,
         |CAST(SUM(${sqlDec("l_quantity")}) FILTER (WHERE l_returnflag = 'A') AS DOUBLE) AS "A",
         |CAST(SUM(${sqlDec("l_quantity")}) FILTER (WHERE l_returnflag = 'N') AS DOUBLE) AS "N",
         |CAST(SUM(${sqlDec("l_quantity")}) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS "R"
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
}
