package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query inventory over the TPC-H-ish testdata tables.
  *
  * These exercise the relational shell around the vector engine
  * (SURVEY §2.6): joins, aggregation, windows, rollup, set ops, string/
  * date/json scalar functions. Every query has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]].
  *
  * Float-determinism policy (drives the driver's hash compare): sums of
  * doubles are computed over exact DECIMAL(18,2) casts, then the exact
  * aggregate is cast back to DOUBLE — order-independent, so Spark's
  * parallel aggregation and DuckDB's sequential one agree bit-for-bit.
  * min/max/count are naturally order-independent.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  /** Reads the events table regardless of how the generator stored `ts`:
    * historical fixtures used parquet timestamp[ns] (which Spark only
    * reads as int64 under the `nanosAsLong` legacy conf), current ones
    * use timestamp[us]. Sniff the resolved type and normalize both to
    * TIMESTAMP_NTZ so every downstream query sees one shape. The ns
    * branch truncates toward zero to micros — exactly DuckDB's ns→us
    * cast, measured on pre-epoch values too (parquet timestamp[ns]
    * −1500/−999/−2001 ns → DuckDB −1/0/−2 µs: truncation, not floor),
    * so the oracle agrees for any epoch sign. InventorySpec pins the
    * measured table.
    *
    * Conf hygiene: the legacy conf must be ON while reading the footer
    * (schema resolution rejects INT64(TIMESTAMP_NANOS) without it) and
    * — for ns fixtures only — must STAY on until the query executes,
    * because the parquet scan re-reads it from the session conf when
    * the file reader is built (execution time, not `read` time). The
    * sniff therefore runs on an ISOLATED `newSession()` (shared
    * SparkContext/catalog/cache, its own conf copy): on the legacy-ns
    * branch the conf stays set THERE for the returned plan's whole
    * lifetime, and the caller's session conf is never touched on any
    * branch (InventorySpec asserts both). The µs branch re-reads
    * through the caller's session so current-fixture plans carry the
    * caller's own conf; the second footer read is metadata-cached. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val iso = s.newSession()
    // newSession() starts from SparkContext defaults, NOT the caller's
    // runtime SQL confs — copy them over first so a legacy-ns frame
    // executes with the caller's settings (shuffle.partitions, ANSI,
    // timezone, …) and ONLY the nanos flag differs. Settable-only copy:
    // getAll includes static/spark-core entries newSession rejects.
    s.conf.getAll.foreach { case (k, v) =>
      if (s.conf.isModifiable(k)) iso.conf.set(k, v)
    }
    iso.conf.set(key, "true")
    val raw = iso.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral division: ns values (~2^60) overflow double's mantissa,
        // so a float divide would drift by ±1 µs on some rows.
        // Deliberately iso-bound: event queries build FROM this frame,
        // so their actions execute under iso's conf, where the
        // load-bearing legacy flag lives
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        s.read.parquet(s"$dir/events.parquet")
          .withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary. Single scan, partial aggregation
    * map-side; grouping key cardinality ~6 → no skew at any scale. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Star-schema join: revenue per nation. Dims (customer/nation/region)
    * are broadcast — lineitem⋈orders is the only shuffle at scale. */
  def q02RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val q02Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Window ranking: top-3 orders per customer by price. */
  def q03TopOrdersPerCust(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  val q03Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders)
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** Semi-join (EXISTS): orders having a late-shipped lineitem. */
  def q04LateOrders(s: SparkSession, dir: String): DataFrame = {
    val late = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    t(s, dir, "orders")
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Anti-join (NOT EXISTS): parts never ordered. */
  def q05PartsNeverOrdered(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .join(t(s, dir, "lineitem").select(col("l_partkey")),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  val q05Sql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |ORDER BY p_partkey""".stripMargin

  /** ROLLUP aggregation over order status/priority. */
  def q06Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q06Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Set op: INTERSECT of big-spender custkeys and positive-balance
    * customers. */
  def q07Intersect(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "orders").filter(col("o_totalprice") > 1000.0)
      .select(col("o_custkey").as("custkey"))
    val b = t(s, dir, "customer").filter(col("c_acctbal") > 0.0)
      .select(col("c_custkey").as("custkey"))
    a.intersect(b).orderBy(col("custkey"))
  }

  val q07Sql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 1000.0
      |INTERSECT
      |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0.0
      |ORDER BY custkey""".stripMargin

  /** Time-bucketed aggregation over the events table (the batch twin of
    * the streaming tumbling window in graft.streaming). */
  def q08EventsHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("hour", date_trunc("hour", col("ts")))
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  val q08Sql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Running total per user (window frame aggregation). */
  def q09RunningTotal(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("running_value", sum(dec(col("value"))).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q09Sql: String =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** DISTINCT aggregation. */
  def q10DistinctUsers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  val q10Sql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Scalar string functions. */
  def q11PartStrings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_type")).as("u_type"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  val q11Sql: String =
    """SELECT p_partkey, upper(p_type) AS u_type, substring(p_name, 1, 8) AS name_prefix,
      |  length(p_name) AS name_len, concat_ws('/', p_brand, p_type) AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  /** JSON extraction from the events props column. */
  def q12JsonProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q12Sql: String =
    """SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Multi-way broadcast join: customers per region. */
  def q13CustomersPerRegion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        max(col("c_acctbal")).as("max_bal"),
        min(col("c_acctbal")).as("min_bal"))
      .orderBy(col("r_name"))

  val q13Sql: String =
    """SELECT r_name, COUNT(*) AS n_customers, MAX(c_acctbal) AS max_bal, MIN(c_acctbal) AS min_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Date functions: orders per month. */
  def q14OrdersByMonth(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("month", date_trunc("month", col("o_orderdate")))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_price"))
      .orderBy(col("month"))

  val q14Sql: String =
    """SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Grouped min/max/count per market segment. */
  def q15SegmentStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        max(col("c_acctbal")).as("max_bal"),
        min(col("c_acctbal")).as("min_bal"),
        (sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
      .orderBy(col("c_mktsegment"))

  val q15Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n, MAX(c_acctbal) AS max_bal, MIN(c_acctbal) AS min_bal,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** CUBE over status × priority. */
  def q16Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val q16Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** LEFT OUTER join with null-side aggregation: customers with their
    * order counts, including customers with none. */
  def q17OuterJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("c_custkey"))

  val q17Sql: String =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** Conditional pivot: one column per event type via CASE aggregation
    * (engine-portable pivot). */
  def q18Pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val aggs = types.map { ty =>
      sum(when(col("event_type") === ty, 1).otherwise(0)).as(s"n_$ty")
    }
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("user_id"))
  }

  val q18Sql: String = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val cols = types.map(ty =>
      s"CAST(SUM(CASE WHEN event_type = '$ty' THEN 1 ELSE 0 END) AS BIGINT) AS n_$ty").mkString(",\n  ")
    s"""SELECT user_id, $cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** Correlated-style query: customers above their nation's average
    * balance (expressed as a window, identical semantics). */
  def q19AboveNationAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
    t(s, dir, "customer")
      .withColumn("nation_cnt", count(lit(1)).over(w))
      .withColumn("nation_avg",
        (sum(dec(col("c_acctbal"))).over(w).cast("double") / col("nation_cnt")))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        col("nation_avg"))
      .orderBy(col("c_custkey"))
  }

  val q19Sql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal, nation_avg FROM (
      |  SELECT c_custkey, c_nationkey, c_acctbal,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY c_nationkey) AS DOUBLE)
      |      / COUNT(*) OVER (PARTITION BY c_nationkey) AS nation_avg
      |  FROM customer)
      |WHERE c_acctbal > nation_avg ORDER BY c_custkey""".stripMargin

  /** The Structured-Streaming tumbling-window aggregation executed in
    * batch (same expression graft.streaming.EventStream uses under
    * readStream): epoch-aligned 1-hour windows ≡ date_trunc. */
  def s01StreamWindows(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("ws"), col("event_type"))

  val s01Sql: String =
    """SELECT date_trunc('hour', ts) AS ws,
      |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS we, event_type,
      |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2, 3 ORDER BY ws, event_type""".stripMargin

  /** Streaming per-user running totals as a REAL Structured Streaming
    * run (AvailableNow over staged event files → `EventStream
    * .sessionize`'s mapGroupsWithState → memory sink in update mode):
    * every micro-batch emits each touched user's running
    * (n_events, total) state; the final state per user — the
    * max-events row, since a user's count strictly grows per
    * emission — is what the batch GROUP BY oracle computes. Values
    * stream as exact cent integers (decimal ×100 → integer-valued
    * doubles), so cross-batch arrival order cannot perturb the
    * double-summed state. */
  def s03StreamSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val staged = s"${Vector.sdir(dir)}/s03_events.parquet"
    events(s, dir)
      .select(col("user_id").as("_1"),
        (dec(col("value")) * 100).cast("double").as("_2"))
      .repartition(8).write.mode("overwrite").parquet(staged)
    val schema = s.read.parquet(staged).schema
    implicit val sp: SparkSession = s
    val sessions = graft.streaming.EventStream.sessionize(
      s.readStream.schema(schema).parquet(staged).as[(Long, Double)])
    val outDir = s"${Vector.sdir(dir)}/s03_out.parquet"
    // state partitions sized to the state, not the scan cores (see
    // EventStream.withStatePartitions); per-batch parquet sink instead
    // of driver-memory (EventStream.parquetSink — identical rows; the
    // update-mode emissions land per micro-batch, exactly what the
    // memory sink accumulated)
    graft.streaming.EventStream.withStatePartitions(s) {
      val q = graft.streaming.EventStream.parquetSink(
        sessions.toDF(), outDir, mode = "update")
      require(q.awaitTermination(300000),
        "s03 streaming query did not finish within 300s — partial sink")
    }
    s.read.parquet(s"$outDir/batch-*")
      .groupBy(col("userId"))
      .agg(max(struct(col("nEvents"), col("totalValue"))).as("m"))
      .select(col("userId").as("user_id"), col("m.nEvents").as("n_events"),
        col("m.totalValue").as("total_cents"))
      .orderBy(col("user_id"))
  }

  val s03Sql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS DOUBLE) AS total_cents
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_stream_windows" -> s01StreamWindows _,
    "s03_stream_sessions" -> s03StreamSessions _,
    "q16_cube" -> q16Cube _,
    "q17_outer_join" -> q17OuterJoin _,
    "q18_pivot" -> q18Pivot _,
    "q19_above_nation_avg" -> q19AboveNationAvg _,
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_revenue_by_nation" -> q02RevenueByNation _,
    "q03_top_orders_per_cust" -> q03TopOrdersPerCust _,
    "q04_late_orders" -> q04LateOrders _,
    "q05_parts_never_ordered" -> q05PartsNeverOrdered _,
    "q06_rollup" -> q06Rollup _,
    "q07_intersect" -> q07Intersect _,
    "q08_events_hourly" -> q08EventsHourly _,
    "q09_running_total" -> q09RunningTotal _,
    "q10_distinct_users" -> q10DistinctUsers _,
    "q11_part_strings" -> q11PartStrings _,
    "q12_json_props" -> q12JsonProps _,
    "q13_customers_per_region" -> q13CustomersPerRegion _,
    "q14_orders_by_month" -> q14OrdersByMonth _,
    "q15_segment_stats" -> q15SegmentStats _)

  val oracles: Map[String, String] = Map(
    "s01_stream_windows" -> s01Sql,
    "s03_stream_sessions" -> s03Sql,
    "q16_cube" -> q16Sql,
    "q17_outer_join" -> q17Sql,
    "q18_pivot" -> q18Sql,
    "q19_above_nation_avg" -> q19Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_revenue_by_nation" -> q02Sql,
    "q03_top_orders_per_cust" -> q03Sql,
    "q04_late_orders" -> q04Sql,
    "q05_parts_never_ordered" -> q05Sql,
    "q06_rollup" -> q06Sql,
    "q07_intersect" -> q07Sql,
    "q08_events_hourly" -> q08Sql,
    "q09_running_total" -> q09Sql,
    "q10_distinct_users" -> q10Sql,
    "q11_part_strings" -> q11Sql,
    "q12_json_props" -> q12Sql,
    "q13_customers_per_region" -> q13Sql,
    "q14_orders_by_month" -> q14Sql,
    "q15_segment_stats" -> q15Sql)
}
