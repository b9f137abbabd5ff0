package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Join operators over the star schema (SURVEY.md §2.2: equi joins
  * incl. broadcast, semi/anti, outer, theta/range, as-of).
  *
  * Scale notes (100 TB design):
  *  - dimension tables (`region`, `nation`, `customer`, `supplier`,
  *    `part`) are bounded; they get explicit `broadcast()` hints so the
  *    fact-side scan never shuffles for them — the alternative SMJ
  *    would shuffle the full fact table per join;
  *  - fact-fact joins (lineitem ⋈ orders) shuffle on the join key
  *    once; AQE handles skew at runtime;
  *  - the as-of join avoids any point-in-time cross product by
  *    sort-merging tagged streams in one window pass per key.
  */
object Joins {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Broadcast equi join: orders ⋈ customer, revenue per market segment. */
  def q04JoinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment").asc_nulls_last)
  }

  val q04Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment ASC NULLS LAST""".stripMargin

  /** 5-way star join (TPC-H Q5 analogue): revenue per nation within one
    * region. All four dims broadcast; lineitem ⋈ orders is the only
    * shuffle.
    */
  def q05StarJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir).filter(col("r_name").isin("ASIA", "EUROPE"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum((col("l_extendedprice").cast(DecimalType(18, 4)) *
          (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4)))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name").asc_nulls_last, col("n_name").asc_nulls_last)
  }

  val q05Sql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |GROUP BY r_name, n_name
      |ORDER BY r_name ASC NULLS LAST, n_name ASC NULLS LAST""".stripMargin

  /** Left-semi join (EXISTS): customers having at least one high-value order. */
  def q06SemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey").asc_nulls_last)
  }

  val q06Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey ASC NULLS LAST""".stripMargin

  /** Left-anti join (NOT EXISTS): orders with no line items. */
  def q07AntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  val q07Sql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin

  /** Outer join with null-producing side: every customer with order
    * stats, including customers with no orders (left outer). Orders
    * are pre-aggregated by custkey BEFORE the join: the join then
    * shuffles one row per customer instead of one per order (at 100 TB
    * that's the difference between shuffling the fact table and
    * shuffling a dimension-sized aggregate), and the post-join
    * aggregate disappears entirely. count(*) per custkey equals
    * count(o_orderkey) since o_orderkey is never null.
    */
  def q08OuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val perCust = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("pre_n"), dsum(col("o_totalprice")).as("pre_spent"))
    c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("pre_n"), lit(0L)).as("n_orders"),
        coalesce(col("pre_spent"), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey").asc_nulls_last)
  }

  val q08Sql: String =
    """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
      |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey ASC NULLS LAST""".stripMargin

  /** Theta join (equi + inequality): same-size part pairs, counted per
    * size. The inequality `p1 < p2` halves the pair space; the equi
    * component keeps it a hash join, not a nested-loop cross product.
    */
  def q09ThetaJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val p1 = Tables.part(spark, sfDir).select(col("p_partkey").as("k1"), col("p_size").as("size1"))
    val p2 = Tables.part(spark, sfDir).select(col("p_partkey").as("k2"), col("p_size").as("size2"))
    p1.join(p2, col("size1") === col("size2") && col("k1") < col("k2"))
      .groupBy(col("size1").as("p_size"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("p_size").asc_nulls_last)
  }

  val q09Sql: String =
    """SELECT p1.p_size AS p_size, count(*) AS n_pairs
      |FROM part p1 JOIN part p2
      |  ON p1.p_size = p2.p_size AND p1.p_partkey < p2.p_partkey
      |GROUP BY p1.p_size ORDER BY p_size ASC NULLS LAST""".stripMargin

  /** Range join: line items shipped within 120 days of their order date
    * — an equi key plus a time-band predicate, aggregated per priority.
    */
  def q10RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    li.join(o,
        li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") >= o("o_orderdate") &&
        li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 120 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_fast"), dsum(col("l_quantity")).as("qty"))
      .orderBy(col("o_orderpriority").asc_nulls_last)
  }

  val q10Sql: String =
    """SELECT o_orderpriority, count(*) AS n_fast,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  AND l_shipdate >= o_orderdate
      |  AND l_shipdate <= o_orderdate + INTERVAL 120 DAY
      |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin

  /** As-of join: each event matched to the user's most recent order at
    * or before the event time.
    *
    * Spark-first formulation: tag both streams, union, then one window
    * pass per user ordered by time carries the latest order forward
    * (`last_value` ignoring nulls). One shuffle + one sort — never a
    * per-event scan of the order history, and no point-in-time cross
    * product; this is the plan that survives 100 TB (partition by key,
    * time-sorted within partitions).
    */
  def q11AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir).select(
      col("user_id").as("k"), col("ts").as("t"),
      col("event_id"), lit(null).cast("bigint").as("o_orderkey_r"),
      lit(null).cast("double").as("o_totalprice_r"), lit(1).as("is_event"))
    val o = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(null).cast("bigint").as("event_id"), col("o_orderkey").as("o_orderkey_r"),
      col("o_totalprice").as("o_totalprice_r"), lit(0).as("is_event"))
    // orders sort before events at identical timestamps (is_event 0 < 1)
    // so an order exactly at the event time IS visible to it ("<= ts").
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("is_event").asc, col("o_orderkey_r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(o)
      .withColumn("last_order", last(col("o_orderkey_r"), ignoreNulls = true).over(w))
      .withColumn("last_price", last(col("o_totalprice_r"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
        col("last_order"), col("last_price"))
      .orderBy(col("event_id").asc_nulls_last)
  }

  /** q64: interval join with NO equi key, made scalable by binning —
    * "incident-shadowed purchases": purchases that happen within 10
    * minutes after any error event, per day. The naive predicate
    * (`p.ts BETWEEN e.ts AND e.ts + 10min`, no equality) can only plan
    * as a nested-loop join — O(purchases × errors) compares and a
    * broadcast ceiling on the window side. Re-keying both sides on a
    * time BIN whose width equals the window length makes it a hash
    * join: each 10-minute window overlaps at most 2 bins (exploded on
    * the window side), each point lives in exactly 1, so every true
    * pair shares a bin and the residual range predicate runs only
    * within bin-matched groups. LEFT SEMI keeps a purchase once no
    * matter how many incidents cover it — no post-join distinct. At
    * 100 TB both sides shuffle by bin (a key whose cardinality grows
    * with the covered time range) and no side needs to fit in memory;
    * the e10 broadcast-calendar shape solves the small-side case, this
    * solves the large×large one. Value sums ride int64 cents
    * (exact at any partitioning, per e18); each output double is a
    * single IEEE division.
    */
  def q64IntervalJoinBinned(spark: SparkSession, sfDir: String): DataFrame = {
    val binUs = 600000000L // 10-minute bins = the window length
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("ts"),
        unix_micros(col("ts").cast("timestamp")).as("pus"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .withColumn("bin", expr(s"pus div ${binUs}L"))
    val windows = ev.filter(col("event_type") === "error")
      .select(unix_micros(col("ts").cast("timestamp")).as("st")).distinct()
      .select(col("st"), explode(sequence(
        expr(s"st div ${binUs}L"),
        expr(s"(st + ${binUs - 1}L) div ${binUs}L"))).as("ebin"))
    val shadowed = purchases.join(windows,
      purchases("bin") === windows("ebin") &&
        purchases("pus") >= windows("st") &&
        purchases("pus") < windows("st") + lit(binUs),
      "left_semi")
    val perDayAll = purchases
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_purchases"))
    val perDayShadowed = shadowed
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("pre_shadowed"), sum(col("cents")).as("pre_cents"))
    perDayAll.join(perDayShadowed, Seq("day"), "left_outer")
      .select(col("day"), col("n_purchases"),
        coalesce(col("pre_shadowed"), lit(0L)).as("n_shadowed"),
        (coalesce(col("pre_shadowed"), lit(0L)).cast("double") /
          col("n_purchases").cast("double")).as("shadow_rate"),
        (coalesce(col("pre_cents"), lit(0L)).cast("double") / lit(100.0))
          .as("shadowed_value"))
      .orderBy(col("day").asc_nulls_last)
  }

  // the oracle states the SEMANTICS (existential interval predicate);
  // the engine's binning is an implementation detail it must not leak
  val q64Sql: String =
    """WITH p AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    EXISTS (SELECT 1 FROM events e WHERE e.event_type = 'error'
      |            AND epoch_us(p0.ts) >= epoch_us(e.ts)
      |            AND epoch_us(p0.ts) < epoch_us(e.ts) + 600000000) AS hit
      |  FROM events p0 WHERE event_type = 'purchase')
      |SELECT day, count(*) AS n_purchases,
      |  count(*) FILTER (WHERE hit) AS n_shadowed,
      |  CAST(count(*) FILTER (WHERE hit) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS shadow_rate,
      |  CAST(CAST(coalesce(sum(cents) FILTER (WHERE hit), 0) AS BIGINT) AS DOUBLE)
      |    / 100.0 AS shadowed_value
      |FROM p GROUP BY day
      |ORDER BY day ASC NULLS LAST""".stripMargin

  // DuckDB has native ASOF JOIN; ties on o_orderdate are broken toward
  // the largest o_orderkey to mirror the window formulation above.
  val q11Sql: String =
    """WITH best AS (
      |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |)
      |SELECT e.event_id AS event_id, e.user_id, e.ts,
      |       b.o_orderkey AS last_order, b.o_totalprice AS last_price
      |FROM events e LEFT JOIN best b ON b.event_id = e.event_id AND b.rn = 1
      |ORDER BY e.event_id ASC NULLS LAST""".stripMargin
}
