package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tier-X relational operators over the star-schema fixtures.
  *
  * Design rules (SURVEY.md §4, §7.5):
  *  - declarative DataFrame plans only — Catalyst handles pushdown,
  *    pruning, join selection; no driver-side materialization;
  *  - exact-decimal aggregation for doubles that feed the DuckDB hash
  *    oracle: `sum(cast(x as decimal(18,4)))` is order-independent and
  *    exact, then one final correctly-rounded cast to double matches
  *    DuckDB bit-for-bit (double sums would differ in the last ulp
  *    depending on partitioning);
  *  - every query ends in a total deterministic ORDER BY with nulls
  *    pinned, mirrored in the oracle SQL.
  */
object Relational {

  /** Exact, order-independent sum of a ~2-decimal double column. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** TPC-H Q1 analogue: scan → filter → groupBy → 8 aggregates → sort.
    * Filter + 7-column projection are pushed into the parquet scan;
    * aggregation is two-phase (partial map-side, final after shuffle on
    * the 2 group keys) — at 100 TB the map-side combine reduces the
    * shuffle to |groups|×partitions rows.
    */
  def q01PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice").cast(DecimalType(18, 4)) *
          (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4)))))
          .cast("double").as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1)).cast("double")).as("avg_qty"),
        (dsum(col("l_discount")) / count(lit(1)).cast("double")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin

  /** q57: TPC-H Q3 analogue (shipping priority) — the composite
    * headline shape a real analytics workload runs: selective dim
    * filter (one market segment of five) BROADCAST into the orders
    * fact, that join filtered and joined into lineitem, an exact-
    * decimal revenue aggregate per order, and a global top-10 that
    * plans as TakeOrderedAndProject (per-partition top-k + driver
    * merge of 10-row heaps — never a full sort). Two fact shuffles
    * total at any scale: the o⋈l equi-join and the revenue groupBy
    * (which reuses the join's orderkey clustering).
    */
  def q57ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
          (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc_nulls_last, col("o_orderdate").asc_nulls_last,
        col("l_orderkey").asc_nulls_last)
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
        col("o_orderpriority"))
  }

  val q57Sql: String =
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-07-01'
      |  AND l_shipdate > TIMESTAMP '1998-07-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC NULLS LAST, o_orderdate ASC NULLS LAST, l_orderkey ASC NULLS LAST
      |LIMIT 10""".stripMargin

  /** q58: TPC-H Q2 analogue (cheapest supplier per part) — the argmin
    * join, run as k=1 on the native [[graft.plans.TopKPerKey]]
    * operator. The obvious `min(struct(price, suppkey))` aggregate
    * plans as a SortAggregate (struct buffers are not hash-agg
    * compatible) and sorts the whole fact per partition; the native
    * operator instead keeps ONE candidate row per part in the partial
    * phase, shuffles only those survivors (≤ |parts| rows per input
    * partition), and streams the final phase — the shape that holds at
    * 100 TB. The (price, suppkey) composite order is the deterministic
    * tie-break (lowest suppkey wins at equal price). The supplier
    * attribute join happens AFTER the argmin collapse, on |parts|
    * rows, with the dim broadcast. `unit_price` is one IEEE division
    * per row — bit-portable to the DuckDB oracle (sums of doubles
    * would not be; there are none here).
    */
  def q58CheapestSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"),
        col("l_suppkey"))
    graft.plans.TopKPerKey.topKPerKey(li,
        keyCols = Seq(col("l_partkey")),
        orderCols = Seq(col("unit_price").asc_nulls_last,
          col("l_suppkey").asc_nulls_last),
        k = 1)
      .select(col("l_partkey").as("partkey"),
        col("l_suppkey").as("suppkey"),
        col("unit_price").as("best_price"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("suppkey") === col("s_suppkey"))
      .select(col("partkey"), col("suppkey"), col("s_name"), col("best_price"))
      .orderBy(col("partkey").asc_nulls_last)
  }

  val q58Sql: String =
    """WITH u AS (
      |  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
      |  FROM lineitem
      |), r AS (
      |  SELECT l_partkey, l_suppkey, unit_price,
      |         row_number() OVER (PARTITION BY l_partkey
      |                            ORDER BY unit_price ASC, l_suppkey ASC) AS rn
      |  FROM u
      |)
      |SELECT l_partkey AS partkey, l_suppkey AS suppkey, s_name, unit_price AS best_price
      |FROM r JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rn = 1
      |ORDER BY partkey ASC NULLS LAST""".stripMargin

  /** q59: TPC-H Q8 analogue (market share) — per order-year, the share
    * of total order value contributed by customers of one region. One
    * conditional-aggregation pass: the region tag rides a two-hop
    * broadcast (nation ⋈ region collapsed to a custkey→flag dim), the
    * orders fact shuffles once on custkey for the customer join, and
    * both the target and total sums come out of the SAME two-phase
    * aggregate on `yr` (5-ish groups) — not two scans, not a
    * self-join. Sums are exact DECIMAL (order-independent across any
    * partitioning); the share is one final IEEE division per year row.
    */
  def q59MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(18, 4)
    val asiaNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"),
        "left")
      .select(col("c_custkey"), col("n_nationkey").isNotNull.as("is_asia"))
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        col("o_totalprice").cast(dec).as("price"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("yr"))
      .agg(
        sum(when(col("is_asia"), col("price")).otherwise(lit(0).cast(dec)))
          .cast("double").as("asia_rev"),
        sum(col("price")).cast("double").as("total_rev"))
      .withColumn("share", col("asia_rev") / col("total_rev"))
      .orderBy(col("yr").asc_nulls_last)
  }

  val q59Sql: String =
    """WITH cust AS (
      |  SELECT c_custkey,
      |         (n_nationkey IS NOT NULL) AS is_asia
      |  FROM customer
      |  LEFT JOIN (
      |    SELECT n_nationkey FROM nation
      |    JOIN region ON n_regionkey = r_regionkey
      |    WHERE r_name = 'ASIA'
      |  ) a ON c_nationkey = n_nationkey
      |), agg AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
      |    CAST(sum(CASE WHEN is_asia THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS asia_rev,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
      |  FROM orders JOIN cust ON o_custkey = c_custkey
      |  GROUP BY 1
      |)
      |SELECT yr, asia_rev, total_rev, asia_rev / total_rev AS share
      |FROM agg
      |ORDER BY yr ASC NULLS LAST""".stripMargin

  /** q60: TPC-H Q13 analogue (customer distribution) — how many
    * customers placed exactly N qualifying orders, INCLUDING the
    * zero-order customers an inner join would drop. Shape: aggregate
    * the orders fact down to per-custkey counts FIRST (one shuffle,
    * partial counts map-side), then left-join customer against that
    * |customers|-sized result and coalesce the misses to 0 — the
    * naive join-then-count would move every order row through the
    * customer join before collapsing. The second aggregate (count per
    * c_count) is over ≤ max-orders-per-customer distinct keys: tiny.
    */
  def q60CustomerDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc_nulls_last, col("c_count").desc_nulls_last)
  }

  /** q63: cumulative daily revenue — the global running total that
    * naively plans as ONE unpartitioned window over every order (the
    * single-task scale-killer PlanAuditSpec bans outright). Re-shaped
    * as the engine's standard two-phase prefix sum: (1) the fact
    * collapses to per-day DECIMAL totals (two-phase hash aggregate —
    * the only stage that sees fact-sized data); (2) the within-year
    * prefix runs partitioned by year over the |days| table, whose
    * per-partition size is bounded by the calendar (≤366 rows)
    * regardless of corpus size; (3) the cross-year offsets come from a
    * triangular self-join of the |years|-row totals table (broadcast
    * NLJ over a handful of rows — no window at all). Decimal addition
    * is exact and associative, so the result is bit-identical to the
    * single-window form the oracle states.
    */
  def q63CumulativeDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(18, 4)
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(col("o_totalprice").cast(dec)).as("day_rev"))
      .withColumn("yr", year(col("day")))
    val wYear = org.apache.spark.sql.expressions.Window
      .partitionBy(col("yr")).orderBy(col("day").asc_nulls_last)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val yearTotals = daily.groupBy(col("yr")).agg(sum(col("day_rev")).as("y_rev"))
    val yearOffsets = yearTotals.as("a")
      .join(broadcast(yearTotals.as("b")), col("b.yr") < col("a.yr"), "left")
      .groupBy(col("a.yr").as("yr"))
      .agg(coalesce(sum(col("b.y_rev")), lit(0).cast(dec)).as("y_off"))
    daily
      .withColumn("in_year", sum(col("day_rev")).over(wYear))
      .join(broadcast(yearOffsets), Seq("yr"))
      .select(col("day"),
        col("day_rev").cast("double").as("day_rev"),
        (col("y_off") + col("in_year")).cast("double").as("cum_rev"))
      .orderBy(col("day").asc_nulls_last)
  }

  val q63Sql: String =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS day_rev
      |  FROM orders GROUP BY 1)
      |SELECT day, CAST(day_rev AS DOUBLE) AS day_rev,
      |  CAST(sum(day_rev) OVER (ORDER BY day ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev
      |FROM daily
      |ORDER BY day ASC NULLS LAST""".stripMargin

  /** q65: TPC-H Q17 analogue (small-quantity revenue) — the correlated
    * scalar-subquery shape: lines whose quantity is below 20% of their
    * part's own average quantity, revenue per brand. The correlation
    * decorrelates to aggregate-then-join: per-part thresholds come from
    * ONE two-phase aggregate over the (brand-filtered) fact, then join
    * back — never a per-row re-scan of the part's history. The brand
    * filter broadcasts into BOTH passes, so only the two brands' lines
    * ever shuffle. The threshold is `0.2 × (exact-decimal sum ÷ count)`
    * — a fixed chain of individually-rounded IEEE ops both engines
    * evaluate identically; the revenue sum is exact DECIMAL.
    */
  def q65SmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val brands = Tables.part(spark, sfDir)
      .filter(col("p_brand").isin("Brand#1", "Brand#2"))
      .select(col("p_partkey"), col("p_brand"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(brands), col("l_partkey") === col("p_partkey"))
    val thresholds = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg((lit(0.2) * (dsum(col("l_quantity")) / count(lit(1)).cast("double")))
        .as("qty_cut"))
    li.join(thresholds, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_cut"))
      .groupBy(col("p_brand"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand").asc_nulls_last)
  }

  val q65Sql: String =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand IN ('Brand#1', 'Brand#2')
      |  AND l_quantity < (
      |    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
      |                  / CAST(count(*) AS DOUBLE))
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand ASC NULLS LAST""".stripMargin

  /** q66: TPC-H Q21 analogue (sole-supplier faulted orders) — the
    * multi-existential shape: per supplier, how many orders had a
    * RETURNED line from them AND no line from any other supplier
    * (`NOT EXISTS other-supplier line` in the oracle). Decorrelated to
    * order-level aggregation — and the fact is shuffled ONCE (round
    * 7; previously two independent distincts + a self-join): the pair
    * collapse carries a `max(returnflag='R')` flag, so the order-level
    * aggregate can read off both "single supplier" and "that
    * supplier's lines include a return" from the same rows — when
    * n_supp = 1 the order's only pair IS the lone supplier, making the
    * returned-side semi-join redundant, not just shareable. Supplier
    * names join AFTER the per-supplier collapse, broadcast.
    */
  def q66SoleSupplierFaults(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), min(col("l_suppkey")).as("lone_supp"),
        max(col("has_r")).as("has_r"))
      .filter(col("n_supp") === 1 && col("has_r") === 1)
      .groupBy(col("lone_supp"))
      .agg(count(lit(1)).as("n_faults"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("lone_supp") === col("s_suppkey"))
      .select(col("s_suppkey").as("suppkey"), col("s_name"), col("n_faults"))
      .orderBy(col("n_faults").desc_nulls_last, col("suppkey").asc_nulls_last)
  }

  val q66Sql: String =
    """SELECT s_suppkey AS suppkey, s_name,
      |  count(DISTINCT l1.l_orderkey) AS n_faults
      |FROM lineitem l1 JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE l1.l_returnflag = 'R'
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
      |                  WHERE l2.l_orderkey = l1.l_orderkey
      |                    AND l2.l_suppkey <> l1.l_suppkey)
      |GROUP BY 1, 2
      |ORDER BY n_faults DESC NULLS LAST, suppkey ASC NULLS LAST""".stripMargin

  /** q67: TPC-H Q22 analogue (lapsed high-balance customers) — the
    * scalar-subquery + anti-join composite: customers whose balance
    * exceeds the positive-balance average but who placed no order
    * since a cutoff, counted per nation. The global average is a
    * one-row aggregate BROADCAST onto the customer scan (q19's
    * join-against-aggregate form); the "no recent order" existential
    * is a left-anti hash join against the date-filtered orders fact
    * (filter pushed to the scan); the nation dim broadcasts for names.
    * Balance sums are exact DECIMAL; the average is one division.
    */
  def q67LapsedHighBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val avgBal = cust.filter(col("c_acctbal") > 0.0)
      .agg((dsum(col("c_acctbal")) / count(lit(1)).cast("double")).as("avg_bal"))
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("n_name").asc_nulls_last)
  }

  val q67Sql: String =
    """WITH a AS (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT n_name, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      |FROM customer, a
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > a.avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY n_name
      |ORDER BY n_name ASC NULLS LAST""".stripMargin

  val q60Sql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey, count(*) AS n_orders
      |  FROM orders
      |  WHERE o_orderpriority <> '1-URGENT'
      |  GROUP BY o_custkey
      |)
      |SELECT coalesce(n_orders, 0) AS c_count, count(*) AS custdist
      |FROM customer
      |LEFT JOIN per_cust ON c_custkey = o_custkey
      |GROUP BY 1
      |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin

  /** q68: TPC-H Q5 analogue (local supplier volume) — the multi-dim
    * star with the region round-trip: revenue per nation where the
    * CUSTOMER's nation equals the SUPPLIER's nation, suppliers limited
    * to one region, orders to one year. Shape: region⋈nation collapse
    * to a tiny broadcast dim, the region-filtered supplier slice rides
    * onto lineitem (AQE picks broadcast at any realistic supplier
    * cardinality — no forced hint, so a pathological supplier side
    * degrades to shuffle instead of OOM), the date filter pushes to
    * the orders scan, and the only fact-sized work is the two
    * canonical shuffles: lineitem⋈orders on orderkey, then ⋈customer
    * on (custkey + the nation-equality residual as a second equi key).
    * Exact DECIMAL revenue.
    */
  def q68LocalSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val natEu = Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)
          .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(spark, sfDir)
      .join(broadcast(natEu), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vol"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("vol")).as("revenue"))
      .orderBy(col("revenue").desc_nulls_last, col("n_name").asc_nulls_last)
  }

  val q68Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS LAST""".stripMargin

  /** q69: TPC-H Q7 analogue (volume shipping) — bilateral trade
    * between two nations by ship-year: supplier in one, customer in
    * the other, either direction. The two-nation dim slices broadcast
    * onto supplier and customer; the cross-direction condition is the
    * residual `supp_nation <> cust_nation` AFTER both sides are
    * restricted to the pair — equivalent to Q7's OR-of-two-orderings
    * but keeps every join a plain equi join (no OR in any join
    * condition, which would force a nested loop).
    */
  def q69VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(spark, sfDir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("yr"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vol"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
    li.join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("yr"))
      .agg(dsum(col("vol")).as("revenue"))
      .orderBy(col("supp_nation").asc_nulls_last,
        col("cust_nation").asc_nulls_last, col("yr").asc_nulls_last)
  }

  val q69Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS yr,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue
      |FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |  AND c_custkey = o_custkey
      |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |  AND n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation ASC NULLS LAST, cust_nation ASC NULLS LAST,
      |  yr ASC NULLS LAST""".stripMargin

  /** q70: TPC-H Q9 analogue (product-type profit). The fixture has no
    * partsupp/ps_supplycost, so cost is modeled as a constant fraction
    * of the part's retail price (0.6 × p_retailprice × quantity) —
    * preserving Q9's computational shape exactly: a part-dim filter
    * pushed to the scan, per-line profit arithmetic, supplier-nation
    * attribution, and the order-year join. Profit terms are computed
    * in IEEE double per line (portable) and summed as exact DECIMAL.
    */
  def q70ProductTypeProfit(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = Tables.part(spark, sfDir)
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey"), col("p_retailprice"))
    val sup = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val li = Tables.lineitem(spark, sfDir)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("n_name"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")).as("amount"))
    li.join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), year(col("o_orderdate")).as("yr")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), col("yr"))
      .agg(dsum(col("amount")).as("profit"))
      .orderBy(col("nation").asc_nulls_last, col("yr").desc_nulls_last)
  }

  val q70Sql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |                - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,4)))
      |    AS DOUBLE) AS profit
      |FROM lineitem, part, supplier, orders, nation
      |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      |  AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
      |  AND p_type = 'PROMO'
      |GROUP BY 1, 2
      |ORDER BY nation ASC NULLS LAST, yr DESC NULLS LAST""".stripMargin

  /** q71: TPC-H Q10 analogue (returned-item ranking) — top 20
    * customers by revenue lost to returns in one quarter. The
    * returnflag and date filters push to the two fact scans; after the
    * per-customer collapse the result is customer-cardinality, so the
    * global top-20 runs as TakeOrderedAndProject (per-partition heaps,
    * never a full sort), with custkey breaking revenue ties
    * deterministically. Nation names broadcast onto the collapsed row.
    */
  def q71ReturnedItemRanking(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vol"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(col("vol")).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc_nulls_last, col("c_custkey").asc_nulls_last)
      .limit(20)
  }

  val q71Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS LAST
      |LIMIT 20""".stripMargin

  /** q72: TPC-H Q12 analogue (priority by lateness). The fixture has
    * no l_shipmode/commitdate/receiptdate, so the "mode" axis is
    * l_linestatus and "late" is shipped more than 60 days after the
    * order date — preserving Q12's shape: a fact-fact equi join with a
    * non-equi date residual, a ship-year scan filter, and the
    * high/low-priority CASE split aggregated in one pass.
    */
  def q72LatePriorityCount(spark: SparkSession, sfDir: String): DataFrame = {
    val hi = Seq("1-URGENT", "2-HIGH")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
    li.join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_linestatus").as("mode"))
      .agg(
        sum(when(col("o_orderpriority").isin(hi: _*), 1).otherwise(0))
          .cast("long").as("high_line_count"),
        sum(when(col("o_orderpriority").isin(hi: _*), 0).otherwise(1))
          .cast("long").as("low_line_count"))
      .orderBy(col("mode").asc_nulls_last)
  }

  val q72Sql: String =
    """SELECT l_linestatus AS mode,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1
      |ORDER BY mode ASC NULLS LAST""".stripMargin
}
