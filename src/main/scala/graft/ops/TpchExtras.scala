package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round 7: the remaining TPC-H shapes (Q4, Q6, Q11, Q14, Q15, Q16,
  * Q18, Q19, Q20) as fixture-schema analogues, completing analogue
  * coverage of all 22 — every query class a warehouse user runs has a
  * representative with a DuckDB oracle twin. Where the fixture lacks a
  * column/table (shipmode, commitdate, partsupp), the analogue keeps
  * the COMPUTATIONAL shape (the join topology, the
  * correlation/decorrelation pattern, the aggregate structure) and
  * substitutes a derivable predicate, noted per query.
  */
object TpchExtras {

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** q73: TPC-H Q4 analogue (order-priority checking) — orders in a
    * quarter having at least one late line (no commit/receipt dates in
    * the fixture: late = shipped > 30 days after order). The EXISTS
    * decorrelates to a LEFT SEMI hash join on orderkey with the date
    * comparison as a non-equi residual — per-order existence never
    * re-scans lineitem per row, and the quarter filter pushes to the
    * orders scan.
    */
  def q73PriorityLateExists(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= ts("1997-01-01") &&
        col("o_orderdate") < ts("1997-04-01"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority").asc_nulls_last)
  }

  val q73Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin

  /** q74: TPC-H Q6 analogue (forecasting revenue change) — the purest
    * scan-shape in the suite: one fact table, three pushable
    * predicates, one exact-DECIMAL sum, zero joins. Its value as a
    * benchmark entry is exactly that the plan must be nothing but a
    * pushed-filter scan and a two-phase aggregate.
    */
  def q74ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  val q74Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** q75: TPC-H Q11 analogue (important stock). No partsupp, so a
    * part's "value" for one nation is its line revenue from that
    * nation's suppliers; parts above a fixed fraction of the national
    * total survive. The threshold is Q11's correlation pattern: a
    * one-row global aggregate re-joined (broadcast) against the
    * per-part aggregate — both sums come from the SAME shuffled
    * aggregate, so the fact is shuffled once.
    */
  def q75ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val natSup = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
          .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    // The threshold comparison stays in exact DECIMAL (value*1000 >
    // total, identical to value > total*0.001) so borderline parts
    // can't flip membership with double accumulation order; only the
    // emitted column is cast to double.
    val perPart = Tables.lineitem(spark, sfDir)
      .join(natSup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))).as("value_dec"))
    perPart
      .join(broadcast(perPart.agg(sum(col("value_dec")).as("total_dec"))))
      .filter(col("value_dec") * lit(1000) > col("total_dec"))
      .select(col("l_partkey").as("partkey"),
        col("value_dec").cast("double").as("value"))
      .orderBy(col("value").desc_nulls_last, col("partkey").asc_nulls_last)
  }

  val q75Sql: String =
    """WITH v AS (
      |  SELECT l_partkey,
      |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |      AS value_dec
      |  FROM lineitem, supplier, nation
      |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_name = 'NATION_3'
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS partkey, CAST(value_dec AS DOUBLE) AS value
      |FROM v
      |WHERE value_dec * 1000 > (SELECT sum(value_dec) FROM v)
      |ORDER BY value DESC NULLS LAST, partkey ASC NULLS LAST""".stripMargin

  /** q76: TPC-H Q14 analogue (promo revenue share) — one month of
    * lineitem joined to the part dim, promo and total revenue from a
    * single conditional aggregate (never two scans), one IEEE division
    * at the end.
    */
  def q76PromoRevenueShare(spark: SparkSession, sfDir: String): DataFrame = {
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-09-01") &&
        col("l_shipdate") < ts("1997-10-01"))
      .join(Tables.part(spark, sfDir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0)))
          .as("promo_revenue"),
        dsum(vol).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (lit(100.0) * col("promo_revenue") / col("total_revenue"))
          .as("promo_share"))
  }

  val q76Sql: String =
    """WITH a AS (
      |  SELECT
      |    CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
      |          THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
      |        AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue,
      |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |      AS DOUBLE) AS total_revenue
      |  FROM lineitem, part
      |  WHERE l_partkey = p_partkey
      |    AND l_shipdate >= TIMESTAMP '1997-09-01'
      |    AND l_shipdate < TIMESTAMP '1997-10-01')
      |SELECT promo_revenue, total_revenue,
      |  100.0 * promo_revenue / total_revenue AS promo_share
      |FROM a""".stripMargin

  /** q77: TPC-H Q15 analogue (top supplier) — per-supplier quarter
    * revenue, keep the max-revenue supplier(s). The max is a one-row
    * aggregate OVER the same collapsed table, broadcast back and
    * matched by equality — safe on doubles because both sides
    * originate from the identical exact-DECIMAL sum (Q15's famous
    * view-equality pattern).
    */
  def q77TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("total_revenue"))
    rev.join(broadcast(rev.agg(max(col("total_revenue")).as("mx"))),
        col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey").as("suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("suppkey").asc_nulls_last)
  }

  val q77Sql: String =
    """WITH r AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |      AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey AS suppkey, s_name, total_revenue
      |FROM r JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM r)
      |ORDER BY suppkey ASC NULLS LAST""".stripMargin

  /** q78: TPC-H Q16 analogue (supplier counts by part attributes) —
    * distinct suppliers per (brand, size) over non-promo parts,
    * excluding negative-balance suppliers via NOT IN (non-null keys →
    * a broadcast LEFT ANTI join, not a null-aware one). Supplier-part
    * pairs come from lineitem (the fixture's partsupp stand-in),
    * deduped BEFORE the count — count(DISTINCT) then runs over
    * already-narrow pairs.
    */
  def q78SupplierPartCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val badSup = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(badSup), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(Tables.part(spark, sfDir).filter(col("p_type") =!= "PROMO")
          .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc_nulls_last,
        col("p_brand").asc_nulls_last, col("p_size").asc_nulls_last)
  }

  val q78Sql: String =
    """SELECT p_brand, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) lp
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC NULLS LAST, p_brand ASC NULLS LAST,
      |  p_size ASC NULLS LAST""".stripMargin

  /** q79: TPC-H Q18 analogue (large-volume orders) — orders whose
    * total quantity exceeds a threshold, with customer attribution and
    * the canonical top-100. The HAVING collapse runs on the fact
    * FIRST (orderkey-grouped, so the later joins see only qualifying
    * orders), and the global top-100 is heap-based
    * (TakeOrderedAndProject) with orderkey breaking price ties.
    */
  def q79LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150.0)
    big.join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc_nulls_last,
        col("o_orderkey").asc_nulls_last)
      .limit(100)
  }

  val q79Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 150.0)
      |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
      |LIMIT 100""".stripMargin

  /** q80: TPC-H Q19 analogue (bracketed discounted revenue) — the
    * disjunction-of-conjunctions predicate: three (brand, size range,
    * quantity range) brackets OR'd together. The part join stays a
    * plain equi join on partkey with the OR evaluated as a post-join
    * residual — the formulation that keeps Q19 out of nested-loop
    * territory (an OR inside the join condition defeats hashing).
    */
  def q80BracketedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    def bracket(brand: String, szLo: Int, szHi: Int,
        qLo: Double, qHi: Double): Column =
      col("p_brand") === brand && col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(bracket("Brand#12", 1, 15, 1, 15) ||
        bracket("Brand#13", 1, 25, 10, 30) ||
        bracket("Brand#14", 1, 35, 20, 40))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
  }

  val q80Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 1 AND 15)
      |    OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
      |        AND l_quantity BETWEEN 10 AND 30)
      |    OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
      |        AND l_quantity BETWEEN 20 AND 40))""".stripMargin

  /** q81: TPC-H Q20 analogue (promo stock suppliers) — the nested
    * semi-join chain: suppliers of one nation who moved more than a
    * threshold quantity of at least one PROMO part in a year (region,
    * not single-nation, so the slice stays non-vacuous at fixture
    * scale). Inner aggregate per (supplier, part) over the
    * date+type-filtered fact, HAVING threshold, then DISTINCT
    * suppliers LEFT SEMI against the region slice — each hop collapses
    * before the next join, nothing fact-sized crosses twice.
    */
  def q81PromoStockSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val promoParts = Tables.part(spark, sfDir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val movers = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(dsum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 50.0)
      .select(col("l_suppkey")).distinct()
    val amNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    Tables.supplier(spark, sfDir)
      .join(broadcast(amNations), col("s_nationkey") === col("n_nationkey"))
      .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
      .orderBy(col("suppkey").asc_nulls_last)
  }

  val q81Sql: String =
    """SELECT s_suppkey AS suppkey, s_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'AMERICA'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    JOIN part ON l_partkey = p_partkey
      |    WHERE p_type = 'PROMO'
      |      AND l_shipdate >= TIMESTAMP '1997-01-01'
      |      AND l_shipdate < TIMESTAMP '1998-01-01'
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 50.0)
      |ORDER BY suppkey ASC NULLS LAST""".stripMargin
}
