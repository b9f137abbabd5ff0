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
}
