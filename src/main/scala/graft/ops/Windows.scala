package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function operators (SURVEY.md §2.2: ranking, analytic,
  * running frames).
  *
  * Every window is partitioned by a key — at scale the sort is local to
  * each key's partition after one shuffle; an unpartitioned window
  * would serialize the whole dataset through one task and is never
  * used here. Window order keys are always total (tie-broken by a
  * unique id) so ranks and running sums are deterministic.
  */
object Windows {

  /** Ranking trio per group: top-3 orders per customer by price.
    * row_number (not rank) bounds the output at exactly 3 per key.
    */
  def q21WindowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_last)
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"), col("rnk"), col("drnk"))
      .orderBy(col("o_custkey").asc_nulls_last, col("rn").asc_nulls_last)
  }

  val q21Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST))
      |WHERE rn <= 3
      |ORDER BY o_custkey ASC NULLS LAST, rn ASC NULLS LAST""".stripMargin

  /** Running (cumulative) sum per customer over order history — an
    * unbounded-preceding row frame. Decimal accumulation keeps the
    * running values exact at every prefix.
    */
  def q22WindowRunning(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc_nulls_last, col("o_orderkey").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w).cast("double"))
      .withColumn("running_n", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("running_spend"), col("running_n"))
      .orderBy(col("o_custkey").asc_nulls_last, col("o_orderdate").asc_nulls_last,
        col("o_orderkey").asc_nulls_last)
  }

  val q22Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_spend,
      |  count(*) OVER w AS running_n
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey ASC NULLS LAST, o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST""".stripMargin

  /** lag/lead analytics: per-part price deltas across consecutive
    * shipments.
    */
  def q23WindowLagLead(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate").asc_nulls_last, col("l_orderkey").asc_nulls_last,
        col("l_linenumber").asc_nulls_last)
    Tables.lineitem(spark, sfDir)
      .withColumn("prev_price", lag(col("l_extendedprice"), 1).over(w))
      .withColumn("next_price", lead(col("l_extendedprice"), 1).over(w))
      .withColumn("delta",
        (col("l_extendedprice").cast(DecimalType(18, 4)) -
          col("prev_price").cast(DecimalType(18, 4))).cast("double"))
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_extendedprice"), col("prev_price"),
        col("next_price"), col("delta"))
      .orderBy(col("l_partkey").asc_nulls_last, col("l_shipdate").asc_nulls_last,
        col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last)
  }

  val q23Sql: String =
    """SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate, l_extendedprice,
      |  lag(l_extendedprice, 1) OVER w AS prev_price,
      |  lead(l_extendedprice, 1) OVER w AS next_price,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) - CAST(lag(l_extendedprice, 1) OVER w AS DECIMAL(18,4)) AS DOUBLE) AS delta
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_partkey
      |             ORDER BY l_shipdate ASC NULLS LAST, l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST)
      |ORDER BY l_partkey ASC NULLS LAST, l_shipdate ASC NULLS LAST, l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST""".stripMargin

  /** Range-frame window: for each order, the customer's spend within
    * the preceding 90 days (a time-based sliding frame, rangeBetween).
    */
  def q24WindowRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .withColumn("od_sec", unix_timestamp(col("o_orderdate")))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od_sec"))
      .rangeBetween(-90L * 86400, 0)
    o.withColumn("spend_90d",
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w).cast("double"))
      .withColumn("n_90d", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("spend_90d"), col("n_90d"))
      .orderBy(col("o_custkey").asc_nulls_last, col("o_orderdate").asc_nulls_last,
        col("o_orderkey").asc_nulls_last)
  }

  val q24Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS spend_90d,
      |  count(*) OVER w AS n_90d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey ASC NULLS LAST, o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST""".stripMargin

  /** ntile + percent_rank + cume_dist: customer account-balance
    * quartiles within each nation.
    */
  /** ntile/percent_rank/cume_dist per nation — re-shaped in round 5
    * after the plan audit's bounded-key window rule caught the naive
    * form: `PARTITION BY c_nationkey` over the whole customer table is
    * 25 fixed keys, i.e. 1/25 of the corpus through ONE task at scale.
    *
    * All three analytics derive from the per-nation RANK under a total
    * order (c_custkey breaks acctbal ties, so rank = row_number), and
    * rank distributes as a two-level prefix sum over balance buckets:
    * level 1 = $200 buckets (≤55/nation, a BOUNDED table whose prefix
    * window is trivially small), level 2 = $1 buckets (occupied-key
    * count grows with the data; its prefix runs within each level-1
    * bucket). The exact per-row window then runs only WITHIN each
    * (nation, dollar) bucket and adds the broadcast offsets. ntile's
    * first-(N mod n)-buckets-get-one-extra split and the
    * percent_rank/cume_dist divisions are restated explicitly from
    * (rank, N) — bit-identical to the built-ins under a total order.
    */
  def q25WindowNtile(spark: SparkSession, sfDir: String): DataFrame =
    q25Of(Tables.customer(spark, sfDir))

  /** q25 over an arbitrary customer frame — the entry point the
    * distributed-rank equivalence property test drives with random
    * inputs (N-mod-4 edges, singleton nations, boundary balances).
    */
  def q25Of(customers: DataFrame): DataFrame = {
    val cust = customers
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("l2", floor(col("c_acctbal")))
      .withColumn("l1", floor(col("c_acctbal") / 200))
    // ONE stats pass over the fact feeding a single linear chain — the
    // round-5 shape computed l2Counts twice (or paid a checkpoint) and
    // re-shuffled a separate level-1 rollup; most of q25's cost is
    // per-stage fixed overhead, so the re-shape below removes stages:
    //  - `off_in_l1` (prefix) and `n1` (group total) come from the SAME
    //    Window node (same partition+order spec, different frames);
    //  - the level-1 table then needs NO shuffle: the window output is
    //    already hash-partitioned by (nation, l1), which satisfies the
    //    groupBy's clustering requirement;
    //  - per-nation prefix `l1_off` and total `nn` share the tiny
    //    level-1 window node and ride one broadcast back.
    val l2Counts = sharedL2Counts(
      cust.groupBy(col("c_nationkey"), col("l1"), col("l2"))
        .agg(count(lit(1)).as("n2")))
    val wL2 = Window.partitionBy(col("c_nationkey"), col("l1"))
      .orderBy(col("l2").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wL2All = Window.partitionBy(col("c_nationkey"), col("l1"))
      .orderBy(col("l2").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wL1 = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("l1").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wL1All = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("l1").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bucketed = l2Counts
      .withColumn("off_in_l1", sum(col("n2")).over(wL2) - col("n2"))
      .withColumn("n1", sum(col("n2")).over(wL2All))
    val l1Off = bucketed
      .groupBy(col("c_nationkey"), col("l1")).agg(max(col("n1")).as("n1"))
      .withColumn("l1_off", sum(col("n1")).over(wL1) - col("n1"))
      .withColumn("nn", sum(col("n1")).over(wL1All))
      .select(col("c_nationkey"), col("l1"), col("l1_off"), col("nn"))
    val offs = bucketed
      .join(broadcast(l1Off), Seq("c_nationkey", "l1"))
      .select(col("c_nationkey"), col("l2"),
        (col("l1_off") + col("off_in_l1")).as("l2_off"), col("nn"))
    val wIn = Window.partitionBy(col("c_nationkey"), col("l2"))
      .orderBy(col("c_acctbal").asc_nulls_last, col("c_custkey").asc_nulls_last)
    cust
      .join(broadcast(offs), Seq("c_nationkey", "l2"))
      .withColumn("rnk", col("l2_off") + row_number().over(wIn))
      // ntile(4): the first (N mod 4) quartiles hold (N div 4 + 1) rows
      .withColumn("qq", expr("nn div 4"))
      .withColumn("rr", expr("nn % 4"))
      .withColumn("quartile",
        when(col("rnk") <= col("rr") * (col("qq") + 1),
          expr("(rnk - 1) div (qq + 1) + 1"))
        .otherwise(expr("rr + (rnk - rr * (qq + 1) - 1) div greatest(qq, 1) + 1"))
        .cast("int"))
      .withColumn("pct_rank", when(col("nn") === 1, lit(0.0))
        .otherwise((col("rnk") - 1).cast("double") / (col("nn") - 1).cast("double")))
      .withColumn("cume", col("rnk").cast("double") / col("nn").cast("double"))
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        col("quartile"), col("pct_rank"), col("cume"))
      .orderBy(col("c_nationkey").asc_nulls_last, col("c_acctbal").asc_nulls_last,
        col("c_custkey").asc_nulls_last)
  }

  /** One-slot cache registry for q25's collapsed stats table: the
    * cache cuts the DAG diamond at l2Counts (Spark plans an unshared
    * subtree once per consumer — without it the fact scan + partial
    * aggregate run twice), and each new q25 build frees the previous
    * build's blocks so bench reps / property-test iterations don't
    * accrete cached RDDs. The cache sits BELOW every window node on
    * purpose: PlanAuditSpec's bounded-key-window rule cannot see
    * through a materialization boundary, so windows must stay visible
    * above it. Not correctness-bearing: an unpersist under a running
    * query just recomputes.
    */
  private val prevL2Counts =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
  private def sharedL2Counts(df: DataFrame): DataFrame = {
    val cached = df.cache()
    val old = prevL2Counts.getAndSet(cached)
    if (old ne null) old.unpersist(false)
    cached
  }

  val q25Sql: String =
    """SELECT c_nationkey, c_custkey, c_acctbal,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey
      |             ORDER BY c_acctbal ASC NULLS LAST, c_custkey ASC NULLS LAST)
      |ORDER BY c_nationkey ASC NULLS LAST, c_acctbal ASC NULLS LAST, c_custkey ASC NULLS LAST""".stripMargin
}
