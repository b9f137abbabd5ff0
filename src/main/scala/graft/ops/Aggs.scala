package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation operators (SURVEY.md §2.2: hash aggs with partial+final
  * phases, distinct, approx distinct, rollup/cube/grouping sets,
  * pivot, scalar subquery).
  *
  * All group-bys are two-phase automatically (partial map-side combine
  * before the shuffle) — at scale the shuffle carries |groups| rows per
  * partition, not the fact table.
  */
object Aggs {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact distinct counting: one `count(distinct)` plus a plain count.
    * Catalyst plans `countDistinct` as an expand + two-phase aggregate —
    * distributed, no driver materialization.
    */
  def q12DistinctAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_last)

  val q12Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin

  /** SELECT DISTINCT (dropDuplicates on a projection). */
  def q13Distinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)

  val q13Sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin

  /** Approximate distinct (HLL++). Estimates are implementation-specific,
    * so there is no SQL oracle (driver records a rows-only check); the
    * ScalaTest spec pins the estimate within 5% of exact instead.
    */
  def q14ApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    q14Of(Tables.lineitem(spark, sfDir))

  /** q14 over an arbitrary lineitem frame — the entry point the
    * sketch-merge property test drives with re-partitioned inputs.
    */
  def q14Of(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
      // checkpoint before the presentation sort: the HLL sketch merge
      // is the heavy final stage and range sampling would run it twice
      .localCheckpoint(false)
      .orderBy(col("l_returnflag").asc_nulls_last)

  /** Rollup: hierarchical subtotals + grand total, disambiguated by
    * grouping_id (same bitmask semantics as DuckDB's GROUPING()).
    */
  def q15Rollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid").asc_nulls_last, col("l_returnflag").asc_nulls_last,
        col("l_linestatus").asc_nulls_last)

  val q15Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n, GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid ASC NULLS LAST, l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin

  /** Cube: all 2^k grouping combinations. */
  def q16Cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid").asc_nulls_last, col("o_orderstatus").asc_nulls_last,
        col("o_orderpriority").asc_nulls_last)

  val q16Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n, GROUPING(o_orderstatus, o_orderpriority) AS gid
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid ASC NULLS LAST, o_orderstatus ASC NULLS LAST, o_orderpriority ASC NULLS LAST""".stripMargin

  /** Grouping sets (via SQL — the DataFrame API has no direct form). */
  def q17GroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("graft_lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM graft_lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin)
  }

  val q17Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin

  /** Pivot: order counts per customer nation × order status. The pivot
    * values are declared (F/O/P) so the plan is a single pass — no
    * driver-side distinct to discover columns.
    */
  def q18Pivot(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_nationkey"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("c_nationkey").asc_nulls_last)
  }

  val q18Sql: String =
    """SELECT c_nationkey,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS P
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey ASC NULLS LAST""".stripMargin

  /** Scalar/correlated-style subquery: orders above their customer's
    * average order value — expressed as a join against a pre-aggregated
    * side (the distributed form of a correlated subquery).
    */
  def q19SubqueryAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val avgPer = o.groupBy(col("o_custkey").as("k"))
      .agg((dsum(col("o_totalprice")) / count(lit(1)).cast("double")).as("avg_price"))
    o.join(avgPer, o("o_custkey") === avgPer("k"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey").asc_nulls_last)
  }

  val q19Sql: String =
    """WITH avg_per AS (
      |  SELECT o_custkey AS k,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price
      |  FROM orders GROUP BY o_custkey)
      |SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders JOIN avg_per ON o_custkey = k
      |WHERE o_totalprice > avg_price
      |ORDER BY o_orderkey ASC NULLS LAST""".stripMargin

  /** Array aggregation, determinism-safe: `collect_list` has no
    * ordering guarantee under parallel aggregation, so every engine
    * result is post-sorted (`sort_array`) — the pattern that makes
    * array aggregation hash-comparable (SURVEY.md §7.5 risk 4). The
    * sorted arrays are then '|'-joined at the comparison surface: the
    * driver's checker cannot sort list-typed output columns.
    */
  def q48CollectSorted(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), "|").as("doc_ids"),
        array_join(sort_array(collect_set(col("source"))), "|").as("sources"),
        count(lit(1)).as("n"))
      .orderBy(col("lang").asc_nulls_last)

  val q48Sql: String =
    """SELECT lang,
      |  list_aggregate(list_sort(list(doc_id)), 'string_agg', '|') AS doc_ids,
      |  list_aggregate(list_sort(list(DISTINCT source)), 'string_agg', '|') AS sources,
      |  count(*) AS n
      |FROM documents GROUP BY lang
      |ORDER BY lang ASC NULLS LAST""".stripMargin

  /** Ordered string aggregation (listagg/string_agg): deterministic by
    * sorting before joining, plus a conditional distinct count.
    */
  def q49StringAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
        countDistinct(when(col("c_acctbal") > 5000.0, col("c_mktsegment"))).as("rich_segments"),
        count(lit(1)).as("n"))
      .orderBy(col("c_nationkey").asc_nulls_last)

  val q49Sql: String =
    """SELECT c_nationkey,
      |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
      |  count(DISTINCT CASE WHEN c_acctbal > 5000.0 THEN c_mktsegment END) AS rich_segments,
      |  count(*) AS n
      |FROM customer GROUP BY c_nationkey
      |ORDER BY c_nationkey ASC NULLS LAST""".stripMargin

  /** SQL front door: the same ANSI text runs on Spark's parser —
    * CTE + IN-subquery + correlated EXISTS. Catalyst rewrites both
    * subqueries into semi joins; the point is the `spark.sql(...)`
    * surface itself, so the oracle is (nearly) the same string.
    */
  def q47SqlSubqueries(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_customer_sq")
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_orders_sq")
    spark.sql(
      """WITH hi AS (
        |  SELECT o_custkey FROM graft_orders_sq WHERE o_totalprice > 400000.0)
        |SELECT c_custkey, c_name, c_mktsegment FROM graft_customer_sq
        |WHERE c_custkey IN (SELECT o_custkey FROM hi)
        |  AND EXISTS (SELECT 1 FROM graft_orders_sq
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey ASC NULLS LAST""".stripMargin)
  }

  val q47Sql: String =
    """WITH hi AS (
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
      |SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM hi)
      |  AND EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey ASC NULLS LAST""".stripMargin

  /** q62: null-aware anti join — `NOT IN (subquery)` under ANSI
    * three-valued logic, the classic correctness trap: a NULL probe is
    * never "not in" anything (comparison is UNKNOWN), and one NULL in
    * the list would empty the whole result. Both sides here are made
    * nullable via `nullif`, so Catalyst cannot downgrade to a plain
    * anti join: it plans the specialized single-column
    * NULL-AWARE ANTI JOIN (broadcast, O(probe) with an O(1) null
    * short-circuit) instead of the naive quadratic
    * not-equal-nested-loop. The nation list stays dim-sized at any
    * scale, so the broadcast NAAJ is the 100 TB shape. DuckDB applies
    * the same ANSI semantics, so the oracle is (nearly) the same text.
    */
  def q62NotInNullAware(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_customer_ni")
    Tables.nation(spark, sfDir).createOrReplaceTempView("graft_nation_ni")
    spark.sql(
      """SELECT c_custkey, c_name, c_nationkey FROM graft_customer_ni
        |WHERE nullif(c_nationkey, 7) NOT IN
        |  (SELECT nullif(n_nationkey, 3) FROM graft_nation_ni
        |   WHERE n_regionkey IN (0, 1) AND n_nationkey <> 3)
        |ORDER BY c_custkey ASC NULLS LAST""".stripMargin)
  }

  val q62Sql: String =
    """SELECT c_custkey, c_name, c_nationkey FROM customer
      |WHERE nullif(c_nationkey, 7) NOT IN
      |  (SELECT nullif(n_nationkey, 3) FROM nation
      |   WHERE n_regionkey IN (0, 1) AND n_nationkey <> 3)
      |ORDER BY c_custkey ASC NULLS LAST""".stripMargin

  /** q51: correlated LATERAL subquery — per-customer top-2 orders by
    * price. Catalyst decorrelates the LIMIT-inside-LATERAL into a
    * ranked window join (no per-row re-execution), which is exactly
    * the plan you'd hand-write; the point is the SQL surface.
    */
  def q51LateralTopN(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("graft_customer_lt")
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_orders_lt")
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM graft_customer_lt c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM graft_orders_lt
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        |ORDER BY c.c_custkey ASC NULLS LAST, o.o_totalprice DESC NULLS LAST,
        |  o.o_orderkey ASC NULLS LAST""".stripMargin)
  }

  val q51Sql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
      |ORDER BY c.c_custkey ASC NULLS LAST, o.o_totalprice DESC NULLS LAST,
      |  o.o_orderkey ASC NULLS LAST""".stripMargin

  /** Top-k: global order-by + limit, planned as TakeOrderedAndProject
    * (per-partition top-k then a k-row merge — no global sort at scale).
    * Ties broken by key so k is deterministic.
    */
  def q20TopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_last)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val q20Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
      |LIMIT 10""".stripMargin

  /** q53: PER-KEY top-k via the native two-phase operator
    * (graft.plans.TopKPerKey — logical node + strategy + partial/final
    * SparkPlans): top 3 lineitems by price within each
    * (returnflag, linestatus) group. Map-side bounded heaps ship at
    * most k rows per key per partition — shuffle parity with Spark's
    * InferWindowGroupLimit rank-filter rewrite, without the
    * per-partition sorts or the post-shuffle Window pass (see
    * TopKPerKey's scaladoc and NativeTopKSpec's measured three-way
    * comparison). The (price, orderkey, linenumber) order is total, so
    * the cut is deterministic and the DuckDB window oracle reproduces
    * it exactly.
    */
  def q53NativeTopK(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
      Tables.lineitem(spark, sfDir).select(
        col("l_returnflag"), col("l_linestatus"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      keyCols = Seq(col("l_returnflag"), col("l_linestatus")),
      orderCols = Seq(col("l_extendedprice").desc_nulls_last,
        col("l_orderkey").asc_nulls_last, col("l_linenumber").asc_nulls_last),
      k = 3)
      .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last,
        col("l_extendedprice").desc_nulls_last, col("l_orderkey").asc_nulls_last)

  /** q55: percent-of-total contribution — each (flag, status) cell's
    * revenue share of its flag's total, the BI staple behind every
    * "top contributors" panel. One partial-aggregated fact shuffle
    * collapses to a 6-row table; the share window runs over THAT
    * (sub-fact-sized, so the bounded partition key is fine at any
    * scale). Revenue stays exact DECIMAL through the aggregation AND
    * the window total (decimal addition is associative — a double sum
    * here would be partition-order-nondeterministic), with one IEEE
    * division into doubles at the end.
    */
  def q55PercentOfTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 4))).as("rev"),
        count(lit(1)).as("n"))
      .withColumn("flag_rev", sum(col("rev")).over(w))
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        col("rev").cast("double").as("revenue"),
        (col("rev").cast("double") / col("flag_rev").cast("double"))
          .as("share_of_flag"))
      .orderBy(col("l_returnflag").asc_nulls_last,
        col("l_linestatus").asc_nulls_last)
  }

  val q55Sql: String =
    """WITH a AS (
      |  SELECT l_returnflag, l_linestatus,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev,
      |    count(*) AS n
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, l_linestatus, n,
      |  CAST(rev AS DOUBLE) AS revenue,
      |  CAST(rev AS DOUBLE) / CAST(sum(rev) OVER (PARTITION BY l_returnflag) AS DOUBLE)
      |    AS share_of_flag
      |FROM a
      |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin

  val q53Sql: String =
    """WITH r AS (
      |  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag, l_linestatus
      |      ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey ASC NULLS LAST,
      |        l_linenumber ASC NULLS LAST) AS rn
      |  FROM lineitem)
      |SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice
      |FROM r WHERE rn <= 3
      |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST,
      |  l_extendedprice DESC NULLS LAST, l_orderkey ASC NULLS LAST""".stripMargin
}
