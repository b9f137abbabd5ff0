package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical aggregates (extends SURVEY.md §2.2 aggregations):
  * moments, correlation, and percentiles.
  *
  * Moment-style statistics are computed from EXACT decimal power sums
  * (Σx, Σx², Σxy) rather than the engines' streaming one-pass
  * implementations: Welford/Neumaier accumulation differs engine to
  * engine in the last ulps, while exact sums followed by one fixed
  * double formula are bit-identical — and the two-phase decimal sum is
  * the same single-shuffle plan at scale.
  */
object Stats {

  private def dsum(c: Column) = sum(c.cast(DecimalType(18, 4))).cast("double")
  // power sums multiply DECIMAL(19,4) × DECIMAL(18,4): the 19-wide
  // side forces DuckDB onto its int128 multiply path (18×18 overflows
  // its int64), while keeping Spark's result precision at
  // 19+18+1 = 38 — any wider and Spark trims the scale below 8,
  // rounding the product. This exact-by-construction pairing is
  // bit-identical on both engines; one final double cast
  private def dsum2(x: Column, y: Column) =
    sum(x.cast(DecimalType(19, 4)) * y.cast(DecimalType(18, 4))).cast("double")

  /** Per-group mean/variance/stddev + cross-column correlation from
    * exact power sums (population forms, n in the denominator).
    *
    * Correlates quantity with discount (not price): every power sum's
    * scaled-integer magnitude then stays below 2^53, so BOTH engines'
    * decimal→double conversions are exact and the cancellation-heavy
    * corr formula gets bit-identical operands. (Σ price² × 10^8
    * exceeds 2^53: DuckDB's int128→double rounds twice there and
    * diverges from Java's correctly-rounded conversion by ~1 ulp.)
    */
  def q37StatsMoments(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val n = count(lit(1)).cast("double")
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sx"),
        dsum2(col("l_quantity"), col("l_quantity")).as("sxx"),
        dsum(col("l_discount")).as("sy"),
        dsum2(col("l_discount"), col("l_discount")).as("syy"),
        dsum2(col("l_quantity"), col("l_discount")).as("sxy"),
        n.as("nd"))
      .select(
        col("l_returnflag"), col("n"),
        (col("sx") / col("nd")).as("mean_qty"),
        (col("sxx") / col("nd") - (col("sx") / col("nd")) * (col("sx") / col("nd")))
          .as("var_qty"),
        sqrt(col("sxx") / col("nd") - (col("sx") / col("nd")) * (col("sx") / col("nd")))
          .as("std_qty"),
        ((col("sxy") / col("nd") - (col("sx") / col("nd")) * (col("sy") / col("nd"))) /
          (sqrt(col("sxx") / col("nd") - (col("sx") / col("nd")) * (col("sx") / col("nd"))) *
            sqrt(col("syy") / col("nd") - (col("sy") / col("nd")) * (col("sy") / col("nd")))))
          .as("corr_qty_disc"))
      .orderBy(col("l_returnflag").asc_nulls_last)
  }

  val q37Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_discount AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
      |    CAST(count(*) AS DOUBLE) AS nd
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  sx / nd AS mean_qty,
      |  sxx / nd - (sx / nd) * (sx / nd) AS var_qty,
      |  sqrt(sxx / nd - (sx / nd) * (sx / nd)) AS std_qty,
      |  (sxy / nd - (sx / nd) * (sy / nd)) /
      |    (sqrt(sxx / nd - (sx / nd) * (sx / nd)) * sqrt(syy / nd - (sy / nd) * (sy / nd)))
      |    AS corr_qty_disc
      |FROM s ORDER BY l_returnflag ASC NULLS LAST""".stripMargin

  /** Exact percentiles with linear interpolation (median + quartiles).
    * Both engines compute pos = p·(n−1) with linear interpolation in
    * double; verified exact on the fixture.
    */
  def q38Percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
        expr("percentile(l_extendedprice, 0.75)").as("p75_price"))
      // the final percentile merge (per-partition value maps) is the
      // expensive stage; checkpoint the 3-row result so the sort's
      // range sampling doesn't run that merge twice (measured 2.4s →
      // 0.7s at sf0.1)
      .localCheckpoint(false)
      .orderBy(col("l_returnflag").asc_nulls_last)

  val q38Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_extendedprice, 0.25) AS p25_price,
      |  quantile_cont(l_extendedprice, 0.75) AS p75_price
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin

  /** q52: approx-percentile scale twin of q38 — the 100 TB form of
    * per-group percentiles: bounded-size sketches (accuracy 1000)
    * merge map-side instead of shipping per-group value maps, so
    * memory is O(groups × accuracy) regardless of value cardinality.
    * Estimates are implementation-specific, so there is no SQL oracle
    * (driver records a rows-only check); RelationalSpec bounds every
    * estimate within 5% of the exact q38-style value.
    */
  def q52ApproxPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    q52Of(Tables.lineitem(spark, sfDir))

  /** q52 over an arbitrary lineitem frame — the entry point the
    * sketch-merge property test drives with re-partitioned inputs.
    */
  def q52Of(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("median_qty"),
        expr("approx_percentile(l_extendedprice, 0.25, 1000)").as("p25_price"),
        expr("approx_percentile(l_extendedprice, 0.75, 1000)").as("p75_price"))
      // same double-execute defense as q38: checkpoint the 3-row
      // result before the presentation sort's range sampling
      .localCheckpoint(false)
      .orderBy(col("l_returnflag").asc_nulls_last)

  /** q50: z-score outlier detection — the classic two-pass plan: a
    * per-group stats aggregate (exact power sums → mean/std, bit-
    * identical across engines), broadcast back onto the fact rows, and
    * a flag count. At scale the stats side is group-cardinality-sized,
    * so the second pass is a broadcast join — one fact shuffle total
    * (for the final per-group count). The |x−μ| > 2σ comparison is on
    * bit-identical doubles, so the boundary is portable.
    */
  /** q54: equi-width histogram — the data-profiling primitive (price
    * distribution per return flag, $10k bins, under/overflow clamped
    * into the edge bins). Binning is ONE IEEE division + floor on each
    * row — bit-identical on both engines — and the histogram itself is
    * a partial-aggregated count shuffle whose key count is fixed by
    * the bin count, not the data: the cheapest possible profile of a
    * 100 TB column.
    */
  def q54Histogram(spark: SparkSession, sfDir: String): DataFrame = {
    val bin = least(greatest(
      floor(col("l_extendedprice").cast("double") / lit(10000.0)), lit(0.0)),
      lit(9.0)).cast("int")
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("total_price"))
      .orderBy(col("l_returnflag").asc_nulls_last, col("bin").asc_nulls_last)
  }

  val q54Sql: String =
    """SELECT l_returnflag,
      |  CAST(least(greatest(floor(CAST(l_extendedprice AS DOUBLE) / 10000.0), 0.0), 9.0) AS INT) AS bin,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      |FROM lineitem
      |GROUP BY 1, 2
      |ORDER BY l_returnflag ASC NULLS LAST, bin ASC NULLS LAST""".stripMargin

  def q50Outliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val stats = li.groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sx"),
        dsum2(col("l_quantity"), col("l_quantity")).as("sxx"),
        count(lit(1)).cast("double").as("nd"))
      .select(col("l_returnflag"),
        (col("sx") / col("nd")).as("mean_q"),
        sqrt(col("sxx") / col("nd") -
          (col("sx") / col("nd")) * (col("sx") / col("nd"))).as("std_q"))
    li.join(broadcast(stats), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        count(when(abs(col("l_quantity") - col("mean_q")) > lit(2.0) * col("std_q"), 1))
          .as("n_outliers"),
        max(col("mean_q")).as("mean_q"),
        max(col("std_q")).as("std_q"))
      .orderBy(col("l_returnflag").asc_nulls_last)
  }

  /** q56: robust outlier detection via MAD (median absolute
    * deviation) — q50's mean/σ flags blow up when the outliers
    * themselves inflate σ; the breakdown-resistant form centers on the
    * exact median and scales by MAD. Three passes over the fact
    * (median → MAD → flag count), each a group-cardinality-sized
    * broadcast back — the honest exact-MAD plan; the 100 TB variant
    * swaps `percentile` for the mergeable approx sketch (q52) without
    * changing shape. Interpolated medians and the |x−med| > 3·MAD
    * boundary are computed identically on both engines (q38
    * precedent), so the flag counts are exact.
    */
  def q56MadOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val med = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("med_q"))
    val mad = li.join(broadcast(med), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(abs(l_quantity - med_q), 0.5)").as("mad_q"),
        max(col("med_q")).as("med_q"))
    li.join(broadcast(mad), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        count(when(abs(col("l_quantity") - col("med_q")) >
          lit(3.0) * col("mad_q"), 1)).as("n_outliers"),
        max(col("med_q")).as("med_q"),
        max(col("mad_q")).as("mad_q"))
      .orderBy(col("l_returnflag").asc_nulls_last)
  }

  val q56Sql: String =
    """WITH med AS (
      |  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_q
      |  FROM lineitem GROUP BY l_returnflag),
      |mad AS (
      |  SELECT l.l_returnflag,
      |    quantile_cont(abs(l.l_quantity - m.med_q), 0.5) AS mad_q,
      |    max(m.med_q) AS med_q
      |  FROM lineitem l JOIN med m USING (l_returnflag)
      |  GROUP BY l.l_returnflag)
      |SELECT l.l_returnflag, count(*) AS n,
      |  count(CASE WHEN abs(l.l_quantity - m.med_q) > 3.0 * m.mad_q THEN 1 END)
      |    AS n_outliers,
      |  max(m.med_q) AS med_q, max(m.mad_q) AS mad_q
      |FROM lineitem l JOIN mad m USING (l_returnflag)
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag ASC NULLS LAST""".stripMargin

  val q50Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
      |    CAST(count(*) AS DOUBLE) AS nd
      |  FROM lineitem GROUP BY l_returnflag),
      |m AS (
      |  SELECT l_returnflag, sx / nd AS mean_q,
      |    sqrt(sxx / nd - (sx / nd) * (sx / nd)) AS std_q
      |  FROM s)
      |SELECT l.l_returnflag, count(*) AS n,
      |  count(CASE WHEN abs(l.l_quantity - m.mean_q) > 2.0 * m.std_q THEN 1 END) AS n_outliers,
      |  max(m.mean_q) AS mean_q, max(m.std_q) AS std_q
      |FROM lineitem l JOIN m USING (l_returnflag)
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag ASC NULLS LAST""".stripMargin

  /** q84: revenue concentration — Gini coefficient and top-1%/10%
    * shares of per-customer revenue, the whale-distribution summary
    * behind quota and risk planning. Gini needs every customer's
    * GLOBAL revenue rank (G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx), x
    * ascending), which naively plans the banned single-task global
    * window. Re-shaped as the engine's two-level distributed rank
    * (q25's machinery, value-bucketed):
    *   level 2 = $1,000 revenue buckets — an OCCUPIED-key table whose
    *     cardinality grows with the data (149 → 3,885 keys sf0.001→0.1),
    *     so the per-row rank window inside each bucket survives the
    *     cross-SF bounded-key audit;
    *   level 1 = $20,000 buckets bound the level-2 prefix window's
    *     partitions; cross-level-1 offsets come from a triangular
    *     broadcast self-join of the tiny level-1 table (q63's pattern —
    *     there is no outer partition key, and a global window over even
    *     the bucket table is banned).
    * Revenue is exact integer cents; rank×cents accumulates in
    * DECIMAL(38,0) (HUGEINT on the oracle side — a 100 TB corpus
    * overflows int64 products), so Gini and the shares are single
    * divisions of exactly-computed integers — bit-identical across
    * engines. The oracle states the naive global-window form.
    */
  def q84RevenueConcentration(spark: SparkSession, sfDir: String): DataFrame = {
    val dec38 = DecimalType(38, 0)
    import org.apache.spark.sql.expressions.Window
    val pc = Tables.orders(spark, sfDir)
      .withColumn("cents",
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("cents")).as("cents"))
      .withColumn("l2", expr("cents div 100000"))
      .withColumn("l1", expr("cents div 2000000"))
    val l2Stats = pc.groupBy(col("l1"), col("l2"))
      .agg(count(lit(1)).as("n2"))
    val wL2 = Window.partitionBy(col("l1")).orderBy(col("l2").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketed = l2Stats
      .withColumn("off_in_l1", sum(col("n2")).over(wL2) - col("n2"))
    val l1Stats = l2Stats.groupBy(col("l1")).agg(sum(col("n2")).as("n1"))
    val l1Off = l1Stats.as("a")
      .join(broadcast(l1Stats.as("b")), col("b.l1") < col("a.l1"), "left")
      .groupBy(col("a.l1").as("l1"))
      .agg(coalesce(sum(col("b.n1")), lit(0L)).as("l1_off"))
    val totals = l1Stats.agg(sum(col("n1")).as("nn"))
    val offs = bucketed.join(broadcast(l1Off), Seq("l1"))
      .select(col("l2"), (col("l1_off") + col("off_in_l1")).as("l2_off"))
    val wIn = Window.partitionBy(col("l2"))
      .orderBy(col("cents").asc_nulls_last, col("o_custkey").asc_nulls_last)
    pc.join(broadcast(offs), Seq("l2"))
      .withColumn("rnk", col("l2_off") + row_number().over(wIn))
      .crossJoin(broadcast(totals))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("cents").cast(dec38)).as("tt"),
        sum(col("rnk").cast(dec38) * col("cents")).as("ss"),
        sum(when(col("rnk") > col("nn") - expr("nn div 10"), col("cents"))
          .otherwise(lit(0L)).cast(dec38)).as("top10"),
        sum(when(col("rnk") > col("nn") - expr("nn div 100"), col("cents"))
          .otherwise(lit(0L)).cast(dec38)).as("top1"),
        max(col("nn")).as("nn"))
      .select(
        col("n_customers"),
        (col("tt").cast("double") / lit(100.0)).as("total_rev"),
        ((lit(2).cast(dec38) * col("ss") -
          (col("nn") + 1).cast(dec38) * col("tt")).cast("double") /
          (col("nn").cast(dec38) * col("tt")).cast("double")).as("gini"),
        (col("top1").cast("double") / col("tt").cast("double")).as("top1_share"),
        (col("top10").cast("double") / col("tt").cast("double")).as("top10_share"))
  }

  val q84Sql: String =
    """WITH pc AS (
      |  SELECT o_custkey,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
      |  FROM orders GROUP BY o_custkey),
      |r AS (
      |  SELECT o_custkey, cents,
      |    row_number() OVER (ORDER BY cents ASC NULLS LAST,
      |      o_custkey ASC NULLS LAST) AS rnk,
      |    count(*) OVER () AS nn
      |  FROM pc)
      |SELECT count(*) AS n_customers,
      |  CAST(sum(CAST(cents AS HUGEINT)) AS DOUBLE) / 100.0 AS total_rev,
      |  CAST(2 * sum(CAST(rnk AS HUGEINT) * cents)
      |       - (max(nn) + 1) * sum(CAST(cents AS HUGEINT)) AS DOUBLE)
      |    / CAST(max(nn) * sum(CAST(cents AS HUGEINT)) AS DOUBLE) AS gini,
      |  CAST(sum(CASE WHEN rnk > nn - nn // 100 THEN CAST(cents AS HUGEINT)
      |        ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(CAST(cents AS HUGEINT)) AS DOUBLE) AS top1_share,
      |  CAST(sum(CASE WHEN rnk > nn - nn // 10 THEN CAST(cents AS HUGEINT)
      |        ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(CAST(cents AS HUGEINT)) AS DOUBLE) AS top10_share
      |FROM r""".stripMargin
}
