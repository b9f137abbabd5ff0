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
}
