package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Aggs, Stats, Tables}

/** Mergeability of the two sketch aggregates (q14 HLL++, q52
  * approx-percentile) across partitionings — the property a real
  * cluster relies on: the same data split into 1, 4, or 32 partial
  * sketches and merged must yield the same answer.
  *
  * HLL++ register merge is a pointwise max — associative, commutative,
  * idempotent — so the estimate must be IDENTICAL whatever the
  * partitioning. Spark's approx_percentile (Greenwald-Khanna summary)
  * merge keeps the rank-error invariant but not bit-equality, so each
  * partitioning's estimate is instead held to the documented bound:
  * within 5% of the exact percentile (the same bound RelationalSpec
  * pins for the declared query).
  */
class SketchMergeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val partitionings = Seq(1, 4, 32)

  test("q14 HLL++ estimate is identical at 1, 4, and 32 partitions") {
    val byParts = partitionings.map { n =>
      n -> Aggs.q14Of(Tables.lineitem(spark, sf).repartition(n))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val (_, ref) = byParts.head
    byParts.tail.foreach { case (n, m) =>
      assert(m == ref,
        s"HLL++ estimate changed under $n-partition merge: $m vs $ref")
    }
  }

  test("q14 HLL++ estimate is insensitive to row order within partitions") {
    // same sketch from a shuffled row order: register max is idempotent
    val base = Aggs.q14Of(Tables.lineitem(spark, sf).repartition(8))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reordered = Aggs.q14Of(
        Tables.lineitem(spark, sf).repartition(8)
          .sortWithinPartitions(col("l_partkey").desc))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reordered == base)
  }

  test("q52 approx percentiles stay within the 5% bound at every partitioning") {
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
        expr("percentile(l_extendedprice, 0.75)").as("p75_price"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    partitionings.foreach { n =>
      val approx = Stats.q52Of(Tables.lineitem(spark, sf).repartition(n))
        .collect()
        .map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(approx.keySet == exact.keySet)
      approx.foreach { case (flag, (m, p25, p75)) =>
        val (em, e25, e75) = exact(flag)
        def within(a: Double, e: Double, tag: String): Unit =
          assert(math.abs(a - e) <= 0.05 * math.abs(e),
            s"$tag for $flag at $n partitions: approx $a vs exact $e")
        within(m, em, "median_qty"); within(p25, e25, "p25_price")
        within(p75, e75, "p75_price")
      }
    }
  }
}
