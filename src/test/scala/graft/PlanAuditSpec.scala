package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Plan-shape audit over EVERY declared query: no accidental
  * cartesian products (the one crossJoin in the IVF codebook
  * assignment is a bounded broadcast NLJ, which is fine and asserted
  * as such), and every parquet scan prunes columns (never reads a
  * full 11-column lineitem row for a narrow projection).
  */
class PlanAuditSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  test("q08 pre-aggregates orders BELOW the join (no post-join aggregate)") {
    // in the plan printout children follow parents, so "aggregate
    // below join" means the HashAggregate line comes after the Join
    // line; the round-1 shape (join feeding a final aggregate) had it
    // before
    val plan = graft.ops.Joins.q08OuterJoin(spark, sf)
      .queryExecution.sparkPlan.toString
    val joinIdx = plan.indexOf("Join")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      s"expected orders pre-aggregate under the join:\n$plan")
  }

  test("q01's lineitem scan reads only the needed columns") {
    // sparkPlan, not executedPlan: AQE wraps the latter into a single
    // AdaptiveSparkPlan leaf before execution
    val scans = graft.ops.Relational.q01PricingSummary(spark, sf)
      .queryExecution.sparkPlan.collectLeaves()
    // 6 of 11 lineitem columns: the filter column + 5 agg inputs
    val cols = scans.flatMap(_.output.map(_.name)).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate"), cols)
  }
}
