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

  test("no query plans an unpartitioned window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name plans a global (unpartitioned) window — single-task at scale")
    }
  }

  /** The range-sampling double-execute class: a global sort's range
    * partitioner SAMPLES its child, so a join/generate kernel sitting
    * under the range exchange with no shuffle in between runs twice.
    * Pipelines whose sort follows a shuffle are bounded by shuffle
    * reuse; kernels must be cut off by a localCheckpoint (which plans
    * as an RDD scan). This fails if a future query forgets the
    * checkpoint.
    */
  test("no global sort re-executes an unshuffled join/generate kernel") {
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.{ShuffleExchangeLike, Exchange}
    def unshuffledBelow(p: SparkPlan): Seq[SparkPlan] =
      p.children.flatMap {
        case _: ShuffleExchangeLike => Nil // resample bounded by shuffle reuse
        case c => c +: unshuffledBelow(c)
      }
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.sparkPlan
      val rangeExchanges = plan.collect {
        case e: ShuffleExchangeLike
          if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
      }
      rangeExchanges.foreach { e =>
        val risky = unshuffledBelow(e).filter {
          case _: GenerateExec => true
          case _: Exchange => false // broadcast exchanges compute once
          case p => p.nodeName.contains("Join")
        }
        assert(risky.isEmpty,
          s"$name: global sort samples an unshuffled kernel " +
            s"(${risky.map(_.nodeName).distinct.mkString(", ")}) — add a localCheckpoint " +
            "before the presentation sort")
      }
    }
  }

  test("shingle analytics aggregate on xxhash64 keys, not raw strings") {
    // the d08/d09/t08/t09 production shape: the wide-key count shuffle
    // must key on the 8-byte hash — a regression to string keys would
    // still be CORRECT, so only the plan can catch it
    Seq("d08_boilerplate", "d09_contamination", "t08_bigrams", "t09_tfidf")
      .foreach { name =>
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.optimizedPlan.toString
        assert(plan.contains("xxhash64"),
          s"$name no longer aggregates on the hashed shingle key")
      }
  }

  /** e10's day↔trailing-days range join is only calendar-sized work
    * because the CALENDAR side broadcasts: a silent flip to a
    * non-broadcast nested loop (or to broadcasting the fact-derived
    * daily side) would re-introduce an O(fact) single-node pass at
    * scale. Correctness would not change, so only the plan can catch
    * the regression.
    */
  test("e10's range join broadcasts the calendar side") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    val plan = graft.ops.EventOps.e10TrailingDistinct(spark, sf)
      .queryExecution.sparkPlan
    val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnlj.size == 1, s"expected exactly one broadcast range join:\n$plan")
    val build = bnlj.head.buildSide match {
      case BuildLeft => bnlj.head.left
      case BuildRight => bnlj.head.right
    }
    // the calendar relation is the single-column distinct-day frame
    assert(build.output.map(_.name) == Seq("d"),
      s"build side must be the calendar (output 'd'), got " +
        s"${build.output.map(_.name).mkString(",")}:\n$plan")
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
