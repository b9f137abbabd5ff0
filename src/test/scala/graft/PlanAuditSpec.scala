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
  lazy val spark: SparkSession = {
    // the audits run EVERY declared query, and the SQL row-level
    // queries (p29/p30) need the injected resolution rule — build the
    // deployment-shaped session (extensions bind at session build, so
    // the JVM's shared session cannot be upgraded in place)
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val s = org.apache.spark.sql.GraftColumnBridge.sessionWithExtensions(
      new GraftExtensions().apply(_))
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  /** q62's whole point is the specialized operator: a plain LeftAnti
    * hash join would KEEP the null-probe rows that ANSI `NOT IN` must
    * drop. The formatted explain does not print the flag, so only this
    * programmatic check can pin it.
    */
  test("q62's NOT IN plans the null-aware anti join (broadcast)") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = graft.ops.Aggs.q62NotInNullAware(spark, sf)
      .queryExecution.sparkPlan
    val naaj = plan.collect {
      case j: BroadcastHashJoinExec if j.isNullAwareAntiJoin => j
    }
    assert(naaj.size == 1,
      s"expected one null-aware broadcast anti join:\n$plan")
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

  /** The bounded-cardinality window class: a window over a FACT-SIZED
    * input partitioned by a key whose cardinality does NOT grow with
    * the data (e.g. the ~5-value `lang`) serializes ~1/5 of the corpus
    * through one task at scale — and "the window is partitioned",
    * which the rule above checks, cannot see it. Detected empirically
    * across two scale factors: if the window's input rows grow ≥4×
    * between sf0.001 and sf0.1 but its partition-key distinct count
    * does not at least double, the key is data-independent and the
    * shape would not survive a 100× scale-up. Windows over
    * pre-collapsed (sub-fact-sized, < 2500 rows) or fixed-size inputs
    * are exempt — the legitimate low-cardinality forms (e08/e09's
    * time-bucket grids, p06/p11's per-bucket prefix tables).
    *
    * Known blind spot: a localCheckpoint truncates the logical plan to
    * a LogicalRDD leaf, so a window that ran INSIDE a checkpointed
    * segment is invisible here. Today every declared query's windows
    * sit above its checkpoints (checkpoints hold narrow scalar
    * outputs); keep it that way, or extend this rule, when adding
    * checkpoints below windows.
    */
  /** An excised window child can carry a DynamicPruningSubquery whose
    * build side lives OUTSIDE the excised subtree (s11's DPP on the
    * index's cell partitions) — unresolvable, and re-executing it
    * standalone throws. Replace with literal true: the detector only
    * counts rows, and skipping the pruning merely overcounts — the
    * conservative direction.
    */
  private def stripDpp(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.transformAllExpressions {
      case _: org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery =>
        org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral
    }

  private def boundedKeyWindowViolations(
      build: String => org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import org.apache.spark.sql.GraftColumnBridge
    val wsSmall = build(sf).queryExecution.optimizedPlan
      .collect { case w: LWindow => w.copy(child = stripDpp(w.child)) }
    if (wsSmall.isEmpty) return Nil
    val wsBig = build("/root/testdata/sf0.1").queryExecution.optimizedPlan
      .collect { case w: LWindow => w.copy(child = stripDpp(w.child)) }
    assert(wsSmall.size == wsBig.size,
      s"window node count differs across scale factors " +
        s"(${wsSmall.size} vs ${wsBig.size}) — cannot pair them")
    wsSmall.zip(wsBig).flatMap { case (w0, w1) =>
      val cBig = GraftColumnBridge.ofRows(spark, w1.child)
      val rowsBig = cBig.count()
      if (rowsBig < 2500) None // pre-collapsed / pruned input: fine
      else {
        val cSmall = GraftColumnBridge.ofRows(spark, w0.child)
        val rowsSmall = cSmall.count()
        if (rowsBig < 4 * rowsSmall) None // fixed-size input (e.g. a calendar grid)
        else {
          val kBig = cBig.select(w1.partitionSpec.map(GraftColumnBridge.column): _*)
            .distinct().count()
          val kSmall = cSmall.select(w0.partitionSpec.map(GraftColumnBridge.column): _*)
            .distinct().count()
          if (kBig >= 2 * kSmall) None
          else {
            // last exemption: an input well below the query's own fact
            // scan is pre-collapsed (e09's time-bucket grid grows with
            // the covered time range, but stays far under the event
            // count); only a window seeing ~the whole fact table on a
            // bounded key is the one-task-per-key scale-killer
            val factRows = w1.collectLeaves()
              .map(l => GraftColumnBridge.ofRows(spark, l).count()).max
            if (rowsBig * 10 < factRows * 3) None
            else Some(s"window partitioned by [${w1.partitionSpec.mkString(", ")}]: " +
              s"input grows $rowsSmall -> $rowsBig (fact scan $factRows) but keys " +
              s"only $kSmall -> $kBig — one task per key at scale; pre-collapse " +
              "the input or use a two-phase bucketed prefix sum")
          }
        }
      }
    }
  }

  test("no fact-sized window is partitioned by a data-independent-cardinality key") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val v = boundedKeyWindowViolations(dir => fn(spark, dir))
      assert(v.isEmpty, s"$name: ${v.mkString("; ")}")
    }
  }

  test("the bounded-key window detector catches the per-lang running-sum shape") {
    // the round-4 p06/p11 shape, reconstructed as a negative control:
    // the detector must flag it, or the rule above proves nothing
    import org.apache.spark.sql.expressions.{Window => WSpec}
    import org.apache.spark.sql.functions._
    def bad(dir: String) = {
      val w = WSpec.partitionBy(col("lang"))
        .orderBy(col("doc_id").asc_nulls_last)
        .rowsBetween(WSpec.unboundedPreceding, WSpec.currentRow)
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("cum", sum(size(split(col("text"), " "))).over(w))
    }
    assert(boundedKeyWindowViolations(bad).nonEmpty,
      "detector failed to flag a fact-sized per-lang running sum")
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
    Seq("d08_boilerplate", "d09_contamination", "d12_substring_runs",
        "t08_bigrams", "t09_tfidf",
        "p12_decontaminated_split", "t13_ngram_lm_score")
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

  /** q64's whole point is that the no-equi-key interval predicate
    * becomes a HASH join through bin keying: a regression that drops
    * the bin equality (or an optimizer change that stops seeing it)
    * would silently fall back to BroadcastNestedLoopJoin — result-
    * identical, but O(points × windows) compares with a broadcast
    * ceiling on the window side. Only the plan can catch it.
    */
  test("q64's interval semi join is a hash join on the bin key, not a nested loop") {
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
    val plan = graft.ops.Joins.q64IntervalJoinBinned(spark, sf)
      .queryExecution.sparkPlan
    val nlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(nlj.isEmpty, s"q64 fell back to a nested-loop interval join:\n$plan")
    val semi = plan.collect {
      case j: BaseJoinExec if j.joinType.sql == "LEFT SEMI" => j
    }
    assert(semi.size == 1 && semi.head.leftKeys.nonEmpty,
      s"expected one equi (bin-keyed) semi join:\n$plan")
  }

  /** The round-5 two-phase re-shapes hinge on their tiny offset/prune
    * tables BROADCASTING back to the fact side (p06 bucket offsets,
    * p11 surviving bands, q25 rank offsets + totals): a silent flip to
    * a shuffle join would re-shuffle the fact table and erase the
    * point of the re-shape without changing results.
    */
  test("two-phase prefix-sum queries broadcast their offset/prune tables") {
    Seq("p06_sequence_packing", "p11_token_budget", "q25_window_ntile")
      .foreach { name =>
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.sparkPlan.toString
        assert(plan.contains("BroadcastHashJoin"),
          s"$name lost its broadcast offset join:\n$plan")
      }
  }

  /** e07 must keep its first-5-per-user selection on the native top-k
    * operator: a regression to collect_list-then-slice would be
    * result-identical but rebuild O(per-user events) aggregation
    * buffers — only the plan can catch it.
    */
  test("e07 plans the native per-key top-k (bounded per-user state)") {
    val plan = graft.ops.EventOps.e07EventPaths(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyFinal") &&
        plan.contains("GraftTopKPerKeyPartial"),
      s"e07 no longer plans the native top-k:\n$plan")
  }

  /** s06's per-vector selection must stay on the native top-k: a
    * regression to a plain window over the full candidate set would be
    * result-identical but ship every candidate row through the
    * exchange instead of ≤ k per vector per partition.
    */
  test("s06 plans the native per-key top-k over its candidate pairs") {
    val plan = graft.ops.Similarity.s06KnnJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyFinal") &&
        plan.contains("GraftTopKPerKeyPartial"),
      s"s06 no longer plans the native top-k:\n$plan")
  }

  /** s08's filter must stay the JOIN KEY (a hash join on label) and
    * its selection must stay on the native top-k: a regression to a
    * post-filtered cross product or a full window sort would be
    * result-identical on the fixture but lose both scale properties.
    */
  test("s08's filtered kNN joins on the label and plans the native top-k") {
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
    val qe = graft.ops.Similarity.s08FilteredKnn(spark, sf).queryExecution
    val nlj = qe.sparkPlan.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(nlj.isEmpty, s"s08 degraded to an unfiltered cross product:\n${qe.sparkPlan}")
    val equi = qe.sparkPlan.collect {
      case j: BaseJoinExec if j.leftKeys.nonEmpty => j
    }
    assert(equi.nonEmpty, s"s08 lost its label equi join:\n${qe.sparkPlan}")
    val plan = qe.executedPlan.toString
    assert(plan.contains("GraftTopKPerKeyFinal") &&
        plan.contains("GraftTopKPerKeyPartial"),
      s"s08 no longer plans the native top-k:\n$plan")
  }

  /** s10's diversification is BOTH selection levels on the native
    * operator — the (query, cell) k=1 dedup and the (query) k=K cut.
    * A regression to window sorts would keep fixture results identical
    * but put two full per-query sorts back on the scored fact.
    */
  test("s10 plans two cascaded native top-k selections") {
    val plan = graft.ops.Similarity.s10DiversifiedKnn(spark, sf)
      .queryExecution.executedPlan.toString
    val finals = "GraftTopKPerKeyFinal".r.findAllIn(plan).size
    val partials = "GraftTopKPerKeyPartial".r.findAllIn(plan).size
    assert(finals == 2 && partials == 2,
      s"s10 expected 2 native top-k cascades, found $finals final / $partials partial:\n$plan")
  }

  /** q57's global top-10 must plan as TakeOrderedAndProject
    * (per-partition bounded heaps + driver merge); a silent flip to a
    * full range-partitioned sort would re-introduce an O(n log n)
    * global shuffle for a 10-row answer.
    */
  test("q57's top-10 plans as TakeOrderedAndProject, not a global sort") {
    val plan = graft.ops.Relational.q57ShippingPriority(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"q57 lost its TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"q57 plans a global range sort for a LIMIT 10:\n$plan")
  }

  /** Same contract for q71 (round 7, TPC-H Q10 analogue): the top-20
    * over the per-customer collapse must be heap-based, and its two
    * fact filters (returnflag, order-date quarter) must reach the
    * scans as pushed filters, not post-scan.
    */
  test("q71's top-20 is TakeOrderedAndProject with pushed fact filters") {
    val q = graft.ops.Relational.q71ReturnedItemRanking(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"q71 lost its TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"q71 plans a global range sort for a LIMIT 20:\n$plan")
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.exists(_.contains("l_returnflag")) ||
      plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)"),
      s"q71's returnflag filter did not reach the lineitem scan:\n${scans.mkString("\n")}")
  }

  /** q84 consumes the per-customer aggregate `pc` in two branches (the
    * bucket census and the final rank join). Spark plans the diamond
    * twice, but the two scan→aggregate exchanges are canonically
    * identical, so AQE must collapse the second into a ReusedExchange
    * — otherwise the orders fact is scanned and shuffled twice. The
    * executed plan only materializes reuse after an action, hence the
    * collect() before the assertion.
    */
  test("q84's per-customer aggregate diamond is AQE-reused, not recomputed") {
    val q = graft.ops.Stats.q84RevenueConcentration(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"q84's pc diamond executed without exchange reuse:\n$plan")
  }

  /** d13's contract is that the CORPUS side of the probe is the stored
    * band index — a parquet scan feeding a broadcast hash join — and
    * only the batch branch hashes text. One graft_minhash in the whole
    * plan (the batch), an index FileScan, and no shuffle of the index:
    * re-banding old rows at probe time would put a second minhash and
    * an exchange on the corpus branch.
    */
  test("d13's corpus side is index scan + broadcast join, never re-banded") {
    val q = graft.ops.Dedup.d13IncrementalNearDup(spark, sf)
    // sparkPlan, not executedPlan: AQE's string form reprints the
    // broadcast subtree and double-counts its scans
    val leaves = q.queryExecution.sparkPlan.collectLeaves().map(_.toString)
    // raw text is scanned exactly twice — the batch union's two
    // branches; a corpus re-banding would add a third documents scan
    val nRawScans = leaves.count(_.contains("documents.parquet"))
    assert(nRawScans == 2,
      s"expected exactly two raw documents scans (the batch union), got $nRawScans:\n${leaves.mkString("\n")}")
    assert(leaves.exists(_.contains("graft_d13_index")),
      s"d13's corpus side does not read the persisted band index:\n${leaves.mkString("\n")}")
    val plan = q.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"d13's probe is not a broadcast join over the index:\n$plan")
  }

  /** s11's contract is that SERVING never re-assigns the corpus: the
    * corpus side of the probe is a parquet scan of the persisted IVF
    * manifest table feeding a broadcast hash join on the cell key.
    * Exactly two raw embeddings scans appear (the bounded query branch
    * and the broadcast codebook branch) — a corpus re-assignment would
    * add a third.
    */
  test("s11 serving reads the persisted IVF index, never re-assigns the corpus") {
    val q = graft.ops.Similarity.s11PersistedIvf(spark, sf)
    val leaves = q.queryExecution.sparkPlan.collectLeaves().map(_.toString)
    val nEmb = leaves.count(_.contains("embeddings.parquet"))
    assert(nEmb == 2,
      s"expected exactly two embeddings scans (queries + codebook), got $nEmb:\n${leaves.mkString("\n")}")
    assert(leaves.exists(_.contains("s11_ivf_")),
      s"serve plan does not read the persisted index:\n${leaves.mkString("\n")}")
    val plan = q.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"s11's probe is not a broadcast join over the index:\n$plan")
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
