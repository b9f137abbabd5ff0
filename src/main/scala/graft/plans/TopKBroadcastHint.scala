package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** CATEGORICAL-skew broadcast selection (VERDICT r19 #5): stock CBO
  * estimates a string-equality filter at 1/ndv — on a skewed column
  * (`lang`-like: a handful of values, one dominating) that wildly
  * over-estimates the RARE values, so a tiny filtered side
  * sort-merge-joins. The numeric-histogram channel cannot carry
  * string frequency (catalyst `FilterEstimation` maps only orderable
  * types into bin space, and would throw on a string histogram), so
  * the ANALYZE-committed top-K rides its own sticky property
  * ([[graft.sinks.ManifestTable.TopKPropPrefix]]) and this rule
  * consumes it: when a join side is a filter over a graft scan whose
  * top-level equality/IN conjuncts on sketched string columns prove a
  * row upper bound, and that bound prices the side under the
  * broadcast threshold, the join gets an explicit BROADCAST hint for
  * that side.
  *
  * Soundness: the bound is an UPPER bound — kept terms carry exact
  * analyze-time counts, absent terms are bounded by `err` = floor(n /
  * (k+1)), and extra conjuncts only shrink the side — so the rule can
  * only broadcast something provably small, never a surprise-huge
  * side. On the heavy value the bound is large and the rule stays
  * silent — exactly the stock plan. At 100 TB this is the difference
  * between a full fact-fact shuffle and a broadcast for every
  * `category = 'rare'` slice query.
  */
object TopKBroadcastHint extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.exists(_.isInstanceOf[Join])) return plan
    plan.transform {
      case j: Join if j.hint == JoinHint.NONE =>
        val threshold = conf.autoBroadcastJoinThreshold
        if (threshold <= 0) j
        else {
          val l = provableBytes(j.left).filter(_ <= threshold)
          val r = provableBytes(j.right).filter(_ <= threshold)
          val hintLeft = l.isDefined && canBuildLeft(j.joinType) &&
            (r.isEmpty || !canBuildRight(j.joinType) ||
              l.get <= r.get)
          val hintRight = !hintLeft && r.isDefined &&
            canBuildRight(j.joinType)
          if (hintLeft) j.copy(hint = JoinHint(
            Some(HintInfo(strategy = Some(BROADCAST))), None))
          else if (hintRight) j.copy(hint = JoinHint(
            None, Some(HintInfo(strategy = Some(BROADCAST)))))
          else j
        }
    }
  }

  private def canBuildRight(jt: JoinType): Boolean = jt match {
    case _: InnerLike | LeftOuter | LeftSemi | LeftAnti |
        _: ExistenceJoin => true
    case _ => false
  }
  private def canBuildLeft(jt: JoinType): Boolean = jt match {
    case _: InnerLike | RightOuter => true
    case _ => false
  }

  /** The provable size (bytes) of a join side: a Project/Filter chain
    * over a graft relation whose equality conjuncts on top-K-sketched
    * string columns bound the surviving rows. None = nothing provable
    * (missing sketch, no equality, non-graft relation). Matches BOTH
    * the pre-pushdown `DataSourceV2Relation` (the Pre CBO batch runs
    * before "Early Filter and Projection Push-Down" in Spark 4) and
    * the pushed `DataSourceV2ScanRelation`.
    */
  private def provableBytes(side: LogicalPlan): Option[BigInt] =
    side match {
      case Project(_, child) => provableBytes(child)
      case Filter(cond, rel: DataSourceV2Relation) =>
        rel.table match {
          case t: org.apache.spark.sql.GraftTableV2.GraftV2Table =>
            priced(cond, rel.output, t.stickyProps, t.sizeHint)
          case _ => None
        }
      case Filter(cond, rel: DataSourceV2ScanRelation) =>
        rel.scan match {
          case g: org.apache.spark.sql.GraftTableV2.GraftStatsScan =>
            priced(cond, rel.output, g.tableProps, g.sizeHint)
          case _ => None
        }
      case _ => None
    }

  private def priced(cond: Expression,
      output: Seq[Attribute],
      props: Map[String, String],
      sizeHint: Option[(Long, Long)]): Option[BigInt] = {
    val outNames = output.map(a => a.exprId -> a.name).toMap
    // STALENESS guard: the top-K counts are analyze-time facts. Every
    // row appended since could carry the probed value, so the sound
    // bound is count + (current rows − analyze-time rows) — priced
    // from the manifest's exact current row count. Without a current
    // count nothing is provable; a table that grew materially prices
    // itself back out of the broadcast range instead of OOMing it.
    val current: Long = sizeHint.filter(_._2 > 0).map(_._2)
      .getOrElse(return None)
    val bounds = splitConjunctivePredicates(cond).flatMap(
      conjunctBound(_, outNames, props).map { case (b, n) =>
        b + math.max(0L, current - n)
      })
    if (bounds.isEmpty) None
    else {
      val rows = bounds.min
      // price the rows CONSERVATIVELY: the larger of the in-memory
      // width (getSizePerRow — the unit the stock planner compares
      // against autoBroadcastJoinThreshold) and the table's on-disk
      // width (text-heavy columns dwarf their 20-byte defaultSize;
      // dictionary-compressed categoricals dwarf their disk bytes)
      val inMem = org.apache.spark.sql.catalyst.plans.logical
        .statsEstimation.EstimationUtils.getSizePerRow(output)
      val onDisk: BigInt = sizeHint
        .filter(_._2 > 0)
        .map { case (bytes, n) => BigInt(math.max(bytes / n, 1L)) }
        .getOrElse(BigInt(1))
      Some(BigInt(rows) * inMem.max(onDisk))
    }
  }

  /** The (row bound, analyze-time rows) a single conjunct proves, if
    * any: `col = 'lit'` (either orientation) or a small `col IN
    * (...)` over a sketched string column. A kept term bounds by its
    * exact analyze-time count, an absent term by the sketch's err
    * bound; the caller adds the growth-since-analyze slack.
    */
  private def conjunctBound(e: Expression,
      names: Map[ExprId, String],
      props: Map[String, String]): Option[(Long, Long)] = {

    def termBound(col: String, v: UTF8String): Option[(Long, Long)] =
      props.get(graft.sinks.ManifestTable.TopKPropPrefix + col)
        .flatMap(graft.sinks.ManifestTable.parseTopK)
        .map { case (n, err, kept) =>
          (if (v == null) 0L else kept.getOrElse(v.toString, err), n)
        }

    def colName(a: Expression): Option[String] = a match {
      case ar: AttributeReference if ar.dataType == StringType =>
        names.get(ar.exprId)
      case _ => None
    }

    e match {
      case EqualTo(a, Literal(v, StringType)) =>
        colName(a).flatMap(termBound(_, v.asInstanceOf[UTF8String]))
      case EqualTo(Literal(v, StringType), a) =>
        colName(a).flatMap(termBound(_, v.asInstanceOf[UTF8String]))
      case In(a, list) if list.nonEmpty && list.size <= 16 &&
          list.forall {
            case Literal(_, StringType) => true
            case _ => false
          } =>
        colName(a).flatMap { c =>
          val per = list.map {
            case Literal(v, StringType) =>
              termBound(c, v.asInstanceOf[UTF8String])
            case _ => None
          }
          if (per.forall(_.isDefined))
            Some((per.flatten.map(_._1).sum, per.flatten.map(_._2).min))
          else None
        }
      case InSet(a, set) if set.nonEmpty && set.size <= 16 =>
        colName(a).flatMap { c =>
          val per = set.toSeq.map {
            case v: UTF8String => termBound(c, v)
            case null => Some((0L, Long.MaxValue))
            case _ => None
          }
          if (per.forall(_.isDefined))
            Some((per.flatten.map(_._1).sum, per.flatten.map(_._2).min))
          else None
        }
      case _ => None
    }
  }
}
