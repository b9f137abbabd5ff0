package org.apache.spark.sql

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

/** NAME-BASED streaming reads (VERDICT r14 #3):
  * `spark.readStream.table("lake.ns.t")` resolves to a
  * [[StreamingRelationV2]] over the catalog's [[GraftTableV2.GraftV2Table]],
  * which declares no `MICRO_BATCH_READ` — and Spark 4.1's
  * [[execution.datasources.v2.TableCapabilityCheck]] refuses such a
  * node UNCONDITIONALLY (it never consults the `v1Relation` fallback
  * slot; only MicroBatchExecution does, too late). So this resolution
  * rule REPLACES the whole node with the engine's proven V1 source
  * relation ([[graft.streaming.GraftManifestSourceProvider]], version
  * offsets + rate limits + CDC + checkpoint-exact restarts), the
  * dsv1-behind-dsv2 substitution Delta ships: the V2 node's OUTPUT
  * attributes are kept verbatim — names resolved against the catalog
  * table keep their exprIds, so downstream operators re-bind nothing.
  *
  * `readStream.option(...)` options ride through verbatim
  * (`maxVersionsPerTrigger`, `startingVersion`, `startingTimestamp`,
  * ...). With `readChangeFeed = true` the source's schema GROWS (the
  * `_change_type` / `_commit_version` columns), so the V2 output
  * cannot be kept — the substituted relation takes FRESH attributes
  * carrying the CDC columns (safe at this point: `readStream.table`
  * analyzes the bare relation before any downstream operator binds to
  * its attributes).
  *
  * Lives in `org.apache.spark.sql` because [[DataSource]] and
  * [[StreamingRelation]] are `private[sql]` — same extension-point
  * technique as [[GraftManifestScan]].
  */
class GraftNamedStreamRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case s @ StreamingRelationV2(_, _, t: GraftTableV2.GraftV2Table,
          opts, _, _, _, _) =>
        val spark = SparkSession.active.asInstanceOf[classic.SparkSession]
        val params = opts.asScala.toMap + ("path" -> t.tablePath)
        val ds = DataSource(spark, className = "graft", options = params)
        if (opts.getBoolean("readChangeFeed", false)) StreamingRelation(ds)
        else StreamingRelation(ds, "graft", s.output)
    }
}
