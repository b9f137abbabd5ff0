package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{DotProductDouble, Md5Hash32, MinhashSignature, SortedIntersectSize}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions for any session built with
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * — the deployment path on a shared cluster, where users reach
  * `graft_dot` / `graft_minhash` / `graft_intersect_size` /
  * `graft_md5_32` from plain SQL without touching the Scala API.
  * (Query builders also self-register via GraftFunctions.register, so
  * the extension is optional in library use.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.IntersectSizeRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // SQL UPDATE / MERGE INTO on graft catalog tables (the Delta-style
    // command rewrite over ManifestTable.update/merge)
    ext.injectResolutionRule(_ => new org.apache.spark.sql.GraftRowLevelRule)
    // DV-capable SQL reads: SELECT over a deletion-vector-bearing
    // catalog table plans as the native scan's anti-join instead of
    // hitting the readerFeatures refusal
    ext.injectResolutionRule(_ => new org.apache.spark.sql.GraftDvReadRule)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductDouble].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductDouble(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "graft_intersect_size"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectSize(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "graft_minhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSignature(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_32"),
      new ExpressionInfo(classOf[Md5Hash32].getName, "graft_md5_32"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Hash32(exprs.head)))
  }
}
