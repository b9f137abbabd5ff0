package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: left-to-right dot product of two
  * `array<double>` columns, accumulated in double.
  *
  * Exists because the composable form —
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)` —
  * runs as an interpreted higher-order function: it materializes the
  * zipped array and evaluates two lambdas per element outside
  * whole-stage codegen. On pairwise similarity plans (n_pairs × dim
  * multiplies) that interpretation is the entire hot path. This
  * expression generates a tight fused loop instead, while computing
  * the BIT-IDENTICAL value (same sequential accumulation order), so
  * DuckDB oracle parity is preserved.
  *
  * Null contract: null input array ⇒ null result (BinaryExpression
  * default); null *elements* are not expected (the engine only feeds
  * it cast embeddings) and would surface as getDouble(0.0)-style
  * garbage rather than being silently skipped — callers guarantee
  * non-null elements.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level access for graft's native expressions. */
object GraftFunctions {

  /** Idempotently register graft's native expressions with the
    * session's function registry; call from any query builder that
    * uses them, then refer via `expr("graft_dot(a, b)")` etc.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductDouble(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinhashSignature(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters",
      exprs => MisraGriesAgg(exprs(0),
        exprs(1).eval(null).asInstanceOf[Number].intValue()), "built-in")
  }
}
