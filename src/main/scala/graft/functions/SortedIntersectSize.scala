package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: |A ∩ B| for two SORTED, DISTINCT
  * `array<string>` or `array<bigint>` columns via a linear merge —
  * O(|A|+|B|) per pair with no per-pair hash-set allocation, fused
  * into whole-stage codegen.
  *
  * This is the hot kernel of blocked pairwise Jaccard: the generic
  * `size(array_intersect(a, b))` builds a hash set per invocation,
  * which dominates candidate-pair scoring. Callers MUST pass arrays
  * that are sorted and deduplicated (`array_sort(array_distinct(...))`
  * — computed once per row, not per pair); the result is then exactly
  * the set-intersection size. The bigint form is the shingle-hash
  * path (d04/d04b): 8-byte comparisons instead of string compares.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case ArrayType(LongType, _)   => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType) &&
        left.dataType.asInstanceOf[ArrayType].elementType ==
          right.dataType.asInstanceOf[ArrayType].elementType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_intersect_size expects two array<string> or two array<bigint>, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_intersect_size"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (n1, n2) = (a.numElements(), b.numElements())
    val longs = isLong
    var i = 0; var j = 0; var c = 0
    while (i < n1 && j < n2) {
      val cmp =
        if (longs) java.lang.Long.compare(a.getLong(i), b.getLong(j))
        else a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val cmp = ctx.freshName("cmp")
      val compare =
        if (isLong) s"Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n1 && $j < $n2) {
         |  int $cmp = $compare;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}
