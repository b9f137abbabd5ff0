package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the full k-permutation MinHash
  * signature of a shingle-hash array in ONE pass.
  *
  * Composable form — k separate `array_min(transform(sh, h -> (a*h+b) % p))`
  * columns — walks the array k times through interpreted lambdas. This
  * expression generates a single fused loop (k mins updated per
  * element) inside whole-stage codegen; the arithmetic is identical
  * ((a_i*h + b_i) mod p, same constants), so the DuckDB oracle result
  * is unchanged.
  *
  * Empty input array ⇒ null (a signature of nothing is undefined);
  * callers filter degenerate docs first, matching the oracle's WHERE.
  */
case class MinhashSignature(child: Expression) extends UnaryExpression {

  private val K = PortableHash.MinhashK
  private val P = PortableHash.P

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < K) {
        val v = (h * PortableHash.A(k) + PortableHash.Bs(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val aArr = ctx.freshName("aArr")
      val bArr = ctx.freshName("bArr")
      val aInit = PortableHash.A.mkString(s"new long[] {", "L, ", "L}")
      val bInit = PortableHash.Bs.mkString(s"new long[] {", "L, ", "L}")
      ctx.addImmutableStateIfNotExists("long[]", aArr, name => s"$name = $aInit;")
      ctx.addImmutableStateIfNotExists("long[]", bArr, name => s"$name = $bInit;")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = null;
         |} else {
         |  long[] $mins = new long[$K];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $c.getLong($i);
         |    for (int $k = 0; $k < $K; $k++) {
         |      long $v = ($h * $aArr[$k] + $bArr[$k]) % ${P}L;
         |      if ($v < $mins[$k]) $mins[$k] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
