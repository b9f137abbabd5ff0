package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 32 bits of md5(utf8(s)) as a
  * long in [0, 2^32) — numerically IDENTICAL to
  * `conv(substring(md5(s), 1, 8), 16, 10)` (the first 8 hex chars are
  * the first 4 digest bytes big-endian), and to the DuckDB oracle's
  * `CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)`.
  *
  * Exists because the composable form allocates a 32-char hex string
  * and re-parses it per call; hash-heavy operators (minhash shingles,
  * simhash tokens, fingerprints) call this millions of times per
  * partition, so the digest-bytes-to-long path is the hot kernel.
  */
case class Md5Hash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_32 expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_md5_32"

  override def nullSafeEval(input: Any): Any = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(
      input.asInstanceOf[UTF8String].getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("digest")
      s"""
         |byte[] $d = org.apache.commons.codec.digest.DigestUtils.md5($c.getBytes());
         |${ev.value} = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
         |  (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32 =
    copy(child = newChild)
}
