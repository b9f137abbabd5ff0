package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the (private[sql]) Column ⇄ Expression conversions so
  * graft's native Catalyst expressions compose as Columns without a
  * function-registry round-trip. Standard technique for Spark
  * extension libraries shipping custom expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' injected functions to an existing
    * session's registry (normally this happens only at session build;
    * tests use this to exercise the extension against a shared
    * session).
    */
  def registerInto(ext: SparkSessionExtensions, spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
