package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.2 UDF/UDAF row): discount-weighted
  * average as an `Aggregator[IN, BUF, OUT]` — the idiomatic Spark form
  * for custom aggregation state: merge is associative/commutative, so
  * Catalyst runs it partial+final like any built-in aggregate.
  *
  * Built-ins are still preferred for anything they can express (this
  * exact computation is also `sum(x*w)/sum(w)`); the Aggregator exists
  * as the library's extension template for aggregation state that
  * built-ins can't hold.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {

  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)

  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
