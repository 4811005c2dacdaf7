package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom-fold extension point (SURVEY §2.11): the reference's `javascript`
  * aggregator lets users ship arbitrary fold/combine functions in the spec
  * (upstream metricsSpec via DruidGuicer serde). We do NOT embed a JS engine —
  * the engine-native equivalent is a typed
  * `org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT]` registered via
  * `functions.udaf`, which gets partial+final merge (map-side combine) like
  * any built-in.
  */
object CustomAggregators {

  /** Σx² — the doc example for a user-supplied fold (init=0, fold=acc+x²,
    * combine=a+b), matching the shape of the reference's javascript
    * aggregator docs.
    */
  object SumOfSquares extends Aggregator[Double, Double, Double] {
    def zero: Double = 0.0
    def reduce(acc: Double, x: Double): Double = acc + x * x
    def merge(a: Double, b: Double): Double = a + b
    def finish(acc: Double): Double = acc
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Streaming-friendly mergeable "max by timestamp" (latest value wins) —
    * a second fold shape: non-commutative input, commutative merge.
    */
  case class Latest(ts: Long, value: Double)
  object LatestValue extends Aggregator[Latest, Latest, Double] {
    def zero: Latest = Latest(Long.MinValue, Double.NaN)
    def reduce(acc: Latest, x: Latest): Latest = if (x.ts >= acc.ts) x else acc
    def merge(a: Latest, b: Latest): Latest = if (a.ts >= b.ts) a else b
    def finish(acc: Latest): Double = acc.value
    def bufferEncoder: Encoder[Latest] = Encoders.product[Latest]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
