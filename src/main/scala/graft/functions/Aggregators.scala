package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF tier (SURVEY.md §2.11): `Aggregator[IN, BUF, OUT]` is the
  * engine's sanctioned custom-aggregate surface — mergeable buffers mean
  * partial aggregation still happens map-side, exactly like builtin
  * aggs, so a custom aggregate never forces a raw-row shuffle.
  */
object Aggregators {

  /** weighted.mean as a typed Aggregator (the builtin rewrite
    * sum(x*w)/sum(w) is preferred — this is the demonstration of the
    * custom-buffer tier for aggregates with no builtin composition).
    */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(b: (Double, Double)): Double = if (b._2 == 0) Double.NaN else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: weightedMean(x, w) usable in any groupBy.agg. */
  def weightedMean(x: Column, w: Column): Column =
    udaf(WeightedMean).apply(x, w)

  /** Exact streaming-merge product aggregate (gprod, src/gsumm.c:1116)
    * — log-free, sign-correct, merge-associative.
    */
  object Product extends Aggregator[Double, Double, Double] {
    def zero: Double = 1.0
    def reduce(b: Double, a: Double): Double = b * a
    def merge(b1: Double, b2: Double): Double = b1 * b2
    def finish(b: Double): Double = b
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def prodAgg(x: Column): Column = udaf(Product).apply(x)
}
