package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Buffer for [[WeightedMean]] — exact decimal partial sums. */
case class WSum(sxw: BigDecimal, sw: BigDecimal)

/** Weighted-mean UDAF (SURVEY.md §3B #22). Upstream analog: SNOWAV's
  * mass-weighted mean snow density ([U] `snowav/framework/process.py`,
  * grep `density`; /root/reference empty at survey time — SURVEY.md §0).
  *
  * Determinism: per-row products are rounded to DECIMAL-scale-6 BigDecimals
  * and summed exactly, so `reduce`/`merge` order (partitioning) cannot
  * change the result — the buffer is a commutative monoid. `finish`
  * divides the two decimal totals as doubles, matching the oracle's
  * `CAST(sum(...) AS DOUBLE) / CAST(sum(...) AS DOUBLE)`. Map-side partial
  * aggregation still applies at 100 TB (Aggregator => ScalaAggregator =>
  * hash-agg partials).
  */
object WeightedMean extends Aggregator[(Double, Double), WSum, Double] {
  private val Zero = BigDecimal(0).setScale(6)
  private def d6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  def zero: WSum = WSum(Zero, Zero)
  def reduce(b: WSum, a: (Double, Double)): WSum =
    WSum(b.sxw + d6(a._1 * a._2), b.sw + d6(a._2))
  def merge(x: WSum, y: WSum): WSum = WSum(x.sxw + y.sxw, x.sw + y.sw)
  def finish(b: WSum): Double =
    if (b.sw.signum == 0) Double.NaN else b.sxw.toDouble / b.sw.toDouble
  def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
