package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed UDAF example — the `Aggregator[IN, BUF, OUT]` surface (SURVEY.md
 * §2.3 UDF/UDAF row): geometric mean via log-sum. Partial aggregation
 * comes for free (`merge` runs map-side), so the shuffle carries one
 * (Double, Long) buffer per group per partition — the same partial+final
 * shape as built-in aggregates.
 */
class GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + math.log(a), b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
