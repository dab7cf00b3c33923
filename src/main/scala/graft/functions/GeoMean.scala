package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Geometric mean as a typed Aggregator — the engine's UDAF surface
 * (SURVEY.md §2.11 "UDF/UDAF/UDTF"): exp(mean(ln x)) over positive inputs,
 * ignoring nulls/non-positives. Buffer is (sum of logs, count); merge is
 * associative+commutative so Spark runs it partial+final like a builtin.
 */
object GeoMean extends Aggregator[java.lang.Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: java.lang.Double): (Double, Long) =
    if (x == null || x <= 0.0) b else (b._1 + math.log(x), b._2 + 1L)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) 0.0 else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
