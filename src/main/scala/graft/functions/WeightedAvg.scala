package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: exact decimal partial sums — order-independent, so partial/final
  * merge across any partitioning yields bit-identical results.
  */
case class WavgBuf(swx: JBigDecimal, sw: JBigDecimal)

/** Typed UDAF (the §2.3 user-defined-aggregate surface): weighted average
  * with exact decimal accumulation, mirroring the engine's dsum convention
  * so the result is oracle-comparable:
  * `CAST(sum(CAST(x*w AS DEC(38,6))) AS DOUBLE) / CAST(sum(CAST(w AS DEC(38,4))) AS DOUBLE)`.
  */
object WeightedAvg extends Aggregator[(Double, Double), WavgBuf, Double] {
  private val Zero = JBigDecimal.ZERO
  private def dec(x: Double, scale: Int): JBigDecimal =
    // valueOf (shortest decimal repr, like CAST(double AS DECIMAL) in both
    // engines) — new JBigDecimal(x) would round the exact binary expansion
    // and diverge on half-way values
    JBigDecimal.valueOf(x).setScale(scale, RoundingMode.HALF_UP)

  override def zero: WavgBuf = WavgBuf(Zero, Zero)

  override def reduce(b: WavgBuf, in: (Double, Double)): WavgBuf = {
    val (x, w) = in
    WavgBuf(b.swx.add(dec(x * w, 6)), b.sw.add(dec(w, 4)))
  }

  override def merge(a: WavgBuf, b: WavgBuf): WavgBuf =
    WavgBuf(a.swx.add(b.swx), a.sw.add(b.sw))

  override def finish(b: WavgBuf): Double =
    if (b.sw.signum() == 0) Double.NaN else b.swx.doubleValue() / b.sw.doubleValue()

  override def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
