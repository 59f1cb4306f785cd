package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Signal-processing functions over embedding columns.
  *
  * Reference: `fft`, `amplitude`, `phase`, `real`, `imag`, `impulse`,
  * `shifted_impulse` (`/root/reference/sql/builtin_signal_functions.cc:214`,
  * 308 LoC). Implemented on Breeze (ships with MLlib) as typed UDFs —
  * per-row transforms with no shuffle; the UDF boundary is acceptable
  * here because an FFT's O(n log n) body dwarfs the row-crossing cost.
  */
object SignalFunctions {

  /** fft(array<double>) → array of [re, im] pairs flattened
    * (2n doubles), matching the reference's interleaved complex
    * output convention. */
  val fftUdf = udf { (xs: Seq[Double]) =>
    if (xs == null || xs.isEmpty) Seq.empty[Double]
    else {
      val ft = breeze.signal.fourierTr(breeze.linalg.DenseVector(xs.toArray))
      ft.toArray.flatMap(c => Array(c.real, c.imag)).toSeq
    }
  }

  /** inverse fft over interleaved [re, im] pairs → real parts. */
  val ifftUdf = udf { (cs: Seq[Double]) =>
    if (cs == null || cs.isEmpty) Seq.empty[Double]
    else {
      val n = cs.length / 2
      val v = breeze.linalg.DenseVector.tabulate(n)(i =>
        breeze.math.Complex(cs(2 * i), cs(2 * i + 1)))
      breeze.signal.iFourierTr(v).toArray.map(_.real).toSeq
    }
  }

  def fft(v: Column): Column = fftUdf(v.cast("array<double>"))
  def ifft(v: Column): Column = ifftUdf(v)

  /** amplitude/phase/real/imag over interleaved complex arrays —
    * pure column math (no UDF). */
  private def half(c: Column): Column = (size(c) / 2).cast("int") - 1

  /** Guard for empty inputs: sequence(0, -1) DESCENDS to [0, -1]
    * (Spark sequence steps toward the stop), so an empty complex
    * array would otherwise yield [null, null] instead of []. */
  private def overPairs(c: Column, f: Column => Column): Column =
    when(size(c) < 2, array().cast("array<double>"))
      .otherwise(transform(sequence(lit(0), half(c)), f))

  def amplitude(c: Column): Column =
    overPairs(c, i =>
      sqrt(pow(element_at(c, i * 2 + 1), 2) + pow(element_at(c, i * 2 + 2), 2)))

  def phase(c: Column): Column =
    overPairs(c, i =>
      atan2(element_at(c, i * 2 + 2), element_at(c, i * 2 + 1)))

  def realPart(c: Column): Column =
    overPairs(c, i => element_at(c, i * 2 + 1))

  def imagPart(c: Column): Column =
    overPairs(c, i => element_at(c, i * 2 + 2))

  /** impulse(n, k): length-n array with 1.0 at index k. */
  def impulse(n: Column, k: Column): Column =
    transform(sequence(lit(0), (n - 1).cast("int")),
      i => when(i === k, 1.0).otherwise(0.0))
}
