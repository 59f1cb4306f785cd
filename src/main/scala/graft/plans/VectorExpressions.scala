package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for dense-vector math over
  * array<double> columns (the Column wrappers in
  * functions.VectorFunctions cast any numeric array first — Cast on
  * arrays is codegen'd, unlike per-element transform lambdas).
  *
  * One eval per row, tight JVM loops over ArrayData — the same math as
  * the zip_with/aggregate formulations but without per-element lambda
  * dispatch. Reference analog: the embedding dataset's dense row ops
  * (`/root/reference/plugins/embedding/embedding.cc`).
  */

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    java.lang.Double.valueOf(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

case class VecNorm(child: Expression, p: Double)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_norm"
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    if (p == 2.0) {
      while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
      s = math.sqrt(s)
    } else if (p == 1.0) {
      while (i < n) { s += math.abs(a.getDouble(i)); i += 1 }
    } else if (p == 0.0) {
      while (i < n) { if (a.getDouble(i) != 0.0) s += 1.0; i += 1 }
    } else if (p.isPosInfinity) {
      while (i < n) { val x = math.abs(a.getDouble(i)); if (x > s) s = x; i += 1 }
    } else {
      while (i < n) { s += math.pow(math.abs(a.getDouble(i)), p); i += 1 }
      s = math.pow(s, 1.0 / p)
    }
    java.lang.Double.valueOf(s)
  }
  override protected def withNewChildInternal(c: Expression): VecNorm = copy(child = c)
}

/** Cosine similarity in a single pass; 0.0 when either side has zero
  * norm (matches VectorFunctions.cosine semantics). */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_cosine"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (d == 0.0) 0.0 else dot / d)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

case class VecEuclidean(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_euclidean"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    java.lang.Double.valueOf(math.sqrt(s))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecEuclidean =
    copy(left = l, right = r)
}

/** All rows of a PLAN-CONSTANT matrix dotted with the input vector in
  * ONE eval: returns array<double> of k dot products. Equivalent to
  * array(VecDot(row₀, v), …, VecDot(rowₖ₋₁, v)) — same per-dot
  * left-to-right summation order, bit-identical results — but one
  * interpreted-expression dispatch per ROW instead of k (the k-call
  * form pays ~1µs of CodegenFallback boxing per dot, which dominates
  * nearest-centroid assignment at k ≥ 16). */
case class MatVecDots(matrix: Seq[Seq[Double]], child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec_dots"
  @transient private lazy val m: Array[Array[Double]] =
    matrix.map(_.toArray).toArray
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val k = m.length
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val row = m(c)
      val n = math.min(v.numElements(), row.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += row(i) * v.getDouble(i); i += 1 }
      out(c) = s
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MatVecDots =
    copy(child = c)
}

/** Unit-interval int8 quantization to a BINARY code: each coordinate
  * of a vector with entries in [-1, 1] (e.g. an L2-normalized
  * embedding) maps to round((x + 1) · 127.5) − 128 ∈ [-128, 127],
  * one signed byte per dimension — 8× less pair-join payload than
  * array<double>. Out-of-range inputs clamp. Inverse:
  * x ≈ (code + 128) / 127.5 − 1, max per-coordinate error 1/255. */
case class QuantizeUnit8(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_quantize_unit8"
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val cl = if (x < -1.0) -1.0 else if (x > 1.0) 1.0 else x
      val c = Math.round((cl + 1.0) * 127.5).toInt - 128
      out(i) = (if (c < -128) -128 else if (c > 127) 127 else c).toByte
      i += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression): QuantizeUnit8 =
    copy(child = c)
}

/** Approximate dot product of two [[QuantizeUnit8]] codes, computed
  * EXACTLY in integer arithmetic then scaled once:
  * Σ(ua/127.5−1)(ub/127.5−1) = Σua·ub/127.5² − (Σua+Σub)/127.5 + n
  * with ua = code + 128 ∈ [0, 255]. For unit vectors the result is
  * within (‖a‖₁+‖b‖₁)/255 + n/255² ≤ 2√n/255 + n/255² of the true
  * dot — the margin a prefilter must allow before exact re-scoring. */
case class VecDotQ8(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot_q8"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    val n = math.min(a.length, b.length)
    var dd = 0L; var sa = 0L; var sb = 0L
    var i = 0
    while (i < n) {
      val ua = (a(i) + 128).toLong; val ub = (b(i) + 128).toLong
      dd += ua * ub; sa += ua; sb += ub
      i += 1
    }
    java.lang.Double.valueOf(
      dd / (127.5 * 127.5) - (sa + sb) / 127.5 + n)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotQ8 =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket id: sign bits of nBits hash-derived
  * ±1 projections packed into a long (Charikar 2002). The ±1 entries
  * are derived from xxhash64("lsh-<bit>-<dim>") — identical to
  * VectorFunctions.lshBucketReference — and memoized per expression
  * instance as dims are observed. */
case class LshBucket(child: Expression, nBits: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  @transient private var signs: Array[Array[Double]] = _
  @transient private var signDims: Int = 0

  private def ensureSigns(dim: Int): Unit = {
    if (signs == null || signDims < dim) {
      signs = LshBucket.signMatrix(nBits, dim)
      signDims = dim
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    ensureSigns(n)
    var out = 0L
    var b = 0
    while (b < nBits) {
      val row = signs(b)
      var proj = 0.0
      var i = 0
      while (i < n) { proj += v.getDouble(i) * row(i); i += 1 }
      if (proj >= 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
}

object LshBucket {
  /** The deterministic ±1 hyperplane matrix behind lshBucket —
    * exposed so cross-engine oracles can inline the exact planes. */
  def signMatrix(nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits)(b => Array.tabulate(dim)(i =>
      if ((MinHashSig.seedHash(s"lsh-$b-$i") & 1L) == 0L) 1.0 else -1.0))
}

object VectorExprs {
  private def d(c: Column): Column = c.cast("array<double>")
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(d(a)), GraftColumnBridge.expression(d(b))))
  def norm(v: Column, p: Double): Column =
    GraftColumnBridge.column(VecNorm(GraftColumnBridge.expression(d(v)), p))
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecCosine(
      GraftColumnBridge.expression(d(a)), GraftColumnBridge.expression(d(b))))
  def euclidean(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecEuclidean(
      GraftColumnBridge.expression(d(a)), GraftColumnBridge.expression(d(b))))
  def lshBucket(v: Column, nBits: Int): Column =
    GraftColumnBridge.column(LshBucket(GraftColumnBridge.expression(d(v)), nBits))
  def matVecDots(matrix: Seq[Seq[Double]], v: Column): Column =
    GraftColumnBridge.column(MatVecDots(matrix,
      GraftColumnBridge.expression(d(v))))
  def quantizeUnit8(v: Column): Column =
    GraftColumnBridge.column(QuantizeUnit8(GraftColumnBridge.expression(d(v))))
  def dotQ8(a: Column, b: Column): Column =
    GraftColumnBridge.column(VecDotQ8(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
