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
}
