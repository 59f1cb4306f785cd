package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding / vector scalar functions over `array<float|double>`
  * columns.
  *
  * Reference surface: `normalize`, `norm`, `vector_diff/sum/product/
  * quotient`, `flatten`, `shape`, `concat`, `slice`
  * (`/root/reference/sql/builtin_functions.cc:1704-2977`,
  * `sql/builtin_signal_functions.cc:288`).
  *
  * All pure `Column` composition (zip_with / aggregate / transform) —
  * no UDFs, no driver involvement; each function is per-row work that
  * scales linearly with partition count.
  */
object VectorFunctions {

  /** Cast any numeric array to array<double> (codegen'd array Cast —
    * cheaper than a per-element transform lambda). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column = graft.plans.VectorExprs.dot(a, b)

  /** L-p norm; p=2 Euclidean, p=1 Manhattan, p=0 counts nonzeros,
    * p=Inf max-abs — same contract as reference `norm`
    * (`sql/builtin_functions.cc:1749`). */
  def norm(v: Column, p: Double = 2.0): Column = graft.plans.VectorExprs.norm(v, p)

  /** Unit-normalize in the p-norm (default L2); zero vector maps to
    * itself. Reference `normalize` `sql/builtin_functions.cc:1704`
    * (MLDB-953 exercises p = 0, 1, 2, 3.2, inf). */
  def normalize(v: Column, p: Double = 2.0): Column = {
    val n = norm(v, p)
    when(n === 0.0, asDouble(v)).otherwise(transform(asDouble(v), x => x / n))
  }

  def cosine(a: Column, b: Column): Column = graft.plans.VectorExprs.cosine(a, b)

  def euclidean(a: Column, b: Column): Column =
    graft.plans.VectorExprs.euclidean(a, b)

  /** Interpreted reference formulations — differential-test oracles
    * for the native expressions in plans.VectorExpressions. */
  def dotReference(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def normReference(v: Column, p: Double = 2.0): Column = p match {
    case 2.0 => sqrt(dotReference(v, v))
    case 1.0 => aggregate(asDouble(v), lit(0.0), (acc, x) => acc + abs(x))
    case 0.0 => aggregate(asDouble(v), lit(0.0),
      (acc, x) => acc + when(x =!= 0.0, 1.0).otherwise(0.0))
    case Double.PositiveInfinity =>
      aggregate(asDouble(v), lit(0.0), (acc, x) => greatest(acc, abs(x)))
    case _ => pow(aggregate(asDouble(v), lit(0.0),
      (acc, x) => acc + pow(abs(x), p)), 1.0 / p)
  }

  def cosineReference(a: Column, b: Column): Column = {
    val d = normReference(a) * normReference(b)
    when(d === 0.0, lit(0.0)).otherwise(dotReference(a, b) / d)
  }

  def vectorSum(a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x + y)

  def vectorDiff(a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x - y)

  def vectorProduct(a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x * y)

  def vectorQuotient(a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x / y)

  def scale(v: Column, k: Column): Column = transform(asDouble(v), x => x * k)

  /** Random-hyperplane LSH bucket: sign bits of `nBits` pseudo-random
    * projections, packed into a Long. Vectors close in cosine land in
    * the same bucket with high probability (Charikar 2002). The
    * "hyperplanes" are deterministic hash-derived ±1 entries, so the
    * bucketing is reproducible with no stored model. */
  def lshBucket(v: Column, nBits: Int): Column =
    graft.plans.VectorExprs.lshBucket(v, nBits)

  /** Interpreted reference formulation of lshBucket (differential-test
    * oracle for the native expression). */
  def lshBucketReference(v: Column, nBits: Int): Column = {
    val dv = asDouble(v)
    (0 until nBits).map { b =>
      // proj_b = sum_i v[i] * s(b,i), s in {-1,+1} hash-derived
      val proj = aggregate(
        zip_with(dv, sequence(lit(0), size(v) - 1),
          (x, i) => x * when(
            xxhash64(concat(lit(s"lsh-$b-"), i.cast("string")))
              .bitwiseAND(lit(1L)) === 0L, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
