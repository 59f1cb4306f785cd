package graft.ml

import java.util.stream.IntStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `tsne.train` / `tsne.embedRow` — t-SNE dimensionality reduction
  * for visualization, matching the reference's config surface
  * (`plugins/jml/tsne_interface.h:23-42`: numOutputDimensions=2,
  * perplexity=30, learningRate=500, tolerance, min/maxIterations)
  * with the published exact algorithm (van der Maaten & Hinton,
  * "Visualizing Data using t-SNE", JMLR 2008): per-point
  * perplexity-calibrated Gaussian affinities (binary search on the
  * bandwidth), symmetrized P, Student-t low-dimensional kernel,
  * gradient descent with early exaggeration, momentum switch and
  * adaptive gains.
  *
  * Scale note: t-SNE is a VISUALIZATION op — O(n²) affinities over at
  * most tens of thousands of points; the reference runs it on one
  * node's memory and so do we (`maxRows` caps the collect; sample or
  * pre-aggregate first at corpus scale). This is the one deliberate
  * driver-side trainer in the ML layer; everything else distributes.
  * Deterministic under a fixed seed (fixed iteration order, seeded
  * init), so runs are reproducible and testable.
  *
  * `embedRow` mirrors the reference's tsne row function (re-embed a
  * new point): distance-weighted average of the k nearest training
  * points' output coordinates — the standard out-of-sample
  * interpolation for a non-parametric embedding.
  */
object Tsne {

  final case class Config(
      numOutputDimensions: Int = 2,
      perplexity: Double = 30.0,
      learningRate: Double = 500.0,
      minIterations: Int = 200,
      maxIterations: Int = 1000,
      tolerance: Double = 1e-5,
      maxRows: Int = 5000,
      seed: Long = 42L)

  /** Fitted embedding: training inputs + their output coordinates
    * (the model IS the data, as with any non-parametric method). */
  final case class Model(
      ids: Array[String],
      inputs: Array[Array[Double]],
      outputs: Array[Array[Double]]) {

    /** Out-of-sample embedding: 1/d²-weighted mean of the k nearest
      * training points' coordinates (exact match → that point). */
    def embedRow(x: Array[Double], k: Int = 5): Array[Double] = {
      val n = inputs.length
      val d2 = new Array[Double](n)
      var i = 0
      while (i < n) { d2(i) = sqDist(x, inputs(i)); i += 1 }
      val nearest = d2.zipWithIndex.sortBy(_._1).take(math.min(k, n))
      nearest.find(_._1 < 1e-12) match {
        case Some((_, j)) => outputs(j).clone()
        case None =>
          val out = new Array[Double](outputs(0).length)
          var wSum = 0.0
          for ((dist2, j) <- nearest) {
            val w = 1.0 / dist2
            wSum += w
            var c = 0
            while (c < out.length) { out(c) += w * outputs(j)(c); c += 1 }
          }
          out.map(_ / wSum)
      }
    }
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Train on `df`'s (idCol, vecCol: array<numeric>) and return
    * (embedding DataFrame (rowName, embedding array), model). */
  def train(df: DataFrame, idCol: String, vecCol: String,
      cfg: Config = Config()): (DataFrame, Model) = {
    val spark = df.sparkSession
    val collected = df
      .select(col(idCol).cast("string"),
        col(vecCol).cast("array<double>"))
      .limit(cfg.maxRows).collect()
    val ids = collected.map(_.getString(0))
    val x = collected.map(_.getSeq[Double](1).toArray)
    require(x.nonEmpty, "tsne.train: no input rows")
    val y = fit(x, cfg)
    val model = Model(ids, x, y)
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.zip(y).map { case (id, v) => Row(id, v.toSeq) }.toSeq, 4),
      StructType(Seq(
        StructField("rowName", StringType, nullable = false),
        StructField("embedding", ArrayType(DoubleType, containsNull = false)))))
    (out, model)
  }

  /** The exact t-SNE loop on a local matrix (parallel over rows). */
  private[graft] def fit(x: Array[Array[Double]], cfg: Config): Array[Array[Double]] = {
    val n = x.length
    val outDims = cfg.numOutputDimensions
    // effective perplexity can't exceed (n-1)/3 meaningfully
    val perplexity = math.min(cfg.perplexity, math.max(1.0, (n - 1) / 3.0))

    // --- pairwise squared distances (parallel rows) ---
    val d2 = Array.ofDim[Double](n, n)
    IntStream.range(0, n).parallel().forEach { i =>
      var j = 0
      while (j < n) { d2(i)(j) = sqDist(x(i), x(j)); j += 1 }
    }

    // --- P: binary-search beta per row to hit log(perplexity) ---
    val logU = math.log(perplexity)
    val p = Array.ofDim[Double](n, n)
    IntStream.range(0, n).parallel().forEach { i =>
      var beta = 1.0
      var betaMin = Double.NegativeInfinity
      var betaMax = Double.PositiveInfinity
      var tries = 0
      var done = false
      val row = new Array[Double](n)
      while (!done && tries < 50) {
        var sum = 0.0
        var j = 0
        while (j < n) {
          row(j) = if (j == i) 0.0 else math.exp(-beta * d2(i)(j))
          sum += row(j)
          j += 1
        }
        if (sum <= 0) sum = Double.MinPositiveValue
        var entropy = 0.0
        j = 0
        while (j < n) {
          if (row(j) > 0) {
            val pj = row(j) / sum
            entropy -= pj * math.log(pj)
          }
          j += 1
        }
        val diff = entropy - logU
        if (math.abs(diff) < 1e-5) done = true
        else if (diff > 0) { // entropy too high → sharpen
          betaMin = beta
          beta = if (betaMax.isInfinite) beta * 2 else (beta + betaMax) / 2
        } else {
          betaMax = beta
          beta = if (betaMin.isInfinite) beta / 2 else (beta + betaMin) / 2
        }
        tries += 1
        if (done || tries == 50) {
          var sum2 = 0.0
          var jj = 0
          while (jj < n) { sum2 += row(jj); jj += 1 }
          jj = 0
          while (jj < n) { p(i)(jj) = row(jj) / math.max(sum2, 1e-300); jj += 1 }
        }
      }
    }
    // symmetrize, floor, and apply early exaggeration
    val exaggeration = 4.0
    val exaggerationIters = math.min(100, cfg.maxIterations / 4)
    // each unordered pair is written by exactly one index (j > i), so
    // the parallel in-place update never reads a half-updated cell
    IntStream.range(0, n).parallel().forEach { i =>
      p(i)(i) = 1e-12
      var j = i + 1
      while (j < n) {
        val v = math.max((p(i)(j) + p(j)(i)) / (2.0 * n), 1e-12)
        p(i)(j) = v
        p(j)(i) = v
        j += 1
      }
    }

    // --- gradient descent ---
    val rnd = new java.util.Random(cfg.seed)
    val y = Array.fill(n, outDims)(rnd.nextGaussian() * 1e-4)
    val dy = Array.ofDim[Double](n, outDims)
    val gains = Array.fill(n, outDims)(1.0)
    val num = Array.ofDim[Double](n, n) // unnormalized Student-t kernel
    var prevKl = Double.MaxValue
    var iter = 0
    var converged = false
    while (iter < cfg.maxIterations && !converged) {
      val exFactor = if (iter < exaggerationIters) exaggeration else 1.0
      IntStream.range(0, n).parallel().forEach { i =>
        var j = 0
        while (j < n) {
          num(i)(j) = if (i == j) 0.0 else 1.0 / (1.0 + sqDist(y(i), y(j)))
          j += 1
        }
      }
      var qSum = 0.0
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) { qSum += num(i)(j); j += 1 }
        i += 1
      }
      val qNorm = math.max(qSum, 1e-300)
      val momentum = if (iter < 20) 0.5 else 0.8
      IntStream.range(0, n).parallel().forEach { i =>
        val grad = new Array[Double](outDims)
        var j = 0
        while (j < n) {
          if (j != i) {
            val q = math.max(num(i)(j) / qNorm, 1e-300)
            val mult = (exFactor * p(i)(j) - q) * num(i)(j)
            var c = 0
            while (c < outDims) {
              grad(c) += 4.0 * mult * (y(i)(c) - y(j)(c))
              c += 1
            }
          }
          j += 1
        }
        var c = 0
        while (c < outDims) {
          gains(i)(c) = math.max(0.01,
            if (math.signum(grad(c)) != math.signum(dy(i)(c))) gains(i)(c) + 0.2
            else gains(i)(c) * 0.8)
          dy(i)(c) = momentum * dy(i)(c) -
            cfg.learningRate * gains(i)(c) * grad(c)
          c += 1
        }
      }
      i = 0
      while (i < n) {
        var c = 0
        while (c < outDims) { y(i)(c) += dy(i)(c); c += 1 }
        i += 1
      }
      // center the embedding (translation invariance)
      val mean = new Array[Double](outDims)
      i = 0
      while (i < n) {
        var c = 0
        while (c < outDims) { mean(c) += y(i)(c) / n; c += 1 }
        i += 1
      }
      i = 0
      while (i < n) {
        var c = 0
        while (c < outDims) { y(i)(c) -= mean(c); c += 1 }
        i += 1
      }
      // convergence check on KL every 25 iterations past the minimum
      if (iter >= cfg.minIterations && iter % 25 == 0) {
        var kl = 0.0
        i = 0
        while (i < n) {
          var j = 0
          while (j < n) {
            if (j != i) {
              val q = math.max(num(i)(j) / qNorm, 1e-300)
              kl += p(i)(j) * math.log(p(i)(j) / q)
            }
            j += 1
          }
          i += 1
        }
        if (math.abs(prevKl - kl) < cfg.tolerance) converged = true
        prevKl = kl
      }
      iter += 1
    }
    y
  }
}
