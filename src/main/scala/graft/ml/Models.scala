package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{DecisionTreeClassifier, GBTClassifier, LinearSVC, LogisticRegression, NaiveBayes, OneVsRest, RandomForestClassifier}
import org.apache.spark.ml.regression.{DecisionTreeRegressor, GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.ml.clustering.{GaussianMixture, KMeans}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{CountVectorizer, IDF, PCA, RegexTokenizer, StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** ML procedures & appliable functions (SURVEY §2.7/§2.8) on MLlib.
  *
  * Reference mapping:
  *  - `classifier.train` types glz/dt/bagging/boosting/naive_bayes
  *    (`/root/reference/plugins/jml/classifier.cc:1491`, generator
  *    factories under `plugins/jml/jml/` at `bagging_generator.cc:267`
  *    … `glz_classifier_generator.cc:445`) →
  *    LogisticRegression / DecisionTree / RandomForest / GBT / NaiveBayes.
  *  - `classifier.test` (`plugins/jml/accuracy.cc:1006`) → AUC +
  *    accuracy evaluators.
  *  - `kmeans.train` / `gaussianclustering.train`
  *    (`plugins/jml/kmeans_interface.cc:389`, `em_interface.cc:383`) →
  *    KMeans / GaussianMixture.
  *  - `svd.train` + `svd.embedRow` (`plugins/embedding/svd.cc:1023`) →
  *    PCA projection (truncated orthogonal basis).
  *  - `tfidf.train` / `tfidf` function (`plugins/nlp/tfidf.cc:472`) →
  *    CountVectorizer + IDF pipeline.
  *  - `probabilizer.train` (`plugins/jml/probabilizer.cc:292`) →
  *    logistic fit on the raw score.
  *
  * A trained model is a PipelineModel — the engine's "function" entity
  * (applied whole-column via `.transform`, persisted with
  * `.write.save`, reloaded with `PipelineModel.load`), which is the
  * MLDB function-entity lifecycle mapped onto Spark's idiom.
  */
object Models {

  /** Build the feature-assembly front of every pipeline: numeric
    * columns → dense vector (+ optional standardization). */
  private def assembler(featureCols: Seq[String], standardize: Boolean) = {
    val asm = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features_raw")
    if (!standardize) Seq(asm.setOutputCol("features"))
    else Seq(asm, new StandardScaler()
      .setInputCol("__features_raw").setOutputCol("features")
      .setWithMean(true).setWithStd(true))
  }

  /** `classifier.train`. `algorithm` ∈ glz | dt | bagging | boosting |
    * naive_bayes (reference names). `weightCol` is the optional
    * example-weight column (the reference's `weight` sub-select,
    * `classifier.cc:281`). Returns the fitted PipelineModel — the
    * appliable `classifier` function. */
  def classifierTrain(train: DataFrame, featureCols: Seq[String],
      labelCol: String, algorithm: String = "glz", seed: Long = 42L,
      weightCol: Option[String] = None): PipelineModel = {
    val clf = algorithm match {
      case "glz" => new LogisticRegression()
        .setLabelCol(labelCol).setFeaturesCol("features").setMaxIter(50)
      case "dt" => new DecisionTreeClassifier()
        .setLabelCol(labelCol).setFeaturesCol("features").setSeed(seed)
      case "bagging" => new RandomForestClassifier()
        .setLabelCol(labelCol).setFeaturesCol("features")
        .setNumTrees(50).setSeed(seed)
      case "boosting" => new GBTClassifier()
        .setLabelCol(labelCol).setFeaturesCol("features")
        .setMaxIter(30).setSeed(seed)
      case "naive_bayes" => new NaiveBayes()
        .setLabelCol(labelCol).setFeaturesCol("features")
      case "svm" => new LinearSVC()
        .setLabelCol(labelCol).setFeaturesCol("features").setMaxIter(25)
        // stop at convergence rather than always burning maxIter
        // rounds: neutral at toy scale (per-iteration job scheduling
        // dominates there) but each saved iteration is a full
        // treeAggregate pass at real data sizes
        .setTol(1e-4)
      // the reference's remaining JML generator types
      // (`plugins/jml/jml/stump_generator.cc`,
      //  `boosted_stumps_generator.cc`, `onevsall_generator.cc`,
      //  `fasttext_generator.cc`):
      case "stump" => new DecisionTreeClassifier() // a stump IS a depth-1 tree
        .setLabelCol(labelCol).setFeaturesCol("features")
        .setMaxDepth(1).setSeed(seed)
      case "boosted_stumps" => new GBTClassifier() // AdaBoost-over-stumps analog
        .setLabelCol(labelCol).setFeaturesCol("features")
        .setMaxDepth(1).setMaxIter(50).setSeed(seed)
      case "onevsall" => new OneVsRest()
        .setClassifier(new LogisticRegression().setMaxIter(50).setTol(1e-5))
        .setLabelCol(labelCol).setFeaturesCol("features")
      case "fasttext" =>
        // fastText's classifier head is a linear (multinomial-softmax)
        // model over averaged bag features; over an already-assembled
        // numeric feature vector that head IS multinomial logistic
        // regression. The text-specific hashed word+ngram front-end
        // lives in [[fasttextTrain]] — documented approximation (no
        // learned input embeddings; MLlib has no supervised fastText).
        new LogisticRegression()
          .setLabelCol(labelCol).setFeaturesCol("features")
          .setFamily("multinomial").setMaxIter(50).setTol(1e-5)
      case other => throw new IllegalArgumentException(
        s"unknown classifier type '$other' (expect glz|dt|stump|bagging|" +
          "boosting|boosted_stumps|naive_bayes|svm|onevsall|fasttext)")
    }
    weightCol.foreach(org.apache.spark.ml.GraftMlBridge.setWeightCol(clf, _))
    // No explicit StandardScaler for glz/svm (r15): LogisticRegression
    // and LinearSVC standardize internally during optimization
    // (standardization=true is their default), so the explicit scaler
    // stage was one redundant full pass over the training data (its
    // summarizer fit) plus a per-row transform — and with regParam = 0
    // and an intercept the optimum is affine-invariant, so the learned
    // decision function is the same up to FP convergence noise
    // (oracle-checked bounds: auc/acc margins measured ≥ 0.98).
    // glzWeightRows / classifierExplain / classProbColumns all handle
    // the scaler-less pipeline (weights are already original-space).
    new Pipeline().setStages((assembler(featureCols, standardize = false) :+ clf).toArray)
      .fit(train)
  }

  /** fastText-style TEXT classification
    * (`plugins/jml/jml/fasttext_generator.cc:51-74` — config keys
    * `epoch`, `dims`, default 5/100): tokenize → hashed bag of words +
    * word bigrams (the fastText wordNgrams trick, hashing in place of
    * a learned vocabulary) → multinomial logistic head. Documented
    * approximation: real fastText learns input embeddings jointly;
    * the hashed-bag linear model is the standard MLlib-native stand-in
    * and matches fastText's accuracy on bag-separable tasks. `dims`
    * maps to the hash-feature space (1 << ceil(log2(dims*1024)) keeps
    * collisions rare), `epoch` to maxIter. */
  def fasttextTrain(train: DataFrame, textCol: String, labelCol: String,
      dims: Int = 100, epoch: Int = 5, seed: Long = 42L): PipelineModel = {
    val tok = new RegexTokenizer().setInputCol(textCol)
      .setOutputCol("__ft_words").setPattern("\\s+").setToLowercase(true)
    val bigrams = new org.apache.spark.ml.feature.NGram()
      .setN(2).setInputCol("__ft_words").setOutputCol("__ft_bigrams")
    val numFeatures = Integer.highestOneBit(
      math.max(1024, dims * 1024) - 1) << 1
    val tfWords = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__ft_words").setOutputCol("__ft_tf_w")
      .setNumFeatures(numFeatures)
    val tfBigrams = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__ft_bigrams").setOutputCol("__ft_tf_b")
      .setNumFeatures(numFeatures)
    val asm = new VectorAssembler()
      .setInputCols(Array("__ft_tf_w", "__ft_tf_b")).setOutputCol("features")
    val head = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setFamily("multinomial").setMaxIter(math.max(epoch * 4, 10))
      .setTol(1e-5)
    new Pipeline().setStages(Array(tok, bigrams, tfWords, tfBigrams, asm, head))
      .fit(train)
  }

  /** `classifier.train` mode = categorical (`classifier.cc:62` — P(category)
    * per class, single label). Algorithms that are natively multiclass in
    * MLlib (dt, bagging/RF, naive_bayes, glz via multinomial) train
    * directly; binary-only ones (boosting/GBT, svm) go through one-vs-all
    * decomposition — the reference's strategy for the same case. */
  def classifierTrainCategorical(train: DataFrame, featureCols: Seq[String],
      labelCol: String, algorithm: String = "glz", seed: Long = 42L,
      weightCol: Option[String] = None): PipelineModel = {
    val clf = algorithm match {
      case "glz" => new LogisticRegression() // multinomial when >2 classes
        .setLabelCol(labelCol).setFeaturesCol("features").setMaxIter(50)
        .setTol(1e-5)
      case "dt" => new DecisionTreeClassifier()
        .setLabelCol(labelCol).setFeaturesCol("features").setSeed(seed)
      case "bagging" => new RandomForestClassifier()
        .setLabelCol(labelCol).setFeaturesCol("features")
        .setNumTrees(50).setSeed(seed)
      case "naive_bayes" => new NaiveBayes()
        .setLabelCol(labelCol).setFeaturesCol("features")
      case "boosting" => new OneVsRest().setClassifier(
        new GBTClassifier().setMaxIter(20).setSeed(seed))
        .setLabelCol(labelCol).setFeaturesCol("features")
      case "svm" => new OneVsRest().setClassifier(
        new LinearSVC().setMaxIter(25).setTol(1e-4))
        .setLabelCol(labelCol).setFeaturesCol("features")
      case "stump" => new DecisionTreeClassifier() // natively multiclass
        .setLabelCol(labelCol).setFeaturesCol("features")
        .setMaxDepth(1).setSeed(seed)
      case "boosted_stumps" => new OneVsRest().setClassifier(
        new GBTClassifier().setMaxDepth(1).setMaxIter(30).setSeed(seed))
        .setLabelCol(labelCol).setFeaturesCol("features")
      case "onevsall" => new OneVsRest()
        .setClassifier(new LogisticRegression().setMaxIter(50).setTol(1e-5))
        .setLabelCol(labelCol).setFeaturesCol("features")
      case "fasttext" => new LogisticRegression()
        .setLabelCol(labelCol).setFeaturesCol("features")
        .setFamily("multinomial").setMaxIter(50).setTol(1e-5)
      case other => throw new IllegalArgumentException(
        s"unknown categorical classifier type '$other'")
    }
    weightCol.foreach(org.apache.spark.ml.GraftMlBridge.setWeightCol(clf, _))
    // same as classifierTrain: glz/svm standardize internally, the
    // explicit scaler stage was a redundant extra training-data pass
    new Pipeline().setStages((assembler(featureCols, standardize = false) :+ clf).toArray)
      .fit(train)
  }

  /** `svm.train` (`plugins/svm/svm.cc:464` — libsvm wrapper): the
    * trainingData's numeric columns (minus `label`) are the embedding;
    * labels are arbitrary values. One-vs-rest linear SVMs (MLlib has
    * no kernel SVM — `configuration.kernel` is accepted and the
    * linear model substitutes, a documented divergence; MLDB-991's
    * separable fixtures classify identically). Returns the fitted
    * pipeline whose last stage is the OneVsRestModel. */
  def svmTrain(train: DataFrame, featureCols: Seq[String],
      labelCol: String): PipelineModel = {
    val asm = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val ovr = new OneVsRest()
      .setClassifier(new LinearSVC().setMaxIter(50).setTol(1e-5))
      .setLabelCol(labelCol).setFeaturesCol("features")
    new Pipeline().setStages(Array(asm, ovr)).fit(train)
  }

  /** Per-class (weights, intercept) rows of a trained one-vs-rest
    * linear-SVM pipeline — the `svm` function entity's plan literals. */
  def svmMargins(model: PipelineModel): Seq[(Array[Double], Double)] =
    model.stages.last match {
      case ovr: org.apache.spark.ml.classification.OneVsRestModel =>
        ovr.models.toSeq.map {
          case m: org.apache.spark.ml.classification.LinearSVCModel =>
            (m.coefficients.toArray, m.intercept)
          case other => throw new IllegalStateException(
            s"unexpected OneVsRest submodel ${other.getClass.getSimpleName}")
        }
      case other => throw new IllegalStateException(
        s"not an svm model: ${other.getClass.getSimpleName}")
    }

  /** `classifier.train` mode = multilabel (`classifier.cc:63` — each
    * example can carry several labels, given as one 0/1 column per
    * label): independent binary decomposition, one model per label —
    * the reference's decomposition for the same mode. Apply with
    * `multilabelTransform`. */
  def classifierTrainMultilabel(train: DataFrame, featureCols: Seq[String],
      labelCols: Seq[String], algorithm: String = "glz",
      seed: Long = 42L): Map[String, PipelineModel] =
    labelCols.map(l =>
      l -> classifierTrain(train, featureCols, l, algorithm, seed)).toMap

  /** Apply a multilabel model set: adds `prediction_<label>` per label. */
  def multilabelTransform(models: Map[String, PipelineModel],
      df: DataFrame): DataFrame =
    models.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (label, m)) =>
      m.transform(acc)
        .withColumnRenamed("prediction", s"prediction_$label")
        .drop("rawPrediction", "probability", "features", "__features_raw")
    }

  /** `classifier.train` mode = regression (`classifier.cc:60` — predicting
    * real values). Same algorithm names, regressor implementations. */
  def regressionTrain(train: DataFrame, featureCols: Seq[String],
      labelCol: String, algorithm: String = "glz", seed: Long = 42L,
      weightCol: Option[String] = None): PipelineModel = {
    // glz = plain OLS (regParam 0): MLlib's WLS "normal" solver IS the
    // normal equations, but it pays two row-object passes (the Instance
    // treeAggregate plus the eager training-summary job). Solve the
    // same equations from ONE codegen'd SQL aggregate of the raw
    // moments (count, Σx_i, Σy, Σx_i·y, Σx_i·x_j) and a k×k driver
    // Cholesky/LU — identical model in exact arithmetic (ReferencePar-
    // ity MLDB-174/565 pins hold bit-for-bit on their integer
    // fixtures), one full pass instead of two at every scale. Falls
    // back to MLlib when the moments are singular or a weight column /
    // very wide feature set is in play.
    if (algorithm == "glz" && weightCol.isEmpty && featureCols.size <= 512)
      olsTrain(train, featureCols, labelCol) match {
        case Some(m) => return m
        case None => // singular/empty moments: MLlib path below
      }
    val reg = algorithm match {
      case "glz" => new LinearRegression()
        .setLabelCol(labelCol).setFeaturesCol("features").setMaxIter(100)
      case "dt" => new DecisionTreeRegressor()
        .setLabelCol(labelCol).setFeaturesCol("features").setSeed(seed)
      case "bagging" => new RandomForestRegressor()
        .setLabelCol(labelCol).setFeaturesCol("features")
        .setNumTrees(50).setSeed(seed)
      case "boosting" => new GBTRegressor()
        .setLabelCol(labelCol).setFeaturesCol("features")
        .setMaxIter(30).setSeed(seed)
      case other => throw new IllegalArgumentException(
        s"unknown regression type '$other' (expect glz|dt|bagging|boosting)")
    }
    weightCol.foreach(org.apache.spark.ml.GraftMlBridge.setWeightCol(reg, _))
    new Pipeline().setStages((assembler(featureCols, standardize = false) :+ reg).toArray)
      .fit(train)
  }

  /** Exact OLS via the normal equations over centered moments: one
    * whole-stage-codegen aggregate collects (n, Σy, Σx_i, Σx_i·y,
    * Σx_i·x_j for i ≤ j); the driver solves
    * (Σxx − n·μμᵀ)·β = (Σxy − n·μ·ȳ) and sets the intercept to
    * ȳ − βᵀμ. The k×k solve is O(k³) driver work (k ≤ 512 by the
    * caller's guard). Returns None when the system is singular or the
    * frame is empty — callers fall back to MLlib's iterative path. */
  private def olsTrain(train: DataFrame, featureCols: Seq[String],
      labelCol: String): Option[PipelineModel] = {
    val k = featureCols.size
    val xs = featureCols.map(c => col(s"`$c`").cast("double"))
    val y = col(s"`$labelCol`").cast("double")
    val aggs = Seq(count(lit(1)).as("n"), count(y).as("ny"),
      sum(y).as("sy")) ++
      xs.zipWithIndex.map { case (xi, i) => count(xi).as(s"nx_$i") } ++
      xs.zipWithIndex.map { case (xi, i) => sum(xi).as(s"sx_$i") } ++
      xs.zipWithIndex.map { case (xi, i) => sum(xi * y).as(s"sxy_$i") } ++
      (for (i <- 0 until k; j <- i until k)
        yield sum(xs(i) * xs(j)).as(s"sxx_${i}_$j"))
    try {
      val r = train.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getAs[Long]("n")
      if (n == 0) return None
      // any null label/feature (or a non-castable string) desyncs the
      // null-skipping sums — hand those frames to the MLlib path
      if (r.getAs[Long]("ny") != n ||
        (0 until k).exists(i => r.getAs[Long](s"nx_$i") != n)) return None
      val sy = r.getAs[Double]("sy")
      val sx = Array.tabulate(k)(i => r.getAs[Double](s"sx_$i"))
      val sxy = Array.tabulate(k)(i => r.getAs[Double](s"sxy_$i"))
      val cxx = breeze.linalg.DenseMatrix.zeros[Double](k, k)
      for (i <- 0 until k; j <- i until k) {
        val c = r.getAs[Double](s"sxx_${i}_$j") - sx(i) * sx(j) / n
        cxx(i, j) = c; cxx(j, i) = c
      }
      val cxy = breeze.linalg.DenseVector.tabulate(k)(i =>
        sxy(i) - sx(i) * sy / n)
      val beta = cxx \ cxy
      if (beta.toArray.exists(b => b.isNaN || b.isInfinite)) return None
      val intercept = sy / n -
        (0 until k).map(i => beta(i) * sx(i) / n).sum
      if (intercept.isNaN || intercept.isInfinite) return None
      val asm = new VectorAssembler()
        .setInputCols(featureCols.toArray).setOutputCol("features")
      Some(org.apache.spark.ml.GraftMlBridge.pipelineModel(Array(asm,
        org.apache.spark.ml.GraftMlBridge.linearRegressionModel(
          beta.toArray, intercept, labelCol, "features"))))
    } catch {
      case _: breeze.linalg.MatrixSingularException => None
      case _: org.apache.spark.SparkException => None
    }
  }

  /** regression-mode `classifier.test`: (rmse, r2). */
  def regressionTest(model: PipelineModel, test: DataFrame,
      labelCol: String): (Double, Double) = {
    val scored = model.transform(test)
    val ev = new org.apache.spark.ml.evaluation.RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
    (ev.setMetricName("rmse").evaluate(scored),
      ev.setMetricName("r2").evaluate(scored))
  }

  /** `classifier.test`: AUC + accuracy of an applied model. */
  def classifierTest(model: PipelineModel, test: DataFrame,
      labelCol: String): (Double, Double) = {
    val scored = model.transform(test)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol(labelCol).setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(scored)
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
      .setMetricName("accuracy").evaluate(scored)
    (auc, acc)
  }

  /** `kmeans.train` over an embedding (array) column. */
  def kmeansTrain(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L): KMeansApplied = {
    val prepared = df.withColumn("features", array_to_vector(col(vecCol)))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(prepared)
    KMeansApplied(model, vecCol)
  }

  final case class KMeansApplied(
      model: org.apache.spark.ml.clustering.KMeansModel, vecCol: String) {
    /** the `kmeans` appliable function: assign cluster per row. */
    def apply(df: DataFrame): DataFrame =
      model.transform(df.withColumn("features", array_to_vector(col(vecCol))))
        .withColumnRenamed("prediction", "cluster")
        .drop("features")
  }

  /** `gaussianclustering.train` (EM / GMM,
    * `plugins/jml/em.cc:125-160`): the reference seeds EM with a
    * kmeans++-style farthest-point pass — random initialization (what
    * `ml.GaussianMixture` does) routinely lands in a worse local
    * optimum on well-separated data (on iris it merges half of
    * versicolor into virginica instead of the classic 45/5+50 split
    * `testing/MLDB-1353-EM.py` pins). The Spark analog: fit k-means
    * (kmeans|| init, deterministic under the seed), hand its centers
    * to EM as the initial model (diagonal global-variance
    * covariances), run `mllib.GaussianMixture` (the MLlib EM that
    * accepts an initial model). Returns plan-literal cluster
    * parameters — applying the model is a codegen'd expression, no
    * UDF, no RDD in the scoring path. */
  def gmmTrain(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxIter: Int = 200, tol: Double = 1e-3): GmmApplied = {
    import org.apache.spark.mllib.linalg.{Matrices => OldMatrices, Vectors => OldVectors}
    import org.apache.spark.mllib.stat.distribution.MultivariateGaussian
    val vecs = df.select(col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull)
    val prepared = vecs.withColumn("features", array_to_vector(col("__v")))
    val km = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(prepared)
    val centers = km.clusterCenters.map(_.toArray)
    val dim = centers.head.length
    val varRow = vecs.select((0 until dim).map(j =>
      var_pop(element_at(col("__v"), j + 1))): _*).head()
    val gvar = (0 until dim).map(j =>
      math.max(if (varRow.isNullAt(j)) 1.0 else varRow.getDouble(j), 1e-6))
    val init = new org.apache.spark.mllib.clustering.GaussianMixtureModel(
      Array.fill(k)(1.0 / k),
      centers.map(c => new MultivariateGaussian(
        OldVectors.dense(c), OldMatrices.diag(OldVectors.dense(gvar.toArray)))))
    val rdd = vecs.rdd.map(r =>
      OldVectors.dense(r.getSeq[Double](0).toArray))
    val m = new org.apache.spark.mllib.clustering.GaussianMixture()
      .setK(k).setSeed(seed).setConvergenceTol(tol)
      .setMaxIterations(maxIter).setInitialModel(init).run(rdd)
    val means = m.gaussians.map(_.mu.toArray)
    val (invCovs, logNorms) = m.gaussians.zipWithIndex.map { case (g, i) =>
      val cov = breeze.linalg.DenseMatrix.create(dim, dim, g.sigma.toArray)
      // regularize before inverting — EM can collapse a dimension
      val reg = cov + breeze.linalg.DenseMatrix.eye[Double](dim) * 1e-9
      val inv = breeze.linalg.inv(reg)
      val (_, logDet) = breeze.linalg.logdet(reg)
      val ic = Array.tabulate(dim, dim)((r, c) => inv(r, c))
      val ln = math.log(m.weights(i)) -
        0.5 * (dim * math.log(2 * math.Pi) + logDet)
      (ic, ln)
    }.unzip
    GmmApplied(m.weights, means, invCovs.toArray, logNorms.toArray, vecCol)
  }

  /** A trained gaussian-mixture model as plan literals: `apply` adds a
    * `cluster` column (max-posterior assignment) via a pure expression
    * — the quadratic forms codegen into the scan stage, every
    * partition scores in parallel, nothing shuffles. */
  final case class GmmApplied(weights: Array[Double],
      means: Array[Array[Double]], invCovs: Array[Array[Array[Double]]],
      logNorms: Array[Double], vecCol: String) {
    def apply(df: DataFrame): DataFrame = {
      val k = weights.length
      val dim = means.head.length
      def x(i: Int) = element_at(col(vecCol).cast("array<double>"), i + 1)
      val logp = (0 until k).map { c =>
        val quad = (for (i <- 0 until dim; j <- 0 until dim)
          yield lit(invCovs(c)(i)(j)) *
            (x(i) - means(c)(i)) * (x(j) - means(c)(j))).reduce(_ + _)
        lit(logNorms(c)) - quad * 0.5
      }
      // nearest = the first cluster whose log-density dominates all
      // others (same CASE shape as the kmeans function entity)
      val cluster = (0 until k - 1).foldRight(lit(k - 1)) { (c, rest) =>
        when((0 until k).filter(_ != c)
          .map(o => logp(c) >= logp(o)).reduce(_ && _), lit(c))
          .otherwise(rest)
      }
      df.withColumn("cluster", cluster)
    }
  }

  /** `svd.train` / `svd.embedRow`: truncated orthogonal projection of
    * the vector column (PCA basis = right singular vectors).
    *
    * An EMPTY training selection (no rows, or every vector null — e.g.
    * a select list naming columns the dataset doesn't have) must still
    * produce a usable model, not an error: the reference's
    * `testing/MLDB-417-empty-svd.js` trains an svd over a selection
    * that matches nothing and expects success; applying such a model
    * embeds everything to zeros (the legitimate face of
    * MLDB-485's title). We fit the zero model on two all-zero rows of
    * dimension k — zero covariance, orthonormal basis, zero
    * projections. */
  def svdTrain(df: DataFrame, vecCol: String, k: Int): PCAApplied = {
    val nonNull = df.filter(col(vecCol).isNotNull)
    if (nonNull.isEmpty) {
      // zero model: fit on two all-zero rows only to obtain a valid
      // PCAModel shell of dimension k; `empty = true` makes both apply
      // paths emit zeros regardless of the shell's arbitrary basis
      val spark = df.sparkSession
      import spark.implicits._
      val zeros = Seq.fill(2)(Array.fill(k)(0.0f)).toDF(vecCol)
      val prepared = zeros.withColumn("features", array_to_vector(col(vecCol)))
      val model = new PCA().setK(k).setInputCol("features")
        .setOutputCol("svd").fit(prepared)
      return PCAApplied(model, vecCol, empty = true)
    }
    val prepared = nonNull.withColumn("features", array_to_vector(col(vecCol)))
    val model = new PCA().setK(k).setInputCol("features").setOutputCol("svd")
      .fit(prepared)
    PCAApplied(model, vecCol)
  }

  final case class PCAApplied(model: org.apache.spark.ml.feature.PCAModel,
      vecCol: String, empty: Boolean = false) {
    def apply(df: DataFrame): DataFrame =
      if (empty)
        df.withColumn("svd", array_to_vector(
          array(Seq.fill(model.getK)(lit(0.0)): _*)))
      else
        model.transform(df.withColumn("features", array_to_vector(col(vecCol))))
          .drop("features")

    /** `svd.embedRow` single-row application
      * (`plugins/embedding/svd.cc:1023` — the svd function entity
      * embeds one argument row; `testing/MLDB-498-svd-apply-function.js`
      * pins the output shape = numSingularValues). Values beyond the
      * trained dimensionality are ignored, missing trailing columns
      * read as 0 — the reference's sparse-row contract. Same linear map
      * as the whole-column apply (x' · PC), driver-side for the
      * function-application path. An empty-trained model embeds
      * everything to zeros (MLDB-417 + the legitimate face of
      * MLDB-485's title). */
    def embedRow(values: Seq[Double]): Array[Double] = {
      if (empty) return Array.fill(model.getK)(0.0)
      val pc = model.pc
      val x = values.toArray
      Array.tabulate(pc.numCols) { j =>
        var s = 0.0
        var i = 0
        val d = math.min(pc.numRows, x.length)
        while (i < d) { s += x(i) * pc(i, j); i += 1 }
        s
      }
    }
  }

  /** `tfidf.train` + the `tfidf` appliable function: token counts →
    * IDF-weighted vectors over a fitted vocabulary. */
  def tfidfTrain(df: DataFrame, textCol: String, vocabSize: Int = 1 << 16): PipelineModel = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
      .setPattern("[\\s,;:!?.()\\[\\]{}\"']+").setToLowercase(true)
    val cv = new CountVectorizer().setInputCol("__tokens").setOutputCol("__tf")
      .setVocabSize(vocabSize)
    val idf = new IDF().setInputCol("__tf").setOutputCol("tfidf")
    new Pipeline().setStages(Array(tok, cv, idf)).fit(df)
  }

  /** `probabilizer.train`: calibrate a raw score into a probability.
    * `method` = "glz" (one-feature logistic fit, Platt scaling) or
    * "isotonic" (monotone piecewise-constant calibration —
    * `plugins/jml/probabilizer.cc:292`'s isotonic variant, MLlib
    * IsotonicRegression 1:1). */
  def probabilizerTrain(scored: DataFrame, scoreCol: String,
      labelCol: String, method: String = "glz"): PipelineModel = {
    val asm = new VectorAssembler().setInputCols(Array(scoreCol))
      .setOutputCol("features")
    val est = method match {
      case "glz" => new LogisticRegression().setLabelCol(labelCol)
        .setFeaturesCol("features").setMaxIter(50)
      case "isotonic" => new org.apache.spark.ml.regression.IsotonicRegression()
        .setLabelCol(labelCol).setFeaturesCol("features").setIsotonic(true)
      case other => throw new IllegalArgumentException(
        s"unknown probabilizer method '$other' (expect glz|isotonic)")
    }
    new Pipeline().setStages(Array(asm, est)).fit(scored)
  }

  /** `classifier.explain` (`plugins/jml/classifier.cc:1496-1502`): for
    * a glz (logistic) model, per-feature contribution = weight_i ·
    * x_i (standardized space), plus the bias — the additive
    * explanation of the raw score. Returns one map column
    * feature→contribution. */
  def classifierExplain(model: PipelineModel, df: DataFrame,
      featureCols: Seq[String], maxExplainLeaves: Int = 4096): DataFrame = {
    // features must match what the classifier trained on — the
    // reference's exact message (testing/MLDB-174-regression.py
    // test_mldb_1712_failure_on_non_matching_features)
    val trained = model.stages.collectFirst {
      case a: VectorAssembler => a.getInputCols.toSeq
    }.getOrElse(Seq.empty)
    if (trained.nonEmpty && !featureCols.forall(trained.contains))
      throw new IllegalArgumentException(
        "The specified features couldn't be found in the classifier.")
    val (weights, intercept) = model.stages.last match {
      case m: org.apache.spark.ml.classification.LogisticRegressionModel =>
        (m.coefficients.toArray, m.intercept)
      case m: org.apache.spark.ml.regression.LinearRegressionModel =>
        (m.coefficients.toArray, m.intercept)
      case _: org.apache.spark.ml.classification.DecisionTreeClassificationModel |
           _: org.apache.spark.ml.classification.RandomForestClassificationModel |
           _: org.apache.spark.ml.classification.GBTClassificationModel |
           _: org.apache.spark.ml.regression.DecisionTreeRegressionModel |
           _: org.apache.spark.ml.regression.RandomForestRegressionModel |
           _: org.apache.spark.ml.regression.GBTRegressionModel =>
        return treeExplain(model, df, featureCols, maxExplainLeaves)
      case other => throw new IllegalArgumentException(
        s"explain supports glz (logistic/linear) and tree models, got ${other.getClass.getSimpleName}")
    }
    val scaler = model.stages.collectFirst {
      case s: org.apache.spark.ml.feature.StandardScalerModel => s
    }
    val (means, stds) = scaler match {
      case Some(s) => (s.mean.toArray, s.std.toArray)
      case None => (Array.fill(weights.length)(0.0), Array.fill(weights.length)(1.0))
    }
    val contribs = featureCols.zipWithIndex.map { case (c, i) =>
      val scaled = (col(c) - means(i)) / (if (stds(i) == 0) 1.0 else stds(i))
      struct(lit(c).as("feature"), (scaled * weights(i)).as("contribution"))
    }
    df.withColumn("bias", lit(intercept))
      .withColumn("explanation", map_from_entries(array(contribs: _*)))
  }

  /** Tree-model explain: PER-ROW decision-path attribution, matching
    * the reference's tree explain (`plugins/jml/classifier.cc:1496-1502`
    * walks each row's path and credits each split's feature). A split
    * on feature f moves the expected prediction from parent.prediction
    * to child.prediction; that delta is f's contribution on this row's
    * path. Each tree's contributions are generated as ONE nested-when
    * Column over the static tree structure — pure codegen'd expression,
    * no UDF, no driver-side scoring, embarrassingly parallel — then
    * summed across the ensemble with tree weights. bias = weighted sum
    * of root predictions, so bias + Σ contributions = the ensemble's
    * raw additive score (leaf prediction for a single dt, tree-average
    * for RF, boosted sum for GBT). Ensembles with more than
    * `maxExplainLeaves` total leaves switch to the broadcast-walk
    * implementation (same semantics, no expression-size limit —
    * differential-tested equal); the nested-when form stays the
    * default because it codegens into the scan stage. */
  private def treeExplain(model: PipelineModel, df: DataFrame,
      featureCols: Seq[String], maxExplainLeaves: Int = 4096): DataFrame = {
    import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}
    val (trees, weights): (Seq[Node], Seq[Double]) = model.stages.last match {
      case m: org.apache.spark.ml.classification.DecisionTreeClassificationModel =>
        (Seq(m.rootNode), Seq(1.0))
      case m: org.apache.spark.ml.classification.RandomForestClassificationModel =>
        (m.trees.map(_.rootNode).toSeq,
          Seq.fill(m.trees.length)(1.0 / m.trees.length))
      case m: org.apache.spark.ml.classification.GBTClassificationModel =>
        (m.trees.map(_.rootNode).toSeq, m.treeWeights.toSeq)
      case m: org.apache.spark.ml.regression.DecisionTreeRegressionModel =>
        (Seq(m.rootNode), Seq(1.0))
      case m: org.apache.spark.ml.regression.RandomForestRegressionModel =>
        (m.trees.map(_.rootNode).toSeq,
          Seq.fill(m.trees.length)(1.0 / m.trees.length))
      case m: org.apache.spark.ml.regression.GBTRegressionModel =>
        (m.trees.map(_.rootNode).toSeq, m.treeWeights.toSeq)
      case other => throw new IllegalArgumentException(
        s"not a tree model: ${other.getClass.getSimpleName}")
    }
    def leaves(n: Node): Int = n match {
      case in: InternalNode => leaves(in.leftChild) + leaves(in.rightChild)
      case _ => 1
    }
    if (trees.map(leaves).sum > maxExplainLeaves)
      return treePathExplainLarge(df, featureCols, trees, weights)
    def walk(node: Node, acc: Vector[Double],
        w: Double): org.apache.spark.sql.Column = node match {
      case _: LeafNode => array(acc.map(lit): _*)
      case in: InternalNode =>
        val f = in.split.featureIndex
        val cond = in.split match {
          case cs: ContinuousSplit => col(featureCols(f)) <= cs.threshold
          case cs: CategoricalSplit =>
            col(featureCols(f)).isin(
              cs.leftCategories.toIndexedSeq.map(_.asInstanceOf[Any]): _*)
        }
        val lAcc = acc.updated(f,
          acc(f) + (in.leftChild.prediction - in.prediction) * w)
        val rAcc = acc.updated(f,
          acc(f) + (in.rightChild.prediction - in.prediction) * w)
        when(cond, walk(in.leftChild, lAcc, w))
          .otherwise(walk(in.rightChild, rAcc, w))
    }
    val zero = Vector.fill(featureCols.size)(0.0)
    val total = trees.zip(weights)
      .map { case (t, w) => walk(t, zero, w) }
      .reduce((a, b) => zip_with(a, b, _ + _))
    val bias = trees.zip(weights).map { case (t, w) => t.prediction * w }.sum
    val entries = featureCols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("feature"),
        element_at(col("__contrib"), i + 1).as("contribution"))
    }
    df.withColumn("__contrib", total)
      .withColumn("bias", lit(bias))
      .withColumn("explanation", map_from_entries(array(entries: _*)))
      .drop("__contrib")
  }

  /** Flattened tree node for the broadcast-walk explain: `feat = -1`
    * marks a leaf; `cats == null` means a continuous split. */
  private final case class FlatNode(feat: Int, thr: Double,
      cats: Array[Double], left: Int, right: Int, pred: Double)

  /** Per-row decision-path attribution for ensembles TOO LARGE for a
    * plan-literal expression (r3's documented 4096-leaf fallback,
    * now closed): trees flatten to index-linked arrays that ride the
    * task closure (model-sized, the same payload every tree-model
    * scorer broadcasts), and each row walks each tree in O(depth)
    * inside mapPartitions. Exactly the expression path's semantics —
    * the spec forces this path on a small model and asserts equality
    * against the nested-when form. */
  private def treePathExplainLarge(df: DataFrame, featureCols: Seq[String],
      treesIn: Seq[org.apache.spark.ml.tree.Node],
      weights: Seq[Double]): DataFrame = {
    import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, Node}
    def flatten(root: Node): Array[FlatNode] = {
      val out = scala.collection.mutable.ArrayBuffer[FlatNode]()
      def add(n: Node): Int = {
        val idx = out.length
        out += null // reserve
        n match {
          case in: InternalNode =>
            val (f, thr, cats) = in.split match {
              case cs: ContinuousSplit => (cs.featureIndex, cs.threshold, null)
              case cs: CategoricalSplit =>
                (cs.featureIndex, 0.0, cs.leftCategories)
            }
            val l = add(in.leftChild)
            val r = add(in.rightChild)
            out(idx) = FlatNode(f, thr, cats, l, r, in.prediction)
          case leaf =>
            out(idx) = FlatNode(-1, 0.0, null, -1, -1, leaf.prediction)
        }
        idx
      }
      add(root)
      out.toArray
    }
    val flat: Array[(Array[FlatNode], Double)] =
      treesIn.zip(weights).map { case (t, w) => (flatten(t), w) }.toArray
    val bias = treesIn.zip(weights).map { case (t, w) => t.prediction * w }.sum
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("bias",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("explanation",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.DoubleType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idxs = featureCols.map(df.schema.fieldIndex).toArray
    val names = featureCols.toArray
    df.mapPartitions { rows =>
      rows.map { r =>
        val x = idxs.map(i => r.get(i) match {
          case null => 0.0
          case n: java.lang.Number => n.doubleValue
          case b: java.lang.Boolean => if (b) 1.0 else 0.0
          case other => other.toString.toDouble
        })
        val contrib = new Array[Double](names.length)
        var t = 0
        while (t < flat.length) {
          val (nodes, w) = flat(t)
          var cur = 0
          while (nodes(cur).feat >= 0) {
            val nd = nodes(cur)
            val goLeft =
              if (nd.cats != null) nd.cats.contains(x(nd.feat))
              else x(nd.feat) <= nd.thr
            val next = if (goLeft) nd.left else nd.right
            contrib(nd.feat) += (nodes(next).pred - nd.pred) * w
            cur = next
          }
          t += 1
        }
        Row.fromSeq(r.toSeq ++
          Seq(bias, names.zip(contrib).toMap))
      }
    }(enc)
  }

  /** MODEL-level Gini featureImportances as an explanation map — kept
    * as an explicit cheap alternative (importance, not attribution);
    * no longer any path's silent fallback. */
  def treeImportanceExplain(model: PipelineModel, df: DataFrame,
      featureCols: Seq[String]): DataFrame = {
    val imp = model.stages.last match {
      case m: org.apache.spark.ml.classification.DecisionTreeClassificationModel =>
        m.featureImportances
      case m: org.apache.spark.ml.classification.RandomForestClassificationModel =>
        m.featureImportances
      case m: org.apache.spark.ml.classification.GBTClassificationModel =>
        m.featureImportances
      case other => throw new IllegalArgumentException(
        s"not a tree model: ${other.getClass.getSimpleName}")
    }
    val entries = featureCols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("feature"), lit(imp(i)).as("contribution"))
    }
    df.withColumn("bias", lit(0.0))
      .withColumn("explanation", map_from_entries(array(entries: _*)))
  }

  /** `classifier.experiment` (`plugins/jml/experiment_procedure.cc:618`):
    * k-fold train/test loop over deterministic hash splits; returns one
    * row of metrics per fold. */
  def classifierExperiment(df: DataFrame, featureCols: Seq[String],
      labelCol: String, keyCol: String, algorithm: String = "glz",
      folds: Int = 3): Seq[(Int, Double, Double)] = {
    // One hash partitions the data into k disjoint buckets; bucket i is
    // fold i's test set. (Re-seeding per fold would give k independent
    // 1/k subsamples, not a partition.)
    val bucket = pmod(xxhash64(col(keyCol), lit(42)), lit(folds))
    (0 until folds).map { fold =>
      val test = df.filter(bucket === fold)
      val train = df.filter(bucket =!= fold)
      val model = classifierTrain(train, featureCols, labelCol, algorithm)
      val (auc, acc) = classifierTest(model, test, labelCol)
      (fold, auc, acc)
    }
  }

  /** `pooling` function (`builtin/pooling_function.cc:182`): aggregate
    * word embeddings of a bag of words — avg + min + max pooling over a
    * broadcast (token → embedding) join, grouped back per document.
    * Scale shape: word-vector table broadcasts (vocabularies are
    * small); only the doc-token stream shuffles, on the doc id. */
  def pooling(docTokens: DataFrame, docIdCol: String, tokenCol: String,
      wordVecs: DataFrame, wordCol: String, vecCol: String): DataFrame = {
    val joined = docTokens.join(broadcast(wordVecs),
      col(tokenCol) === col(wordCol), "inner")
    val vs = col("__vecs")
    val dim = size(element_at(vs, 1))
    def pool(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      aggregate(slice(vs, 2, 1000000), element_at(vs, 1).cast("array<double>"),
        (acc, v) => zip_with(acc, v.cast("array<double>"), f))
    joined.groupBy(col(docIdCol))
      .agg(collect_list(col(vecCol)).as("__vecs"))
      .select(col(docIdCol),
        transform(pool(_ + _), x => x / size(vs)).as("pool_avg"),
        pool(least(_, _)).as("pool_min"),
        pool(greatest(_, _)).as("pool_max"))
  }

  /** Plan-literal per-class probability columns for a trained
    * classification PipelineModel — the `classifier` FUNCTION entity
    * (`plugins/jml/classifier.cc` apply; pinned by
    * testing/MLDB-647_multiclass_apply_function_pins.py). `feat(name)`
    * supplies the input expression for each trained feature (the
    * function-application argument row's field; absent → the caller's
    * 0 default). The output is pure expression text — glz scores are
    * the sigmoid/softmax of plan-literal margins, trees walk their
    * splits as nested WHENs reading leaf class distributions
    * (`update_alg: prob` semantics via GraftMlBridge) — codegen'd,
    * zero UDF, every partition scores in parallel. */
  def classProbColumns(model: PipelineModel, featureCols: Seq[String],
      feat: String => Column): Seq[Column] = {
    val scaler = model.stages.collectFirst {
      case s: org.apache.spark.ml.feature.StandardScalerModel => s
    }
    def x(i: Int): Column = scaler match {
      case Some(s) =>
        val std = if (s.std(i) == 0) 1.0 else s.std(i)
        (feat(featureCols(i)) - s.mean(i)) / std
      case None => feat(featureCols(i))
    }
    import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}
    def treeProbArray(root: Node, numClasses: Int): Column = {
      def walk(n: Node): Column = n match {
        case l: LeafNode =>
          val counts = org.apache.spark.ml.GraftMlBridge.leafClassCounts(l)
            .padTo(numClasses, 0.0)
          val total = math.max(counts.sum, 1e-12)
          array(counts.take(numClasses).map(c => lit(c / total)): _*)
        case in: InternalNode =>
          val f = in.split.featureIndex
          val cond = in.split match {
            case cs: ContinuousSplit => x(f) <= cs.threshold
            case cs: CategoricalSplit => x(f).isin(
              cs.leftCategories.toIndexedSeq.map(_.asInstanceOf[Any]): _*)
          }
          when(cond, walk(in.leftChild)).otherwise(walk(in.rightChild))
      }
      walk(root)
    }
    model.stages.last match {
      case m: org.apache.spark.ml.classification.LogisticRegressionModel
          if m.numClasses == 2 =>
        val margin = featureCols.indices
          .map(i => x(i) * m.coefficients(i))
          .foldLeft(lit(m.intercept): Column)(_ + _)
        val p1 = lit(1.0) / (lit(1.0) + exp(-margin))
        Seq(lit(1.0) - p1, p1)
      case m: org.apache.spark.ml.classification.LogisticRegressionModel =>
        val mat = m.coefficientMatrix
        val margins = (0 until m.numClasses).map(c =>
          featureCols.indices.map(i => x(i) * mat(c, i))
            .foldLeft(lit(m.interceptVector(c)): Column)(_ + _))
        val mx = margins.reduce(greatest(_, _))
        val exps = margins.map(mg => exp(mg - mx))
        val z = exps.reduce(_ + _)
        exps.map(_ / z)
      case m: org.apache.spark.ml.classification.DecisionTreeClassificationModel =>
        val arr = treeProbArray(m.rootNode, m.numClasses)
        (0 until m.numClasses).map(c => element_at(arr, c + 1))
      case m: org.apache.spark.ml.classification.RandomForestClassificationModel =>
        val summed = m.trees.map(t =>
            treeProbArray(t.rootNode, m.numClasses): Column)
          .reduce((a, b) => zip_with(a, b, _ + _))
        (0 until m.numClasses).map(c =>
          element_at(summed, c + 1) / m.trees.length.toDouble)
      case m: org.apache.spark.ml.classification.GBTClassificationModel =>
        // boosting: weighted sum of regression-tree margins; Spark's
        // LogLoss probability is sigmoid(2·margin)
        def treeValue(n: org.apache.spark.ml.tree.Node): Column = n match {
          case l: LeafNode => lit(l.prediction)
          case in: InternalNode =>
            val f = in.split.featureIndex
            val cond = in.split match {
              case cs: ContinuousSplit => x(f) <= cs.threshold
              case cs: CategoricalSplit => x(f).isin(
                cs.leftCategories.toIndexedSeq.map(_.asInstanceOf[Any]): _*)
            }
            when(cond, treeValue(in.leftChild))
              .otherwise(treeValue(in.rightChild))
        }
        val margin = m.trees.zip(m.treeWeights).map { case (t, w) =>
          treeValue(t.rootNode) * w: Column
        }.reduce(_ + _)
        val p1 = lit(1.0) / (lit(1.0) + exp(lit(-2.0) * margin))
        Seq(lit(1.0) - p1, p1)
      case m: org.apache.spark.ml.classification.NaiveBayesModel =>
        // multinomial NB: raw(c) = log π_c + Σ_i x_i·log θ_ci, softmax'd
        val raws = (0 until m.numClasses).map(c =>
          featureCols.indices.map(i => x(i) * m.theta(c, i))
            .foldLeft(lit(m.pi(c)): Column)(_ + _))
        val mx = raws.reduce(greatest(_, _))
        val exps = raws.map(r => exp(r - mx))
        val z = exps.reduce(_ + _)
        exps.map(_ / z)
      case other => throw new IllegalArgumentException(
        "the classifier function supports glz (logistic), tree, " +
          "boosting (GBT) and naive_bayes models, got " +
          other.getClass.getSimpleName)
    }
  }

  /** Original-feature-space GLZ weight rows for `/details` model
    * introspection (`testing/MLDB-565-classifier-details.js` pins
    * `weights: [[1, 0]]` for the x=y regression — per-output rows of
    * `[coef…, bias]`). Our glz pipelines standardize internally, so
    * the trained (w, b) un-standardize back:
    * coef_i = w_i/σ_i, bias = b − Σ w_i·μ_i/σ_i. Returns None for
    * non-GLZ models (trees have no weight rows). */
  def glzWeightRows(model: PipelineModel): Option[(Seq[Seq[Double]], String)] = {
    val scaler = model.stages.collectFirst {
      case s: org.apache.spark.ml.feature.StandardScalerModel => s
    }
    def unscale(w: Array[Double], b: Double): Seq[Double] = scaler match {
      case Some(s) =>
        val coefs = w.indices.map(i =>
          if (s.std(i) == 0) 0.0 else w(i) / s.std(i))
        val bias = b - w.indices.map(i =>
          if (s.std(i) == 0) 0.0 else w(i) * s.mean(i) / s.std(i)).sum
        coefs.toSeq :+ bias
      case None => w.toSeq :+ b
    }
    model.stages.last match {
      case m: org.apache.spark.ml.regression.LinearRegressionModel =>
        Some((Seq(unscale(m.coefficients.toArray, m.intercept)), "LINEAR"))
      case m: org.apache.spark.ml.classification.LogisticRegressionModel
          if m.numClasses == 2 =>
        Some((Seq(unscale(m.coefficients.toArray, m.intercept)), "LOGIT"))
      case m: org.apache.spark.ml.classification.LogisticRegressionModel =>
        val mat = m.coefficientMatrix
        Some(((0 until m.numClasses).map(c => unscale(
          Array.tabulate(mat.numCols)(i => mat(c, i)),
          m.interceptVector(c))), "LOGIT"))
      case _ => None
    }
  }

  /** Plan-literal per-argument-row explain for the `classifier.explain`
    * FUNCTION entity (`plugins/jml/classifier.cc:1374-1446` —
    * output `{bias, explanation: {<feature>: contribution}}`). Same
    * attribution semantics as [[classifierExplain]] but over a
    * function-argument accessor instead of frame columns: glz credits
    * w_i·x_std_i, trees credit each split's prediction delta along the
    * row's path. Returns (bias, per-feature contributions) — pure
    * codegen'd expressions. */
  def explainColumns(model: PipelineModel, featureCols: Seq[String],
      feat: String => Column, maxExplainLeaves: Int = 4096): (Column, Seq[Column]) = {
    import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}
    val scaler = model.stages.collectFirst {
      case s: org.apache.spark.ml.feature.StandardScalerModel => s
    }
    def xs(i: Int): Column = scaler match {
      case Some(s) =>
        val std = if (s.std(i) == 0) 1.0 else s.std(i)
        (feat(featureCols(i)) - s.mean(i)) / std
      case None => feat(featureCols(i))
    }
    def glz(weights: Array[Double], intercept: Double) =
      (lit(intercept): Column,
        featureCols.indices.map(i => xs(i) * weights(i)): Seq[Column])
    def treeEnsemble(trees: Seq[Node], weights: Seq[Double]) = {
      def leaves(n: Node): Int = n match {
        case in: InternalNode => leaves(in.leftChild) + leaves(in.rightChild)
        case _ => 1
      }
      require(trees.map(leaves).sum <= maxExplainLeaves,
        s"classifier.explain function: ensemble has more than " +
          s"$maxExplainLeaves leaves — use the classifier.explain " +
          "procedure form over a dataset instead")
      def walk(node: Node, acc: Vector[Double], w: Double): Column = node match {
        case _: LeafNode => array(acc.map(lit): _*)
        case in: InternalNode =>
          val f = in.split.featureIndex
          val cond = in.split match {
            case cs: ContinuousSplit => feat(featureCols(f)) <= cs.threshold
            case cs: CategoricalSplit => feat(featureCols(f)).isin(
              cs.leftCategories.toIndexedSeq.map(_.asInstanceOf[Any]): _*)
          }
          val lAcc = acc.updated(f,
            acc(f) + (in.leftChild.prediction - in.prediction) * w)
          val rAcc = acc.updated(f,
            acc(f) + (in.rightChild.prediction - in.prediction) * w)
          when(cond, walk(in.leftChild, lAcc, w))
            .otherwise(walk(in.rightChild, rAcc, w))
      }
      val zero = Vector.fill(featureCols.size)(0.0)
      val total = trees.zip(weights)
        .map { case (t, w) => walk(t, zero, w) }
        .reduce((a, b) => zip_with(a, b, _ + _))
      val bias = trees.zip(weights).map { case (t, w) => t.prediction * w }.sum
      (lit(bias): Column,
        featureCols.indices.map(i => element_at(total, i + 1)): Seq[Column])
    }
    model.stages.last match {
      case m: org.apache.spark.ml.classification.LogisticRegressionModel
          if m.numClasses == 2 =>
        glz(m.coefficients.toArray, m.intercept)
      case m: org.apache.spark.ml.regression.LinearRegressionModel =>
        glz(m.coefficients.toArray, m.intercept)
      case m: org.apache.spark.ml.classification.DecisionTreeClassificationModel =>
        treeEnsemble(Seq(m.rootNode), Seq(1.0))
      case m: org.apache.spark.ml.classification.RandomForestClassificationModel =>
        treeEnsemble(m.trees.map(_.rootNode).toSeq,
          Seq.fill(m.trees.length)(1.0 / m.trees.length))
      case m: org.apache.spark.ml.classification.GBTClassificationModel =>
        treeEnsemble(m.trees.map(_.rootNode).toSeq, m.treeWeights.toSeq)
      case m: org.apache.spark.ml.regression.DecisionTreeRegressionModel =>
        treeEnsemble(Seq(m.rootNode), Seq(1.0))
      case m: org.apache.spark.ml.regression.RandomForestRegressionModel =>
        treeEnsemble(m.trees.map(_.rootNode).toSeq,
          Seq.fill(m.trees.length)(1.0 / m.trees.length))
      case m: org.apache.spark.ml.regression.GBTRegressionModel =>
        treeEnsemble(m.trees.map(_.rootNode).toSeq, m.treeWeights.toSeq)
      case other => throw new IllegalArgumentException(
        "classifier.explain supports glz (logistic/linear) and tree " +
          s"models, got ${other.getClass.getSimpleName}")
    }
  }

  /** True iff [[classProbColumns]] can lower this model — used by the
    * classifier-function entry point to FAIL FAST at creation rather
    * than at first application. */
  def classProbSupported(model: PipelineModel): Boolean =
    model.stages.last match {
      case _: org.apache.spark.ml.classification.LogisticRegressionModel |
           _: org.apache.spark.ml.classification.DecisionTreeClassificationModel |
           _: org.apache.spark.ml.classification.RandomForestClassificationModel |
           _: org.apache.spark.ml.classification.GBTClassificationModel |
           _: org.apache.spark.ml.classification.NaiveBayesModel => true
      case _ => false
    }

  /** Plan-literal predicted value for a trained REGRESSION
    * PipelineModel — the regression face of the classifier function
    * entity (same contract as [[classProbColumns]]). */
  def regressionValueColumn(model: PipelineModel, featureCols: Seq[String],
      feat: String => Column): Column = {
    val scaler = model.stages.collectFirst {
      case s: org.apache.spark.ml.feature.StandardScalerModel => s
    }
    def x(i: Int): Column = scaler match {
      case Some(s) =>
        val std = if (s.std(i) == 0) 1.0 else s.std(i)
        (feat(featureCols(i)) - s.mean(i)) / std
      case None => feat(featureCols(i))
    }
    import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}
    def walk(n: Node): Column = n match {
      case l: LeafNode => lit(l.prediction)
      case in: InternalNode =>
        val f = in.split.featureIndex
        val cond = in.split match {
          case cs: ContinuousSplit => x(f) <= cs.threshold
          case cs: CategoricalSplit => x(f).isin(
            cs.leftCategories.toIndexedSeq.map(_.asInstanceOf[Any]): _*)
        }
        when(cond, walk(in.leftChild)).otherwise(walk(in.rightChild))
    }
    model.stages.last match {
      case m: org.apache.spark.ml.regression.LinearRegressionModel =>
        featureCols.indices.map(i => x(i) * m.coefficients(i))
          .foldLeft(lit(m.intercept): Column)(_ + _)
      case m: org.apache.spark.ml.regression.DecisionTreeRegressionModel =>
        walk(m.rootNode)
      case m: org.apache.spark.ml.regression.RandomForestRegressionModel =>
        m.trees.map(t => walk(t.rootNode): Column)
          .reduce(_ + _) / m.trees.length.toDouble
      case m: org.apache.spark.ml.regression.GBTRegressionModel =>
        m.trees.zip(m.treeWeights).map { case (t, w) =>
          walk(t.rootNode) * w: Column
        }.reduce(_ + _)
      case other => throw new IllegalArgumentException(
        "the regression function supports glz (linear) and tree " +
          s"models, got ${other.getClass.getSimpleName}")
    }
  }

  /** regression-mode `classifier.test` over PRE-SCORED rows — the
    * reference's r² including its zero-variance conventions
    * (`plugins/jml/accuracy.cc` scoring of `{score, label}` inputs,
    * pinned by `testing/MLDB-174-regression.py` test_r2/test_r2_edge):
    * when the labels have zero variance, r² is 1 for a perfect score
    * column and 0 otherwise (the naive formula would divide by zero).
    * One aggregate pass. */
  def r2Score(df: DataFrame, scoreCol: String, labelCol: String): Double = {
    val r = df.agg(
      sum(pow(col(scoreCol).cast("double") - col(labelCol).cast("double"), 2)),
      sum(pow(col(labelCol).cast("double"), 2)),
      sum(col(labelCol).cast("double")),
      count(lit(1))).head()
    val (ssres, ssy, sy, n) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
    val sstot = ssy - sy * sy / n
    if (sstot <= 1e-12) { if (ssres <= 1e-12) 1.0 else 0.0 }
    else 1.0 - ssres / sstot
  }

  /** Per-label statistics of categorical `classifier.test`
    * (`plugins/jml/accuracy.cc:499-515` — one-vs-rest confusion per
    * label): accuracy = (tp+tn)/total, precision = tp/(tp+fp),
    * recall = tp/support, f1, support = tp+fn. x/0 reads 0 like the
    * reference's xdiv. One groupBy over (label, prediction) pairs —
    * #labels² counts on the driver, rows never leave the cluster. */
  final case class LabelStats(accuracy: Double, precision: Double,
    recall: Double, f1Score: Double, support: Double)

  def categoricalLabelStats(scored: DataFrame, labelCol: String,
      predictionCol: String): Map[String, LabelStats] = {
    def xdiv(a: Double, b: Double): Double = if (b == 0) 0.0 else a / b
    val counts = scored.groupBy(
        col(labelCol).cast("string").as("__l"),
        col(predictionCol).cast("string").as("__p"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = counts.map(_._3).sum.toDouble
    val labels = (counts.map(_._1) ++ counts.map(_._2)).distinct
    labels.map { l =>
      val tp = counts.collect { case (`l`, `l`, n) => n }.sum.toDouble
      val fn = counts.collect { case (`l`, p, n) if p != l => n }.sum.toDouble
      val fp = counts.collect { case (a, `l`, n) if a != l => n }.sum.toDouble
      val tn = total - tp - fn - fp
      val precision = xdiv(tp, tp + fp)
      val recall = xdiv(tp, tp + fn)
      l -> LabelStats(xdiv(tp + tn, total), precision, recall,
        2 * xdiv(precision * recall, precision + recall), tp + fn)
    }.toMap
  }

  /** categorical `classifier.test`: per-label statistics of an applied
    * model whose label indexing ran through [[classifierTrainCategorical]]
    * (prediction is the decoded string label column `predictedLabel`
    * when an IndexToString stage is present, else raw `prediction`). */
  def classifierTestCategorical(model: PipelineModel, test: DataFrame,
      labelCol: String): Map[String, LabelStats] = {
    val scored = model.transform(test)
    val predCol =
      if (scored.columns.contains("predictedLabel")) "predictedLabel"
      else "prediction"
    categoricalLabelStats(scored, labelCol, predCol)
  }

  /** `classifier.train` algorithm=naive_bayes with the reference's
    * missing-feature semantics (`plugins/jml/jml/naive_bayes.cc:88-111`
    * keeps an explicit MISSING probability bucket per rule; a feature
    * absent from the input row contributes its missing bucket, not a
    * zero value). The Spark analog trains per-class Gaussian
    * likelihoods (the reference learns threshold rules — documented
    * divergence; on the canonical Wikipedia gender example both give
    * the same confident posteriors) and SKIPS absent features at
    * score time, which is the balanced-priors limit of the missing
    * bucket. Training is one groupBy(label) aggregate; whole-frame
    * scoring is a plan-literal expression (codegen'd, no UDF). */
  final case class GaussianNbModel(priors: Map[String, Double],
      featureCols: Seq[String],
      stats: Map[String, Seq[(Double, Double)]]) {

    /** posterior per label for a single (possibly partial) feature map —
      * absent keys are skipped. Driver-side: the single-row function
      * application path. */
    def score(features: Map[String, Double]): Map[String, Double] = {
      val logPost = priors.map { case (l, pr) =>
        val ll = featureCols.zipWithIndex.collect {
          case (f, i) if features.contains(f) =>
            val (m, v) = stats(l)(i)
            val vv = math.max(v, 1e-9)
            -0.5 * math.log(2 * math.Pi * vv) -
              math.pow(features(f) - m, 2) / (2 * vv)
        }.sum
        l -> (math.log(pr) + ll)
      }
      val mx = logPost.values.max
      val exp = logPost.map { case (l, lp) => l -> math.exp(lp - mx) }
      val z = exp.values.sum
      exp.map { case (l, e) => l -> e / z }
    }

    /** whole-frame scoring: posterior columns `score_<label>`; NULL
      * cells skip their likelihood term like absent features. */
    def apply(df: DataFrame): DataFrame = {
      val labels = priors.keys.toSeq.sorted
      val logPost = labels.map { l =>
        val terms = featureCols.zipWithIndex.map { case (f, i) =>
          val (m, v) = stats(l)(i)
          val vv = math.max(v, 1e-9)
          when(col(f).isNull, lit(0.0)).otherwise(
            lit(-0.5 * math.log(2 * math.Pi * vv)) -
              pow(col(f).cast("double") - m, 2) / (2 * vv))
        }
        terms.foldLeft(lit(math.log(priors(l))))(_ + _)
      }
      val mx = logPost.reduce(greatest(_, _))
      val exps = logPost.map(lp => exp(lp - mx))
      val z = exps.reduce(_ + _)
      labels.zip(exps).foldLeft(df) { case (acc, (l, e)) =>
        acc.withColumn(s"score_$l", e / z)
      }
    }
  }

  def gaussianNbTrain(train: DataFrame, featureCols: Seq[String],
      labelCol: String): GaussianNbModel = {
    val aggs = featureCols.flatMap(f => Seq(
      avg(col(f).cast("double")).as(s"__m_$f"),
      coalesce(var_pop(col(f).cast("double")), lit(0.0)).as(s"__v_$f"))) :+
      count(lit(1)).as("__n")
    val rows = train.groupBy(col(labelCol).cast("string").as("__l"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val total = rows.map(_.getAs[Long]("__n")).sum.toDouble
    val priors = rows.map(r =>
      r.getString(0) -> r.getAs[Long]("__n") / total).toMap
    val stats = rows.map { r =>
      r.getString(0) -> featureCols.map(f =>
        (r.getAs[Double](s"__m_$f"), r.getAs[Double](s"__v_$f")))
    }.toMap
    GaussianNbModel(priors, featureCols, stats)
  }

  /** Word2Vec TRAINING (the reference only imports pre-trained
    * vectors, `plugins/word2vec.cc` — training is a beyond-reference
    * addition the pooling/embedding pipeline naturally wants).
    * Distributed MLlib skip-gram; returns (word, vector array<float>)
    * in exactly the shape `Sources`/`Word2Vec.write` exports and
    * `pooling` consumes, so train → export-binary → re-import
    * round-trips. */
  def word2vecTrain(docTokens: DataFrame, tokensCol: String,
      dim: Int = 64, minCount: Int = 2, maxIter: Int = 1,
      seed: Long = 42L): DataFrame = {
    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol(tokensCol).setOutputCol("__docvec")
      .setVectorSize(dim).setMinCount(minCount).setMaxIter(maxIter)
      .setSeed(seed)
    val model = w2v.fit(docTokens)
    model.getVectors.select(col("word"),
      vector_to_array(col("vector"), "float32").as("embedding"))
  }
}
