package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{DecisionTreeClassifier, GBTClassifier, LinearSVC, LogisticRegression, NaiveBayes, OneVsRest, RandomForestClassifier}
import org.apache.spark.ml.regression.{DecisionTreeRegressor, GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.ml.clustering.{GaussianMixture, KMeans}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{CountVectorizer, IDF, PCA, RegexTokenizer, StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
    * naive_bayes (reference names). Returns the fitted PipelineModel —
    * the appliable `classifier` function. */
  def classifierTrain(train: DataFrame, featureCols: Seq[String],
      labelCol: String, algorithm: String = "glz", seed: Long = 42L): PipelineModel = {
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
    val standardize = algorithm == "glz" || algorithm == "svm"
    new Pipeline().setStages((assembler(featureCols, standardize) :+ clf).toArray)
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
      labelCol: String, algorithm: String = "glz", seed: Long = 42L): PipelineModel = {
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
    val standardize = algorithm == "glz" || algorithm == "svm"
    new Pipeline().setStages((assembler(featureCols, standardize) :+ clf).toArray)
      .fit(train)
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
      labelCol: String, algorithm: String = "glz", seed: Long = 42L): PipelineModel = {
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
    new Pipeline().setStages((assembler(featureCols, standardize = false) :+ reg).toArray)
      .fit(train)
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

  /** `gaussianclustering.train` (EM / GMM). */
  def gmmTrain(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L) = {
    val prepared = df.withColumn("features", array_to_vector(col(vecCol)))
    new GaussianMixture().setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(prepared)
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
    val lr = model.stages.last match {
      case m: org.apache.spark.ml.classification.LogisticRegressionModel => m
      case _: org.apache.spark.ml.classification.DecisionTreeClassificationModel |
           _: org.apache.spark.ml.classification.RandomForestClassificationModel |
           _: org.apache.spark.ml.classification.GBTClassificationModel =>
        return treeExplain(model, df, featureCols, maxExplainLeaves)
      case other => throw new IllegalArgumentException(
        s"explain supports glz (logistic) and tree models, got ${other.getClass.getSimpleName}")
    }
    val weights = lr.coefficients.toArray
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
    df.withColumn("bias", lit(lr.intercept))
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
