package graft

import java.nio.file.Files
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.GraftEngine
import graft.core.{Eav, Tables}
import graft.ml.Models

class MlLifecycleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def features = {
    val emb = Tables.embeddings(spark, sf)
      .withColumn("y", (col("label") >= 5).cast("double"))
      .withColumn("f", col("embedding").cast("array<double>"))
    (0 until 8).foldLeft(emb) { case (df, i) =>
      df.withColumn(s"f_$i", element_at(col("f"), i + 1))
    }
  }

  test("classifier.experiment: k folds, AUC above chance") {
    val metrics = Models.classifierExperiment(features,
      (0 until 8).map(i => s"f_$i"), "y", "vec_id", "glz", folds = 3)
    assert(metrics.size === 3)
    metrics.foreach { case (_, auc, acc) =>
      assert(auc >= 0.0 && auc <= 1.0 && acc >= 0.0 && acc <= 1.0)
    }
  }

  test("classifier tail types stump/boosted_stumps/onevsall/fasttext: " +
      "train + apply per accepted reference type string") {
    val feats = (0 until 8).map(i => s"f_$i")
    val df = features
    val n = df.count()
    for (algo <- Seq("stump", "boosted_stumps", "onevsall", "fasttext")) {
      val model = Models.classifierTrain(df, feats, "y", algo)
      val scored = model.transform(df)
      assert(scored.count() === n, s"$algo: apply lost rows")
      val preds = scored.select("prediction").distinct()
        .collect().map(_.getDouble(0)).toSet
      assert(preds.subsetOf(Set(0.0, 1.0)), s"$algo: non-binary $preds")
      val (_, acc) = Models.classifierTest(model, df, "y")
      assert(acc > 0.5, s"$algo: train-set accuracy $acc at chance")
    }
    // a stump really is depth 1
    val stump = Models.classifierTrain(df, feats, "y", "stump")
    val tree = stump.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.DecisionTreeClassificationModel]
    assert(tree.depth === 1)
    // categorical mode accepts them too (3-class label)
    val multi = df.withColumn("yc",
      (col("label") % 3).cast("double"))
    for (algo <- Seq("stump", "onevsall", "fasttext")) {
      val m = Models.classifierTrainCategorical(multi, feats, "yc", algo)
      assert(m.transform(multi).select("prediction").distinct().count() <= 3)
    }
  }

  test("fasttextTrain: hashed word+bigram text classifier separates " +
      "token-disjoint classes") {
    import spark.implicits._
    // two trivially bag-separable classes, fastText's home turf
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      val label = i % 2
      val words = (0 until 12).map { _ =>
        if (label == 0) s"alpha${rnd.nextInt(30)}" else s"beta${rnd.nextInt(30)}"
      }
      (words.mkString(" "), label.toDouble)
    }
    val df = rows.toDF("text", "y")
    val model = Models.fasttextTrain(df, "text", "y", dims = 16, epoch = 5)
    val acc = model.transform(df)
      .filter(col("prediction") === col("y")).count().toDouble / rows.size
    assert(acc > 0.95, s"fasttext accuracy $acc on separable bags")
  }

  test("model save/load round-trip: the persisted-function lifecycle") {
    val dir = Files.createTempDirectory("graft_model").toString + "/m"
    val model = Models.classifierTrain(features,
      (0 until 8).map(i => s"f_$i"), "y", "dt")
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val a = model.transform(features).select(col("vec_id"), col("prediction"))
    val b = loaded.transform(features).select(col("vec_id"), col("prediction"))
    assert(a.join(b, Seq("vec_id", "prediction")).count() === a.count())
  }

  test("classifier.explain: contributions + bias reproduce the raw score") {
    val feats = (0 until 8).map(i => s"f_$i")
    val model = Models.classifierTrain(features, feats, "y", "glz")
    val explained = Models.classifierExplain(model, features, feats)
    val scored = model.transform(features)
      .select(col("vec_id"), col("rawPrediction"))
    val check = explained
      .withColumn("score_from_explain",
        aggregate(map_values(col("explanation")), lit(0.0), (a, x) => a + x)
          + col("bias"))
      .join(scored, Seq("vec_id"))
      .withColumn("raw1", element_at(
        org.apache.spark.ml.functions.vector_to_array(col("rawPrediction")), 2))
      .filter(abs(col("score_from_explain") - col("raw1")) > 1e-6)
    assert(check.count() === 0)
  }

  test("isotonic probabilizer: monotone calibrated probabilities in [0,1]") {
    val feats = (0 until 8).map(i => s"f_$i")
    val base = Models.classifierTrain(features, feats, "y", "glz")
    val scored = base.transform(features)
      .withColumn("score", element_at(
        org.apache.spark.ml.functions.vector_to_array(col("rawPrediction")), 2))
      .select(col("vec_id"), col("score"), col("y"))
    val cal = Models.probabilizerTrain(scored, "score", "y", method = "isotonic")
    val out = cal.transform(scored)
      .select(col("score"), col("prediction").as("p"))
    assert(out.filter(col("p") < 0 || col("p") > 1).count() === 0)
    // isotonic: higher score never maps to a lower probability
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("score"))
    val viol = out.withColumn("prev_p", lag(col("p"), 1).over(w))
      .filter(col("prev_p").isNotNull && col("p") < col("prev_p") - 1e-9)
    assert(viol.count() === 0)
  }

  test("classifier.explain on a dt: per-row path contributions reproduce the leaf prediction") {
    val feats = (0 until 8).map(i => s"f_$i")
    val model = Models.classifierTrain(features, feats, "y", "dt")
    val explained = Models.classifierExplain(model, features, feats)
    val scored = model.transform(features).select(col("vec_id"), col("prediction"))
    // bias + Σ path contributions must equal the leaf prediction on
    // EVERY row (the decision-path identity the reference's tree
    // explain satisfies, classifier.cc:1496-1502)
    val check = explained
      .withColumn("s",
        aggregate(map_values(col("explanation")), lit(0.0), (a, x) => a + x)
          + col("bias"))
      .join(scored, Seq("vec_id"))
      .filter(abs(col("s") - col("prediction")) > 1e-6)
    assert(check.count() === 0)
    // and the attribution is genuinely per-row (different paths →
    // different contribution maps), not a model-level constant
    val distinctExplanations = explained
      .select(array_sort(map_entries(col("explanation"))).as("e"))
      .distinct().count()
    assert(distinctExplanations > 1)
  }

  test("classifier.explain beyond the leaf cap: broadcast walk equals the expression path") {
    // r3's documented divergence (>4096 total leaves → importances
    // fallback) is closed: the large path walks broadcast tree arrays
    // per row. Force it on a SMALL model (cap = 1 leaf) and assert the
    // two implementations agree bit-for-bit per row.
    val feats = (0 until 8).map(i => s"f_$i")
    for (algo <- Seq("dt", "bagging", "boosting")) {
      val model = Models.classifierTrain(features, feats, "y", algo)
      val expr = Models.classifierExplain(model, features, feats)
        .select(col("vec_id"), col("bias"), col("explanation"))
      val walk = Models.classifierExplain(model, features, feats,
        maxExplainLeaves = 1)
        .select(col("vec_id"), col("bias").as("bias2"),
          col("explanation").as("explanation2"))
      val joined = expr.join(walk, Seq("vec_id"))
        .withColumn("d", abs(col("bias") - col("bias2")) +
          aggregate(
            zip_with(
              map_values(map_from_entries(
                array_sort(map_entries(col("explanation"))))),
              map_values(map_from_entries(
                array_sort(map_entries(col("explanation2"))))),
              (a, b) => abs(a - b)),
            lit(0.0), (a, x) => a + x))
      assert(joined.filter(col("d") > 1e-9).count() === 0,
        s"$algo: broadcast walk diverged from the expression path")
    }
  }

  test("classifier.explain on an ensemble: per-row contributions, bounded raw score") {
    val feats = (0 until 8).map(i => s"f_$i")
    val model = Models.classifierTrain(features, feats, "y", "bagging")
    val explained = Models.classifierExplain(model, features, feats)
    // bias + Σ contributions = weighted average of the trees' leaf
    // predictions — for a binary-label forest that lives in [0,1]
    val out = explained.withColumn("s",
      aggregate(map_values(col("explanation")), lit(0.0), (a, x) => a + x)
        + col("bias"))
    assert(out.filter(col("s") < -1e-9 || col("s") > 1.0 + 1e-9).count() === 0)
    assert(out.select(array_sort(map_entries(col("explanation"))).as("e"))
      .distinct().count() > 1)
    // every map carries one entry per feature
    assert(explained.filter(size(col("explanation")) =!= feats.size).count() === 0)
  }

  test("serial and permuter procedures: ordered steps, full grid sweep") {
    import graft.procedures.Procedures
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val out = Procedures.serial(Seq(
      "a" -> (() => { ran += "a"; 1 }),
      "b" -> (() => { ran += "b"; 2 })))
    assert(ran.toSeq === Seq("a", "b") && out.map(_._2) === Seq(1, 2))
    val grid = Seq("alg" -> Seq("glz", "dt"), "frac" -> Seq(0.2, 0.3))
    val sweep = Procedures.permuter(grid, p => s"${p("alg")}@${p("frac")}")
    assert(sweep.size === 4)
    assert(sweep.map(_._2).toSet ===
      Set("glz@0.2", "glz@0.3", "dt@0.2", "dt@0.3"))
  }

  test("multilabel mode: one model per label, predictions recover both planes") {
    import spark.implicits._
    val feats = Seq("f_0", "f_1")
    val wide = features
      .withColumn("y_a", (col("f_0") > 0).cast("double"))
      .withColumn("y_b", (col("f_1") > 0).cast("double"))
    val models = Models.classifierTrainMultilabel(wide, feats,
      Seq("y_a", "y_b"), "glz")
    assert(models.keySet === Set("y_a", "y_b"))
    val out = Models.multilabelTransform(models, wide)
    assert(out.columns.contains("prediction_y_a") &&
      out.columns.contains("prediction_y_b"))
    val accA = out.filter(col("prediction_y_a") === col("y_a")).count().toDouble / out.count()
    val accB = out.filter(col("prediction_y_b") === col("y_b")).count().toDouble / out.count()
    assert(accA > 0.9 && accB > 0.9, s"accA=$accA accB=$accB")
  }

  test("tokensplit separates configured special tokens, longest first") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val df = Seq("I am :-)) today:-)ok").toDF("t")
    val out = df.select(TextAnalysis.tokensplit(col("t"),
      Seq(":-)", ":-))")).as("s")).head().getString(0)
    assert(out === "I am :-)) today :-) ok")
  }

  test("@ operator parses and is the wide-mode identity") {
    val r = graft.sql.GraftSql.query(spark, sf,
      "SELECT (n_nationkey + 1) @ CAST('2024-01-01' AS timestamp) AS v " +
        "FROM nation WHERE n_nationkey = 2").head()
    assert(r.getLong(0) === 3L)
  }

  test("sql.query function: broadcast lookup application") {
    val e = new GraftEngine(spark)
    e.createDatasetFromParquet("nation", s"$sf/nation.parquet")
    e.createDatasetFromParquet("region", s"$sf/region.parquet")
    e.createSqlQueryFunction("region_of",
      """SELECT n_nationkey, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,
      Seq("n_nationkey"))
    val input = e.dataset("nation").select(col("n_nationkey"), col("n_name"))
    val out = e.applyFunction("region_of", input)
    assert(out.columns.toSeq === Seq("n_nationkey", "n_name", "r_name"))
    assert(out.filter(col("r_name").isNull).count() === 0)
    assert(out.count() === 25)
  }

  test("EAV at() re-timestamps; distinct_timestamps sorted unique") {
    val ev = Tables.events(spark, sf).limit(100)
    val eav = Eav.toEav(ev, col("user_id"), col("ts"), Seq("value"))
    val fixed = Eav.at(eav, lit("2030-01-01").cast("timestamp"))
    assert(fixed.select(min(col("ts")), max(col("ts"))).head().toSeq.distinct.size === 1)
    val dt = Eav.distinctTimestamps(eav)
    val r = dt.head()
    val tss = r.getAs[scala.collection.Seq[java.sql.Timestamp]]("timestamps")
    assert(tss.map(_.getTime) === tss.map(_.getTime).sorted)
    assert(tss.distinct.size === tss.size)
  }
}
