package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Twenty-sixth batch of replays of the reference's OWN regression
  * tests — the statsTable / experiment family:
  *   - MLDB-873_stats_table_test.py (statsTable.train prior counts,
  *     the getCounts function, derivedColumnsGenerator, bagOfWords
  *     train + posneg),
  *   - MLDBFB-506-stats-tbl-sql-expr.py (posneg through sql.expression
  *     composition),
  *   - MLDB-878_experiment_proc.py (classifier.experiment folds /
  *     kfold / validation errors / scorer functions),
  *   - MLDBFB-724_classifier_exp_segfault_test.py (experiment over an
  *     empty join fails cleanly),
  *   - MLDB-926_auto_functions_for_procs.py (functionName auto-creates
  *     a function for every train procedure; kmeans modelFileUrl
  *     validation). */
class ReferenceParitySpec26 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val e = new api.GraftEngine(spark)
  private def q(sql: String) = {
    val df = e.query(sql)
    if (df.schema.headOption.exists(f =>
        f.name.equalsIgnoreCase("rowName") &&
          f.metadata.contains("graft.implicitRowName")))
      df.drop("rowName")
    else df
  }
  private val client = HttpClient.newHttpClient()

  // --- MLDB-873: statsTable.train + getCounts --------------------------------------

  test("MLDB-873: statsTable.train prior counts and the getCounts function") {
    e.recordRows("toy873",
      """[{"rowName":"br_1","host":"pataté.com","region":"qc","CLICK":"1"},
        |{"rowName":"br_2","host":"poire.com","region":"on"},
        |{"rowName":"br_3","host":"pataté.com","region":"on"}]"""
        .stripMargin)
    e.runProcedure("statsTable.train", Map(
      "trainingData" ->
        "select * EXCLUDING(CLICK) from toy873 order by rowName() ASC",
      "outputDataset" -> "out873",
      "outcomes" -> ("""[["label", "CLICK IS NOT NULL"], """ +
        """["not_label", "CLICK IS NULL"]]"""),
      "statsTableFileUrl" -> "file://tmp/mldb-873-stats_table.st",
      "functionName" -> "mySt873").get _)
    val rows = e.dataset("out873").orderBy("rowName").collect()
    assert(rows(0).getAs[String]("rowName") === "br_1")
    val br3 = rows(2)
    assert(br3.getAs[Long]("label.region") === 0L)
    assert(br3.getAs[Long]("trial.region") === 1L)
    assert(br3.getAs[Long]("label.host") === 1L)
    assert(br3.getAs[Long]("not_label.region") === 1L)
    assert(br3.getAs[Long]("not_label.host") === 0L)
    // the function reads the FINAL table; unknown keys ('prout') drop,
    // unseen values read 0
    val app = q("""select mySt873({keys: {host: 'poire.com',
        prout: 'existe pas', region: 'verdun'}})[counts] as c""").head()
    val c = app.getStruct(0)
    def cnt(o: String, k: String): Long =
      c.getStruct(c.fieldIndex(o)).getAs[Long](k)
    assert(cnt("label", "host") === 0L)
    assert(cnt("not_label", "host") === 1L)
    assert(cnt("trial", "host") === 1L)
    assert(cnt("label", "region") === 0L)
    assert(cnt("trial", "region") === 0L)
    // field order: outcomes in config order, then trial
    assert(c.schema.fieldNames.toSeq === Seq("label", "not_label", "trial"))
    // within a select statement over the training rows
    val sel = q("""select rowName() as rn,
        mySt873({{*} as keys})[counts] as c
      from toy873 order by rowName() ASC""").collect()
    def selCnt(i: Int, o: String, k: String): Long = {
      val cc = sel(i).getStruct(1)
      cc.getStruct(cc.fieldIndex(o)).getAs[Long](k)
    }
    assert(selCnt(0, "label", "region") === 1L)
    assert(selCnt(1, "label", "region") === 0L)
    assert(selCnt(1, "trial", "host") === 1L)
    assert(selCnt(2, "trial", "host") === 2L)
  }

  test("MLDB-873: derivedColumnsGenerator expands $tbl per stats table") {
    // depends on the previous test's trained table
    e.runProcedure("statsTable.train", Map(
      "trainingData" ->
        "select * EXCLUDING(CLICK) from toy873 order by rowName() ASC",
      "outcomes" -> ("""[["label", "CLICK IS NOT NULL"], """ +
        """["not_label", "CLICK IS NULL"]]"""),
      "statsTableFileUrl" -> "file://tmp/mldb-873b.st",
      "functionName" -> "mySt873b").get _)
    e.runProcedure("experimental.statsTable.derivedColumnsGenerator", Map(
      "expression" -> ("""counts.label as lbl_hoho_$tbl,
          counts.label as lbl_$tbl,
          counts.label/counts.trial as ctr_$tbl,
          1 as pwet_$tbl,
          ln(counts.trial+1) as hoho_$tbl"""),
      "statsTableFileUrl" -> "file://tmp/mldb-873b.st",
      "functionId" -> "getDerived873").get _)
    val r = q("""select getDerived873({counts: {label: {host: 5, region: 0},
        trial: {host: 500, region: 250}}}) as *""").head()
    def v(n: String): Double =
      r.getAs[Number](r.fieldIndex(n)).doubleValue
    assert(math.abs(v("ctr_host") - 5.0 / 500) < 1e-3)
    assert(math.abs(v("ctr_region")) < 1e-9)
    assert(v("pwet_host") === 1.0)
    // composed over the trained function: ctr = label/trial of br_1
    val r2 = q("""select getDerived873({mySt873b({keys: {*}}) as *}) as *
      from toy873 order by rowName() ASC limit 1""").head()
    def v2(n: String): Double =
      r2.getAs[Number](r2.fieldIndex(n)).doubleValue
    assert(math.abs(v2("ctr_host") - 0.5) < 1e-3, r2.toString)
    assert(math.abs(v2("ctr_region") - 1.0) < 1e-3, r2.toString)
    assert(math.abs(v2("hoho_host") - math.log(3)) < 1e-3, r2.toString)
  }

  // --- MLDBFB-506: bagOfWords train + posneg ----------------------------------------

  test("MLDBFB-506: bagOfWords stats + posneg through sql.expression") {
    e.recordRows("veggies506",
      """[{"rowName":"0","txt":"a,c","label":0},
        |{"rowName":"1","txt":"b,c","label":1},
        |{"rowName":"2","txt":"a,d","label":0},
        |{"rowName":"3","txt":"b,d","label":1}]""".stripMargin)
    e.createSqlExpressionFunction("bow506", "tokenize(txt) as bow")
    val bowRow = q(
      "select bow506({txt})[bow] as b from veggies506 order by rowName()")
      .head()
    assert(bowRow.getMap[String, Any](0).keySet === Set("a", "c"))
    e.runProcedure("statsTable.bagOfWords.train", Map(
      "trainingData" -> "select bow506({txt})[bow] as * from veggies506",
      "outcomes" -> """[["label", "label"]]""",
      "statsTableFileUrl" -> "file://tmp/bow506.st",
      "outputDataset" -> "patate506").get _)
    // word counts: every word appears twice; b,d carry the outcome
    val counts = e.dataset("patate506").collect()
      .map(r => r.getAs[String]("rowName") ->
        ((r.getAs[Long]("trials"), r.getAs[Long]("outcome.label")))).toMap
    assert(counts("a") === ((2L, 0L)), counts.toString)
    assert(counts("b") === ((2L, 2L)), counts.toString)
    assert(counts("c") === ((2L, 1L)), counts.toString)
    assert(counts("d") === ((2L, 1L)), counts.toString)
    e.createStatsTablePosNegFunction("posneg506", "file://tmp/bow506.st",
      outcomeToUse = "label", numPos = 2, numNeg = 2, minTrials = 1)
    val probs = q("""select posneg506({words:
        {bow506({txt: 'a,c'})[bow] as *}})[probs] as *""").head()
    assert(math.abs(probs.getAs[Double]("a.label")) < 1e-9, probs.toString)
    assert(math.abs(probs.getAs[Double]("c.label") - 0.5) < 1e-9,
      probs.toString)
    // the same pipeline packaged in an sql.expression
    e.createSqlExpressionFunction("apply_bow506",
      "posneg506({words: {bow506({txt})[bow] as *}})[probs] as posneg")
    val viaExpr = q(
      "select apply_bow506({txt: 'a,c'})[posneg] as p").head().getStruct(0)
    assert(math.abs(viaExpr.getAs[Double]("a.label")) < 1e-9)
    assert(math.abs(viaExpr.getAs[Double]("c.label") - 0.5) < 1e-9)
  }

  // --- MLDB-873: posneg over a tokenize MAP argument --------------------------------

  test("MLDB-873: posneg over raw text bags; default minTrials filters all") {
    e.recordRows("posneg873",
      """[{"rowName":"a","text":"I like apples","CLICK":"1"},
        |{"rowName":"b","text":"I like Macs"},
        |{"rowName":"c","text":"What about bananas?"},
        |{"rowName":"d","text":"Apples are red","CLICK":"1"},
        |{"rowName":"e","text":"Bananas are yellow"},
        |{"rowName":"f","text":"Oranges are ... orange"}]""".stripMargin)
    e.runProcedure("statsTable.bagOfWords.train", Map(
      "trainingData" ->
        "select tokenize(text, {splitChars: ' '}) as * from posneg873",
      "outcomes" -> """[["label", "CLICK IS NOT NULL"]]""",
      "statsTableFileUrl" -> "file://tmp/bow873.st",
      "functionName" -> "myBowSt873",
      "functionOutcomeToUse" -> "label").get _)
    e.createStatsTablePosNegFunction("posnegz873", "file://tmp/bow873.st",
      outcomeToUse = "label", numPos = 4, numNeg = 4, minTrials = 1)
    val rows = q("""select rowName() as rn,
        posnegz873({words: tokenize(text, {splitChars: ' _'})})[probs] as p
      from posneg873""").collect()
      .map(r => r.getString(0) -> r.getStruct(1)).toMap
    def p(rn: String, w: String): Option[Double] = {
      val st = rows(rn)
      val i = st.schema.fieldNames.indexOf(s"$w.label")
      if (i < 0 || st.isNullAt(i)) None else Some(st.getDouble(i))
    }
    assert(p("d", "red").contains(1.0), rows("d").toString)
    assert(p("a", "I").contains(0.5), rows("a").toString)
    assert(p("a", "like").contains(0.5))
    assert(p("b", "I").contains(0.5))
    assert(p("b", "like").contains(0.5))
    // the auto-created function keeps the 50/50/50 defaults — no word
    // reaches 50 trials, so every probability row is empty
    val defRows = q("""select
        myBowSt873({words: tokenize(text, {splitChars: ' .'})})[probs] as p
      from posneg873""").collect()
    defRows.foreach { r =>
      val st = r.getStruct(0)
      assert(st.schema.isEmpty ||
        st.schema.fieldNames.forall(f => st.isNullAt(st.fieldIndex(f))),
        st.toString)
    }
  }

  // --- MLDB-878: classifier.experiment ----------------------------------------------

  test("MLDB-878: classifier.experiment trains/tests per fold") {
    val rng = new scala.util.Random(878)
    val rows = (0 until 600).map { i =>
      val label = rng.nextDouble() < 0.3
      val f1 = rng.nextGaussian() * 3 + (if (label) 5 else 15)
      val f2 = rng.nextGaussian() * 10 + (if (label) -5 else 10)
      s"""{"rowName":"u$i","feat1":$f1,"feat2":$f2,"label":$label}"""
    }.mkString("[", ",", "]")
    e.recordRows("toy878", rows)
    val rez = e.runProcedure("classifier.experiment", Map(
      "experimentName" -> "my_test_exp",
      "inputData" ->
        "select {* EXCLUDING(label)} as features, label from toy878",
      "testingDataOverride" ->
        "select {* EXCLUDING(label)} as features, label from toy878",
      "datasetFolds" -> ("""[{"trainingWhere": "rowHash() % 5 != 3", """ +
        """"testingWhere": "rowHash() % 5 = 3"}, """ +
        """{"trainingWhere": "rowHash() % 5 != 2", """ +
        """"testingWhere": "rowHash() % 5 = 2"}]"""),
      "modelFileUrlPattern" -> "file://tmp/bouya-$runid.cls",
      "algorithm" -> "glz", "mode" -> "boolean",
      "outputAccuracyDataset" -> "false").get _)
    val aucs = "\"auc\": ([0-9.]+)".r.findAllMatchIn(rez)
      .map(_.group(1).toDouble).toSeq
    assert(aucs.size === 2, rez)
    aucs.foreach(a => assert(a > 0.95, s"auc $a"))
    // the per-fold scorer functions exist and apply
    val scores = (0 until 2).map(i => q(
      s"select my_test_exp_scorer_$i({features: {feat1: 10, feat2: 50}})" +
        "[score] as s").head().getDouble(0))
    assert(scores.size === 2)
    // no accuracy datasets were created
    assert(!e.listDatasets.exists(_.contains("results_")))
    // re-running with the label inverted changes the scores (MLDB-1070)
    e.runProcedure("classifier.experiment", Map(
      "experimentName" -> "my_test_exp",
      "inputData" ->
        "select {* EXCLUDING(label)} as features, NOT label as label from toy878",
      "testingDataOverride" ->
        "select {* EXCLUDING(label)} as features, NOT label as label from toy878",
      "datasetFolds" -> ("""[{"trainingWhere": "rowHash() % 5 != 3", """ +
        """"testingWhere": "rowHash() % 5 = 3"}, """ +
        """{"trainingWhere": "rowHash() % 5 != 2", """ +
        """"testingWhere": "rowHash() % 5 = 2"}]"""),
      "modelFileUrlPattern" -> "file://tmp/bouya-$runid.cls",
      "algorithm" -> "glz", "mode" -> "boolean",
      "outputAccuracyDataset" -> "false").get _)
    val scores2 = (0 until 2).map(i => q(
      s"select my_test_exp_scorer_$i({features: {feat1: 10, feat2: 50}})" +
        "[score] as s").head().getDouble(0))
    assert(scores.toSet !== scores2.toSet)
    // no folds + testingDataOverride → ONE (true, true) fold, and
    // outputAccuracyDataset creates the results dataset
    val rez2 = e.runProcedure("classifier.experiment", Map(
      "experimentName" -> "no_fold",
      "inputData" ->
        "select {* EXCLUDING(label)} as features, label from toy878",
      "testingDataOverride" ->
        "select {* EXCLUDING(label)} as features, label from toy878",
      "modelFileUrlPattern" -> "file://tmp/bouya-$runid.cls",
      "algorithm" -> "glz", "mode" -> "boolean").get _)
    assert("\"fold\":".r.findAllIn(rez2).size === 1, rez2)
    assert(rez2.contains("accuracyDataset"), rez2)
    assert(e.listDatasets.exists(_.contains("results_")))
    // kfold = 5 → five folds, each with a sane AUC
    val rez3 = e.runProcedure("classifier.experiment", Map(
      "experimentName" -> "fivefold",
      "inputData" ->
        "select {* EXCLUDING(label)} as features, label from toy878",
      "modelFileUrlPattern" -> "file://tmp/bouya-$runid.cls",
      "algorithm" -> "glz", "mode" -> "boolean",
      "kfold" -> "5",
      "outputAccuracyDataset" -> "false").get _)
    val aucs3 = "\"auc\": ([0-9.]+)".r.findAllMatchIn(rez3)
      .map(_.group(1).toDouble).toSeq
    assert(aucs3.size === 5, rez3)
    aucs3.foreach(a => assert(a > 0.5, s"auc $a"))
    // validation errors
    val ex1 = intercept[IllegalArgumentException](
      e.runProcedure("classifier.experiment", Map(
        "experimentName" -> "bad1",
        "inputData" -> "select {feat1} as features, label from toy878",
        "modelFileUrlPattern" -> "file://tmp/b-$runid.cls",
        "kfold" -> "5",
        "datasetFolds" ->
          """[{"trainingWhere": "true", "testingWhere": "true"}]""").get _))
    assert(ex1.getMessage.contains("cannot be specified at the same time"))
    val ex2 = intercept[IllegalArgumentException](
      e.runProcedure("classifier.experiment", Map(
        "experimentName" -> "bad2",
        "inputData" -> "select {feat1} as features, label from toy878",
        "modelFileUrlPattern" -> "file://tmp/b-$runid.cls",
        "kfold" -> "1").get _))
    assert(ex2.getMessage.contains("must be >= 2"))
    val ex3 = intercept[IllegalArgumentException](
      e.runProcedure("classifier.experiment", Map(
        "experimentName" -> "bad3",
        "inputData" -> "select {feat1} as features, label from toy878",
        "testingDataOverride" ->
          "select {feat1} as features, label from toy878",
        "modelFileUrlPattern" -> "file://tmp/b-$runid.cls",
        "kfold" -> "5").get _))
    assert(ex3.getMessage.contains("k-fold"))
  }

  // --- MLDBFB-724: experiment over an empty join fails cleanly ----------------------

  test("MLDBFB-724: experiment over empty datasets errors cleanly") {
    e.createDatasetTyped("ds724", "sparse.mutable", _ => None)
    e.createDatasetTyped("inception724", "sparse.mutable", _ => None)
    val ex = intercept[Exception](
      e.runProcedure("classifier.experiment", Map(
        "experimentName" -> "exp724",
        "mode" -> "boolean",
        "inputData" -> ("SELECT {i.* EXCLUDING(image_url)} AS features, " +
          "d.cei AS label FROM inception724 AS i " +
          "INNER JOIN ds724 AS d ON i.image_url = d.image_url"),
        "datasetFolds" -> ("""[{"trainingWhere": "rowHash() % 10 != 0", """ +
          """"testingWhere": "rowHash() % 10 = 0"}]"""),
        "algorithm" -> "bagging",
        "modelFileUrlPattern" -> "file://tmp/724-$runid.cls").get _))
    assert(ex.getMessage != null)
    // the engine survives
    assert(q("select 1 + 1 as x").head().getLong(0) === 2L)
  }

  // --- MLDB-926: functionName auto-creation everywhere ------------------------------

  test("MLDB-926: every train procedure's functionName creates a function") {
    val rng = new scala.util.Random(926)
    val rows = (0 until 50).map { i =>
      val label = rng.nextDouble() < 0.3
      s"""{"rowName":"u$i","feat1":${rng.nextGaussian() * 3 +
        (if (label) 5 else 15)},"feat2":${rng.nextGaussian() * 10 +
        (if (label) -5 else 10)},"feat3":${rng.nextGaussian() * 40 +
        (if (label) 52 else 30)},"label":$label}"""
    }.mkString("[", ",", "]")
    e.recordRows("toy926", rows)
    e.runProcedure("classifier.train", Map(
      "trainingData" ->
        "select {* EXCLUDING(label)} as features, label from toy926",
      "modelFileUrl" -> "file://tmp/MLDB-926-bouya.cls",
      "algorithm" -> "glz", "mode" -> "boolean",
      "functionName" -> "cls_func926").get _)
    assert(e.functionExists("cls_func926"))
    e.runProcedure("kmeans.train", Map(
      "trainingData" -> "select * excluding(label) from toy926",
      "modelFileUrl" -> "file://tmp/MLDB-926.mks",
      "centroidsDataset" -> "kmean_out926",
      "functionName" -> "kmeans_func926").get _)
    assert(e.functionExists("kmeans_func926"))
    // functionName without modelFileUrl is the reference's 400
    val exNoUrl = intercept[IllegalArgumentException](
      e.runProcedure("kmeans.train", Map(
        "trainingData" -> "select * excluding(label) from toy926",
        "centroidsDataset" -> "kmean_out926b",
        "functionName" -> "kmeans_func926b").get _))
    assert(exNoUrl.getMessage.contains("modelFileUrl"), exNoUrl.getMessage)
    // an unwritable scheme is a 400 too
    val exScheme = intercept[IllegalArgumentException](
      e.runProcedure("kmeans.train", Map(
        "trainingData" -> "select * excluding(label) from toy926",
        "modelFileUrl" -> "not://a/valid/path",
        "functionName" -> "kmeans_func926c").get _))
    assert(exScheme.getMessage.contains("scheme"), exScheme.getMessage)
    e.runProcedure("probabilizer.train", Map(
      "trainingData" -> ("select cls_func926({{* EXCLUDING(label)} as " +
        "features})[score] as score, label from toy926"),
      "modelFileUrl" -> "file://tmp/MLDB-926-proba.json",
      "functionName" -> "probabilizer_func926").get _)
    assert(e.functionExists("probabilizer_func926"))
    e.runProcedure("svd.train", Map(
      "trainingData" -> "select * from toy926",
      "modelFileUrl" -> "file://tmp/MLDB-926-svd.model",
      "functionName" -> "svd_func926").get _)
    assert(e.functionExists("svd_func926"))
    assert(q("select svd_func926({row: {feat1: 1}})[embedding] as emb")
      .head().getSeq[Double](0).nonEmpty)
    e.runProcedure("tsne.train", Map(
      "trainingData" -> "select * excluding(label) from toy926",
      "numOutputDimensions" -> "2",
      "modelFileUrl" -> "file://tmp/MLDB-926-tsne.model",
      "functionName" -> "tsne_func926").get _)
    assert(e.functionExists("tsne_func926"))
    // GET /v1/functions/<name> answers a status object per function
    val srv = new api.RestServer(e)
    val port = srv.start()
    try {
      for (fn <- Seq("cls_func926", "kmeans_func926",
          "probabilizer_func926", "svd_func926", "tsne_func926")) {
        val r = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/v1/functions/$fn"))
          .GET.build(), HttpResponse.BodyHandlers.ofString())
        assert(r.statusCode() === 200, s"$fn: ${r.body()}")
        assert(r.body().contains("\"state\": \"ok\""), r.body())
      }
    } finally srv.stop()
  }
}
