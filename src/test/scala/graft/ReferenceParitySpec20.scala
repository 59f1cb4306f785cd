package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Twentieth batch of replays of the reference's OWN regression
  * tests — builtin binding errors (MLDB-1336), the uniform REST error
  * envelope (MLDB-1260), the tokensplit function entity (MLDB-1116),
  * and the tfidf train/function pair (MLDB-1101). */
class ReferenceParitySpec20 extends AnyFunSuite {

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

  // --- MLDB-1336-builtin-checks.py ------------------------------------------------

  test("MLDB-1336: builtin arity mismatches raise the binding error") {
    val ex = intercept[IllegalArgumentException](q("SELECT sqrt(1,2,3)"))
    assert(ex.getMessage.contains(
      "Binding builtin function sqrt: expected 1 argument, got 3"),
      ex.getMessage)
    val ex2 = intercept[IllegalArgumentException](q("SELECT pow(1)"))
    assert(ex2.getMessage.contains(
      "Binding builtin function pow: expected 2 arguments, got 1"),
      ex2.getMessage)
    // exp('a') reads NaN/NULL under our non-ANSI cell semantics (the
    // reference raises a per-cell conversion error — documented
    // divergence; our whole math battery is built on null-safe casts)
    assert(q("SELECT exp('a') AS x").count() === 1)
  }

  // --- MLDB-1260-json-errors.py ---------------------------------------------------

  test("MLDB-1260: every REST error carries error + httpCode") {
    val srv = new api.RestServer(e)
    val port = srv.start()
    def get(path: String): (Int, String) = {
      val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port$path")).GET.build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    try {
      // a parse error, an unknown function, and an unknown route all
      // answer the same envelope shape
      val (c1, b1) = get("/v1/query?q=sele")
      assert(c1 === 400 && b1.contains("\"error\"") &&
        b1.contains("\"httpCode\": 400"), s"$c1 $b1")
      val (c2, b2) = get("/v1/query?q=" +
        java.net.URLEncoder.encode("select h()", "UTF-8"))
      assert(c2 >= 400 && b2.contains("\"error\"") &&
        b2.contains("\"httpCode\""), s"$c2 $b2")
    } finally srv.stop()
  }

  // --- MLDB-1116-tokensplit.py ----------------------------------------------------

  test("MLDB-1116: tokensplit round-trips emoticon-laden text") {
    e.recordRows("example1116",
      """[{"rowName":"1","x":":)"},{"rowName":"2","x":":P"},
        |{"rowName":"3","x":"(>_<)"},
        |{"rowName":"4","x":"(ノಠ益ಠ)ノ彡┻━┻"},
        |{"rowName":"5","x":"¯\\\\_(ツ)_/¯"},
        |{"rowName":"6","x":"¯\\\\_(ツ)_/¯¯¯¯¯¯"}]"""
        .stripMargin)
    e.createTokensplitFunction("tokensplit_function",
      "select * from example1116")
    val out1 = e.query(
      "select tokensplit_function({text: 'aaahhhhh " +
        "¯\\_(ツ)_/¯'})[text] as t").select("t").head().getString(0)
    assert(out1 === "aaahhhhh ¯\\_(ツ)_/¯", out1)
    // the smiley-only variant: already-separated tokens stay put
    e.recordRows("smileys1116",
      """[{"rowName":"1","a":":P"},{"rowName":"2","a":"(>_<)"},
        |{"rowName":"3","a":":-)"}]""".stripMargin)
    e.createTokensplitFunction("split_smiley", "select * from smileys1116")
    val s2 = ":P Great day!!! (>_<) (>_<) :P :P :P :-)"
    val out2 = e.query(s"select split_smiley({text: '$s2'})[text] as t")
      .select("t").head().getString(0)
    assert(out2 === s2, out2)
  }

  // --- MLDB-283-embedding-nearest-neighbours.py --------------------------------------

  test("MLDB-283: embedding.neighbors distances, row-name coords, params") {
    e.recordRows("test283",
      """[{"rowName":"ex1","x":0,"y":0},{"rowName":"ex2","x":0,"y":1},
        |{"rowName":"ex3","x":1,"y":0},{"rowName":"ex4","x":1,"y":1}]"""
        .stripMargin)
    e.createEmbeddingNeighborsFunction("nn", "test283")
    def dists(call: String): Map[String, Double] =
      e.query(s"select nn({$call})[distances] as d").head()
        .getMap[String, Double](0).toMap
    // the centre point is √0.5 from all four corners
    val centre = dists("coords: {x:0.5, y:0.5}")
    assert(centre.size === 4)
    centre.values.foreach(v => assert(math.abs(v - 0.7071067) < 1e-5, centre))
    // the reference's exact distances from (0.1, 0.2)
    val off = dists("coords: {x:0.1, y:0.2}")
    assert(math.abs(off("ex1") - 0.2236068) < 1e-5, off)
    assert(math.abs(off("ex2") - 0.8062258) < 1e-5, off)
    assert(math.abs(off("ex3") - 0.9219544) < 1e-5, off)
    assert(math.abs(off("ex4") - 1.2041595) < 1e-5, off)
    // a row NAME as coords (MLDB-509)
    val fromEx1 = dists("coords: 'ex1'")
    assert(fromEx1("ex1") === 0.0 && fromEx1("ex2") === 1.0 &&
      fromEx1("ex3") === 1.0 &&
      math.abs(fromEx1("ex4") - 1.4142135) < 1e-5, fromEx1)
    // numNeighbors and maxDistance trim the result
    val k2 = dists("coords: 'ex1', numNeighbors: 2")
    assert(k2.keySet === Set("ex1", "ex2") || k2.keySet === Set("ex1", "ex3"),
      k2)
    val bounded = dists("coords: 'ex1', numNeighbors: 2, maxDistance: 0.5")
    assert(bounded.keySet === Set("ex1"), bounded)
  }

  // --- MLDB-1101-tf-idf.py ---------------------------------------------------------

  test("MLDB-1101: tfidf.train counts document frequencies per word") {
    val corpus = Seq(
      "peanut butter jelly peanut butter jelly",
      "peanut butter jelly time peanut butter jelly time",
      "this is the jelly song")
    e.recordRows("example1101", corpus.zipWithIndex.map { case (doc, i) =>
      s"""{"rowName":"row$i","test":"$doc"}"""
    }.mkString("[", ",", "]"))
    e.runProcedure("transform", Map(
      "inputData" -> ("select tokenize(test, {splitChars:' ', " +
        "quoteChar:'', minTokenLength: 2}) as * from example1101"),
      "outputDataset" -> "bag1101").get _)
    e.runProcedure("tfidf.train", Map(
      "trainingData" -> "select * from bag1101",
      "modelFileUrl" -> "file://tmp/MLDB-1101.idf",
      "outputDataset" -> "tf_idf1101",
      "functionName" -> "tfidffunction").get _)
    // the reference's exact document-frequency table
    val dfTable = q("select rowName() as w, count from tf_idf1101 " +
      "order by w").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(dfTable.toSeq === Seq("butter" -> 2L, "is" -> 1L,
      "jelly" -> 3L, "peanut" -> 2L, "song" -> 1L, "the" -> 1L,
      "this" -> 1L, "time" -> 1L), dfTable.toSeq)
  }

  test("MLDB-1101: the tfidf function scores relative relevance") {
    // depends on the previous test's model
    val dfTable = q("select count from tf_idf1101").count()
    assert(dfTable === 8)
    def scores(fn: String): Map[String, Double] =
      e.query(s"""select $fn({tokenize('jelly time butter butter bristol',
        {splitChars: ' '}) as input})[output] as o""")
        .head().getMap[String, Double](0).toMap
    val s = scores("tfidffunction")
    // tf-idf of an in-corpus word is positive
    assert(s("time") > 0, s)
    // unseen 'bristol' outranks ubiquitous 'jelly'
    assert(s("bristol") > s("jelly"), s)
    // 'butter' (tf 2) ≥ 'jelly' (tf 1, df 3)
    assert(s("butter") >= s("jelly"), s)
    // rarer 'time' outranks 'jelly'
    assert(s("time") > s("jelly"), s)
    // the augmented/inverseMax variant keeps the same ordering pins
    e.createTfidfFunction("tfidf_aug_invmax", "file://tmp/MLDB-1101.idf",
      "augmented", "inverseMax")
    val s2 = scores("tfidf_aug_invmax")
    assert(s2("bristol") > s2("jelly"), s2)
    val s3scoped = {
      e.createTfidfFunction("tfidf_raw_inv", "file://tmp/MLDB-1101.idf",
        "raw", "inverse")
      scores("tfidf_raw_inv")
    }
    assert(s3scoped("bristol") > s3scoped("jelly"), s3scoped)
  }
}
