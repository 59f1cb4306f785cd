package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Twenty-fourth batch of replays of the reference's OWN regression
  * tests — the SVD behavioral family, closing the NOTES_r9
  * svd.embedRow string-one-hot divergence:
  *   - MLDB-489-svd-nonvarying-reals.js (constant columns survive),
  *   - MLDB-533-low-rank-continuous-svd.js (numDenseBasisVectors cap,
  *     26 column embeddings out),
  *   - MLDB-534-svd-function-column-errors.js (embedRow input-type
  *     validation: "only numbers were seen", "was a string in
  *     training", "never seen in training"),
  *   - MLDB-687-svd-embed-row-single-column.js (partial input row),
  *   - MLDB-663_repeatable_svd.py (two trainings agree exactly),
  * plus the COL_EQUAL embed-time pin (`plugins/embedding/svd.cc:836`):
  * embedRow of a training row's RAW values — string column included —
  * reproduces that row's rowOutputDataset projection. */
class ReferenceParitySpec24 extends AnyFunSuite {

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

  // --- MLDB-489-svd-nonvarying-reals.js -------------------------------------------

  test("MLDB-489: constant (nonvarying) real columns still embed") {
    val rng = new scala.util.Random(489)
    val rows = (0 until 60).map { i =>
      s"""{"rowName":"r$i","a":${rng.nextDouble()},"b":${rng.nextDouble()},""" +
        s""""const1":7.5,"const2":0}"""
    }.mkString("[", ",", "]")
    e.recordRows("ds489", rows)
    e.runProcedure("svd.train", Map(
      "trainingData" -> "select * from ds489",
      "columnOutputDataset" -> "svd489_cols",
      "numSingularValues" -> "10").get _)
    // every trained column gets an embedding row, constants included
    assert(e.dataset("svd489_cols").count() === 4)
    val names = e.dataset("svd489_cols")
      .select(col("rowName")).collect().map(_.getString(0)).sorted
    assert(names === Array("a.numericValue", "b.numericValue",
      "const1.numericValue", "const2.numericValue"), names.mkString(","))
  }

  // --- MLDB-533-low-rank-continuous-svd.js ----------------------------------------

  test("MLDB-533: numDenseBasisVectors caps k; 26 column embeddings out") {
    val rng = new scala.util.Random(533)
    val rows = (0 until 100).map { i =>
      val cells = (0 until 26).map(j => s""""c$j":${rng.nextInt(10)}""")
      s"""{"rowName":"${i + 1}",${cells.mkString(",")}}"""
    }.mkString("[", ",", "]")
    e.recordRows("ds533", rows)
    e.runProcedure("svd.train", Map(
      "trainingData" -> "select * from ds533",
      "columnOutputDataset" -> "svd533_cols",
      "rowOutputDataset" -> "svd533_rows",
      "numSingularValues" -> "1000",
      "numDenseBasisVectors" -> "20").get _)
    assert(e.dataset("svd533_cols").count() === 26)
    assert(e.dataset("svd533_rows").count() === 100)
    // the kept dimensionality is bounded by numDenseBasisVectors
    val dims = e.dataset("svd533_cols").columns
      .count(_.startsWith("embedding"))
    assert(dims <= 20, s"$dims dims")
  }

  // --- MLDB-534-svd-function-column-errors.js -------------------------------------

  test("MLDB-534: embedRow validates input types with the reference's errors") {
    val rng = new scala.util.Random(534)
    val letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val rows = (0 until 100).map { i =>
      val nums = (0 until 6).map(j => s""""n$j":${rng.nextInt(10)}""")
      val strs = (0 until 3).map(j =>
        s""""s$j":"${letters(rng.nextInt(26))}"""")
      s"""{"rowName":"${i + 1}",${(nums ++ strs).mkString(",")}}"""
    }.mkString("[", ",", "]")
    e.recordRows("ds534", rows)
    e.runProcedure("svd.train", Map(
      "trainingData" -> "select * from ds534",
      "numSingularValues" -> "1000",
      "numDenseBasisVectors" -> "20",
      "modelFileUrl" -> "file://tmp/MLDB-534.svd").get _)
    e.createSvdEmbedFunction("svd534", "file://tmp/MLDB-534.svd", 20)
    // a numeric value for a numeric-trained column embeds (MLDB-536)
    val ok = q("select svd534({row: {n0: 1}})[embedding] as emb").head()
    assert(ok.getSeq[Double](0).nonEmpty)
    // a string value for a numeric-trained column is the reference's
    // bind error
    val ex1 = intercept[Exception](
      q("select svd534({row: {n0: '1'}})[embedding] as emb").collect())
    assert(ex1.getMessage.contains("only numbers were seen"), ex1.getMessage)
    // a number for a string-trained column
    val ex2 = intercept[Exception](
      q("select svd534({row: {s0: 1}})[embedding] as emb").collect())
    assert(ex2.getMessage.contains("was a string in training"),
      ex2.getMessage)
    // a string value never observed for a string-trained column
    val ex3 = intercept[Exception](
      q("select svd534({row: {s0: 'never-seen-value'}})[embedding] as emb")
        .collect())
    assert(ex3.getMessage.contains("never seen in training"), ex3.getMessage)
    // the same battery over REST (the reference drives /application)
    val srv = new api.RestServer(e)
    val port = srv.start()
    try {
      def app(input: String): (Int, String) = {
        val enc = java.net.URLEncoder.encode(input, "UTF-8")
        val r = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/v1/functions/svd534/" +
            s"application?input=$enc")).GET.build(),
          HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      }
      val (c1, b1) = app("""{"row": {"n0": 1}}""")
      assert(c1 === 200 && b1.contains("embedding"), s"$c1 $b1")
      val (c2, b2) = app("""{"row": {"n0": "1"}}""")
      assert(c2 === 400 && b2.contains("only numbers were seen"), s"$c2 $b2")
      val (c3, b3) = app("""{"row": {"s0": 1}}""")
      assert(c3 === 400 && b3.contains("was a string in training"),
        s"$c3 $b3")
    } finally srv.stop()
  }

  // --- MLDB-687-svd-embed-row-single-column.js ------------------------------------

  test("MLDB-687: embedRow accepts a partial input row") {
    e.recordRows("ds687",
      """[{"rowName":"row1","x":1,"y":1},{"rowName":"row2","x":1,"y":2}]""")
    e.runProcedure("svd.train", Map(
      "trainingData" -> "select * from ds687",
      "numSingularValues" -> "2",
      "modelFileUrl" -> "file://tmp/MLDB-687.svd").get _)
    e.createSvdEmbedFunction("svd687", "file://tmp/MLDB-687.svd")
    val r = q("select svd687({row: {x: 2}})[embedding] as emb").head()
    assert(r.getSeq[Double](0).nonEmpty)
  }

  // --- MLDB-663_repeatable_svd.py -------------------------------------------------

  test("MLDB-663: two trainings of the same data produce identical embeddings") {
    val rng = new scala.util.Random(663)
    val rows = (0 until 200).map { i =>
      val cells = (0 until 8).map(j => s""""c$j":${rng.nextInt(100)}""")
      s"""{"rowName":"r${"%03d".format(i)}",${cells.mkString(",")}}"""
    }.mkString("[", ",", "]")
    e.recordRows("ds663", rows)
    for (run <- Seq("svd663a", "svd663b"))
      e.runProcedure("svd.train", Map(
        "trainingData" -> "select * from ds663 order by rowName() limit 150",
        "columnOutputDataset" -> run).get _)
    val a = e.dataset("svd663a").orderBy("rowName").collect()
    val b = e.dataset("svd663b").orderBy("rowName").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.toSeq === rb.toSeq, s"$ra != $rb")
    }
  }

  // --- svd.cc:836 COL_EQUAL at embed time (NOTES_r9 divergence closed) -------------

  test("embedRow re-applies string one-hots: raw values reproduce the projection") {
    val rng = new scala.util.Random(836)
    val rows = (0 until 80).map { i =>
      val cat = if (i % 2 == 0) "long" else "short"
      s"""{"rowName":"e$i","x":${rng.nextDouble()},""" +
        s""""y":${rng.nextDouble()},"petalCat":"$cat"}"""
    }.mkString("[", ",", "]")
    e.recordRows("ds836", rows)
    e.runProcedure("svd.train", Map(
      "trainingData" -> "select * from ds836",
      "rowOutputDataset" -> "svd836_rows",
      "numSingularValues" -> "4",
      "modelFileUrl" -> "file://tmp/MLDB-836.svd").get _)
    e.createSvdEmbedFunction("svd836", "file://tmp/MLDB-836.svd")
    // embedding the raw training row — string column as its raw value
    // — must equal that row's stored projection (the reference applies
    // its COL_EQUAL ops inside embedRow)
    val embedded = q("""select rowName() as rn,
        svd836({row: {x: x, y: y, petalCat: petalCat}})[embedding] as emb
      from ds836""").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val nDims = e.dataset("svd836_rows").columns
      .count(_.startsWith("embedding"))
    val stored = e.dataset("svd836_rows").collect().map { r =>
      r.getAs[String]("rowName") ->
        (0 until nDims).map(j => r.getAs[Double](s"embedding.$j"))
    }.toMap
    assert(embedded.size === stored.size)
    stored.foreach { case (rn, proj) =>
      val emb = embedded(rn)
      proj.zip(emb).foreach { case (p, v) =>
        assert(math.abs(p - v) < 1e-9, s"row $rn: $proj vs $emb")
      }
    }
    // the one-hot dimensions genuinely contribute: flipping the
    // category changes the embedding
    val flip = q("""select
        svd836({row: {x: 0.5, y: 0.5, petalCat: 'long'}})[embedding] as a,
        svd836({row: {x: 0.5, y: 0.5, petalCat: 'short'}})[embedding] as b""")
      .head()
    assert(flip.getSeq[Double](0) !== flip.getSeq[Double](1))
  }
}
