package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SignalFunctions => S, TextFunctions => T}
import graft.operators.Reshape
import graft.sources.Word2Vec

class SignalW2vSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fft of an impulse is flat amplitude; ifft round-trips") {
    import spark.implicits._
    val df = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0, 4.0)).toDF("x")
    val out = df.select(col("x"), S.fft(col("x")).as("f"))
      .withColumn("amp", S.amplitude(col("f")))
      .withColumn("back", S.ifft(col("f")))
      .collect()
    // impulse → all-ones spectrum
    val amp0 = out(0).getAs[scala.collection.Seq[Double]]("amp")
    assert(amp0.size === 4 && amp0.forall(a => math.abs(a - 1.0) < 1e-9))
    // round-trip
    val x1 = out(1).getAs[scala.collection.Seq[Double]]("x")
    val b1 = out(1).getAs[scala.collection.Seq[Double]]("back")
    x1.zip(b1).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("amplitude/phase of an empty complex array are empty, not [null, null]") {
    import spark.implicits._
    // sequence(0, -1) descends, so the unguarded form fabricated two
    // null entries per empty signal
    val r = Seq(Seq.empty[Double]).toDF("f")
      .select(S.amplitude(col("f")).as("a"), S.phase(col("f")).as("p"),
        S.realPart(col("f")).as("re"), S.imagPart(col("f")).as("im"))
      .head()
    assert(r.getAs[scala.collection.Seq[Double]]("a").isEmpty)
    assert(r.getAs[scala.collection.Seq[Double]]("p").isEmpty)
    assert(r.getAs[scala.collection.Seq[Double]]("re").isEmpty)
    assert(r.getAs[scala.collection.Seq[Double]]("im").isEmpty)
  }

  test("impulse() builds a one-hot signal") {
    import spark.implicits._
    val r = Seq(1).toDF("i").select(S.impulse(lit(5), lit(2)).as("s")).head()
    assert(r.getAs[scala.collection.Seq[Double]]("s") === Seq(0.0, 0.0, 1.0, 0.0, 0.0))
  }

  test("word2vec binary round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("w2v").toString
    // non-ASCII vocabulary must survive the byte round-trip (UTF-8 on
    // both sides — byte-per-char IO mojibakes 'caf\u00e9' into 'caf\u00c3\u00a9')
    val vecs = Seq(
      ("alpha", Seq(1.0f, 2.0f, 3.0f)),
      ("caf\u00e9", Seq(-1.5f, 0.25f, 4.0f)),
      ("\u65e5\u672c\u8a9e", Seq(0.0f, 0.0f, 1.0f))).toDF("word", "embedding")
    Word2Vec.write(vecs, s"$dir/model.bin")
    val back = Word2Vec.read(spark, s"$dir/model.bin")
    assert(back.count() === 3)
    assert(back.join(vecs, Seq("word", "embedding")).count() === 3)
    assert(back.filter(col("word") === "caf\u00e9").count() === 1)
  }

  test("COLUMN EXPR meta-projection: filter/order/limit/rename columns") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val out = Reshape.selectColumnsExpr(li,
      where = _.startsWith("l_"),
      orderBy = Some(Ordering.String),
      limit = Some(3),
      rename = c => c.stripPrefix("l_"))
    assert(out.columns.toSeq === Seq("discount", "extendedprice", "linenumber"))
  }

  test("tokenize with ngramRange and minTokenLength") {
    import spark.implicits._
    val df = Seq("a bb ccc dd").toDF("t")
    val bag = df.select(T.tokenBagNgrams(col("t"), 1, 2, minTokenLength = 2).as("m"))
      .head().getAs[Map[String, Int]]("m")
    assert(bag === Map("bb" -> 1, "ccc" -> 1, "dd" -> 1,
      "bb ccc" -> 1, "ccc dd" -> 1))
  }

  test("sentiwordnet import: 1/rank-weighted synset averages + doc sentiment") {
    import graft.sources.Sources
    val dir = Files.createTempDirectory("graft_swn").toString
    val pw = new java.io.PrintWriter(s"$dir/swn.txt")
    pw.println("# SentiWordNet v3.0 comment")
    pw.println("a\t00000001\t0.5\t0.25\tgood#1 nice#2\tfirst gloss")
    pw.println("a\t00000002\t0.0\t1.0\tgood#2\tsecond gloss")
    pw.println("n\t00000003\t0.125\t0.5\tgood#1\tnoun gloss")
    pw.close()
    val lex = Sources.importSentiWordNet(spark, s"$dir/swn.txt")
    val rows = lex.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // good#a: rank-1 (.5,.25,.25) w=1 + rank-2 (0,1,0) w=.5 →
    // pos (.5)/(1.5)=1/3, neg (.25+.5)/1.5=.5, obj (.25)/1.5=1/6
    val (p, n, o) = rows("good#a")
    assert(math.abs(p - 1.0 / 3) < 1e-9 && math.abs(n - 0.5) < 1e-9 &&
      math.abs(o - 1.0 / 6) < 1e-9)
    // single-synset entries: weights cancel, raw scores come back
    assert(rows("nice#a") === ((0.5, 0.25, 0.25)))
    assert(rows("good#n") === ((0.125, 0.5, 0.375)))
    // doc-level application: averages across matched tokens (and the
    // word's POS variants); unmatched tokens are ignored
    import spark.implicits._
    val docs = Seq((1L, "good zzz"), (2L, "zzz qqq")).toDF("id", "t")
    val senti = Sources.docSentiment(docs, "id", "t", lex).collect()
    assert(senti.length === 1) // doc 2 matches nothing
    val s1 = senti.head
    // good = avg over good#a (1/3, .5, 1/6) and good#n (.125, .5, .375)
    assert(math.abs(s1.getAs[Double]("SentiPos") - (1.0 / 3 + 0.125) / 2) < 1e-9)
    assert(math.abs(s1.getAs[Double]("SentiNeg") - 0.5) < 1e-9)
    assert(s1.getAs[Long]("n_matched") === 1L)
  }

  test("word2vec train → binary export → re-import → pooling round-trip") {
    import spark.implicits._
    // a tiny corpus with strong co-occurrence structure
    val sentences = (1 to 200).map { i =>
      if (i % 2 == 0) Seq("cat", "dog", "pet", "fur")
      else Seq("car", "road", "wheel", "drive")
    }
    val docs = sentences.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "toks")
    val vecs = graft.ml.Models.word2vecTrain(docs, "toks",
      dim = 16, minCount = 1, maxIter = 2)
    assert(vecs.columns.toSeq == Seq("word", "embedding"))
    assert(vecs.count() == 8)

    // binary round-trip through the reference's word2vec format
    val path = Files.createTempDirectory("w2v").toString + "/model.bin"
    Word2Vec.write(vecs, path)
    val back = Word2Vec.read(spark, path)
    val a = vecs.orderBy("word").collect()
    val b = back.orderBy("word").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      val vx = x.getSeq[Float](1)
      val vy = y.getSeq[Float](1)
      vx.zip(vy).foreach { case (p, q) => assert(math.abs(p - q) < 1e-6f) }
    }

    // trained vectors feed pooling directly
    val pooled = graft.ml.Models.pooling(
      docs.select(col("doc_id"), explode(col("toks")).as("tok")),
      "doc_id", "tok", back, "word", "embedding")
    assert(pooled.count() == 200)
    assert(pooled.schema("pool_avg").dataType.typeName == "array")
  }
}
