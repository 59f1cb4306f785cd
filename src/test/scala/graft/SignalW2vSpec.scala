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

  test("impulse() builds a one-hot signal") {
    import spark.implicits._
    val r = Seq(1).toDF("i").select(S.impulse(lit(5), lit(2)).as("s")).head()
    assert(r.getAs[scala.collection.Seq[Double]]("s") === Seq(0.0, 0.0, 1.0, 0.0, 0.0))
  }

  test("word2vec binary round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("w2v").toString
    val vecs = Seq(
      ("alpha", Seq(1.0f, 2.0f, 3.0f)),
      ("beta", Seq(-1.5f, 0.25f, 4.0f)),
      ("gamma", Seq(0.0f, 0.0f, 1.0f))).toDF("word", "embedding")
    Word2Vec.write(vecs, s"$dir/model.bin")
    val back = Word2Vec.read(spark, s"$dir/model.bin")
    assert(back.count() === 3)
    assert(back.join(vecs, Seq("word", "embedding")).count() === 3)
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
}
