package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ml.Bpe

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("training reproduces the paper's worked example") {
    // Sennrich et al. 2016 §3.2 vocabulary: low×5 lower×2 newest×6 widest×3
    val freq = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.trainFromFreq(freq, 6)
    assert(m.merges.take(5) === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    // the paper's headline: unseen "lowest" segments into low + est</w>
    assert(Bpe.encodeWord("lowest", m.ranks) === Seq("low", "est</w>"))
  }

  test("encode round-trips characters and marks every word end") {
    val freq = Array(("hello", 10L), ("help", 5L), ("yellow", 4L))
    val m = Bpe.trainFromFreq(freq, 20)
    for (w <- Seq("hello", "help", "yellow", "unseen", "hell"))  {
      val toks = Bpe.encodeWord(w, m.ranks)
      assert(toks.mkString("").stripSuffix(Bpe.EndOfWord) === w)
      assert(toks.count(_.endsWith(Bpe.EndOfWord)) === 1)
    }
  }

  test("native expression is bit-identical with the interpreted encoder") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 80, maxVocab = 20000)
    val both = docs
      .select(col("doc_id"), col("text"),
        graft.functions.TextFunctions.tokens(col("text")).as("__w"))
      .select(col("doc_id"), col("text"),
        Bpe.encodeColumn(col("__w"), model).as("native"))
      .collect()
    both.foreach { r =>
      val interpreted = Bpe.encode(r.getString(1), model)
      assert(r.getSeq[String](2) === interpreted,
        s"doc ${r.getLong(0)} diverged")
    }
    assert(both.nonEmpty)
  }

  test("distributed train: merges are deterministic across runs") {
    val docs = Tables.documents(spark, sf)
    val a = Bpe.train(docs, "text", numMerges = 30)
    val b = Bpe.train(docs.repartition(7), "text", numMerges = 30)
    assert(a.merges === b.merges)
    assert(a.merges.size === 30)
  }
}
