package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.Dedup
import graft.streaming.Continuous

/** Streaming near-dup dedup against a static kept corpus: micro-batches
  * carrying near-copies of corpus documents must come out scrubbed,
  * novel documents must pass, across multiple batches reusing one
  * persisted index. */
class StreamNearDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("micro-batches dedup against the corpus index, novel rows pass") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(30).cache()
    val corpusRows = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    val index = Dedup.buildIndex(corpus, "text", "doc_id")
    try {
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val kept = ArrayBuffer.empty[Long]
      val q = Continuous.nearDedupStream(
        in.toDF.toDF("doc_id", "text"), index, "text", "doc_id",
        threshold = 0.8) { (batch: DataFrame, _: Long) =>
        kept ++= batch.select("doc_id").collect().map(_.getLong(0))
      }.start()

      // batch 1: two exact corpus copies + one novel doc
      in.addData(
        (9001L, corpusRows(0)._2),
        (9002L, corpusRows(1)._2),
        (9003L, "a genuinely novel document about spark native analytics " +
          "engines that appears nowhere in the corpus at all"))
      q.processAllAvailable()
      assert(kept.toSet == Set(9003L), s"batch1 kept $kept")

      // batch 2: a near-copy (tail tweaked), another novel, the SAME
      // index instance — no corpus re-shingling
      val nearCopy = corpusRows(2)._2 + " tiny tail edit"
      in.addData(
        (9004L, nearCopy),
        (9005L, "completely different subject matter entirely unrelated " +
          "to anything stored with many extra unique words zq xv wk"))
      q.processAllAvailable()
      assert(kept.toSet == Set(9003L, 9005L), s"batch2 kept $kept")
      q.stop()
    } finally index.release()
  }

  test("dedupAgainstIndex equals minHashDedupAgainst on the same input") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val existing = docs.filter(col("doc_id") < 40).cache()
    // new side: 10 copies of existing docs (shifted ids) + 10 novel docs
    val newDocs = existing.filter(col("doc_id") < 10)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") >= 40 && col("doc_id") < 50))
    val viaIndex = {
      val idx = Dedup.buildIndex(existing, "text", "doc_id")
      try Dedup.dedupAgainstIndex(newDocs, idx, "text", "doc_id",
        threshold = 0.8).select("doc_id").collect().map(_.getLong(0)).toSet
      finally idx.release()
    }
    val viaOneShot = Dedup.minHashDedupAgainst(newDocs, existing,
      "text", "doc_id", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == viaOneShot)
    assert(viaIndex.forall(_ >= 40), s"copies survived: $viaIndex")
    assert(viaIndex.nonEmpty)
  }

  test("semantic stream: corpus-twin embeddings scrubbed, novel pass, index reused") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50).cache()
    val corpusVecs = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val cents = graft.plans.LshBucket.signMatrix(8, 64)
    val index = Dedup.buildSemanticIndex(corpus, "v", "vec_id", cents)
    try {
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val kept = ArrayBuffer.empty[Long]
      val q = Continuous.semanticDedupStream(
        in.toDF.toDF("vec_id", "v"), index, "v", "vec_id",
        minCosine = 0.95) { (batch: DataFrame, _: Long) =>
        kept ++= batch.select("vec_id").collect().map(_.getLong(0))
      }.start()
      // batch 1: two exact corpus twins + one novel random direction
      val novel = Seq.tabulate(64)(i => if (i % 3 == 0) 1.0 else -0.5)
      in.addData((9001L, corpusVecs(0)._2), (9002L, corpusVecs(1)._2),
        (9003L, novel))
      q.processAllAvailable()
      assert(kept.toSet == Set(9003L), s"batch1 kept $kept")
      // batch 2: a slightly perturbed twin + another novel direction,
      // same index instance (no corpus re-assignment)
      val near = corpusVecs(2)._2.updated(0, corpusVecs(2)._2.head * 0.5 + 0.01)
      val novel2 = Seq.tabulate(64)(i => if (i % 5 == 0) -1.0 else 0.25)
      in.addData((9004L, near), (9005L, novel2))
      q.processAllAvailable()
      assert(kept.toSet == Set(9003L, 9005L), s"batch2 kept $kept")
      q.stop()
    } finally index.release()
  }

  test("semanticDedupAgainstIndex equals one-shot semanticDedupAgainst") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val corpus = emb.filter(col("vec_id") < 100).cache()
    // new side: 20 corpus twins (shifted ids) + 20 novel rows
    val newRows = corpus.filter(col("vec_id") < 20)
      .select((col("vec_id") + 5000).as("vec_id"), col("v"))
      .unionByName(emb.filter(col("vec_id") >= 100 && col("vec_id") < 120))
    val cents = graft.plans.LshBucket.signMatrix(8, 64)
    val viaIndex = {
      val idx = Dedup.buildSemanticIndex(corpus, "v", "vec_id", cents)
      try Dedup.semanticDedupAgainstIndex(newRows, idx, "v", "vec_id",
        minCosine = 0.95)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      finally idx.release()
    }
    val oneShot = Dedup.semanticDedupAgainst(newRows, corpus, "v", "vec_id",
      cents, minCosine = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == oneShot)
    // every exact twin dropped; every novel row kept (corpus is
    // near-orthogonal, nothing clears 0.95 by accident)
    assert(viaIndex == (100L until 120L).toSet, s"kept $viaIndex")
  }
}
