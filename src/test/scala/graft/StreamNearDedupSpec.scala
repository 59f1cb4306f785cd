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
}
