package graft.ml

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Byte-pair-encoding tokenizer — the exact published algorithm
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
  * Rare Words with Subword Units", §3.2), the tokenization every LLM
  * data pipeline ultimately feeds.
  *
  * Scale shape, by the paper's own structure: merges are learned from
  * the corpus WORD-FREQUENCY table, not from raw text — so the
  * distributed part of training is one tokenize → groupBy(word) count
  * (map-side partial aggregation; only (word, n) rows shuffle),
  * truncated to the `maxVocab` most frequent words. That table is
  * model-sized (the same driver boundary as word2vec's vocabulary or
  * kmeans' centroids), and the greedy merge loop runs over it
  * driver-side. APPLICATION is the 100 TB part and stays fully
  * distributed: a native expression ([[graft.plans.BpeEncode]]) walks
  * each document with the merge-rank map in a tight JVM loop — one
  * eval per row, no shuffle, no driver round-trips.
  */
object Bpe {

  /** End-of-word marker, appended as its own symbol before merging
    * (paper §3.2) so subwords know whether they end a word. */
  val EndOfWord = "</w>"

  /** Learned merge list, highest priority first. */
  final case class Model(merges: Seq[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Learn `numMerges` merges from the corpus word-frequency table.
    * Deterministic: ties in pair frequency break lexicographically. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 50000): Model = {
    val wordFreq = docs
      .select(explode(T.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromFreq(wordFreq, numMerges)
  }

  /** The paper's merge loop over an explicit (word, count) table. */
  def trainFromFreq(wordFreq: Array[(String, Long)],
      numMerges: Int): Model = {
    var vocab: Array[(Array[String], Long)] = wordFreq.map { case (w, n) =>
      ((w.map(_.toString) :+ EndOfWord).toArray, n)
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        if (best._2 < 2) done = true // singleton pairs never help
        else {
          merges += best._1
          val (a, b) = best._1
          vocab = vocab.map { case (syms, n) =>
            (mergePair(syms, a, b), n)
          }
        }
      }
      step += 1
    }
    Model(merges.toSeq)
  }

  private def mergePair(syms: Array[String], a: String,
      b: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy application to one word (interpreted reference — the
    * native expression's differential-test twin; keep bit-identical
    * with [[graft.plans.BpeEncode]]). At each step the PRESENT pair
    * with the lowest merge rank is merged everywhere, exactly the
    * order training created it. */
  def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Array[String] = (word.map(_.toString) :+ EndOfWord).toArray
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bi = i }
        i += 1
      }
      if (bi < 0) continue = false
      else {
        val (a, b) = (syms(bi), syms(bi + 1))
        syms = mergePair(syms, a, b)
      }
    }
    syms.toSeq
  }

  /** Interpreted whole-text encode (reference twin). */
  def encode(text: String, model: Model): Seq[String] = {
    val ranks = model.ranks
    text.toLowerCase.split("[\\s,;:!?.()\\[\\]{}\"']+").toSeq
      .filter(_.nonEmpty)
      .flatMap(w => encodeWord(w, ranks))
  }

  /** Distributed apply: token array column → subword array column via
    * the native expression. */
  def encodeColumn(tokens: Column, model: Model): Column =
    graft.plans.BpeEncode.column(tokens, model.merges)
}
