package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for large text corpora.
  *
  * The reference has only exact row identity (rowName) — dedup is an
  * LLM-pipeline extension of this engine. All variants follow the same
  * scale shape: per-row signature (map-side, codegen) → shuffle on the
  * signature/bucket key → per-bucket verification. No driver-side
  * state, no collect; candidate generation is O(rows·bands) and the
  * only quadratic work is within LSH buckets (bounded below).
  */
object Dedup {

  /** Exact dedup on a normalized content hash. Keeps the row with the
    * smallest `idCol` per duplicate group. One shuffle on the 128-bit
    * hash — at 100 TB this is a standard hash-partitioned
    * dropDuplicates; AQE handles skew (identical boilerplate docs →
    * few hot keys, but the combine is map-side). */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    docs.withColumn("__h", T.normalizedHash(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
  }

  /** Candidate near-duplicate pairs via MinHash-LSH banding.
    *
    * rows → minhash signature (k = bands·rowsPerBand) → explode band
    * keys → self-join on (band, key) → distinct (idA < idB) pairs,
    * verified with true n-gram Jaccard ≥ threshold.
    *
    * Scale: the exploded table is rows×bands; the self-join shuffles
    * on the band key. `maxBucket` drops degenerate buckets (e.g. empty
    * docs all hashing together) before the quadratic within-bucket
    * pairing — the standard guard that keeps worst-case work
    * O(bucketCap²·buckets). */
  def minHashPairs(docs: DataFrame, textCol: String, idCol: String,
      bands: Int = 8, rowsPerBand: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    val k = bands * rowsPerBand
    // Stage 1 (map-side): one pass per doc — distinct shingles + native
    // minhash signature. Only (id, band, key) goes into the self-join;
    // shingle arrays stay out of the wide shuffle.
    val base = docs.select(col(idCol).as("id"),
      array_distinct(T.shingles(col(textCol), shingleN)).as("sh"))
      .withColumn("sig", T.minHashFromShingles(col("sh"), k))
    val bandTable = base
      .select(col("id"), explode(T.minHashBands(col("sig"), bands, rowsPerBand)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.key").as("key"))
    val pruned = bandTable.withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
      .filter(col("__n") <= maxBucket).drop("__n")
    // Stage 2: candidate pairs, deduplicated across bands BEFORE the
    // expensive verification (a pair colliding in all 8 bands would
    // otherwise be verified 8 times).
    val cand = pruned.select(col("band"), col("key"), col("id").as("id_a"))
      .join(pruned.select(col("band"), col("key"), col("id").as("id_b")),
        Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // Stage 3: verify each candidate once with true shingle Jaccard.
    cand
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        T.jaccardArrays(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash-LSH dedup: drop every doc that has a verified near-dup
    * with a smaller id (single-link to the smallest id — one LSH pass,
    * not full transitive closure; documented divergence from exact
    * clustering). */
  def minHashDedup(docs: DataFrame, textCol: String, idCol: String,
      bands: Int = 8, rowsPerBand: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val dups = minHashPairs(docs, textCol, idCol, bands, rowsPerBand,
      shingleN, threshold)
      .select(col("id_b").as("__dup_id")).distinct()
    docs.join(dups, docs(idCol) === col("__dup_id"), "left_anti")
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, candidates =
    * identical fingerprint (hamming 0) or matching on any of 4
    * 16-bit chunks then hamming ≤ maxHamming (standard simhash
    * chunk-index trick: any pair within hamming 3 of 64 bits must
    * agree on at least one of 4 chunks). */
  def simHashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSig = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", T.simHash64(col("text")))
    val chunked = withSig.withColumn("chunk", explode(array(
      (0 until 4).map(i => struct(lit(i).as("i"),
        shiftrightunsigned(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL)).as("v"))): _*)))
    val a = chunked.select(col("chunk"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = chunked.select(col("chunk"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", T.hamming64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b")).agg(min(col("hamming")).as("hamming"))
  }

  /** Embedding-cosine near-dup pairs: LSH-bucket on random-hyperplane
    * sign bits, verify cosine within bucket. */
  def embeddingPairs(emb: DataFrame, vecCol: String, idCol: String,
      minCosine: Double = 0.95, nBits: Int = 8): DataFrame = {
    val withB = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", V.lshBucket(col("v"), nBits))
    val a = withB.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withB.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", V.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine")).distinct()
  }
}
