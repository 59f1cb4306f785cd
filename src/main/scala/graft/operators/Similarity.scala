package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Similarity search over embedding columns.
  *
  * Reference analog: the `embedding` dataset's VP-tree exact kNN
  * (`/root/reference/plugins/embedding/embedding.cc:93-220`,
  * `embedding.neighbors` function `:1420`). A VP-tree is a
  * single-node in-memory index; the Spark-native shapes are
  * (a) brute-force block kNN — exact, one broadcast, no index — and
  * (b) LSH-bucketed approximate kNN for the 100 TB path.
  */
object Similarity {

  /** Per-group top-n without a one-task-per-group straggler: phase 1
    * ranks within (group, input partition) — every window partition is
    * bounded by the input partition size — and keeps n; phase 2 ranks
    * the ≤ n×nPartitions survivors per group (the quotaSample
    * two-phase construction). Any global top-n row is in its own
    * partition's top-n, so the cut is exact. A single window
    * partitioned by group alone would pull every scored candidate of
    * one query into one task — corpus-sized at 100 TB. Emits `rank`
    * (1-based, dense input order). */
  private def topNPerGroup(df: DataFrame, group: Column, ord: Seq[Column],
      n: Int): DataFrame = {
    val wLocal = Window.partitionBy(group, col("__pid")).orderBy(ord: _*)
    val wFinal = Window.partitionBy(group).orderBy(ord: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(wLocal))
      .filter(col("__lrn") <= n)
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= n)
      .drop("__pid", "__lrn")
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries` is expected to be small (it is broadcast); the corpus
    * side streams — no shuffle of the corpus at all, just a map-side
    * broadcast nested loop, then the two-phase per-query top-k. At
    * 100 TB this is the right exact plan: corpus never moves, and no
    * task ever collects one query's full candidate stream. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", V.cosine(col("qv"), col("cv")))
    topNPerGroup(scored, col("query_id"),
      Seq(col("cosine").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Per-dimension corpus ranges for int8 scalar quantization. One
    * posexplode + groupBy pass (partial aggregation map-side — only
    * (dim, mn, mx) partials shuffle), then a dimension-count-sized
    * collect (config-sized, like approxQuantile's cut points). */
  def embeddingRanges(df: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val r = df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy(col("pos")).collect()
    (r.map(_.getDouble(1)), r.map(_.getDouble(2)))
  }

  /** Int8 scalar quantization of an embedding column: per dimension,
    * code = round((x - mn) / (mx - mn) * 255) — 4× less memory/IO
    * than float32, the standard first rung of ANN index compression.
    * The ranges ride along as plan literals (a few hundred bytes), so
    * encoding is pure codegen'd row math — no join, no shuffle. */
  def quantizeInt8(vec: org.apache.spark.sql.Column,
      mins: Array[Double], maxs: Array[Double]): org.apache.spark.sql.Column = {
    val (mnL, mxL) = (typedLit(mins.toSeq), typedLit(maxs.toSeq))
    transform(sequence(lit(1), lit(mins.length)), i => {
      val x = element_at(vec, i).cast("double")
      val mn = element_at(mnL, i)
      val mx = element_at(mxL, i)
      when(mx === mn, lit(0))
        .otherwise(round((x - mn) / (mx - mn) * 255, 0).cast("int"))
    })
  }

  /** Inverse of [[quantizeInt8]]: xq = mn + code / 255 * (mx - mn).
    * Reconstruction error is bounded by span/510 per dimension. */
  def dequantizeInt8(codes: org.apache.spark.sql.Column,
      mins: Array[Double], maxs: Array[Double]): org.apache.spark.sql.Column = {
    val (mnL, mxL) = (typedLit(mins.toSeq), typedLit(maxs.toSeq))
    transform(sequence(lit(1), lit(mins.length)), i =>
      element_at(mnL, i) + element_at(codes, i).cast("double") / lit(255.0) *
        (element_at(mxL, i) - element_at(mnL, i)))
  }

  /** dequantize∘quantize fused into ONE lambda — semantically
    * identical to chaining [[quantizeInt8]] then [[dequantizeInt8]]
    * (same code arithmetic, same operand order), but O(d) per row.
    * The chained form is an optimizer trap: a single-use alias gets
    * CollapseProject'd into the consumer, nesting the quantize tree
    * inside the dequantize lambda, and higher-order functions
    * re-evaluate captured trees per element — O(d²) per row. Use this
    * for scan-time reconstruction; the split pair is for writing /
    * reading a codes table at rest. */
  def sqReconstruct(vec: org.apache.spark.sql.Column,
      mins: Array[Double], maxs: Array[Double]): org.apache.spark.sql.Column = {
    val (mnL, mxL) = (typedLit(mins.toSeq), typedLit(maxs.toSeq))
    transform(sequence(lit(1), lit(mins.length)), i => {
      val mn = element_at(mnL, i)
      val mx = element_at(mxL, i)
      val x = element_at(vec, i).cast("double")
      val code = when(mx === mn, lit(0))
        .otherwise(round((x - mn) / (mx - mn) * 255, 0).cast("int"))
      mn + code.cast("double") / lit(255.0) * (mx - mn)
    })
  }

  /** Approximate top-k via random-hyperplane LSH buckets with
    * multi-probe (exact within the matching bucket). Recall is
    * tunable by nBits; corpus is shuffled once on the bucket id —
    * bucket count 2^nBits should be sized ≫ executor count so AQE can
    * balance. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nBits: Int = 8): DataFrame = {
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", V.lshBucket(col("cv"), nBits))
    val qb = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", V.lshBucket(col("qv"), nBits)))
    val scored = cb.join(qb, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", V.cosine(col("qv"), col("cv")))
    topNPerGroup(scored, col("query_id"),
      Seq(col("cosine").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF-style two-stage kNN: coarse-quantize the corpus to the
    * nearest of `centroids` (a small broadcast table of
    * (centroid_id, vector)), then search only the probed cells.
    * Centroids can come from MLlib KMeans; any small table works. */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val cents = broadcast(centroids.select(
      col(idCol).as("centroid_id"), col(vecCol).as("centv")))
    // Map-side argmin: the broadcast nested-loop scores every centroid
    // next to the corpus row, and min_by partial-aggregates per row id
    // INSIDE each map task (a row's candidates never leave its input
    // partition), so the shuffle carries one row per corpus row — not
    // corpus×centroids rows into a window sort.
    def assign(df: DataFrame, vcol: String): DataFrame = {
      val keep = df.columns.filter(_ != "__rid")
      val payload = struct((keep.toSeq.map(col) :+ col("centroid_id")): _*)
      val key = struct(V.euclidean(col(vcol), col("centv")).as("d"),
        col("centroid_id").as("c"))
      df.crossJoin(cents)
        .groupBy(col("__rid"))
        .agg(min_by(payload, key).as("__best"))
        .select((keep.toSeq :+ "centroid_id").map(c => col(s"__best.$c").as(c)): _*)
    }
    val cb = assign(corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), col(idCol).as("__rid")), "cv")
    val qb = broadcast(assign(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), col(idCol).as("__rid")), "qv")
      .select(col("query_id"), col("qv"), col("centroid_id")))
    val scored = cb.select(col("neighbor_id"), col("cv"), col("centroid_id"))
      .join(qb, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", V.cosine(col("qv"), col("cv")))
    topNPerGroup(scored, col("query_id"),
      Seq(col("cosine").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Quantized-scan + exact-rerank kNN — the SQ8 pattern every vector
    * index at scale uses: scan the corpus as int8 codes (4× less
    * memory/IO than float32), pick `k·rerankFactor` candidates per
    * query by approximate cosine over the dequantized codes, then
    * re-score ONLY those candidates against the exact vectors. The
    * codes table is the index at rest; exact vectors are touched for
    * a per-query-constant number of rows. Recall loss is bounded by
    * the quantization error (span/510 per dimension); the rerank
    * restores exact ordering within the candidate pool. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, rerankFactor: Int = 4,
      ranges: Option[(Array[Double], Array[Double])] = None): DataFrame = {
    val (mins, maxs) = ranges.getOrElse(embeddingRanges(corpus, vecCol))
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      sqReconstruct(col(vecCol), mins, maxs).as("__cq"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val approx = codes.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__ac", V.cosine(col("qv"), col("__cq")))
    val cands = topNPerGroup(approx, col("query_id"),
      Seq(col("__ac").desc, col("neighbor_id")), k * rerankFactor)
      .select(col("query_id"), col("neighbor_id"))
    val exact = cands
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .withColumn("cosine", V.cosine(col("qv"), col("cv")))
    topNPerGroup(exact, col("query_id"),
      Seq(col("cosine").desc, col("neighbor_id")), k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
