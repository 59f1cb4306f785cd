package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.{Dedup, Reshape, Similarity, StatsTable}

class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf)
  private def doubled = {
    val d = docs
    d.unionByName(d.select((col("doc_id") + 1000000).as("doc_id"), col("text"),
      col("lang"), col("source"), col("n_chars")))
  }

  test("exact dedup keeps one row per text, smallest id") {
    val out = Dedup.exact(doubled, "text", "doc_id")
    assert(out.count() === docs.count())
    assert(out.filter(col("doc_id") >= 1000000).count() === 0)
  }

  test("minhash pairs find every exact duplicate with jaccard 1.0") {
    val pairs = Dedup.minHashPairs(doubled, "text", "doc_id",
      bands = 8, rowsPerBand = 4, threshold = 0.99)
    val exactDups = pairs.filter(col("id_b") === col("id_a") + 1000000)
    // identical docs agree on every band -> all 500 must be found
    assert(exactDups.count() === docs.count())
    assert(pairs.filter(col("jaccard") > 1.0 || col("jaccard") < 0.99).count() === 0)
  }

  test("minhash dedup removes the shifted copies") {
    val out = Dedup.minHashDedup(doubled, "text", "doc_id", threshold = 0.99)
    assert(out.count() === docs.count())
    assert(out.filter(col("doc_id") >= 1000000).count() === 0)
  }

  test("simhash pairs: exact duplicates at hamming 0") {
    val pairs = Dedup.simHashPairs(doubled, "text", "doc_id", maxHamming = 0)
    assert(pairs.filter(col("id_b") === col("id_a") + 1000000).count() === docs.count())
  }

  test("brute-force topK: k neighbors per query, descending cosine") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3),
      "embedding", "vec_id", k = 4).cache()
    assert(out.count() === 12)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() === 0)
    // rank 1 has the max cosine within each query group
    val viol = out.alias("x").join(out.alias("y"),
      col("x.query_id") === col("y.query_id") &&
        (col("x.rank") < col("y.rank")) && (col("x.cosine") < col("y.cosine")))
      .count()
    assert(viol === 0)
  }

  test("melt/widen round-trip") {
    val base = Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size").limit(50)
    val long = Reshape.melt(base, Seq("p_partkey"),
      Seq("p_retailprice", "p_size"), castTo = "double")
    assert(long.count() === 100)
    val wide = Reshape.widen(long, Seq("p_partkey"), "column", "value",
      Seq("p_retailprice", "p_size"))
    val diff = wide.alias("w").join(base.alias("b"), Seq("p_partkey"))
      .filter(col("w.p_retailprice") =!= col("b.p_retailprice") ||
        col("w.p_size") =!= col("b.p_size").cast("double")).count()
    assert(diff === 0)
  }

  test("merge: right side wins on common columns, outer rows kept") {
    import spark.implicits._
    val a = Seq((1, "a1", 10.0), (2, "a2", 20.0)).toDF("k", "name", "v")
    val b = Seq((2, 99.0), (3, 42.0)).toDF("k", "v")
    val m = Reshape.merge(a, b, "k").orderBy("k").collect()
    assert(m.length === 3)
    assert(m(1).getAs[Double]("v") === 99.0) // b overrides k=2
    assert(m(0).getAs[Double]("v") === 10.0) // a-only row survives
    assert(m(2).getAs[Double]("v") === 42.0) // b-only row survives
    assert(m(2).getAs[String]("name") === null)
  }

  test("statsTable counts: first occurrence has zero trials") {
    val out = StatsTable.counts(Tables.events(spark, sf), "event_type",
      col("value") > 100, "event_id")
    val firsts = out.groupBy(col("event_type"))
      .agg(min(col("event_id")).as("event_id"))
      .join(out, Seq("event_type", "event_id"))
    assert(firsts.filter(col("st_trials") =!= 0).count() === 0)
    // trials = rank within type - 1
    val bad = out.withColumn("rk",
      rank().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("event_id"))))
      .filter(col("st_trials") =!= col("rk") - 1).count()
    assert(bad === 0)
  }

  test("modulo sample is a strict deterministic subset") {
    val li = Tables.lineitem(spark, sf)
    val s1 = Reshape.moduloSample(li, "l_orderkey", 97, 5)
    val c1 = s1.count()
    assert(c1 > 0 && c1 < li.count())
    assert(s1.count() === c1) // deterministic across evaluations
  }
}
