package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes an sf1 (≈10× sf0.1) copy of the driver's test tables
  * for the SCALING.md rehearsal — the round-14 ask: measure the heavy
  * operators' time-vs-sf curve instead of arguing scale structurally.
  *
  * Construction: each fact table is replicated `factor` times with
  * REPLICA-SHIFTED keys (key + r·10^8), so referential integrity,
  * per-key densities and group-size distributions are preserved
  * exactly — the realistic scale-out where a corpus grows by MORE
  * groups, not fatter groups:
  *
  *  - `documents.text` is token-salted per replica (`tok` → `tok_r`),
  *    keeping each replica's near-dup cluster structure intact while
  *    making clusters disjoint ACROSS replicas — cluster count scales
  *    10×, cluster size stays constant (replica 0 byte-identical to
  *    the source);
  *  - `embeddings.embedding` gets a replica-indexed component offset,
  *    so within-replica neighbor structure is preserved and replicas
  *    are far apart in cosine space;
  *  - dimension tables (`region`, `nation`) are copied as-is.
  *
  * Usage: `runMain graft.ScaleUp [srcDir destDir factor]`
  * (defaults: /root/testdata/sf0.1 → target/scaling/sf1 ×10).
  */
object ScaleUp {
  private val Step = 100000000L // replica key shift; >> any sf0.1 key

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/scaling/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    // one row per (source row, replica), hidden column __r
    def replicate(df: DataFrame): DataFrame =
      df.withColumn("__r",
        explode(array((0 until factor).map(r => lit(r.toLong)): _*)))
    def shifted(c: String): Column = col(c) + col("__r") * Step
    def write(df: DataFrame, name: String, files: Int): Unit = {
      df.drop("__r").repartition(files)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"$name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // dimensions: copy untouched
    Seq("region", "nation").foreach(n => write(tbl(n), n, 1))

    write(replicate(tbl("customer"))
      .withColumn("c_custkey", shifted("c_custkey")), "customer", 4)
    write(replicate(tbl("supplier"))
      .withColumn("s_suppkey", shifted("s_suppkey")), "supplier", 2)
    write(replicate(tbl("part"))
      .withColumn("p_partkey", shifted("p_partkey")), "part", 4)
    write(replicate(tbl("orders"))
      .withColumn("o_orderkey", shifted("o_orderkey"))
      .withColumn("o_custkey", shifted("o_custkey")), "orders", 8)
    write(replicate(tbl("lineitem"))
      .withColumn("l_orderkey", shifted("l_orderkey"))
      .withColumn("l_partkey", shifted("l_partkey"))
      .withColumn("l_suppkey", shifted("l_suppkey")), "lineitem", 16)
    write(replicate(tbl("events"))
      .withColumn("event_id", shifted("event_id"))
      .withColumn("user_id", shifted("user_id")), "events", 16)

    // documents: replica 0 byte-identical; others token-salted so
    // near-dup clusters stay within a replica ("$1_" then a non-digit
    // separator keeps the group reference unambiguous)
    val docs = replicate(tbl("documents"))
      .withColumn("doc_id", shifted("doc_id"))
      .withColumn("text",
        when(col("__r") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), col("__r")))))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs, "documents", 8)

    // embeddings: push replica r by r·0.9 along component (r mod dim)
    val emb = replicate(tbl("embeddings"))
      .withColumn("vec_id", shifted("vec_id"))
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x + when(i.cast("long") === pmod(col("__r"),
              size(col("embedding")).cast("long")),
            col("__r").cast("float") * lit(0.9f))
            .otherwise(lit(0.0f))).cast("float")))
    write(emb, "embeddings", 4)

    spark.stop()
  }
}
