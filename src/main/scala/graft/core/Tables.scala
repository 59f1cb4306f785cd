package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access over the driver-generated parquet directories.
  *
  * MLDB datasets (reference: `/root/reference/core/dataset.h:397`) are
  * schema-less sparse matrices; our engine standardizes on typed,
  * columnar Parquet-backed DataFrames (the "wide" mode of SURVEY.md
  * §1.4) — the same decision the reference's own `tabular` dataset
  * makes (`/root/reference/plugins/tabular/tabular_dataset.cc:2681`).
  *
  * Scale note: every loader returns a lazily-planned scan. Catalyst
  * pushes filters/projections into the Parquet reader, so callers can
  * compose freely — nothing is materialized here. On a real cluster the
  * same paths would be a partitioned table / Delta location; no code
  * here assumes single-node layout.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session settings we need regardless of who built the session.
    * - ANSI off: MLDB arithmetic never errors (overflow wraps, bad cast
    *   → NULL — `/root/reference/sql/cell_value.h` semantics); we also
    *   use wrapping Long arithmetic for rolling hashes/minhash.
    * - UTC: oracle (DuckDB) parity for all timestamp functions.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.ts is INT64 TIMESTAMP(NANOS) which Spark's vectorized
    // parquet reader rejects; read the raw long and convert ourselves
    // (see events()).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Let pass-through predicates keep reaching the scan past graft's
    // Opaque optimizer barrier (see plans.PushThroughOpaque).
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.PushThroughOpaque))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.PushThroughOpaque
    spark
  }

  def load(spark: SparkSession, dir: String, table: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$dir/$table.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped in two physical layouts across testdata
    * generations: INT64 TIMESTAMP(NANOS) (read as a raw long via
    * nanosAsLong — see tune()) and native TIMESTAMP(MICROS) (read as
    * TIMESTAMP_NTZ). Normalize both to a microsecond TimestampType:
    * - long nanos → integral `div 1000` (double math would lose
    *   precision above 2^53 ns; floor matches DuckDB's epoch_us),
    * - NTZ → cast (identity on the micros value in the UTC session). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        // `div` truncates toward zero; subtracting pmod first gives
        // true floor division, so (hypothetical) pre-epoch nanos would
        // still match DuckDB's epoch_us flooring bit-for-bit
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
