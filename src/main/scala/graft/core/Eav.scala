package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EAV (long/sparse) mode: the full-fidelity representation of MLDB's
  * 3-D sparse matrix (SURVEY §1.1/§1.4).
  *
  * A dataset is rows of `(rowName: string, column: string, value
  * variant, ts: timestamp)` — one row per CELL, so every cell keeps
  * its own timestamp and the same (rowName, column) may hold several
  * timestamped values (a superposition,
  * `/root/reference/sql/expression_value.h:1326,1343-1345`).
  *
  * The value variant is a struct of typed slots (num/str/ts/bool),
  * exactly one non-null — the typed-engine version of the reference's
  * 16-byte tagged `CellValue` (`sql/cell_value.h:50,534-541`).
  *
  * Scale shape: EAV tables shuffle on (rowName) for row
  * reconstruction and on (rowName, column) for temporal reads — both
  * standard hash partitions. `fromEav` (pivot) needs the column set,
  * supplied explicitly to avoid a discovery scan.
  */
object Eav {

  /** Wide → EAV: one output row per non-null cell. `tsCol` supplies
    * the cell timestamp (MLDB: every atom is timestamped; wide tables
    * have a single row timestamp — TabularDataset.md:33-35). */
  def toEav(df: DataFrame, rowNameCol: Column, tsCol: Column,
      cols: Seq[String]): DataFrame = {
    val cells = cols.map { c =>
      val dt = df.schema(c).dataType.typeName
      val slot = dt match {
        // DecimalType.typeName is "decimal(p,s)", so prefix-match it
        case "double" | "float" | "long" | "integer" | "short" | "byte" =>
          struct(col(c).cast("double").as("num"), lit(null).cast("string").as("str"),
            lit(null).cast("timestamp").as("tsv"), lit(null).cast("boolean").as("flag"))
        case d if d.startsWith("decimal") =>
          struct(col(c).cast("double").as("num"), lit(null).cast("string").as("str"),
            lit(null).cast("timestamp").as("tsv"), lit(null).cast("boolean").as("flag"))
        case "string" =>
          struct(lit(null).cast("double").as("num"), col(c).as("str"),
            lit(null).cast("timestamp").as("tsv"), lit(null).cast("boolean").as("flag"))
        case "timestamp" =>
          struct(lit(null).cast("double").as("num"), lit(null).cast("string").as("str"),
            col(c).as("tsv"), lit(null).cast("boolean").as("flag"))
        case "boolean" =>
          struct(lit(null).cast("double").as("num"), lit(null).cast("string").as("str"),
            lit(null).cast("timestamp").as("tsv"), col(c).as("flag"))
        case "binary" =>
          // a silent cast("string") would mangle the bytes (UTF-8
          // replacement) with no way back — binary payloads stay
          // BESIDE the EAV cells (the Multimodal contract) or get
          // base64-encoded explicitly by the caller
          throw new IllegalArgumentException(
            s"toEav: binary column '$c' has no EAV variant slot; " +
              "keep blobs beside the cells or base64-encode them first")
        case other =>
          struct(lit(null).cast("double").as("num"), col(c).cast("string").as("str"),
            lit(null).cast("timestamp").as("tsv"), lit(null).cast("boolean").as("flag"))
      }
      struct(lit(c).as("column"), slot.as("value"))
    }
    df.select(rowNameCol.cast("string").as("rowName"), tsCol.as("ts"),
      explode(array(cells: _*)).as("cell"))
      .select(col("rowName"), col("cell.column").as("column"),
        col("cell.value").as("value"), col("ts"))
      .filter(col("value.num").isNotNull || col("value.str").isNotNull ||
        col("value.tsv").isNotNull || col("value.flag").isNotNull)
  }

  /** The WHEN clause with per-cell fidelity: drop cell VALUES (not
    * rows) whose timestamp fails the predicate — the semantics of
    * `WhenExpression::filterInPlace`
    * (`/root/reference/sql/sql_expression.cc:4054-4109`). In EAV mode
    * this is a plain filter — exactly why the mode exists. */
  def whenFilter(eav: DataFrame, pred: Column => Column): DataFrame =
    eav.filter(pred(col("ts")))

  /** GET_LATEST read: collapse superpositions to the latest value per
    * (rowName, column) — `VariableFilter::LATEST`
    * (`sql/expression_value.h:61-100`). */
  def latest(eav: DataFrame): DataFrame =
    eav.groupBy(col("rowName"), col("column"))
      .agg(max_by(col("value"), col("ts")).as("value"), max(col("ts")).as("ts"))

  /** GET_EARLIEST read — `VariableFilter::EARLIEST`: collapse each
    * superposition to its FIRST-timestamped value. Same single
    * partial-aggregated shuffle as [[latest]]. */
  def earliest(eav: DataFrame): DataFrame =
    eav.groupBy(col("rowName"), col("column"))
      .agg(min_by(col("value"), col("ts")).as("value"), min(col("ts")).as("ts"))

  /** GET_RANGE read — `VariableFilter::BETWEEN`: keep only the values
    * of each superposition whose timestamp lies in [lo, hi] (both
    * inclusive, the reference's bound semantics). Stays in EAV form so
    * it composes with [[latest]]/[[earliest]]/[[temporalAgg]] — and it
    * is a pure filter, so it pushes to the scan. */
  def between(eav: DataFrame, lo: Column, hi: Column): DataFrame =
    eav.filter(col("ts") >= lo && col("ts") <= hi)

  /** GET_ALL read — `VariableFilter::ALL`: the whole superposition of
    * each cell as a ts-ordered array of (ts, value) — the
    * full-fidelity read the other filters collapse. */
  def allValues(eav: DataFrame): DataFrame =
    eav.groupBy(col("rowName"), col("column"))
      .agg(array_sort(collect_list(struct(col("ts"), col("value"))))
        .as("values"))

  /** EAV → wide for a known column set, reading LATEST per cell. */
  def fromEav(eav: DataFrame, columns: Seq[String]): DataFrame = {
    val l = latest(eav)
    val wide = l.groupBy(col("rowName"))
      .pivot("column", columns)
      .agg(first(col("value")))
    wide
  }

  /** `at(value, ts)` / `@` operator: re-timestamp cells
    * (`/root/reference/sql/builtin_functions.cc:1154`). In EAV mode
    * this is literal (set the ts column); the wide-mode equivalent is
    * a documented no-op. */
  def at(eav: DataFrame, newTs: Column): DataFrame =
    eav.withColumn("ts", newTs)

  /** distinct_timestamps (`sql/builtin_functions.cc:1120`): the
    * sorted distinct timeline of each cell. */
  def distinctTimestamps(eav: DataFrame): DataFrame =
    eav.groupBy(col("rowName"), col("column"))
      .agg(array_sort(collect_set(col("ts"))).as("timestamps"))

  /** Temporal aggregates: per (rowName, column) across the cell's
    * timeline — `temporal_min/max/sum/avg/count`
    * (`sql/builtin_functions.cc:1366-1467`). Numeric slots only. */
  def temporalAgg(eav: DataFrame): DataFrame =
    eav.groupBy(col("rowName"), col("column"))
      .agg(
        count(col("value.num")).as("temporal_count"),
        sum(col("value.num")).as("temporal_sum"),
        min(col("value.num")).as("temporal_min"),
        max(col("value.num")).as("temporal_max"),
        avg(col("value.num")).as("temporal_avg"),
        min(col("ts")).as("earliest_ts"),
        max(col("ts")).as("latest_ts"))
}
