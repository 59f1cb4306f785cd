package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File sources/sinks (SURVEY §2.7 import/export procedures).
  *
  * Mirrors the reference's `import.text` config surface
  * (`/root/reference/plugins/textual/importtext_procedure.cc:43-99`:
  * headers, delimiter, quoteChar, encoding, ignoreBadLines,
  * autoGenerateHeaders, limit/offset, select/where post-transforms)
  * onto `spark.read.csv` options. The reference's multithreaded
  * chunked parse (`forEachLineBlock :1321`) is exactly Spark's
  * splittable text reading — one partition per file split, schema
  * inference optional — so the parallelism comes for free and scales
  * past one node.
  */
object Sources {

  final case class TextImportConfig(
      delimiter: String = ",",
      quoteChar: String = "\"",
      encoding: String = "UTF-8",
      headers: Boolean = true,
      autoGenerateHeaders: Boolean = false,
      ignoreBadLines: Boolean = false,
      allowMultiLines: Boolean = false,
      limit: Option[Int] = None,
      offset: Int = 0,
      schema: Option[StructType] = None)

  /** `import.text` — CSV/TSV import. */
  def importText(spark: SparkSession, path: String,
      cfg: TextImportConfig = TextImportConfig()): DataFrame = {
    var r = spark.read
      .option("sep", cfg.delimiter)
      .option("quote", cfg.quoteChar)
      .option("encoding", cfg.encoding)
      .option("header", cfg.headers && !cfg.autoGenerateHeaders)
      .option("mode", if (cfg.ignoreBadLines) "DROPMALFORMED" else "FAILFAST")
      .option("multiLine", cfg.allowMultiLines)
    cfg.schema match {
      case Some(s) => r = r.schema(s)
      case None => r = r.option("inferSchema", true)
    }
    val df0 = r.csv(path)
    val df1 = if (cfg.autoGenerateHeaders) {
      // reference autoGenerateHeaders: columns named by position
      df0.toDF(df0.columns.indices.map(i => s"c$i"): _*)
    } else df0
    val df2 = if (cfg.offset > 0) df1.offset(cfg.offset) else df1
    cfg.limit.map(df2.limit).getOrElse(df2)
  }

  /** `import.json` — line-JSON import
    * (`plugins/textual/json_importer.cc:427`). */
  def importJson(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame =
    schema.map(spark.read.schema).getOrElse(spark.read).json(path)

  /** `export.csv` (`plugins/textual/csv_export_procedure.cc:238`). */
  def exportCsv(df: DataFrame, path: String, delimiter: String = ",",
      headers: Boolean = true, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("sep", delimiter).option("header", headers)
      .csv(path)

  /** JSON export (reference writes JSON over REST; as a file sink). */
  def exportJson(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)
}
