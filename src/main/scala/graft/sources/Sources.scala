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

  /** `import.sentiwordnet`
    * (`/root/reference/plugins/nlp/sentiwordnet.cc:85-170`): parse a
    * SentiWordNet 3.0 data file — lines
    * `POS\tID\tPosScore\tNegScore\tterm#rank term#rank…\tgloss` —
    * into one row per `word#pos` with scores averaged across the
    * word's synsets weighted by 1/senseRank (the reference's
    * no-disambiguation weighting, including SentiObj = 1 - pos - neg
    * per synset BEFORE averaging). Fully distributed: text scan →
    * explode(terms) → one groupBy on the word key; the lexicon-sized
    * result is broadcastable downstream. */
  def importSentiWordNet(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val lines = spark.read.text(path)
      .filter(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
    val f = split(col("value"), "\t")
    val parsed = lines.select(
      f.getItem(0).as("pos"),
      f.getItem(2).cast("double").as("p"),
      f.getItem(3).cast("double").as("n"),
      split(f.getItem(4), " ").as("terms"))
      .filter(col("p").isNotNull && col("n").isNotNull)
      .withColumn("o", lit(1.0) - col("p") - col("n"))
      .select(col("pos"), col("p"), col("n"), col("o"),
        explode(col("terms")).as("term"))
      .select(col("pos"), col("p"), col("n"), col("o"),
        substring_index(col("term"), "#", 1).as("baseWord"),
        substring_index(col("term"), "#", -1).cast("int").as("rank"))
      .filter(col("rank").isNotNull && col("rank") > 0)
    parsed
      .groupBy(concat(col("baseWord"), lit("#"), col("pos")).as("rowName"))
      .agg(
        (sum(col("p") / col("rank")) / sum(lit(1.0) / col("rank"))).as("SentiPos"),
        (sum(col("n") / col("rank")) / sum(lit(1.0) / col("rank"))).as("SentiNeg"),
        (sum(col("o") / col("rank")) / sum(lit(1.0) / col("rank"))).as("SentiObj"),
        first(col("pos")).as("POS"),
        first(col("baseWord")).as("baseWord"))
  }

  /** Document-level sentiment via the imported lexicon: average the
    * (SentiPos, SentiNeg, SentiObj) of every matched token, across
    * POS variants (no disambiguation — same divergence as the
    * reference importer documents). Lexicon broadcasts; only the
    * (doc, token) stream shuffles on the doc id. */
  def docSentiment(docs: DataFrame, idCol: String, textCol: String,
      lexicon: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val words = lexicon.groupBy(col("baseWord"))
      .agg(avg(col("SentiPos")).as("wp"), avg(col("SentiNeg")).as("wn"),
        avg(col("SentiObj")).as("wo"))
    docs.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("baseWord"))
      .join(org.apache.spark.sql.functions.broadcast(words), Seq("baseWord"))
      .groupBy(col("doc_id"))
      .agg(avg(col("wp")).as("SentiPos"), avg(col("wn")).as("SentiNeg"),
        avg(col("wo")).as("SentiObj"), count(lit(1)).as("n_matched"))
  }
}
