package graft.queries

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.ml.Models
import graft.procedures.Procedures
import graft.sources.Sources

/** Procedure-layer queries: import/export round-trips (the
  * import.text / import.json / export.csv surface), summary
  * statistics, deterministic split, and ML training procedures.
  *
  * The import queries are true end-to-end round-trips: export the
  * driver table to CSV/JSON under /tmp, re-import through the Sources
  * layer, aggregate — and the oracle computes the same aggregate from
  * the original parquet, so any quoting/typing/row-loss bug in either
  * direction breaks the hash match.
  */
object ProcedureQueries {

  private def tmpDir(d: String, tag: String): String =
    s"/tmp/graft_roundtrip_${tag}_${math.abs(d.hashCode)}"

  val all: Seq[QueryDef] = Seq(

    // --- import.text / export.csv round-trip ---
    QueryDef("q51_csv_roundtrip",
      """SELECT lang, count(*) AS n,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_id
        |FROM documents GROUP BY lang""".stripMargin) { (s, d) =>
      val path = tmpDir(d, "csv")
      Sources.exportCsv(
        Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
        path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType)))
      Sources.importText(s, path,
        Sources.TextImportConfig(schema = Some(schema)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("text"))).cast("long").as("total_chars"),
          min(col("doc_id")).cast("long").as("min_id"))
    },

    // --- import.json round-trip ---
    QueryDef("q52_json_roundtrip",
      """SELECT source, count(*) AS n,
        |  round(avg(n_chars), 6) AS avg_chars
        |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      val path = tmpDir(d, "json")
      Sources.exportJson(
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars")),
        path)
      Sources.importJson(s, path)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), round(avg(col("n_chars")), 6).as("avg_chars"))
    },

    // --- summary.statistics procedure ---
    QueryDef("q53_summary_stats",
      """SELECT column_name, stat, round(value, 4) AS value FROM (
        |  SELECT 'l_quantity' AS column_name, 'count' AS stat,
        |         CAST(count(l_quantity) AS DOUBLE) AS value FROM lineitem
        |  UNION ALL SELECT 'l_quantity', 'min', min(l_quantity) FROM lineitem
        |  UNION ALL SELECT 'l_quantity', 'max', max(l_quantity) FROM lineitem
        |  UNION ALL SELECT 'l_quantity', 'avg', avg(l_quantity) FROM lineitem
        |  UNION ALL SELECT 'l_quantity', 'std', stddev_samp(l_quantity) FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', 'count',
        |         CAST(count(l_extendedprice) AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', 'min', min(l_extendedprice) FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', 'max', max(l_extendedprice) FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', 'avg', avg(l_extendedprice) FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', 'std', stddev_samp(l_extendedprice) FROM lineitem
        |) t""".stripMargin) { (s, d) =>
      Procedures.summaryStatistics(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice"))
        .filter(col("stat") =!= "p50") // approx quantile has no exact oracle
        .select(col("column_name"), col("stat"), round(col("value"), 4).as("value"))
    },

    // --- deterministic cross-engine split (md5 first hex digit) ---
    QueryDef("q54_split",
      """SELECT 'test' AS fold, count(*) AS n,
        |  CAST(sum(o_custkey) AS BIGINT) AS key_sum
        |FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1','2')
        |UNION ALL
        |SELECT 'train' AS fold, count(*) AS n,
        |  CAST(sum(o_custkey) AS BIGINT) AS key_sum
        |FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) NOT IN ('0','1','2')""".stripMargin) { (s, d) =>
      val (train, test) = Procedures.splitMd5(Tables.orders(s, d), "o_orderkey")
      val a = train.agg(count(lit(1)).as("n"), sum("o_custkey").as("key_sum"))
        .select(lit("train").as("fold"), col("n"), col("key_sum"))
      val b = test.agg(count(lit(1)).as("n"), sum("o_custkey").as("key_sum"))
        .select(lit("test").as("fold"), col("n"), col("key_sum"))
      a.unionByName(b)
    },

    // --- kmeans.train + cluster assignment (rows-only: iterative init) ---
    QueryDef.rowsOnly("q55_kmeans") { (s, d) =>
      val km = Models.kmeansTrain(Tables.embeddings(s, d), "embedding", k = 8)
      km(Tables.embeddings(s, d))
        .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
    },

    // --- classifier.train/test: binary label from embedding label ---
    QueryDef.rowsOnly("q56_classifier") { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .withColumn("y", (col("label") >= 5).cast("double"))
        .withColumn("f", col("embedding").cast("array<double>"))
      val feats = (0 until 16).map(i => s"f_$i")
      val wide = feats.zipWithIndex.foldLeft(emb) { case (df, (c, i)) =>
        df.withColumn(c, element_at(col("f"), i + 1))
      }
      val (train, test) = Procedures.split(wide, "vec_id", 0.3)
      val model = Models.classifierTrain(train, feats, "y", "glz")
      val (auc, acc) = Models.classifierTest(model, test, "y")
      val s2 = s
      import s2.implicits._
      Seq(("auc", auc), ("accuracy", acc)).toDF("metric", "value")
    },

    // --- svd.train / embedRow: project embeddings to 8 dims ---
    QueryDef.rowsOnly("q57_svd") { (s, d) =>
      val svd = Models.svdTrain(Tables.embeddings(s, d), "embedding", k = 8)
      svd(Tables.embeddings(s, d)).select(col("vec_id"), col("svd"))
    },

    // --- tfidf.train + apply ---
    QueryDef.rowsOnly("q58_tfidf") { (s, d) =>
      val m = Models.tfidfTrain(Tables.documents(s, d), "text")
      m.transform(Tables.documents(s, d)).select(col("doc_id"), col("tfidf"))
    })
}
