package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling entry — times plan variants for hot queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    import graft.core.Tables
    import graft.ml.Models
    import graft.procedures.Procedures

    val emb = Tables.embeddings(spark, d)
      .withColumn("y", (col("label") >= 5).cast("double"))
      .withColumn("f", col("embedding").cast("array<double>"))
    val feats = (0 until 16).map(i => s"f_$i")
    val wide = feats.zipWithIndex.foldLeft(emb) { case (df, (c, i)) =>
      df.withColumn(c, element_at(col("f"), i + 1))
    }
    val (train, test) = Procedures.split(wide, "vec_id", 0.3)

    // binary glz (existing q56)
    val glz = Models.classifierTrain(train, feats, "y", "glz")
    val (auc, acc) = Models.classifierTest(glz, test, "y")
    println(s"[probe] glz auc=$auc acc=$acc")

    // svm
    val svm = Models.classifierTrain(train, feats, "y", "svm")
    val (svmAuc, svmAcc) = Models.classifierTest(svm, test, "y")
    println(s"[probe] svm auc=$svmAuc acc=$svmAcc")

    // categorical glz on the 10-class label
    val wideCat = wide.withColumn("yc", col("label").cast("double"))
    val (trc, tec) = Procedures.split(wideCat, "vec_id", 0.3)
    val cat = Models.classifierTrainCategorical(trc, feats, "yc", "glz")
    val scored = cat.transform(tec)
    val catAcc = new org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator()
      .setLabelCol("yc").setPredictionCol("prediction").setMetricName("accuracy")
      .evaluate(scored)
    println(s"[probe] categorical glz acc=$catAcc nclasses=" +
      wideCat.select(countDistinct(col("yc"))).head.getLong(0))

    // regression slope/intercept vs closed form
    val li = Tables.lineitem(spark, d).select(
      col("l_quantity").cast("double").as("x"),
      col("l_extendedprice").cast("double").as("y"))
    val m = Models.regressionTrain(li, Seq("x"), "y", "glz")
    val lrm = m.stages.last
      .asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    val cf = li.select(
      (covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("slope"),
      (avg(col("y")) - covar_pop(col("x"), col("y")) / var_pop(col("x")) * avg(col("x"))).as("icept")).head
    println(s"[probe] ols spark=${lrm.coefficients(0)},${lrm.intercept} closed=${cf.getDouble(0)},${cf.getDouble(1)}")

    // kmeans cluster count
    val km = Models.kmeansTrain(Tables.embeddings(spark, d), "embedding", k = 8)
    val kdf = km(Tables.embeddings(spark, d)).groupBy(col("cluster")).count()
    println(s"[probe] kmeans clusters=${kdf.count()}")
    spark.stop()
  }
}
