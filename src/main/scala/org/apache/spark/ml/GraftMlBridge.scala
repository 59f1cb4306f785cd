package org.apache.spark.ml

import org.apache.spark.ml.tree.LeafNode

/** Accessor for tree-leaf class-count statistics, `private[ml]` in
  * Spark. The reference's `update_alg: prob` decision trees score a
  * row by its leaf's CLASS DISTRIBUTION
  * (`/root/reference/plugins/jml/jml/decision_tree.cc` leaf
  * probabilities), so the dialect `classifier` function entity needs
  * the per-leaf counts to build its plan-literal probability
  * expressions. Same technique as [[org.apache.spark.sql.GraftColumnBridge]].
  */
object GraftMlBridge {
  /** Per-class observation counts at a leaf (length = numClasses for
    * classification trees). */
  def leafClassCounts(n: LeafNode): Array[Double] =
    n.impurityStats.stats.clone()

  /** Construct a LinearRegressionModel from driver-computed
    * coefficients (the constructor is `private[ml]`). Used by the
    * normal-equations OLS path in [[graft.ml.Models.regressionTrain]] —
    * the closed form IS what MLlib's WLS "normal" solver computes, but
    * via one codegen'd SQL aggregate instead of two row-object passes
    * (the instance treeAggregate + the training-summary job). */
  def linearRegressionModel(coefficients: Array[Double], intercept: Double,
      labelCol: String, featuresCol: String)
      : org.apache.spark.ml.regression.LinearRegressionModel = {
    val m = new org.apache.spark.ml.regression.LinearRegressionModel(
      org.apache.spark.ml.util.Identifiable.randomUID("linReg"),
      org.apache.spark.ml.linalg.Vectors.dense(coefficients), intercept)
    m.set(m.labelCol, labelCol)
    m.set(m.featuresCol, featuresCol)
    m.set(m.predictionCol, "prediction")
    m
  }

  /** Assemble a PipelineModel from already-fitted transformer stages
    * (the constructor is `private[ml]`). */
  def pipelineModel(stages: Array[Transformer]): PipelineModel =
    new PipelineModel(
      org.apache.spark.ml.util.Identifiable.randomUID("pipeline"), stages)

  /** Set the example-weight column on any estimator that supports one
    * (`HasWeightCol` is `private[ml]`). The reference's
    * `classifier.train` accepts an optional `weight` sub-select
    * (`plugins/jml/classifier.cc:281-282`); this is the MLlib hook for
    * the same semantics. Returns true iff the estimator took it. */
  def setWeightCol(est: PipelineStage, colName: String): Boolean = est match {
    case w: org.apache.spark.ml.param.shared.HasWeightCol =>
      w.set(w.weightCol, colName); true
    case _ => false
  }
}
