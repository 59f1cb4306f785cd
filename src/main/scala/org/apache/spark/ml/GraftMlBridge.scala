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
}
