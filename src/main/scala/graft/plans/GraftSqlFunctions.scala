package graft.plans

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Registers graft's native expressions in a session's function
  * registry so they are callable from plain `spark.sql(...)` — the
  * interop path (`GraftEngine.sparkSql`) then exposes the engine's
  * hot-loop expressions next to Spark's builtins, the same integration
  * a SparkSessionExtensions jar would provide at cluster submit time. */
object GraftSqlFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  def registerAll(spark: SparkSession): Unit = {
    GraftColumnBridge.registerFunction(spark, "graft_porter_stem",
      es => PorterStem(es.head))
    GraftColumnBridge.registerFunction(spark, "graft_simhash64",
      es => SimHash64(es.head))
    GraftColumnBridge.registerFunction(spark, "graft_shingle_hashes",
      es => ShingleHashes(es(0), intLit(es(1), "shingle width n")))
    GraftColumnBridge.registerFunction(spark, "graft_minhash_sig",
      es => MinHashSig(es(0), intLit(es(1), "signature length k")))
    GraftColumnBridge.registerFunction(spark, "graft_nfc_normalize",
      es => NfcNormalize(es.head))
    GraftColumnBridge.registerFunction(spark, "graft_deflate_ratio",
      es => DeflateRatio(es(0),
        if (es.length > 1) intLit(es(1), "deflate level") else 6))
    GraftColumnBridge.registerFunction(spark, "jseval",
      es => JsEval.build("json", es))
    GraftColumnBridge.registerFunction(spark, "jseval_num",
      es => JsEval.build("num", es))
    GraftColumnBridge.registerFunction(spark, "jseval_str",
      es => JsEval.build("str", es))
    GraftColumnBridge.registerFunction(spark, "jseval_bool",
      es => JsEval.build("bool", es))
  }
}
