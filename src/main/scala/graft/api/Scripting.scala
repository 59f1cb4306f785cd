package graft.api

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `script.run` — server-side scripting, the reference's
  * `builtin/script_procedure.cc:129` (it runs JavaScript inside the
  * engine; the host language here is Scala, the documented divergence
  * SURVEY §7.3 anticipated). A script is a Scala source snippet
  * evaluating to `(SparkSession, Map[String, Any]) => Any`, compiled
  * at runtime with the Scala toolbox and cached by source text, so
  * repeated runs pay compilation once.
  *
  * The returned value flows back to the caller (the reference returns
  * the script's JSON result); a script returning a DataFrame can be
  * registered as a dataset by the caller via `Engine.createDataset`.
  *
  * Trust model: identical to the reference — scripts are engine-side
  * code supplied by the operator, not sandboxed user input.
  */
object Scripting {

  type Script = (SparkSession, Map[String, Any]) => Any

  private val cache = new ConcurrentHashMap[String, Script]()

  /** Compile (or fetch from cache) and run a script source. */
  def run(spark: SparkSession, source: String,
      args: Map[String, Any] = Map.empty): Any =
    compile(source)(spark, args)

  def compile(source: String): Script = {
    val cached = cache.get(source)
    if (cached != null) cached
    else {
      val fn = {
        import scala.tools.reflect.ToolBox
        val tb = scala.reflect.runtime.universe
          .runtimeMirror(getClass.getClassLoader).mkToolBox()
        tb.eval(tb.parse(source)) match {
          case f: Script @unchecked => f
          case other => throw new IllegalArgumentException(
            "script must evaluate to (SparkSession, Map[String, Any]) => Any, " +
              s"got ${if (other == null) "null" else other.getClass.getName}")
        }
      }
      cache.putIfAbsent(source, fn)
      fn
    }
  }

  /** Convenience for scripts that produce a DataFrame. */
  def runQuery(spark: SparkSession, source: String,
      args: Map[String, Any] = Map.empty): DataFrame =
    run(spark, source, args) match {
      case df: DataFrame => df
      case other => throw new IllegalArgumentException(
        s"script returned ${if (other == null) "null" else other.getClass.getName}, not a DataFrame")
    }
}
