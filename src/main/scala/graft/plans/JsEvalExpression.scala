package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

import graft.js.JsInterp
import graft.js.JsInterp._

/** `jseval('<js>', '<arg names>', args...)` — run a JavaScript snippet
  * per row (reference: `builtin/js/js_function.cc:117-226`, doc
  * `ValueExpression.md:779-839`; the reference embeds V8, we interpret
  * the [[graft.js.JsInterp]] ES5 subset).
  *
  * The reference's jseval is dynamically typed; Catalyst needs a static
  * type, so the surface is four variants:
  *   - `jseval`      → scalar results read as their plain atom text
  *                     (a string result is the string itself, NOT its
  *                     JSON quoting — MLDB-1323 names rows with one);
  *                     objects and arrays encode as JSON — pair with
  *                     the engine's JSON accessors to decompose,
  *   - `jseval_num`  → ToNumber of the result (double),
  *   - `jseval_str`  → ToString of the result (string),
  *   - `jseval_bool` → ToBoolean of the result (boolean).
  *
  * Scale: the script is parsed ONCE per executor (transient lazy), not
  * per row; evaluation is a tight AST walk with a step budget, so a
  * hostile/runaway script fails the task with a clear error instead of
  * hanging an executor core. Arguments arrive as plain JS values:
  * atoms → number/string/bool, arrays → Array, maps/structs → Object,
  * timestamps → epoch milliseconds (the JS Date convention).
  */
case class JsEval(script: String, argNames: Seq[String],
    args: Seq[Expression], mode: String)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = args
  override def nullable: Boolean = true
  override def prettyName: String =
    if (mode == "json") "jseval" else s"jseval_$mode"

  override def dataType: DataType = mode match {
    case "num" => DoubleType
    case "bool" => BooleanType
    case _ => StringType
  }

  // parse once per executor; not serialized with the expression
  @transient private lazy val program =
    try JsInterp.compile(script)
    catch {
      // the reference's compile-error shape (MLDB-723:
      // "Exception compiling")
      case e: Exception => throw new IllegalArgumentException(
        s"Exception compiling jseval script: ${e.getMessage}", e)
    }

  override def eval(input: InternalRow): Any = {
    val jsArgs = args.map(e => JsEval.toJs(e.eval(input), e.dataType))
    val result =
      try JsInterp.run(program, argNames, jsArgs)
      catch {
        case e: JsError => throw new IllegalArgumentException(
          s"jseval script threw exception: ${toStr(e.value)}", e)
      }
    mode match {
      case "num" => JsInterp.toNum(result)
      case "str" => UTF8String.fromString(toStr(result))
      case "bool" => JsInterp.toBool(result)
      case _ => result match {
        // atoms read as their plain value — the reference's jseval
        // returns a typed CellValue, not JSON text; only structural
        // results need the JSON encoding
        case JsStr(s) => UTF8String.fromString(s)
        case JsNull | JsUndef => null
        case _: JsNum | _: JsBool =>
          jsonStringify(result).map(UTF8String.fromString).orNull
        case _ => jsonStringify(result).map(UTF8String.fromString).orNull
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): JsEval = copy(args = newChildren)
}

object JsEval {

  /** Catalyst internal value → JS value, driven by the static type. */
  def toJs(v: Any, dt: DataType): JsVal = {
    if (v == null) return JsNull
    dt match {
      case StringType => JsStr(v.toString)
      case ByteType | ShortType | IntegerType =>
        JsNum(v.asInstanceOf[Number].doubleValue())
      case LongType => JsNum(v.asInstanceOf[Long].toDouble)
      case FloatType => JsNum(v.asInstanceOf[Float].toDouble)
      case DoubleType => JsNum(v.asInstanceOf[Double])
      case _: DecimalType =>
        JsNum(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
      case BooleanType => JsBool(v.asInstanceOf[Boolean])
      case TimestampType | TimestampNTZType =>
        JsNum(v.asInstanceOf[Long] / 1000.0) // micros → JS epoch millis
      case DateType =>
        JsNum(v.asInstanceOf[Int].toDouble * 86400000.0)
      case ArrayType(et, _) =>
        val ad = v.asInstanceOf[ArrayData]
        val out = mutable.ArrayBuffer.empty[JsVal]
        var i = 0
        while (i < ad.numElements()) {
          out += (if (ad.isNullAt(i)) JsNull else toJs(ad.get(i, et), et))
          i += 1
        }
        new JsArrV(out)
      case MapType(kt, vt, _) =>
        val md = v.asInstanceOf[MapData]
        val m = mutable.LinkedHashMap.empty[String, JsVal]
        val ks = md.keyArray()
        val vs = md.valueArray()
        var i = 0
        while (i < md.numElements()) {
          val k = toStr(toJs(ks.get(i, kt), kt))
          m(k) = if (vs.isNullAt(i)) JsNull else toJs(vs.get(i, vt), vt)
          i += 1
        }
        new JsObjV(m)
      case st: StructType =>
        // MLDB rows carry only PRESENT cells — a null field means "no
        // cell", so it is OMITTED from the JS object (MLDB-704:
        // Object.keys({*}).length counts recorded cells)
        val row = v.asInstanceOf[InternalRow]
        val m = mutable.LinkedHashMap.empty[String, JsVal]
        st.fields.zipWithIndex.foreach { case (f, i) =>
          if (!row.isNullAt(i))
            m(f.name) = toJs(row.get(i, f.dataType), f.dataType)
        }
        new JsObjV(m)
      case BinaryType =>
        val bytes = v.asInstanceOf[Array[Byte]]
        new JsArrV(mutable.ArrayBuffer.from(
          bytes.map(b => JsNum((b & 0xFF).toDouble): JsVal)))
      case other => throw new IllegalArgumentException(
        s"jseval: unsupported argument type $other")
    }
  }

  /** Shared builder for the SQL registrations: first two args must be
    * string literals (the script and the comma-separated arg names). */
  def build(mode: String, es: Seq[Expression]): JsEval = {
    def strLit(e: Expression, what: String): String =
      if (e.foldable && e.dataType == StringType) {
        val v = e.eval(InternalRow.empty)
        if (v == null) throw new IllegalArgumentException(
          s"jseval: $what must not be NULL")
        v.toString
      } else throw new IllegalArgumentException(
        s"jseval: $what must be a string literal")
    if (es.length < 2) throw new IllegalArgumentException(
      "jseval needs (script, argNames, args...)")
    val script = strLit(es.head, "the script (first argument)")
    val names = strLit(es(1), "the argument-name list (second argument)")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    JsEval(script, names, es.drop(2), mode)
  }
}
