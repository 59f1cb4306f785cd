package graft.api

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal flat-JSON-object parser for the single-row function
  * application path: `{"a": 1, "b": "x", "v": [1.0, 2.0]}` →
  * (schema, Row) entirely on the driver. `spark.read.json` launches a
  * Spark job per call just to infer the schema — the difference
  * between ~30 and thousands of scoring calls per second (the
  * reference claims "thousands of calls per second" on its lock-free
  * application route, BASELINE.md). Applying the function to a
  * `createDataFrame`-local relation keeps pure-Column functions inside
  * Catalyst's ConvertToLocalRelation fold: the whole application
  * executes driver-side with zero jobs.
  *
  * Supported (mirrors what read.json infers for flat rows): string,
  * long, double, boolean, null, arrays of numbers/strings. Nested
  * objects are out of scope for the single-row route (the reference's
  * application input is a flat row too).
  */
object JsonRow {

  def parseFlat(json: String): (StructType, Row) = {
    val p = new P(json)
    p.ws()
    p.expect('{')
    val names = Seq.newBuilder[StructField]
    val values = Seq.newBuilder[Any]
    p.ws()
    if (p.peek() == '}') { p.next() }
    else {
      var more = true
      while (more) {
        p.ws()
        val key = p.string()
        p.ws(); p.expect(':'); p.ws()
        val (dt, v) = p.value()
        names += StructField(key, dt)
        values += v
        p.ws()
        p.next() match {
          case ',' => ()
          case '}' => more = false
          case c => throw bad(s"expected ',' or '}', got '$c'")
        }
      }
    }
    (StructType(names.result()), Row.fromSeq(values.result()))
  }

  /** A scalar script/procedure result as a JSON value. */
  def scalarJson(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => n.toString
    case n: Double => n.toString
    case other =>
      "\"" + String.valueOf(other).replace("\\", "\\\\")
        .replace("\"", "\\\"").replace("\n", "\\n") + "\""
  }

  private def bad(msg: String) = new IllegalArgumentException(s"bad json: $msg")

  private final class P(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def peek(): Char = if (i < s.length) s.charAt(i) else throw bad("truncated")
    def next(): Char = { val c = peek(); i += 1; c }
    def expect(c: Char): Unit = {
      val g = next(); if (g != c) throw bad(s"expected '$c', got '$g'")
    }

    def string(): String = {
      expect('"')
      val sb = new StringBuilder
      var done = false
      while (!done) next() match {
        case '"' => done = true
        case '\\' => next() match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
          case 'b' => sb += '\b'; case 'f' => sb += '\f'
          case 'u' =>
            val hex = s.substring(i, i + 4); i += 4
            sb += Integer.parseInt(hex, 16).toChar
          case other => sb += other // \" \\ \/
        }
        case c => sb += c
      }
      sb.toString
    }

    private def number(): (DataType, Any) = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      val t = s.substring(start, i)
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) (DoubleType, t.toDouble)
      else (LongType, t.toLong)
    }

    private def literal(lit: String, dt: DataType, v: Any): (DataType, Any) = {
      if (!s.startsWith(lit, i)) throw bad(s"expected $lit")
      i += lit.length
      (dt, v)
    }

    def value(): (DataType, Any) = peek() match {
      case '"' => (StringType, string())
      case 't' => literal("true", BooleanType, true)
      case 'f' => literal("false", BooleanType, false)
      case 'n' => literal("null", StringType, null)
      case '[' => array()
      case '{' => obj()
      case _ => number()
    }

    /** nested object → struct (the reference's row-valued function
      * arguments: `input={"row": {"x": .5}}` — MLDB-805). */
    private def obj(): (DataType, Any) = {
      expect('{')
      ws()
      val fields = Seq.newBuilder[StructField]
      val values = Seq.newBuilder[Any]
      if (peek() == '}') next()
      else {
        var more = true
        while (more) {
          ws()
          val key = string()
          ws(); expect(':'); ws()
          val (dt, v) = value()
          fields += StructField(key, dt)
          values += v
          ws()
          next() match {
            case ',' => ()
            case '}' => more = false
            case c => throw bad(s"expected ',' or '}', got '$c'")
          }
        }
      }
      (StructType(fields.result()), Row.fromSeq(values.result()))
    }

    private def array(): (DataType, Any) = {
      expect('[')
      ws()
      val elems = Seq.newBuilder[(DataType, Any)]
      if (peek() == ']') next()
      else {
        var more = true
        while (more) {
          ws()
          elems += value()
          ws()
          next() match {
            case ',' => ()
            case ']' => more = false
            case c => throw bad(s"expected ',' or ']', got '$c'")
          }
        }
      }
      val es = elems.result()
      // element type like read.json: any double → array<double> (longs
      // widen); any string → array<string>; empty → array<string>.
      // An array of OBJECTS is the dialect's row-of-rows — a struct
      // with index-named fields, each keeping its own element schema
      // (MLDB-2022's rowsToScore: [{x,y}, {a,b,c}] pivots per field).
      if (es.exists(_._1.isInstanceOf[StructType]))
        (StructType(es.zipWithIndex.map { case ((dt, _), i) =>
          StructField(i.toString, dt) }),
          Row.fromSeq(es.map(_._2)))
      else if (es.isEmpty) (ArrayType(StringType), Seq.empty[String])
      else if (es.exists(_._1 == StringType))
        (ArrayType(StringType), es.map(e => String.valueOf(e._2)))
      else if (es.exists(_._1 == DoubleType))
        (ArrayType(DoubleType), es.map(_._2 match {
          case l: Long => l.toDouble
          case d: Double => d
          case other => throw bad(s"non-numeric in numeric array: $other")
        }))
      else (ArrayType(LongType), es.map(_._2))
    }
  }
}
