package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.js.JsInterp
import graft.js.JsInterp._

/** Parser + evaluator coverage for the jseval ES5 subset, including
  * regression pins for the four round-4 review findings: the C-style
  * for-loop init rewind, the non-var for-in NoIn grammar, the in-band
  * NUL regex separator, and the compound shift-assignment gaps. */
class JsSpec extends AnyFunSuite {

  private def num(src: String, names: Seq[String] = Nil,
      args: Seq[JsVal] = Nil): Double =
    toNum(JsInterp.eval(src, names, args))
  private def str(src: String): String = toStr(JsInterp.eval(src))

  // ---- review finding 1: C-style for with non-var init
  test("for loop with non-var init parses and runs") {
    assert(num("var s = 0; var i; for (i = 0; i < 4; i++) { s += i; } s;") == 6)
  }

  test("for loop with comma init") {
    assert(num(
      "var i, j, s = 0; for (i = 0, j = 10; i < j; i++, j--) s++; s;") == 5)
  }

  // ---- review finding 2: non-var for-in
  test("non-var for-in over object keys") {
    assert(str(
      "var o = {a: 1, b: 2, c: 3}; var k; var out = ''; " +
        "for (k in o) { out += k; } out;") == "abc")
  }

  test("var for-in still works") {
    assert(num(
      "var o = {x: 5, y: 7}; var s = 0; for (var k in o) s += o[k]; s;") == 12)
  }

  test("for-in over member expression object") {
    assert(str(
      "var d = {inner: {p: 1, q: 2}}; var k; var out = ''; " +
        "for (k in d.inner) out += k; out;") == "pq")
  }

  // ---- review finding 3: regex literals (no in-band separator)
  test("regex literal with a space in the body") {
    assert(num("var r = /a b/; r.test('xa by') ? 1 : 0;") == 1)
  }

  test("regex literal flags survive") {
    assert(num("/AB/i.test('xaby') ? 1 : 0;") == 1)
    assert(str("var r = /x y/gi; r.source + '|' + r.flags;") == "x y|gi")
  }

  // ---- review finding 4: compound shift assignments
  test("shift compound assignments") {
    assert(num("var x = 1; x <<= 4; x;") == 16)
    assert(num("var x = 64; x >>= 3; x;") == 8)
    assert(num("var x = -1; x >>>= 28; x;") == 15)
  }

  // ---- operators and coercions
  test("arithmetic and string concat follow ES5 coercion") {
    assert(str("1 + '2';") == "12")
    assert(num("'3' * '4';") == 12)
    assert(num("'10' - 5;") == 5)
    assert(str("[1,2] + '';") == "1,2")
    assert(num("5 % 3;") == 2)
    assert(num("-7 % 3;") == -1) // fmod, not Euclidean
  }

  test("equality table") {
    assert(num("(null == undefined) ? 1 : 0;") == 1)
    assert(num("(null === undefined) ? 1 : 0;") == 0)
    assert(num("('1' == 1) ? 1 : 0;") == 1)
    assert(num("('1' === 1) ? 1 : 0;") == 0)
    assert(num("(NaN == NaN) ? 1 : 0;") == 0)
  }

  test("relational: string vs numeric comparison") {
    assert(num("('10' < '9') ? 1 : 0;") == 1) // string compare
    assert(num("(10 < '9') ? 1 : 0;") == 0)   // numeric compare
  }

  test("bitwise and ToInt32") {
    assert(num("(5 & 3) + (5 | 3) + (5 ^ 3);") == 14)
    assert(num("~5;") == -6)
    assert(num("1 << 10;") == 1024)
    assert(num("-8 >> 1;") == -4)
    assert(num("-1 >>> 0;") == 4294967295d)
  }

  test("typeof / in / instanceof") {
    assert(str("typeof 3;") == "number")
    assert(str("typeof 'x';") == "string")
    assert(str("typeof undefined;") == "undefined")
    assert(str("typeof null;") == "object")
    assert(str("typeof function(){};") == "function")
    assert(str("typeof notDeclared;") == "undefined")
    assert(num("('a' in {a: 1}) ? 1 : 0;") == 1)
    assert(num("(0 in [7]) ? 1 : 0;") == 1)
    assert(num("([1] instanceof Array) ? 1 : 0;") == 1)
  }

  // ---- control flow
  test("while / do-while / break / continue") {
    assert(num("var s = 0, i = 0; while (i < 10) { i++; " +
      "if (i % 2) continue; if (i > 6) break; s += i; } s;") == 12)
    assert(num("var n = 0; do { n++; } while (n < 3); n;") == 3)
  }

  test("switch with fallthrough and default") {
    val src = """
      function f(x) {
        var out = '';
        switch (x) {
          case 1: out += 'a';
          case 2: out += 'b'; break;
          case 3: out += 'c'; break;
          default: out += 'd';
        }
        return out;
      }
      f(1) + f(2) + f(3) + f(9);
    """
    assert(str(src) == "abbcd")
  }

  test("try/catch/finally and throw") {
    assert(str("var out = ''; try { throw new Error('boom'); } " +
      "catch (e) { out = e.message; } finally { out += '!'; } out;") == "boom!")
    assert(num("function f() { try { return 1; } finally { } } f();") == 1)
  }

  // ---- functions
  test("closures and recursion") {
    assert(num("""
      function counter() {
        var n = 0;
        return function() { n++; return n; };
      }
      var c = counter();
      c(); c(); c();
    """) == 3)
    assert(num(
      "function fib(n) { return n < 2 ? n : fib(n-1) + fib(n-2); } fib(10);")
      == 55)
  }

  test("hoisting: call before declaration") {
    assert(num("var r = f(2); function f(x) { return x * 10; } r;") == 20)
  }

  test("constructor functions with this") {
    assert(num("""
      function Point(x, y) { this.x = x; this.y = y; }
      var p = new Point(3, 4);
      Math.sqrt(p.x * p.x + p.y * p.y);
    """) == 5)
  }

  test("methods bind this; arguments object exists") {
    assert(num("var o = {v: 7, get: function() { return this.v; }}; o.get();")
      == 7)
    assert(num("function f() { return arguments.length; } f(1, 2, 3);") == 3)
  }

  // ---- stdlib
  test("Math basics are exact") {
    assert(num("Math.round(2.5);") == 3)
    assert(num("Math.round(-2.5);") == -2) // ES floor(x+0.5), not rint
    assert(num("Math.max(1, 9, 4);") == 9)
    assert(num("Math.pow(2, 10);") == 1024)
  }

  test("Math.random is deterministic across evaluations") {
    val a = JsInterp.eval("Math.random() + ',' + Math.random();")
    val b = JsInterp.eval("Math.random() + ',' + Math.random();")
    assert(toStr(a) == toStr(b))
  }

  test("string methods") {
    assert(str("'Hello World'.toUpperCase();") == "HELLO WORLD")
    assert(str("'a,b,,c'.split(',').join('|');") == "a|b||c")
    assert(num("'hello'.indexOf('ll');") == 2)
    assert(str("'  pad  '.trim();") == "pad")
    assert(str("'abcdef'.substring(4, 1);") == "bcd") // swapped args
    assert(str("'abcdef'.slice(-3);") == "def")
    assert(str("'a-b-c'.replace(/-/g, '+');") == "a+b+c")
    assert(str("'aXbXc'.replace('X', '_');") == "a_bXc") // first only
    assert(str("'john smith'.replace(/(\\w+) (\\w+)/, '$2 $1');")
      == "smith john")
    assert(str("'count 42 things'.match(/\\d+/)[0];") == "42")
  }

  test("array methods") {
    assert(num("[3, 1, 2].sort(function(a, b) { return a - b; })[0];") == 1)
    assert(str("[10, 9, 1].sort().join(',');") == "1,10,9") // default: string
    assert(num("[1, 2, 3, 4].filter(function(x) { return x % 2 == 0; })" +
      ".map(function(x) { return x * x; })" +
      ".reduce(function(a, b) { return a + b; }, 0);") == 20)
    assert(str("[1, 2, 3].slice(1).join('');") == "23")
    assert(num("var a = [1]; a.push(2, 3); a.length;") == 3)
    assert(num("[1, 2, 3].indexOf(2);") == 1)
    assert(str("var a = [1, 2, 3, 4]; a.splice(1, 2); a.join(',');") == "1,4")
  }

  test("JSON round trip preserves order and types") {
    assert(str("""JSON.stringify({b: 1, a: [true, null, 'x'], n: 2.5});""")
      == """{"b":1,"a":[true,null,"x"],"n":2.5}""")
    assert(num("""JSON.parse('{"x": [1, 2, {"y": 3}]}').x[2].y;""") == 3)
    assert(str("JSON.stringify(3);") == "3") // integral double → no '.0'
  }

  test("parseInt / parseFloat / isNaN") {
    assert(num("parseInt('42abc');") == 42)
    assert(num("parseInt('ff', 16);") == 255)
    assert(num("parseInt('0x1A');") == 26)
    assert(num("parseFloat('3.5e2xyz');") == 350)
    assert(num("isNaN(parseInt('zz')) ? 1 : 0;") == 1)
  }

  test("number formatting: integral doubles print without .0") {
    assert(str("var x = 6 / 2; '' + x;") == "3")
    assert(str("'' + 0.5;") == "0.5")
    assert(str("(1234567890123456789).toFixed(0);").nonEmpty)
    assert(str("(3.14159).toFixed(2);") == "3.14")
  }

  test("ES5 accessors: getters and setters in object literals") {
    assert(num("""
      var o = {
        _v: 10,
        get v() { return this._v * 2; },
        set v(x) { this._v = x + 1; }
      };
      var before = o.v;   // 20
      o.v = 4;            // _v = 5
      before + o.v;       // 20 + 10
    """) == 30)
    // `get` / `set` as ordinary keys still work
    assert(num("({get: 7, set: 8}).get + ({get: 7, set: 8}).set;") == 15)
    // setter-only reads as undefined; getter-only writes are no-ops
    assert(str("""
      var log = [];
      var sink = {set x(v) { log.push(v); }};
      sink.x = 1; sink.x = 2;
      '' + sink.x + '|' + log.join(',');
    """) == "undefined|1,2")
    assert(num("""
      var g = {get x() { return 9; }};
      g.x = 100; // silently ignored (non-strict)
      g.x;
    """) == 9)
  }

  test("labeled break and continue target the labeled loop") {
    assert(str("""
      var out = '';
      outer: for (var i = 0; i < 3; i++) {
        for (var j = 0; j < 3; j++) {
          if (j == 2) continue outer;
          if (i == 2) break outer;
          out += '' + i + j + ',';
        }
      }
      out;
    """) == "00,01,10,11,")
    // unlabeled break still binds to the innermost loop
    assert(num("""
      var n = 0;
      for (var i = 0; i < 3; i++) {
        for (var j = 0; j < 10; j++) { if (j == 1) break; n++; }
      }
      n;
    """) == 3)
    // break out of a labeled block (non-loop)
    assert(num("var x = 1; blk: { x = 2; break blk; x = 3; } x;") == 2)
  }

  test("invalid regex is a catchable JS error") {
    assert(str("""
      var m = 'none';
      try { new RegExp('[unclosed').test('x'); }
      catch (e) { m = '' + e; }
      m.indexOf('SyntaxError') >= 0 ? 'caught' : m;
    """) == "caught")
  }

  test("prototype chains: shared methods, instanceof, call/apply") {
    val src = """
      function Point(x, y) { this.x = x; this.y = y; }
      Point.prototype.norm = function() {
        return Math.sqrt(this.x * this.x + this.y * this.y);
      };
      Point.prototype.scale = function(k) {
        return new Point(this.x * k, this.y * k);
      };
      var p = new Point(3, 4);
      var q = p.scale(2);
      '' + p.norm() + ',' + q.norm() + ',' +
        (p instanceof Point) + ',' + ({} instanceof Point) + ',' +
        p.hasOwnProperty('x') + ',' + p.hasOwnProperty('norm');
    """
    assert(str(src) == "5,10,true,false,true,false")
  }

  test("prototype replacement and function call/apply") {
    assert(num("""
      function A() {}
      A.prototype = {tag: 7};
      var a = new A();
      a.tag;
    """) == 7)
    assert(num("function add(a, b) { return a + b; } " +
      "add.call(null, 1, 2) + add.apply(null, [10, 20]);") == 33)
    assert(num("""
      function get() { return this.v; }
      get.call({v: 42});
    """) == 42)
  }

  test("constructor statics: Object.keys/values, Array.isArray, fromCharCode") {
    assert(str("Object.keys({a: 1, b: 2}).join(',');") == "a,b")
    assert(num("Object.values({a: 3, b: 4}).reduce(" +
      "function(x, y) { return x + y; }, 0);") == 7)
    assert(num("Array.isArray([1]) ? 1 : 0;") == 1)
    assert(num("Array.isArray('no') ? 1 : 0;") == 0)
    assert(str("String.fromCharCode(72, 105);") == "Hi")
    val err = intercept[JsError] { JsInterp.eval("Date.now();") }
    assert(toStr(err.value).contains("non-deterministic"))
  }

  test("Date: deterministic UTC subset") {
    assert(num("new Date(86400000).getUTCDate();") == 2) // 1970-01-02
    assert(str("new Date(1704067199123).toISOString();")
      == "2023-12-31T23:59:59.123Z")
    assert(num("new Date('2024-03-05T06:07:08Z').getUTCMonth();") == 2)
    assert(num("new Date('2024-03-05').getUTCFullYear();") == 2024)
    assert(num("new Date(1704067199123).getTime();") == 1704067199123d)
    // no-arg Date would read the wall clock: refused
    val err = intercept[JsError] { JsInterp.eval("new Date();") }
    assert(toStr(err.value).contains("non-deterministic"))
  }

  // ---- safety
  test("runaway loop hits the step budget") {
    val err = intercept[JsError] {
      JsInterp.run(JsInterp.compile("while (true) {}"), Nil, Nil,
        maxSteps = 100000)
    }
    assert(toStr(err.value).contains("step budget"))
  }

  test("parse errors carry position") {
    val err = intercept[graft.js.JsAst.JsParseError] {
      JsInterp.compile("var x = ;")
    }
    assert(err.getMessage.contains("line 1"))
  }

  test("argument binding from the host") {
    val r = JsInterp.eval("return a * b + c.length;",
      Seq("a", "b", "c"), Seq(JsNum(3), JsNum(4), JsStr("xy")))
    assert(toNum(r) == 14)
  }

  test("top-level return and last-expression result both work") {
    assert(num("return 41 + 1;") == 42)
    assert(num("var x = 5; x * 2;") == 10)
  }

  // ---- Spark integration: both SQL surfaces
  lazy val spark: org.apache.spark.sql.SparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  test("jseval via spark.sql registry") {
    graft.plans.GraftSqlFunctions.registerAll(spark)
    val rows = spark.sql(
      "SELECT jseval_num('return a * b + 1;', 'a, b', id, 10) AS v " +
        "FROM range(3)").collect().map(_.getDouble(0)).sorted
    assert(rows.toSeq == Seq(1.0, 11.0, 21.0))
    val json = spark.sql(
      """SELECT jseval('return {n: x, s: "v" + x, arr: [x, x * 2]};',
        |  'x', 7) AS j""".stripMargin).collect().head.getString(0)
    assert(json == """{"n":7,"s":"v7","arr":[7,14]}""")
  }

  test("jseval via the MLDB dialect") {
    val df = graft.sql.GraftSql.query(spark, "/root/testdata/sf0.001",
      """SELECT n_name,
        |  jseval_str('return name.toLowerCase();', 'name', n_name) AS lower_name
        |FROM nation
        |ORDER BY n_name
        |LIMIT 3""".stripMargin)
    val rows = df.collect()
    assert(rows.forall(r => r.getString(1) == r.getString(0).toLowerCase))
  }

  test("jseval array and struct arguments become JS values") {
    graft.plans.GraftSqlFunctions.registerAll(spark)
    val v = spark.sql(
      """SELECT jseval_num(
        |  'var s = 0; for (var i = 0; i < xs.length; i++) s += xs[i];
        |   return s + o.k;',
        |  'xs, o', array(1, 2, 3), named_struct('k', 10)) AS v""".stripMargin)
      .collect().head.getDouble(0)
    assert(v == 16.0)
  }

  test("script.apply: a JS-backed function entity applies per row") {
    val engine = new graft.api.GraftEngine(spark)
    engine.createScriptFunction("jsscore",
      "return a * 2 + (b > 1 ? 10 : 0);", Seq("a", "b"), "score")
    import spark.implicits._
    val out = engine.applyFunction("jsscore",
      Seq((1.0, 0.5), (3.0, 2.0)).toDF("a", "b"))
      .select("score").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(2.0, 16.0))
    // bad code fails registration, not first application
    intercept[graft.js.JsAst.JsParseError] {
      engine.createScriptFunction("bad", "function (", Seq("a"))
    }
    // the single-row REST scoring path works through the same entity
    val (_, rows) = engine.applyFunctionJsonRows("jsscore",
      """{"a": 4, "b": 9}""")
    assert(rows.head.getAs[Double]("score") == 18.0)
  }

  test("a runaway script fails the query with a clear error, not a hang") {
    graft.plans.GraftSqlFunctions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT jseval_num('while (true) {}', '', 1) AS v")
        .collect()
    }
    assert(e.getMessage.contains("step budget") ||
      Option(e.getCause).exists(_.getMessage.contains("step budget")))
  }
}
