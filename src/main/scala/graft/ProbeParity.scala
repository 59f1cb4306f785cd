package graft

import org.apache.spark.sql.SparkSession

/** Scratch driver for reference-parity batch 4: run candidate dialect
  * queries against small recorded datasets and print result or error.
  * Dev tool only — not part of the driver contract. */
object ProbeParity {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = new api.GraftEngine(spark)

    // MLDB-770/809/702 fixture
    e.recordRows("test",
      """[{"rowName":"ex1","x":0,"y":0,"label":"cat"},
        |{"rowName":"ex2","x":1,"y":1,"label":"dog"},
        |{"rowName":"ex3","x":1,"y":2,"label":"cat"}]"""
        .stripMargin.replace("\n", ""))
    // MLDB-832 fixture
    e.recordRows("d1",
      """[{"rowName":"row_0","a":0,"b":1,"c":2,"x1":3,"x2":4,"x3":5}]""")
    // MLDBFB-638 fixture (string values)
    e.recordRows("dataset1",
      """[{"rowName":"row1","x":"1","y":"1","z":"2"},
        |{"rowName":"row2","x":"2","y":"2","z":"1"}]"""
        .stripMargin.replace("\n", ""))
    // MLDB-989 tokenize fixture
    e.recordRows("str_test_data",
      """[{"rowName":"row1","terms":"c++,python,c++,java,c++"},
        |{"rowName":"row2","terms":"scala,scala,java,java,scala,java,scala,c++"},
        |{"rowName":"row3","terms":"python,ada,ada"}]"""
        .stripMargin.replace("\n", ""))


    e.recordRows("cmt", """[{"rowName":"row1","x2":15}]""")
    e.recordRows("dataset1x",
      (0 until 10).map(i => s"""{"rowName":"row_$i","x":$i}""")
        .mkString("[", ",", "]"))
    e.recordRows("strts",
      """[{"rowName":"r1","sc":"2015-01-01T15:14:39.123456Z"}]""")
    e.recordRows("toy917",
      """[{"rowName":"row1","feat1":54,"feat2":"NaN","label":"Infinity"}]""")
    e.recordRows("kv", """[{"rowName":"1","who":"plum"},{"rowName":"2","who":"m"}]""")
    try e.createSqlExpressionFunction("identity1563", "input")
    catch { case t: Throwable => println("[note] fn create: " + t.getMessage) }
    e.recordRows("x.y",
      """[{"rowName":"row1","a.b":7,"z":11,"id":0},{"rowName":"row2","a.b":5,"z":13,"id":1}]""")


    e.recordRows("dataset650",
      """[{"rowName":"efgh","x":"1"},{"rowName":"abcd","x":"1"}]""")
    e.recordRows("ds308", """[{"rowName":"userValid","behA":1}]""")
    e.recordRows("sample573", """[{"rowName":"a","x":"{\"artist\": \"Champion\"}"}]""")


    e.recordRows("ds1305",
      """[{"rowName":"row1","col1":"a"},{"rowName":"row2","col2":"b"}]""")
    try {
      e.createSqlExpressionFunction("f1012a", "input.x*2 as x2, input.y*2 as y2")
      e.createSqlExpressionFunction("f1012b", "input.x3*2 as x4, input.y3*2 as y4")
      e.createSqlExpressionFunction("noIgnore1440", "a+b as rez")
    } catch { case t: Throwable => println("[note] fn: " + t.getMessage) }
    e.recordRows("noColDs", """[{"rowName":"row1"}]""")
    e.recordRows("sample1490", """[{"rowName":"a","x":1}]""")


    e.recordRows("ds813a",
      (0 until 10).map(i => s"""{"rowName":"row_$i","x":$i}""").mkString("[", ",", "]"))
    e.recordRows("ds813b",
      (0 until 5).map(i => s"""{"rowName":"row_$i","ds1_row":"row_$i","y":$i}""").mkString("[", ",", "]"))
    e.recordRows("ds784a",
      (0 until 5).map(i => s"""{"rowName":"row_$i","x":$i,"y":${2*i}}""").mkString("[", ",", "]"))
    e.recordRows("ds784b",
      (0 until 5).map(i => s"""{"rowName":"row_$i","a":${3*i}}""").mkString("[", ",", "]"))
    try e.createSqlQueryDialectFunction("patate784", "select * from ds784a where rowName() = $id")
    catch { case t: Throwable => println("[note] patate784: " + t.getMessage) }

    val probes: Seq[(String, String)] = Seq(
      "638 orderby-agg-not-selected" ->
        "SELECT min(x) FROM dataset1 GROUP BY y ORDER BY min(z), y",
      "770 min-star-as-prefix" ->
        "SELECT min({*}) AS min, max({*}) AS max FROM test GROUP BY label",
      "770 whitespace" -> "\n\tselect min(x) from test group by y\t",
      "809 named-group-key" ->
        "SELECT min({*}) AS min NAMED label FROM test GROUP BY label",
      "809 group_key_element" ->
        "SELECT min({*}) AS min NAMED group_key_element(0) FROM test GROUP BY label",
      "703 count-star-as-c" ->
        "SELECT count({*}) AS c FROM test GROUP BY 1",
      "703 count-x-vs-star" ->
        "SELECT x, count(x) AS a FROM test WHERE x IS NOT NULL GROUP BY x",
      "988 sum-group-by-x" ->
        "SELECT sum(x) AS sum FROM test GROUP BY x",
      "702 earliest-latest-global" ->
        "SELECT earliest({*}) AS earliest, latest({*}) AS latest FROM test",
      "832 star-nested" -> "SELECT {{*} as *} as * FROM d1",
      "832 star-nested-nl" -> "SELECT {{*} as *\n} as * FROM d1",
      "832 brace-as-z" -> "SELECT {*} as z FROM d1",
      "832 brace-ab-as-z" -> "SELECT {a,b} as z FROM d1",
      "832 brace-wild-as-z" -> "SELECT {x*} as z FROM d1",
      "832 mixed" -> "SELECT a,b,c, {x*} as z FROM d1",
      "832 dup-col" -> "SELECT a, a FROM d1",
      "832 excl-wild-rename" -> "SELECT x* EXCLUDING(x3) AS y* FROM d1",
      "989 tokenize-order" ->
        "SELECT rowName() AS rn FROM str_test_data ORDER BY tokenize(terms)",
      "989 tokenize-cmp-gt" ->
        "SELECT tokenize('zoo string string string', {splitChars:' '}) > tokenize('zoo string string', {splitChars:' '}) AS comp",
      "989 tokenize-cmp-eq" ->
        "SELECT tokenize('zoo string string', {splitChars:' '}) = tokenize('string zoo string', {splitChars:' '}) AS comp",
      "989 tokenize-cmp-lt" ->
        "SELECT tokenize('string string zoo', {splitChars:' '}) < tokenize('string zoo', {splitChars:' '}) AS comp",
      "956 block-comment" -> "select /*We choose*/ power(x2,2) AS p FROM cmt",
      "956 line-comment" -> "select --comment\npower(x2, 2) AS p FROM cmt",
      "956 tricky-comment" -> "select /***because -- and /*win, -- others.\n*/ power(x2,2) AS p FROM cmt",
      "869 bare-words-error" -> "SELECT 5 golden rings, 3 french hens FROM d1",
      "869 alias-star" -> "SELECT x.* FROM dataset1x AS x ORDER BY rowName() DESC LIMIT 3",
      "724 interval-eq-1" -> "select INTERVAL '10 s' = INTERVAL '10second' as equal",
      "724 interval-eq-2" -> "select INTERVAL '1Y2W' = INTERVAL '12MONTH14d' as equal",
      "724 interval-ne" -> "select INTERVAL '1 day' = INTERVAL '24H' as equal",
      "906 dp-second-str" -> "SELECT date_part('second', CAST('2015-01-01T15:14:39.123456Z' AS timestamp)) AS s",
      "906 dp-ms" -> "SELECT date_part('millisecond', CAST('2015-01-01T15:14:39.123456Z' AS timestamp)) AS s",
      "906 dp-dow" -> "SELECT date_part('dow', CAST('2015-01-01T15:14:39.123456Z' AS timestamp)) AS s",
      "906 dp-doy" -> "SELECT date_part('doy', CAST('2015-01-01T15:14:39.123456Z' AS timestamp)) AS s",
      "906 dp-isodoy" -> "SELECT date_part('isodoy', CAST('2015-01-01T15:14:39.123456Z' AS timestamp)) AS s",
      "906 dp-week" -> "SELECT date_part('week', CAST('2014-12-31T15:14:39.123456Z' AS timestamp)) AS s",
      "906 dp-isoweek" -> "SELECT date_part('isoweek', CAST('2014-12-31T15:14:39Z' AS timestamp)) AS s",
      "906 dp-quarter-jul" -> "SELECT date_part('quarter', CAST('2015-07-01T00:00:00Z' AS timestamp)) AS s",
      "906 dp-string-col" -> "SELECT date_part('second', sc) AS s FROM strts",
      "917 replace-nan-row" -> "select replace_nan({0/0, 2, 6}, 5) AS r",
      "917 replace-inf-emb" -> "select replace_inf([1/0, 5/0, 23], 98) AS r",
      "917 replace-null-emb" -> "select replace_null([1/0, null, 23], 98) AS r",
      "917 nested-star" -> "select replace_inf(replace_nan({*}, 0), 1) AS r from toy917",
      "953 normalize-p1" -> "select norm(normalize({1, 2, 3, 4}, 1), 1) as x",
      "953 normalize-p0" -> "select norm(normalize([1, 2, 3, 4], 0), 0) as x",
      "953 normalize-inf" -> "select norm(normalize([1, 2, 3, 4], inf), inf) as x",
      "953 norm-inf" -> "select norm([1,2,0,4],inf) AS n",
      "953 array-div" -> "select horizontal_sum( normalize([1,2,3,4],2) - [1,2,3,4]/norm([1,2,3,4],2) ) AS h",
      "1567 empty-emb" -> "select [] as x",
      "1567 empty-row" -> "select {} as x",
      "1563 keys-of-fn" -> "SELECT rowName() AS rn FROM kv WHERE rowName() IN (KEYS OF identity1563({input: {\"1\": 1}})[input])",
      "835 quoted-ds" -> "SELECT a.b AS ab FROM \"x.y\"",
      "835 prefix-quoted" -> "SELECT \"a.\"* FROM \"x.y\"",
      "835 a-star" -> "SELECT a.* FROM \"x.y\"",
      "835 excl-dotted" -> "select * excluding(a.*) from \"x.y\"",
      "835 alias-deep" -> "SELECT q.r.a.b AS v FROM \"x.y\" as \"q.r\"",
      "835 groupby-dotted" -> "SELECT count(1) AS c FROM \"x.y\" GROUP BY \"a.b\"",
      "923 vecsum-row" -> "select vector_sum([1,2,3],{\"0\":3, \"1\":2, \"2\":1}) as x",
      "923 arr-plus-arr" -> "select [1,2,3] + [3,2,1] as x",
      "923 arr-plus-row" -> "select [1,2,3] + {\"0\":3, \"1\":2, \"2\":1} as x",
      "923 numrow-as-x" -> "select {\"0\":3, \"1\":2, \"2\":1} as x",
      "761 ds-star" -> "SELECT dataset1x.* from dataset1x",
      "761 sub-alias-star" -> "SELECT blah.* FROM (SELECT * FROM dataset1x) AS blah",
      "761 sub-where-outer" -> "SELECT blah.* FROM (SELECT * FROM dataset1x WHERE (x % 2) = 0) AS blah WHERE (x%4) = 0",
      "761 select1-from-select1" -> "SELECT 1 AS one FROM (SELECT 1 AS i)",
      "761 nested-brace" -> "SELECT x.* FROM (select {1 as y} as z ) as x",
      "761 brace-star-sub" -> "SELECT * FROM (select {*} as y from dataset1x) as x",
      "761 ln-equiv" -> "SELECT ln(t.x) as r FROM ( SELECT 10 as x ) as t",
      "650 named-agg" -> "SELECT x AS x NAMED min(rowName()) FROM dataset650 GROUP BY x",
      "308 outer-join-where" -> "SELECT 1 AS one FROM ds308 OUTER JOIN (SELECT 2 AS two FROM ds308) WHERE behA",
      "573 parse-json-err" -> "select parse_json('{\"asdf:', {arrays: 'parse', ignoreErrors:1}) as * from sample573",
      "573 parse-json-null" -> "select parse_json(y, {arrays: 'parse'}) as pwet from sample573",
      "798 mod-1" -> "SELECT -2507820791313827470 % 1534 AS m",
      "798 mod-2" -> "SELECT 2507820791313827470 % -1534 AS m",
      "798 pow-prec" -> "SELECT 1.2345678901234567e-300 = exp(ln(1.2345678901234567e-300)) AS eq",
      "1305 qual-where-name" -> "SELECT * FROM ds1305 WHERE ds1305.col1 = 'a'",
      "1305 qual-where-alias" -> "SELECT * FROM ds1305 AS blah WHERE blah.col1 = 'a'",
      "1305 qual-rowname-name" -> "SELECT * FROM ds1305 WHERE ds1305.rowName() = 'row1'",
      "1305 qual-rowname-alias" -> "SELECT * FROM ds1305 AS blah WHERE blah.rowName() = 'row1'",
      "1012 nested-fn-1" -> "select f1012a( {input: {x: 1, y: 2}} ) as *",
      "1012 nested-fn-2" -> "select f1012b( {input: f1012a( {input: {x: 1, y: 2}} )[{x3: x2, y3: y2}] }) as *",
      "1440 unknown-param" -> "select noIgnore1440({a:1, b:2, c:5}) as *",
      "440 sum-star-no-cols" -> "SELECT sum({*}) AS s FROM noColDs",
      "768 missing-fn" -> "SELECT 1 AS one from d1 order by hello()",
      "1490 agg-unknown" -> "select count(*) AS c, sum(deletions) AS s from sample1490 group by x",
      "1490 ln-agg" -> "select count(*) AS c, ln(sum(deletions)+1) AS l from sample1490 group by x",
      "1490 agg-ln" -> "select count(*) AS c, sum(ln(deletions+1)) AS s from sample1490 group by x",
      "1490 global-ln-agg" -> "select count(*) AS c, ln(sum(deletions)+1) AS l from sample1490",
      "1490 bad-bare" -> "select count(*) AS c, ln(deletions+1) AS l from sample1490 group by x",
      "1490 bad-bare-global" -> "select count(*) AS c, ln(deletions+1) AS l from sample1490",
      "813 join-rowname-col" -> "SELECT d1.x, d2.y FROM ds813a AS d1 JOIN ds813b AS d2 ON d1.rowName() = d2.ds1_row ORDER BY rowName()",
      "813 join-rowname-both" -> "SELECT ds813b.* FROM ds813b INNER JOIN ds813a ON ds813a.rowName() = ds813b.rowName() ORDER BY ds813b.rowName()",
      "784 sqlquery-param-apply" -> "SELECT a, patate784({rowName() as id}) as * from ds784b where rowName() = 'row_2'"




    )
    probes.foreach { case (name, sql) =>
      try {
        val df = e.query(sql)
        val rows = df.collect()
        println(s"[OK ] $name :: cols=${df.columns.mkString(",")} :: " +
          rows.take(4).map(_.toString).mkString(" | "))
      } catch {
        case t: Throwable =>
          println(s"[ERR] $name :: ${t.getClass.getSimpleName}: " +
            String.valueOf(t.getMessage).linesIterator.take(2).mkString(" "))
      }
    }
    spark.stop()
  }
}
