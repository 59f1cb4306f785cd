package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Twenty-seventh batch of replays of the reference's OWN regression
  * tests — MLDB-1750-dist-tables.py: experimental.distTable.train's
  * prior running stats, the getStats function (trained + ad-hoc,
  * statistic subsets, unknown values), bagOfWords mode, and
  * NULL-as-a-value grouping. The real-time increment/persist routes
  * are out of scope this round (documented). */
class ReferenceParitySpec27 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val e = new api.GraftEngine(spark)
  private def q(sql: String) = {
    val df = e.query(sql)
    if (df.schema.headOption.exists(f =>
        f.name.equalsIgnoreCase("rowName") &&
          f.metadata.contains("graft.implicitRowName")))
      df.drop("rowName")
    else df
  }

  private lazy val bidReqLoaded: Unit = loadBidReq0()
  private def loadBidReq(): Unit = bidReqLoaded
  private def loadBidReq0(): Unit =
    e.recordRows("bid_req1750",
      """[{"rowName":"row0","host":"patate.com","region":"canada","price":1,"target2":2,"order_":0},
        |{"rowName":"row1","host":"poil.com","region":"canada","price":3,"target2":4,"order_":1},
        |{"rowName":"row2","host":"poil.com","price":7,"target2":8,"order_":2},
        |{"rowName":"row3","host":"patate.com","region":"usa","price":9,"target2":10,"order_":3},
        |{"rowName":"row4","host":"poil.com","region":"usa","price":11,"target2":10,"order_":4}]"""
        .stripMargin)

  test("MLDB-1750: prior running stats per row in training order") {
    loadBidReq()
    e.runProcedure("experimental.distTable.train", Map(
      "trainingData" ->
        "SELECT host, region FROM bid_req1750 ORDER BY order_",
      "outputDataset" -> "bid_req_features1750",
      "outcomes" -> """[["price", "price"], ["target", "target2"]]""",
      "distTableFileUrl" -> "file://tmp/mldb-1750.dt",
      "functionName" -> "get_stats1750").get _)
    val rows = e.dataset("bid_req_features1750").collect()
      .map(r => r.getAs[String]("rowName") -> r).toMap
    def v(rn: String, c: String): Double = rows(rn).getAs[Double](c)
    def cnt(rn: String, c: String): Double = rows(rn).getAs[Double](c)
    // row0: nothing before it
    assert(cnt("row0", "price.host.count") === 0.0)
    assert(v("row0", "price.host.avg").isNaN)
    // row1: region=canada saw row0 (price 1, target 2)
    assert(cnt("row1", "price.host.count") === 0.0)
    assert(cnt("row1", "price.region.count") === 1.0)
    assert(v("row1", "price.region.avg") === 1.0)
    assert(v("row1", "price.region.std").isNaN)
    assert(v("row1", "price.region.min") === 1.0)
    assert(v("row1", "target.region.avg") === 2.0)
    // row2: host=poil.com saw row1; region NULL partition empty
    assert(cnt("row2", "price.host.count") === 1.0)
    assert(v("row2", "price.host.avg") === 3.0)
    assert(cnt("row2", "price.region.count") === 0.0)
    assert(v("row2", "target.host.avg") === 4.0)
    // row3: host=patate.com saw row0
    assert(cnt("row3", "price.host.count") === 1.0)
    assert(v("row3", "price.host.avg") === 1.0)
    assert(cnt("row3", "price.region.count") === 0.0)
    // row4: host=poil.com saw rows 1,2 → prices [3,7]
    assert(cnt("row4", "price.host.count") === 2.0)
    assert(v("row4", "price.host.avg") === 5.0)
    assert(math.abs(v("row4", "price.host.std") - 2 * math.sqrt(2)) < 1e-9)
    assert(v("row4", "price.host.min") === 3.0)
    assert(v("row4", "price.host.max") === 7.0)
    assert(cnt("row4", "price.region.count") === 1.0)
    assert(v("row4", "price.region.avg") === 9.0)
    assert(v("row4", "target.host.avg") === 6.0)
    assert(v("row4", "target.region.avg") === 10.0)
  }

  test("MLDB-1750: getStats reads the FINAL table; unknown values read empty") {
    loadBidReq()
    e.runProcedure("experimental.distTable.train", Map(
      "trainingData" ->
        "SELECT host, region FROM bid_req1750 ORDER BY order_",
      "outcomes" -> """[["price", "price"], ["target", "target2"]]""",
      "distTableFileUrl" -> "file://tmp/mldb-1750b.dt",
      "functionName" -> "get_stats1750b").get _)
    // an ad-hoc function over the same table behaves identically
    e.createDistTableGetStatsFunction("get_stats1750c",
      "file://tmp/mldb-1750b.dt")
    for (fn <- Seq("get_stats1750b", "get_stats1750c")) {
      val st = q(s"""select $fn({features:
          {host: 'patate.com', region: 'usa'}})[stats] as s""")
        .head().getStruct(0)
      def sv(n: String): Double =
        st.getAs[Number](st.fieldIndex(n)).doubleValue
      // host patate.com prices [1,9]; region usa prices [9,11]
      assert(sv("price.host.count") === 2.0)
      assert(sv("price.host.avg") === 5.0)
      assert(math.abs(sv("price.host.std") - math.sqrt(32)) < 1e-9)
      assert(sv("price.host.min") === 1.0)
      assert(sv("price.host.max") === 9.0)
      assert(sv("price.region.count") === 2.0)
      assert(sv("price.region.avg") === 10.0)
      assert(math.abs(sv("price.region.std") - math.sqrt(2)) < 1e-9)
      // target region usa values [10, 10] → std 0
      assert(sv("target.region.std") === 0.0)
      assert(sv("target.host.avg") === 6.0)
    }
    // unknown VALUES: count 0, everything else NaN
    val unk = q("""select get_stats1750b({features:
        {host: 'prout', region: 'prout'}})[stats] as s""").head().getStruct(0)
    assert(unk.getAs[Number](unk.fieldIndex("price.host.count"))
      .doubleValue === 0.0)
    assert(unk.getAs[Double]("price.host.avg").isNaN)
    assert(unk.getAs[Double]("target.region.max").isNaN)
  }

  test("MLDB-1750: non-default statistics at train and function creation") {
    loadBidReq()
    e.runProcedure("experimental.distTable.train", Map(
      "trainingData" ->
        "SELECT host, region FROM bid_req1750 ORDER BY order_",
      "outputDataset" -> "bid_req_few1750",
      "outcomes" -> """[["price", "price"]]""",
      "distTableFileUrl" -> "file://tmp/mldb-1750-few.dt",
      "functionName" -> "get_stats1750d",
      "statistics" -> """["last", "min", "sum"]""").get _)
    val r4 = e.dataset("bid_req_few1750")
      .filter(col("rowName") === "row4").head()
    // prior host=poil.com values [3,7]
    assert(r4.getAs[Double]("price.host.last") === 7.0)
    assert(r4.getAs[Double]("price.host.min") === 3.0)
    assert(r4.getAs[Double]("price.host.sum") === 10.0)
    // prior region=usa values [9]
    assert(r4.getAs[Double]("price.region.last") === 9.0)
    assert(r4.getAs[Double]("price.region.sum") === 9.0)
    // the function reads FINAL values [3,7,11] / [9,11]
    val st = q("""select get_stats1750d({features: {host, region}})[stats] as s
      from bid_req1750 where rowName() = 'row4'""").head().getStruct(0)
    assert(st.getAs[Double]("price.host.last") === 11.0)
    assert(st.getAs[Double]("price.host.min") === 3.0)
    assert(st.getAs[Double]("price.host.sum") === 21.0)
    assert(st.getAs[Double]("price.region.last") === 11.0)
    assert(st.getAs[Double]("price.region.sum") === 20.0)
    // a getStats with a DIFFERENT stat subset still reads the full
    // stored distribution (max from a ['last','min','sum'] table)
    e.createDistTableGetStatsFunction("get_stats1750e",
      "file://tmp/mldb-1750-few.dt", Some(Seq("max")))
    val st2 = q("""select get_stats1750e({features:
        {host: 'prout', region: 'usa'}})[stats] as s""").head().getStruct(0)
    assert(st2.schema.fieldNames.toSeq ===
      Seq("price.host.max", "price.region.max"))
    assert(st2.getAs[Double]("price.host.max").isNaN)
    assert(st2.getAs[Double]("price.region.max") === 11.0)
    // unknown statistics raise at train AND at function creation
    val ex1 = intercept[IllegalArgumentException](
      e.runProcedure("experimental.distTable.train", Map(
        "trainingData" -> "SELECT host FROM bid_req1750 ORDER BY order_",
        "outcomes" -> """[["price", "price"]]""",
        "distTableFileUrl" -> "file://tmp/mldb-1750-bad.dt",
        "statistics" -> """["patate"]""").get _))
    assert(ex1.getMessage.contains("Unknown distribution table statistic"))
    val ex2 = intercept[IllegalArgumentException](
      e.createDistTableGetStatsFunction("get_stats_bad",
        "file://tmp/mldb-1750-few.dt", Some(Seq("pwel"))))
    assert(ex2.getMessage.contains("Unknown distribution table statistic"))
  }

  test("MLDB-1750: bagOfWords mode keys columns by presence") {
    e.recordRows("tags1750",
      """[{"rowName":"row0","tag_a":1,"tag_b":1,"price":1,"target2":2,"order_":0},
        |{"rowName":"row1","tag_c":1,"price":3,"target2":4,"order_":1},
        |{"rowName":"row2","price":7,"target2":8,"order_":2},
        |{"rowName":"row3","tag_b":1,"tag_c":1,"price":9,"target2":10,"order_":3},
        |{"rowName":"row4","tag_a":1,"tag_b":1,"tag_c":1,"price":11,"target2":10,"order_":4}]"""
        .stripMargin)
    e.runProcedure("experimental.distTable.train", Map(
      "trainingData" -> "SELECT tag* FROM tags1750 ORDER BY order_",
      "outcomes" -> """[["price", "price"]]""",
      "distTableFileUrl" -> "file://tmp/mldb-1750-bow.dt",
      "mode" -> "bagOfWords",
      "statistics" -> """["avg", "max"]""",
      "functionName" -> "get_bow_stats1750",
      "outputDataset" -> "bowOut1750").get _)
    // final stats: tag_a rows [1,11], tag_b [1,9,11], tag_c [3,9,11]
    val st = q("""select get_bow_stats1750({features:
        {"tag_a": 1, "tag_b": 1, "tag_c": 1}})[stats] as s""")
      .head().getStruct(0)
    assert(st.getAs[Double]("price.tag_a.avg") === 6.0)
    assert(st.getAs[Double]("price.tag_a.max") === 11.0)
    assert(st.getAs[Double]("price.tag_b.avg") === 7.0)
    assert(st.getAs[Double]("price.tag_b.max") === 11.0)
    assert(math.abs(st.getAs[Double]("price.tag_c.avg") - 23.0 / 3) < 1e-9)
    assert(st.getAs[Double]("price.tag_c.max") === 11.0)
    // an UNTRAINED word still answers (all-NaN stats)
    val unk = q("""select get_bow_stats1750({features: {"tag_z": 1}})
        [stats] as s""").head().getStruct(0)
    assert(unk.schema.fieldNames.toSeq ===
      Seq("price.tag_z.avg", "price.tag_z.max"))
    assert(unk.getAs[Double]("price.tag_z.avg").isNaN)
    // prior rows: row4 saw tag_a=[1], tag_b=[1,9], tag_c=[3,9]
    val out = e.dataset("bowOut1750").collect()
      .map(r => r.getAs[String]("rowName") -> r).toMap
    assert(out("row4").getAs[Double]("price.tag_a.avg") === 1.0)
    assert(out("row4").getAs[Double]("price.tag_b.avg") === 5.0)
    assert(out("row4").getAs[Double]("price.tag_b.max") === 9.0)
    assert(out("row4").getAs[Double]("price.tag_c.avg") === 6.0)
    // a row without the word has NO cell; the FIRST occurrence reads
    // the empty stats (NaN)
    assert(out("row2").isNullAt(out("row2").fieldIndex("price.tag_a.avg")))
    assert(out("row0").getAs[Double]("price.tag_a.avg").isNaN)
    assert(out("row1").getAs[Double]("price.tag_c.avg").isNaN)
  }

  test("MLDB-1750: a NULL key value groups as its own value") {
    e.recordRows("poil1750",
      """[{"rowName":"row0","host":"patate.com","patate":null,"price":1,"order":1},
        |{"rowName":"row1","host":"poil.com","patate":null,"price":3,"order":2},
        |{"rowName":"row2","host":"patate.com","patate":null,"price":8,"order":3}]"""
        .stripMargin)
    e.runProcedure("experimental.distTable.train", Map(
      "trainingData" ->
        "SELECT * EXCLUDING(price, \"order\") FROM poil1750 ORDER BY \"order\"",
      "outcomes" -> """[["price", "price"]]""",
      "distTableFileUrl" -> "file://tmp/mldb-1750-null.dt",
      "statistics" -> """["avg"]""",
      "functionName" -> "get_null_stats1750",
      "outputDataset" -> "poil_dt1750").get _)
    val out = e.dataset("poil_dt1750").collect()
      .map(r => r.getAs[String]("rowName") -> r).toMap
    // the all-NULL 'patate' column groups every row together
    assert(out("row0").getAs[Double]("price.patate.avg").isNaN)
    assert(out("row1").getAs[Double]("price.patate.avg") === 1.0)
    assert(out("row2").getAs[Double]("price.patate.avg") === 2.0)
    assert(out("row2").getAs[Double]("price.host.avg") === 1.0)
    // the function: NULL feature value reads the NULL-value entry
    val s1 = q("""select get_null_stats1750({features:
        {host: 'patate.com', patate: NULL}})[stats] as s""")
      .head().getStruct(0)
    assert(s1.getAs[Double]("price.host.avg") === 4.5)
    assert(s1.getAs[Double]("price.patate.avg") === 4.0)
    val s2 = q("""select get_null_stats1750({features:
        {host: 'poil.com', patate: NULL}})[stats] as s""")
      .head().getStruct(0)
    assert(s2.getAs[Double]("price.host.avg") === 3.0)
    assert(s2.getAs[Double]("price.patate.avg") === 4.0)
  }
}
