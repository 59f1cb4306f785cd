package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Twenty-fifth batch of replays of the reference's OWN regression
  * tests — WHEN composed into procedures and functions:
  *   - MLDB-945-WHEN-in-proc-and-func.py (transform / sql.query /
  *     svd.train / classifier.train / kmeans.train all honor WHEN),
  *   - MLDBFB-335_when_timestamp_variable_test.py (`TIMESTAMP time` —
  *     a VARIABLE operand — filters identically to the literal),
  *   - MLDB-679-latest-get-variable.js + MLDB-963 per-cell semantics
  *     via the EAV module (superposed tuples read back whole; WHEN
  *     drops individual cells).
  * Wide mode carries ONE timestamp per row, so the row-sliced replays
  * pin the same WHEN-composition behavior with per-row slices; the
  * per-cell superposition shapes are pinned at the [[graft.core.Eav]]
  * layer, the representation built for them. */
class ReferenceParitySpec25 extends AnyFunSuite {

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

  private val T0 = "2026-08-15T12:00:00Z"
  private val T0plus1d = "2026-08-16T12:00:00Z"
  private val T0plus2h = "2026-08-15T14:00:00Z"

  private def loadDataset1(): Unit =
    e.recordRows("ds945",
      ((0 until 9).map(i =>
        s"""{"rowName":"$i","x":$i,"y":$i,"ts":"$T0"}""") :+
        s"""{"rowName":"9","x":9,"y":9,"ts":"$T0plus1d"}""")
        .mkString("[", ",", "]"))

  // --- MLDB-945: transform honors WHEN ---------------------------------------------

  test("MLDB-945: transform with WHEN windows the rows it transforms") {
    loadDataset1()
    def runTransform(out: String, when: String): Long = {
      e.runProcedure("transform", Map(
        "inputData" -> s"select * from ds945 when $when",
        "outputDataset" -> out).get _)
      e.dataset(out).count()
    }
    assert(runTransform("ds945_all",
      "value_timestamp() BETWEEN TIMESTAMP '2015-01-01' AND " +
        "TIMESTAMP '2030-01-06'") === 10)
    // the transformed rows keep their name = x invariant
    q("select rowName() as rn, x from ds945_all").collect().foreach { r =>
      assert(r.getString(0) === r.getLong(1).toString)
    }
    assert(runTransform("ds945_none",
      "value_timestamp() BETWEEN TIMESTAMP '2015-01-01' AND " +
        "TIMESTAMP '2015-06-06'") === 0)
    assert(runTransform("ds945_early",
      s"value_timestamp() BETWEEN TIMESTAMP '$T0' AND " +
        s"TIMESTAMP '$T0plus2h'") === 9)
    assert(!q("select rowName() as rn from ds945_early").collect()
      .exists(_.getString(0) == "9"), "row 9 must be WHEN-filtered")
    assert(runTransform("ds945_le",
      s"value_timestamp() <= TIMESTAMP '$T0plus2h'") === 9)
  }

  // --- MLDB-945: sql.query function honors WHEN ------------------------------------

  test("MLDB-945: sql.query function with WHEN") {
    loadDataset1()
    e.createSqlQueryRowFunction("when945_fn",
      "select * from ds945 when value_timestamp() BETWEEN " +
        "TIMESTAMP '2015-01-01' AND TIMESTAMP '2030-01-06' " +
        "where rowName() = '9'", "FIRST_ROW")
    val out = q("select when945_fn()[output] as o").head()
    val o = out.getStruct(0)
    assert(o.getAs[Long]("x") === 9L)
    // a WHEN window excluding row 9 leaves the lookup empty
    e.createSqlQueryRowFunction("when945_fn2",
      s"select * from ds945 when value_timestamp() BETWEEN " +
        s"TIMESTAMP '$T0' AND TIMESTAMP '$T0plus2h' " +
        "where rowName() = '9'", "FIRST_ROW")
    val out2 = q("select when945_fn2()[output] as o").head()
    assert(!out2.getStruct(0).schema.fieldNames.contains("x"),
      out2.toString)
  }

  // --- MLDB-945: svd.train honors the structured `when` ----------------------------

  test("MLDB-945: svd.train WHEN selects the time slice (rank 2 vs 3)") {
    val rng = new scala.util.Random(945)
    val rows =
      (0 until 100).map { i =>
        val (x, y, z) = (rng.nextInt(1000) + 1, rng.nextInt(1000) + 1,
          rng.nextInt(1000) + 1)
        s"""{"rowName":"now_$i","x":$x,"y":$y,"z":$z,"ts":"$T0"}"""
      } ++ (0 until 100).map { i =>
        val (x, z) = (rng.nextInt(1000) + 1, rng.nextInt(1000) + 1)
        s"""{"rowName":"tmrw_$i","x":$x,"y":${2 * x},"z":$z,"ts":"$T0plus1d"}"""
      }
    e.recordRows("svd945", rows.mkString("[", ",", "]"))
    def effectiveRank(out: String, when: String): Int = {
      e.runProcedure("svd.train", Map(
        "select" -> "*", "from" -> "svd945", "when" -> when,
        "rowOutputDataset" -> out).get _)
      e.dataset(out).columns.count(_.startsWith("embedding"))
    }
    assert(effectiveRank("svd945_rows_tmrw",
      s"value_timestamp() > TIMESTAMP '$T0plus2h'") === 2,
      "y = 2x slice must have 2 independent eigenvectors")
    assert(effectiveRank("svd945_rows_now",
      s"value_timestamp() < TIMESTAMP '$T0plus2h'") === 3,
      "independent slice must have 3 eigenvectors")
  }

  // --- MLDB-945: classifier.train honors the structured `when` ---------------------

  test("MLDB-945: classifier.train WHEN trains on the windowed slice") {
    loadDataset1()
    for ((when, name) <- Seq(
        s"value_timestamp() > TIMESTAMP '$T0plus2h'" -> "after",
        s"value_timestamp() <= TIMESTAMP '$T0plus2h'" -> "before")) {
      // the after-slice holds ONE row (9) — one label class; glz still
      // trains in the reference. Use a label derived from x so both
      // slices are trainable; the pin is WHEN composing into training.
      val r = e.runProcedure("classifier.train", Map(
        "select" -> "{y} as features, x > 4 as label",
        "from" -> "ds945", "when" -> when,
        "algorithm" -> "dt", "mode" -> "boolean",
        "modelFileUrl" -> s"file://tmp/MLDB-945-$name.cls").get _)
      assert(r.contains("trained"), r)
    }
    // an empty WHEN window raises the MLDB-587 filtered error
    val ex = intercept[IllegalArgumentException](
      e.runProcedure("classifier.train", Map(
        "select" -> "{y} as features, x > 4 as label",
        "from" -> "ds945",
        "when" -> "value_timestamp() < TIMESTAMP '2015-01-01'",
        "algorithm" -> "dt", "mode" -> "boolean",
        "modelFileUrl" -> "file://tmp/MLDB-945-none.cls").get _))
    assert(ex.getMessage.contains("all rows were filtered"), ex.getMessage)
  }

  // --- MLDB-945: kmeans.train honors WHEN ------------------------------------------

  test("MLDB-945: kmeans.train WHEN picks the cluster axis") {
    val rng = new scala.util.Random(946)
    val rows = (1 to 2).flatMap { i =>
      (0 until 100).map { j =>
        val vx = rng.nextInt(11) - 5.0
        val vy = rng.nextInt(11) - 5.0
        val off = math.pow(10, i)
        s"""{"rowName":"now_${i}_$j","x":${vx + off},"y":$vy,"ts":"$T0"}"""
      }
    } ++ (1 to 2).flatMap { i =>
      (0 until 100).map { j =>
        val vx = rng.nextInt(11) - 5.0
        val vy = rng.nextInt(11) - 5.0
        val off = math.pow(10, i)
        s"""{"rowName":"tmrw_${i}_$j","x":$vx,"y":${vy + off},"ts":"$T0plus1d"}"""
      }
    }
    e.recordRows("kmeans945", rows.mkString("[", ",", "]"))
    def centroids(out: String, when: String): Array[(Double, Double)] = {
      e.runProcedure("kmeans.train", Map(
        "trainingData" -> s"select x, y from kmeans945 when $when",
        "centroidsDataset" -> out,
        "numClusters" -> "2",
        "modelFileUrl" -> s"file://tmp/MLDB-945-$out.kmeans").get _)
      // centroid dimensions are index-named (c.0 = x, c.1 = y in the
      // select order)
      e.dataset(out).collect()
        .map(r => (r.getAs[Double]("c.0"), r.getAs[Double]("c.1")))
    }
    // tomorrow slice: clusters sit along the y axis — x stays small
    centroids("kmeans945_after",
      s"value_timestamp() > TIMESTAMP '$T0plus2h'").foreach { case (x, _) =>
      assert(math.abs(x) < 6, s"x $x should be within the ±5 noise band")
    }
    // now slice: clusters along the x axis — y stays small
    centroids("kmeans945_before",
      s"value_timestamp() < TIMESTAMP '$T0plus2h'").foreach { case (_, y) =>
      assert(math.abs(y) < 6, s"y $y should be within the ±5 noise band")
    }
  }

  // --- MLDBFB-335: TIMESTAMP <variable> ---------------------------------------------

  test("MLDBFB-335: WHEN with a TIMESTAMP variable equals the literal form") {
    e.recordRows("ds335",
      """[{"rowName":"row1","colA":1,"colB":1,"colC":1,
        |"ts":"1970-01-01T00:00:01Z"}]""".stripMargin)
    e.recordRows("timeDs335",
      """[{"rowName":"row1","time":"1970-01-01T00:00:01Z",
        |"ts":"1970-01-01T00:00:00Z"}]""".stripMargin)
    // the stored cell reads back as its ISO text
    assert(q("select time from timeDs335").head().getString(0)
      === "1970-01-01T00:00:01Z")
    val value = q("""select * from merge(ds335, timeDs335)
        when value_timestamp() <= TIMESTAMP '1970-01-01T00:00:01Z'""")
      .collect()
    val variable = q("""select * from merge(ds335, timeDs335)
        when value_timestamp() <= TIMESTAMP time""").collect()
    assert(value.nonEmpty, "the literal form must keep the row")
    assert(value.map(_.toString).toSeq === variable.map(_.toString).toSeq)
  }

  // --- MLDB-679 / MLDB-963 per-cell semantics (EAV layer) ---------------------------

  test("MLDB-679: a superposed cell reads back all its tuples; latest wins") {
    import graft.core.Eav
    import spark.implicits._
    val ev = Seq(
      ("row1", java.sql.Timestamp.valueOf("2015-01-01 00:00:00"), 0),
      ("row1", java.sql.Timestamp.valueOf("2015-01-02 00:00:00"), 1),
      ("row1", java.sql.Timestamp.valueOf("2015-01-03 00:00:00"), 2))
      .toDF("rid", "ts", "x")
    val eav = Eav.toEav(ev, col("rid"), col("ts"), Seq("x"))
    // SELECT * returns every tuple of the superposition (MLDB-1370 /
    // MLDB-679's 3-column read) — one cell, three timestamped values
    val all = Eav.allValues(eav).head()
    assert(all.getSeq[org.apache.spark.sql.Row](
      all.fieldIndex("values")).size === 3)
    // GET_LATEST collapses to the max-ts value
    val latest = Eav.latest(eav).filter(col("column") === "x").head()
    assert(latest.getAs[org.apache.spark.sql.Row]("value")
      .getAs[Double]("num") === 2.0)
    // WHEN drops individual CELLS, not rows (MLDB-963's shape)
    val cut = java.sql.Timestamp.valueOf("2015-01-02 12:00:00")
    assert(Eav.whenFilter(eav, ts => ts < lit(cut)).count() === 2)
  }
}
