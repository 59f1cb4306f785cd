package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sqlite

/** Fixture databases under src/test/resources/graft were produced by
  * a real SQLite 3 library (page_size 512 to force interior b-tree
  * pages; one 2000-char row to force an overflow chain), so the
  * parser is exercised against genuine on-disk bytes, not a
  * hand-modeled approximation:
  *
  *   generic.db: CREATE TABLE items (id INTEGER PRIMARY KEY,
  *     name TEXT, score REAL, data BLOB, flag INT); 300 rows with
  *     name='item_<i>' (i=7: 'long_'+2000×'x'), score=i*0.5 or NULL
  *     every 10th, data=[i%256,0,255] every 3rd else NULL,
  *     flag=-i odd / i even.
  *   sparse.db: the reference sqliteSparse rows/cols/vals layout with
  *     2 rows × 2 cols and epoch-millis timestamps.
  */
class SqliteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def resourcePath(name: String): String = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing test resource $name")
    val f = java.nio.file.Files.createTempFile("sqlite", ".db")
    java.nio.file.Files.copy(in, f,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    f.toString
  }

  test("generic table: types, ipk, nulls, negatives, overflow, b-tree") {
    val path = resourcePath("generic.db")
    assert(Sqlite.tables(path) == Seq("items"))
    val df = Sqlite.importSqlite(spark, path, "items")
    assert(df.columns.toSeq == Seq("id", "name", "score", "data", "flag"))
    assert(df.count() == 300)

    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId.keySet == (1L to 300L).toSet) // ipk = rowid round-trip
    assert(byId(1L).getString(1) == "item_1")
    // the 2000-char payload crossed overflow pages intact
    assert(byId(7L).getString(1) == "long_" + "x" * 2000)
    assert(byId(4L).getDouble(2) == 2.0)
    assert(byId(10L).isNullAt(2)) // every 10th score NULL
    assert(byId(3L).getAs[Array[Byte]](3).toSeq == Seq(3.toByte, 0.toByte, 0xFF.toByte))
    assert(byId(4L).isNullAt(3))
    assert(byId(5L).getLong(4) == -5L) // negative int round-trip
    assert(byId(6L).getLong(4) == 6L)
    // aggregate over the distributed frame
    assert(df.agg(sum(when(col("flag") > 0, 1).otherwise(0))).head.getLong(0) == 150L)
  }

  test("sqliteSparse layout reassembles to EAV cells") {
    val path = resourcePath("sparse.db")
    val cells = Sqlite.importSqliteSparse(spark, path)
    assert(cells.columns.toSeq == Seq("rowName", "column", "value", "ts"))
    val got = cells.select(col("rowName"), col("column"),
        col("value.str"), col("value.num"),
        unix_millis(col("ts")).as("ms"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4))).toSet
    assert(got == Set(
      ("r1", "alpha", Some("3.5"), Some(3.5), 1700000000000L),
      ("r1", "beta", Some("hello"), None, 1700000001000L),
      ("r2", "alpha", Some("42"), Some(42.0), 1700000002000L),
      ("r2", "beta", None, None, 1700000003000L)))
  }

  test("create-table parse handles quoting and table constraints") {
    val (cols, ipk) = Sqlite.parseCreate(
      """CREATE TABLE t ("a b" TEXT, `c` INT, [d e] REAL,
        | n INTEGER PRIMARY KEY, CHECK (c > 0),
        | FOREIGN KEY(c) REFERENCES x(y))""".stripMargin)
    assert(cols == Seq("a b", "c", "d e", "n"))
    assert(ipk == 3)
  }
}
