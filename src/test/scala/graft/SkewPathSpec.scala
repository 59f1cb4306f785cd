package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.{PathFunctions => P}
import graft.operators.Skew

class SkewPathSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("salted count equals plain count on a skewed key") {
    val li = Tables.lineitem(spark, sf)
    val plain = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(li, "l_returnflag", col("l_orderkey"))
    assert(salted.join(plain, Seq("l_returnflag"))
      .filter(plain("n") =!= salted("n")).count() === 0)
    assert(salted.count() === plain.count())
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf)
      .withColumnRenamed("l_orderkey", "okey")
    val o = Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", "okey")
      .select("okey", "o_orderstatus")
    val plain = li.join(o, Seq("okey")).groupBy("o_orderstatus").count()
    val salted = Skew.saltedJoin(li, o, "okey", col("l_linenumber"), 8)
      .groupBy("o_orderstatus").count()
    assert(plain.collect().toSet === salted.collect().toSet)
  }

  test("path functions round-trip") {
    import spark.implicits._
    val df = Seq("a.b.c").toDF("p")
    val r = df.select(
      P.parsePath(col("p")).as("arr"),
      P.stringifyPath(P.parsePath(col("p"))).as("s"),
      P.pathElement(P.parsePath(col("p")), lit(1)).as("el"),
      P.pathLength(P.parsePath(col("p"))).as("len")).head()
    assert(r.getAs[scala.collection.Seq[String]]("arr") === Seq("a", "b", "c"))
    assert(r.getString(1) === "a.b.c")
    assert(r.getString(2) === "b")
    assert(r.getInt(3) === 3)
  }

  test("extract_domain with and without subdomain stripping") {
    import spark.implicits._
    val df = Seq("https://docs.example.com/a/b?q=1").toDF("u")
    val r = df.select(P.extractDomain(col("u")).as("full"),
      P.extractDomain(col("u"), removeSubdomain = true).as("short")).head()
    assert(r.getString(0) === "docs.example.com")
    assert(r.getString(1) === "example.com")
  }

  test("mime sniffing on magic bytes") {
    import spark.implicits._
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    val jpg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 0, 0, 0, 0)
    val df = Seq((png, jpg)).toDF("png", "jpg")
    val r = df.select(P.mimeType(col("png")), P.mimeType(col("jpg"))).head()
    assert(r.getString(0) === "PNG image data")
    assert(r.getString(1) === "JPEG image data")
  }

  test("isodow: 2024-01-01 is a Monday") {
    import spark.implicits._
    val df = Seq("2024-01-01", "2024-01-07").toDF("d")
    val got = df.select(P.isoDow(col("d").cast("timestamp")).as("dow"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 7L))
  }
}
