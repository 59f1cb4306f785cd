package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Eav, Tables}
import graft.operators.Multimodal

class EavMultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("toEav emits one cell per non-null value with its timestamp") {
    val ev = Tables.events(spark, sf)
    val eav = Eav.toEav(ev, col("event_id"), col("ts"), Seq("event_type", "value"))
    assert(eav.count() === ev.count() * 2)
    assert(eav.columns.toSeq === Seq("rowName", "column", "value", "ts"))
    // string cells fill only the str slot, numeric only num
    assert(eav.filter(col("column") === "event_type" &&
      (col("value.str").isNull || col("value.num").isNotNull)).count() === 0)
  }

  test("superpositions: latest() picks max-ts value per cell") {
    val ev = Tables.events(spark, sf)
    val eav = Eav.toEav(ev, col("user_id"), col("ts"), Seq("value"))
    val lat = Eav.latest(eav)
    // one output cell per (user, column)
    assert(lat.count() === ev.select("user_id").distinct().count())
    val expect = ev.groupBy(col("user_id"))
      .agg(max_by(col("value"), col("ts")).as("v"))
      .select(col("user_id").cast("string").as("rowName"), col("v"))
    val got = lat.select(col("rowName"), col("value.num").as("v"))
    assert(got.join(expect, Seq("rowName", "v")).count() === lat.count())
  }

  test("whenFilter drops cells, not rows (per-cell WHEN fidelity)") {
    val ev = Tables.events(spark, sf)
    val eav = Eav.toEav(ev, col("event_id"), col("ts"), Seq("event_type", "value"))
    val cut = lit("2024-01-10").cast("timestamp")
    val kept = Eav.whenFilter(eav, ts => ts < cut)
    assert(kept.count() === ev.filter(col("ts") < cut).count() * 2)
  }

  test("VariableFilter variants: earliest/between/allValues on a superposition") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // one cell (u1, score) holding three timestamped values
    val wide = Seq(
      ("u1", 1.0, t("2024-01-01 00:00:00")),
      ("u1", 2.0, t("2024-01-05 00:00:00")),
      ("u1", 3.0, t("2024-01-09 00:00:00")),
      ("u2", 9.0, t("2024-01-03 00:00:00"))
    ).toDF("user", "score", "ts")
    val eav = Eav.toEav(wide, col("user"), col("ts"), Seq("score"))
    val ear = Eav.earliest(eav).collect()
      .map(r => r.getString(0) -> r.getStruct(2).getDouble(0)).toMap
    assert(ear === Map("u1" -> 1.0, "u2" -> 9.0))
    // BETWEEN is inclusive on both bounds and keeps EAV form
    val win = Eav.between(eav,
      lit("2024-01-01 00:00:00").cast("timestamp"),
      lit("2024-01-05 00:00:00").cast("timestamp"))
    assert(win.count() === 3)
    val latWin = Eav.latest(win).collect()
      .map(r => r.getString(0) -> r.getStruct(2).getDouble(0)).toMap
    assert(latWin === Map("u1" -> 2.0, "u2" -> 9.0))
    // ALL returns the whole timeline, ts-ordered
    val allv = Eav.allValues(eav).filter(col("rowName") === "u1").head()
    val vals = allv.getSeq[org.apache.spark.sql.Row](2)
      .map(_.getStruct(1).getDouble(0))
    assert(vals === Seq(1.0, 2.0, 3.0))
  }

  test("fromEav round-trips wide rows at latest values") {
    val ev = Tables.events(spark, sf).limit(200)
    val eav = Eav.toEav(ev, col("event_id"), col("ts"), Seq("event_type", "value"))
    val wide = Eav.fromEav(eav, Seq("event_type", "value"))
    assert(wide.count() === 200)
    val back = wide.select(col("rowName").cast("long").as("event_id"),
      col("event_type.str").as("event_type"), col("value.num").as("value"))
    assert(back.join(ev.select("event_id", "event_type", "value"),
      Seq("event_id", "event_type", "value")).count() === 200)
  }

  test("image header metadata: PNG/GIF/BMP/JPEG dimensions from raw bytes") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      b.array()
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(10)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
      b.array()
    }
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(26)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("BM".getBytes).position(18)
      b.putInt(w).putInt(h)
      b.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(33)
      b.put(Array(0xff, 0xd8).map(_.toByte))
      b.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16).put(new Array[Byte](14))
      b.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11)
        .put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(1.toByte)
      b.array()
    }
    val df = Seq(
      ("png", png(640, 480)), ("gif", gif(320, 200)),
      ("bmp", bmp(800, 600)), ("jpeg", jpeg(384, 256)),
      ("junk", Array[Byte](1, 2, 3)))
      .toDF("tag", "content")
    val out = df.select(col("tag"), Multimodal.imageMeta(col("content")).as("m"))
      .select(col("tag"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else (r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out("png") === (("png", 640, 480)))
    assert(out("gif") === (("gif", 320, 200)))
    assert(out("bmp") === (("bmp", 800, 600)))
    assert(out("jpeg") === (("jpeg", 384, 256)))
    assert(out("junk") === null)
  }

  test("EXIF: orientation/make/model from JPEG APP1 (LE) and bare TIFF (BE)") {
    import spark.implicits._
    // little-endian TIFF inside a JPEG APP1 Exif segment
    def jpegExif(orient: Int, make: String): Array[Byte] = {
      val mk = make.getBytes :+ 0.toByte
      val t = java.nio.ByteBuffer.allocate(38 + mk.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      t.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
      t.putShort(2)
      t.putShort(0x0112.toShort).putShort(3).putInt(1)
        .putShort(orient.toShort).putShort(0)
      t.putShort(0x010f.toShort).putShort(2).putInt(mk.length).putInt(38)
      t.putInt(0)
      t.put(mk)
      val tiff = t.array()
      val out = java.nio.ByteBuffer.allocate(4 + 2 + 6 + tiff.length + 2)
      out.put(0xff.toByte).put(0xd8.toByte)
      out.put(0xff.toByte).put(0xe1.toByte).putShort((2 + 6 + tiff.length).toShort)
      out.put("Exif".getBytes).put(0.toByte).put(0.toByte)
      out.put(tiff)
      out.put(0xff.toByte).put(0xd9.toByte)
      out.array()
    }
    // big-endian bare TIFF with orientation + inline-short model tag
    def tiffBe(orient: Int): Array[Byte] = {
      val t = java.nio.ByteBuffer.allocate(44) // BIG_ENDIAN default
      t.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
      t.putShort(2)
      t.putShort(0x0112.toShort).putShort(3).putInt(1)
        .putShort(orient.toShort).putShort(0)
      t.putShort(0x0110.toShort).putShort(2).putInt(4)
        .put("cam".getBytes).put(0.toByte)
      t.putInt(0)
      t.array()
    }
    val df = Seq(
      ("jpeg_le", jpegExif(6, "graftcam")),
      ("tiff_be", tiffBe(3)),
      ("no_exif", Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)),
      ("junk", Array[Byte](1, 2, 3)))
      .toDF("tag", "content")
    val out = df.select(col("tag"), Multimodal.exifMeta(col("content")).as("x"))
      .collect().map(r => r.getString(0) -> r.getAs[org.apache.spark.sql.Row]("x")).toMap
    assert(out("jpeg_le").getInt(0) === 6)
    assert(out("jpeg_le").getString(1) === "graftcam")
    assert(out("tiff_be").getInt(0) === 3)
    assert(out("tiff_be").getString(2) === "cam")
    assert(out("no_exif") === null)
    assert(out("junk") === null)
  }

  test("multimodal: synthesize → decode stub → frame/resize plans") {
    val docs = Tables.documents(spark, sf).limit(50)
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    assert(media.schema("content").dataType.typeName === "binary")
    val decoded = Multimodal.decodeStats(media).cache()
    assert(decoded.count() === 50)
    // stub decode is deterministic: n_bytes equals utf-8 text length
    val bad = decoded.join(docs,
      decoded("media_id") === docs("doc_id"))
      .filter(col("decoded.n_bytes") =!= length(col("text")).cast("long"))
      .count()
    assert(bad === 0)
    val planned = Multimodal.resizePlan(Multimodal.frameSamplePlan(decoded, 4), 256)
    val r = planned.head()
    val frames = r.getAs[scala.collection.Seq[Long]]("sample_frames")
    assert(frames.length === 4)
    val rs = r.getAs[org.apache.spark.sql.Row]("resize_to")
    assert(rs.getInt(0) <= 256 && rs.getInt(1) <= 256)
  }
}
