package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal}

/** Real-codec multimodal tests: images are encoded with ImageIO in
  * the test, decoded by the operators on executors, and the pixel
  * math must round-trip. */
class CodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Solid-color PNG with one gradient band (so dHash has signal). */
  private def png(w: Int, h: Int, rgb: Int, bandAt: Int = -1): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        if (x == bandAt) 0xFFFFFF else if ((x + y) % 7 == 0) rgb ^ 0x3F3F3F else rgb)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wav(freq: Double, seconds: Double, rate: Float = 8000f): Array[Byte] = {
    val n = (rate * seconds).toInt
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * 0.5 * 32767).toInt
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeImages: real pixel statistics, errors as data") {
    val s2 = spark
    import s2.implicits._
    val rows = Seq(
      (1L, png(32, 16, 0xFF0000)),              // red-ish
      (2L, png(10, 10, 0x0000FF)),              // blue-ish
      (3L, Array[Byte](1, 2, 3, 4)))            // corrupt
      .toDF("id", "content")
    val out = Multimodal.decodeImages(rows).select("id", "image.*")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 32 && out(1L).getInt(2) == 16)
    // red image: mean_r far above mean_b; blue image: reversed
    assert(out(1L).getDouble(4) > out(1L).getDouble(6) + 100)
    assert(out(2L).getDouble(6) > out(2L).getDouble(4) + 100)
    assert(out(3L).isNullAt(1) && out(3L).getString(7) != null)
  }

  test("resizeImages: bounded dims, decodable output, no upscale") {
    val s2 = spark
    import s2.implicits._
    val rows = Seq((1L, png(100, 40, 0x00FF00)), (2L, png(8, 6, 0x123456)))
      .toDF("id", "content")
    val out = Multimodal.resizeImages(rows, maxSide = 50)
      .select(col("id"), col("resized"), col("resized_meta.width"),
        col("resized_meta.height"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(2) == 50 && out(1L).getInt(3) == 20)
    assert(out(2L).getInt(2) == 8 && out(2L).getInt(3) == 6) // no upscale
    val back = ImageIO.read(new java.io.ByteArrayInputStream(
      out(1L).getAs[Array[Byte]](1)))
    assert(back.getWidth == 50 && back.getHeight == 20)
  }

  test("imageDHash + hammingPairs: near-identical images pair up") {
    val s2 = spark
    import s2.implicits._
    val base = png(64, 64, 0x808080, bandAt = 20)
    val near = png(64, 64, 0x808080, bandAt = 21)  // band shifted 1px
    val other = png(64, 64, 0x10FF30, bandAt = 50)
    val rows = Seq((1L, base), (2L, near), (3L, other), (4L, base))
      .toDF("id", "content")
    val hashed = Multimodal.imageDHash(rows)
    val pairs = Dedup.hammingPairs(hashed, "phash", "id", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 4L))) // identical → hamming 0
    assert(pairs.find(p => p._1 == 1L && p._2 == 4L).get._3 == 0L)
    assert(pairSet.contains((1L, 2L))) // near-identical → within 6
    assert(!pairSet.contains((1L, 3L)) && !pairSet.contains((2L, 3L)))
  }

  test("wavSamples + spectralCentroidHz: sines land on their frequency") {
    val s2 = spark
    import s2.implicits._
    val n = 4096
    val rows = Seq(
      (1L, wav(440.0, 1.0)),
      (2L, wav(2000.0, 1.0)),
      (3L, Array[Byte](1, 2, 3)))
      .toDF("id", "content")
    val out = Multimodal.wavSamples(rows, n = n)
      .withColumn("centroid",
        Multimodal.spectralCentroidHz(col("samples"), col("sample_rate"), n))
      .select("id", "sample_rate", "centroid")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 8000)
    // a pure sine's centroid sits on its frequency (leakage keeps it
    // within a couple of bins; bin width = 8000/4096 ≈ 2 Hz)
    assert(math.abs(out(1L).getDouble(2) - 440.0) < 10.0,
      s"centroid ${out(1L).getDouble(2)}")
    assert(math.abs(out(2L).getDouble(2) - 2000.0) < 10.0,
      s"centroid ${out(2L).getDouble(2)}")
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2))
  }

  test("decodeWav: format facts and RMS of a sine") {
    val s2 = spark
    import s2.implicits._
    val rows = Seq(
      (1L, wav(440.0, 0.5)),
      (2L, Array[Byte](9, 9, 9)))
      .toDF("id", "content")
    val out = Multimodal.decodeWav(rows).select("id", "audio.*")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 8000 && out(1L).getInt(2) == 1)
    assert(math.abs(out(1L).getLong(4) - 500L) <= 1) // duration ms
    // RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ≈ 0.354
    assert(math.abs(out(1L).getDouble(5) - 0.3536) < 0.01)
    assert(out(2L).isNullAt(1) && out(2L).getString(6) != null)
  }

  test("video: AVI/MJPEG container walk + real frame decode") {
    import spark.implicits._
    import java.nio.{ByteBuffer, ByteOrder}
    def jpegFrame(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // hand-rolled RIFF writer: hdrl(avih + strl(strh vids/MJPG + strf)),
    // then movi with one 00dc chunk per JPEG frame (even-padded)
    def avi(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
        handler: String = "MJPG"): Array[Byte] = {
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
        id.getBytes("ASCII") ++ le32(body.length) ++ body ++ pad
      }
      def list(tpe: String, body: Array[Byte]): Array[Byte] =
        "LIST".getBytes("ASCII") ++ le32(body.length + 4) ++
          tpe.getBytes("ASCII") ++ body
      def le32(v: Int): Array[Byte] = ByteBuffer.allocate(4)
        .order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
      val avih = le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
      val strh = "vids".getBytes("ASCII") ++ handler.getBytes("ASCII") ++
        le32(0) ++ le32(0) /* prio+lang */ ++ le32(0) ++
        le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++
        le32(0) ++ le32(0) ++ le32(0) ++ Array.fill(8)(0.toByte)
      val strf = le32(40) ++ le32(w) ++ le32(h) ++
        Array[Byte](1, 0, 24, 0) ++ handler.getBytes("ASCII") ++
        le32(w * h * 3) ++ Array.fill(16)(0.toByte)
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi",
        frames.flatMap(f => chunk("00dc", f)).toArray)
      val body = "AVI ".getBytes("ASCII") ++ hdrl ++ movi
      "RIFF".getBytes("ASCII") ++ le32(body.length) ++ body
    }
    // 5 frames: red, red, blue, blue, green — 32x24 @ 25 fps
    val frames = Seq(0xFF0000, 0xFF0000, 0x0000FF, 0x0000FF, 0x00FF00)
      .map(jpegFrame(_, 32, 24))
    val good = avi(frames, 32, 24, 25)
    val h264 = avi(frames.map(_.drop(2)), 32, 24, 25, handler = "H264")
    val rows = Seq((1L, good), (2L, h264),
      (3L, "not a movie".getBytes)).toDF("id", "content")
    val meta = graft.operators.Multimodal.videoMeta(rows)
      .select("id", "video.*").collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getAs[String]("codec") === "MJPG")
    assert(meta(1L).getAs[Int]("width") === 32 &&
      meta(1L).getAs[Int]("height") === 24)
    assert(meta(1L).getAs[Double]("fps") === 25.0)
    assert(meta(1L).getAs[Int]("n_frames") === 5)
    assert(meta(3L).getAs[String]("error") != null)
    // sample 2 frames: indices 0 (red) and 2 (blue), really decoded
    val fr = graft.operators.Multimodal.videoSampleFrames(rows, 2)
      .select(col("id"), col("frames")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    val f1 = fr(1L)
    assert(f1.map(_.getInt(0)) === Seq(0, 2))
    assert(f1(0).getDouble(4) > 200 && f1(0).getDouble(6) < 60) // red frame
    assert(f1(1).getDouble(6) > 200 && f1(1).getDouble(4) < 60) // blue frame
    assert(f1.forall(_.getString(7) == null))
    // non-MJPEG codec: per-frame error, not a crash
    assert(fr(2L).forall(_.getString(7) != null))
  }

  test("video: MS-RLE8 inter-frame decode — delta frames inherit pixels") {
    import spark.implicits._
    import java.nio.{ByteBuffer, ByteOrder}
    def le32(v: Int): Array[Byte] = ByteBuffer.allocate(4)
      .order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0)
        else Array.emptyByteArray
      id.getBytes("ASCII") ++ le32(body.length) ++ body ++ pad
    }
    def list(tpe: String, body: Array[Byte]): Array[Byte] =
      "LIST".getBytes("ASCII") ++ le32(body.length + 4) ++
        tpe.getBytes("ASCII") ++ body
    val (w, h, fps) = (4, 2, 10)
    // palette: 0=red 1=green 2=blue 3=white (RGBQUADs are b,g,r,0)
    val palette = Array[Byte](
      0, 0, -1, 0, /* red */ 0, -1, 0, 0, /* green */
      -1, 0, 0, 0, /* blue */ -1, -1, -1, 0 /* white */)
    // frame 0 (key): bottom row = run mode, top row = absolute mode, all red
    val f0 = Array[Byte](4, 0, 0, 0, /* run 4×idx0, EOL */
      0, 4, 0, 0, 0, 0, /* absolute 4 literal idx0 */
      0, 0, 0, 1) /* EOL, EOF */
    // frame 1 (delta): skip right 2, paint 2 blue on the bottom row;
    // everything else inherits frame 0
    val f1 = Array[Byte](0, 2, 2, 0, /* delta dx=2 dy=0 */
      2, 2, /* run 2×idx2 (blue) */ 0, 0, 0, 1)
    // frame 2 (delta): jump UP one row, paint 1 green; the bottom
    // row's blues must survive from frame 1 — the inter-frame proof
    val f2 = Array[Byte](0, 2, 0, 1, /* delta dx=0 dy=1 */
      1, 1, /* run 1×idx1 (green) */ 0, 0, 0, 1)
    val avih = le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(3) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
    val strh = "vids".getBytes("ASCII") ++ "mrle".getBytes("ASCII") ++
      le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) ++ le32(fps) ++ le32(0) ++ le32(3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ Array.fill(8)(0.toByte)
    // BITMAPINFOHEADER: 8-bit, biCompression=1 (BI_RLE8), 4 palette entries
    val strf = le32(40) ++ le32(w) ++ le32(h) ++
      Array[Byte](1, 0, 8, 0) ++ le32(1) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(4) ++ le32(0) ++ palette
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", chunk("00dc", f0) ++ chunk("00dc", f1) ++
      chunk("00dc", f2))
    val body = "AVI ".getBytes("ASCII") ++ hdrl ++ movi
    val aviBytes = "RIFF".getBytes("ASCII") ++ le32(body.length) ++ body

    val rows = Seq((1L, aviBytes)).toDF("id", "content")
    val meta = Multimodal.videoMeta(rows).select("video.*").head()
    assert(meta.getAs[String]("codec") === "mrle")
    assert(meta.getAs[Int]("n_frames") === 3)

    val fr = Multimodal.videoSampleFrames(rows, 3)
      .select(col("frames")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(fr.map(_.getInt(0)) === Seq(0, 1, 2))
    assert(fr.forall(_.getString(7) == null), fr.mkString("; "))
    def rgb(r: org.apache.spark.sql.Row) =
      (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    // frame 0: 8/8 red
    assert(rgb(fr(0)) === ((255.0, 0.0, 0.0)))
    // frame 1: 6 red + 2 blue
    assert(rgb(fr(1)) === ((6 * 255.0 / 8, 0.0, 2 * 255.0 / 8)))
    // frame 2: 5 red + 1 green + 2 blue — the blues were painted in
    // frame 1 and never re-encoded, so only inter-frame state
    // produces this value
    assert(rgb(fr(2)) === ((5 * 255.0 / 8, 255.0 / 8, 2 * 255.0 / 8)))
  }
}
