package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Image-header metadata WITHOUT a codec: container formats put the
  * pixel dimensions in the first bytes (PNG IHDR, GIF logical screen
  * descriptor, BMP info header) or in a marker walk (JPEG SOFn), so a
  * 100 TB corpus can be size-filtered / bucketed by resolution from
  * pure byte arithmetic — no image library, no decode, no Python.
  * Returns struct(format, width, height); null for unrecognized or
  * truncated payloads. Byte layouts per the public format
  * specifications (PNG RFC 2083 §3; GIF89a spec §18; BMP
  * BITMAPINFOHEADER; JPEG ISO/IEC 10918-1 SOF segment). */
case class ImageHeaderMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))
  override def prettyName: String = "graft_image_header_meta"

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val out: (String, Int, Int) =
      if (b.length >= 24 &&
          (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
        ("png", be32(b, 16), be32(b, 20))
      } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
        ("gif", le16(b, 6), le16(b, 8))
      } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
        ("bmp", le32(b, 18), math.abs(le32(b, 22)))
      } else if (b.length >= 4 &&
          (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG: walk segments to the first SOFn (C0-CF minus C4/C8/CC)
        var i = 2
        var res: (String, Int, Int) = null
        while (res == null && i + 3 < b.length) {
          if ((b(i) & 0xff) != 0xff) { i += 1 } // padding / junk
          else {
            val marker = b(i + 1) & 0xff
            if (marker == 0xff) i += 1 // fill byte
            else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2 // no payload
            else {
              val len = be16(b, i + 2)
              if (marker >= 0xc0 && marker <= 0xcf &&
                  marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
                if (i + 8 < b.length)
                  res = ("jpeg", be16(b, i + 7), be16(b, i + 5))
                else i = b.length
              } else i += 2 + len
            }
          }
        }
        res
      } else null
    if (out == null) null
    else InternalRow(UTF8String.fromString(out._1),
      Integer.valueOf(out._2), Integer.valueOf(out._3))
  }

  override protected def withNewChildInternal(c: Expression): ImageHeaderMeta =
    copy(child = c)
}

object ImageHeaderMeta {
  def column(binary: Column): Column =
    GraftColumnBridge.column(ImageHeaderMeta(
      GraftColumnBridge.expression(binary)))
}

/** EXIF metadata subset (`parse_exif`,
  * `/root/reference/sql/builtin_image_functions.cc:208`): walk the JPEG
  * APP1 "Exif\0\0" segment's TIFF IFD0 — byte order II/MM, 12-byte
  * directory entries — and surface the tags corpus pipelines filter on:
  * orientation (0x0112), camera make (0x010F) / model (0x0110), and
  * DateTime (0x0132). Bare TIFF payloads (II*\0 / MM\0*) parse too.
  * Pure byte arithmetic per the public TIFF 6.0 / EXIF 2.3 specs — no
  * image library. Null when no EXIF is present; individual fields null
  * when their tag is absent. */
case class ExifMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("orientation", IntegerType),
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("datetime", StringType)))
  override def prettyName: String = "graft_exif_meta"

  private def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (le) ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** offset of the TIFF header inside the payload, or -1. */
  private def tiffStart(b: Array[Byte]): Int = {
    def isTiff(i: Int): Boolean = i + 8 <= b.length && (
      (b(i) == 'I' && b(i + 1) == 'I' && u16(b, i + 2, le = true) == 42) ||
      (b(i) == 'M' && b(i + 1) == 'M' && u16(b, i + 2, le = false) == 42))
    if (isTiff(0)) return 0
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return -1
    // JPEG: walk segments looking for APP1 "Exif\0\0"
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) i += 1
      else {
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) i += 1
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
        else {
          val len = u16(b, i + 2, le = false)
          if (marker == 0xe1 && i + 10 <= b.length &&
              b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
              b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
            return if (isTiff(i + 10)) i + 10 else -1
          }
          if (marker == 0xda) return -1 // scan data: no EXIF before it
          i += 2 + len
        }
      }
    }
    -1
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val t = tiffStart(b)
    if (t < 0) return null
    val le = b(t) == 'I'
    // u32 can exceed Int.MaxValue or wrap negative on corrupt files —
    // bound-check on the long BEFORE narrowing (caught by fuzzing)
    val ifdL = t.toLong + u32(b, t + 4, le)
    if (ifdL < 0 || ifdL + 2 > b.length) return null
    val ifd = ifdL.toInt
    val n = u16(b, ifd, le)
    var orientation: Integer = null
    var make: UTF8String = null
    var model: UTF8String = null
    var datetime: UTF8String = null
    def ascii(count: Long, valOff: Int): UTF8String = {
      val start = if (count <= 4) valOff else t + u32(b, valOff, le).toInt
      val len0 = math.min(count, math.max(0, b.length - start)).toInt
      if (start < 0 || len0 <= 0) return null
      var len = len0
      while (len > 0 && b(start + len - 1) == 0) len -= 1 // strip NULs
      UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, start + len))
    }
    var e = 0
    while (e < n && ifd + 2 + (e + 1) * 12 <= b.length) {
      val off = ifd + 2 + e * 12
      val tag = u16(b, off, le)
      val tpe = u16(b, off + 2, le)
      val count = u32(b, off + 4, le)
      tag match {
        case 0x0112 if tpe == 3 => orientation = u16(b, off + 8, le)
        case 0x010f if tpe == 2 => make = ascii(count, off + 8)
        case 0x0110 if tpe == 2 => model = ascii(count, off + 8)
        case 0x0132 if tpe == 2 => datetime = ascii(count, off + 8)
        case _ => ()
      }
      e += 1
    }
    if (orientation == null && make == null && model == null && datetime == null)
      null
    else InternalRow(orientation, make, model, datetime)
  }

  override protected def withNewChildInternal(c: Expression): ExifMeta =
    copy(child = c)
}

object ExifMeta {
  def column(binary: Column): Column =
    GraftColumnBridge.column(ExifMeta(GraftColumnBridge.expression(binary)))
}

/** `tf_EncodePng` (reference TensorFlow plugin,
  * `plugins/tensorflow/tensorflow_plugin.cc`;
  * testing/MLDB-1979-structure-embedding.py): encode an H×W×C pixel
  * embedding (C = 1 grayscale, 3 RGB, 4 RGBA) into a PNG blob. The
  * JDK's ImageIO PNG writer stands in for TF's libpng call — the
  * decoded pixels round-trip identically; the compressed byte stream
  * differs from TF's (documented divergence: different zlib
  * filter/window heuristics, same image). */
case class PngEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_png_encode"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rows = input.asInstanceOf[ArrayData]
    val h = rows.numElements()
    if (h == 0) return null
    val row0 = rows.getArray(0)
    val w = row0.numElements()
    if (w == 0) return null
    val c = row0.getArray(0).numElements()
    val imgType = c match {
      case 1 => java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      case 3 => java.awt.image.BufferedImage.TYPE_INT_RGB
      case 4 => java.awt.image.BufferedImage.TYPE_INT_ARGB
      case other => throw new IllegalArgumentException(
        s"tf_EncodePng: $other channels (want 1, 3 or 4)")
    }
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    // grayscale writes go through the raster: setRGB on TYPE_BYTE_GRAY
    // would run an sRGB→linear-gray colorspace conversion and store a
    // DIFFERENT sample (128 → ~55), breaking the round-trip contract
    val grayRaster = if (c == 1) img.getRaster else null
    var y = 0
    while (y < h) {
      val rowArr = rows.getArray(y)
      var x = 0
      while (x < w) {
        val px = rowArr.getArray(x)
        def ch(i: Int): Int =
          math.max(0, math.min(255, math.round(px.getDouble(i)).toInt))
        c match {
          case 1 => grayRaster.setSample(x, y, 0, ch(0))
          case 3 => img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
          case 4 => img.setRGB(x, y,
            (ch(3) << 24) | (ch(0) << 16) | (ch(1) << 8) | ch(2))
        }
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  override protected def withNewChildInternal(c: Expression): PngEncode =
    copy(child = c)
}

object PngEncode {
  def column(pixels: Column): Column =
    GraftColumnBridge.column(PngEncode(
      GraftColumnBridge.expression(pixels)))
}
