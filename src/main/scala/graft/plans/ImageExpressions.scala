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
