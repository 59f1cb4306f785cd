package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque binary + typed
  * metadata, with decode/feature steps structured for scale.
  *
  * Contract (per the engine's LLM-pipeline mandate): the binary
  * payload is NEVER interpreted by Catalyst — it flows as
  * `BinaryType` next to a typed metadata struct, and heavy per-item
  * work runs per-partition in batches, the Scala analog of the
  * mapInPandas batch shape.
  *
  * Codecs: image decode/resize/perceptual-hash and WAV audio decode
  * are REAL, on the JDK's own codecs (javax.imageio handles
  * PNG/JPEG/GIF/BMP; javax.sound.sampled handles WAV/PCM) — no
  * external library. Video: the AVI/RIFF container walk is real
  * (codec/dims/fps/frame chunks), MJPEG frames — whole JPEGs —
  * decode end to end via ImageIO, and MS-RLE8 (BI_RLE8) decodes as a
  * true INTER-frame codec (delta/skip escapes inherit the previous
  * frame's pixels — `rleApply`); codecs with no public pure-JVM
  * decode path (H264…) surface per-frame errors (documented
  * divergence). Decode errors
  * travel as data (null result + error string), never as task
  * failures: one corrupt file in a 100 TB corpus must not kill a
  * stage.
  */
object Multimodal {

  // executors have no display; keep AWT headless and ImageIO off the
  // disk cache (temp-file churn per decode otherwise)
  System.setProperty("java.awt.headless", "true")
  javax.imageio.ImageIO.setUseCache(false)

  /** media metadata struct carried beside every binary column. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_frames", IntegerType)))

  /** Wrap any table into the multimodal shape with a synthetic binary
    * payload (deterministic from a source column) — stands in for
    * `spark.read.format("binaryFile")` in tests. */
  def synthesize(df: DataFrame, idCol: String, payloadFrom: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      col(payloadFrom).cast("string").cast("binary").as("content"),
      struct(
        lit("image/x-stub").as("mime"),
        (pmod(xxhash64(col(payloadFrom)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col(payloadFrom), lit(1)), lit(1080)) + 1).cast("int").as("height"),
        (pmod(xxhash64(col(payloadFrom), lit(2)), lit(60000)) + 1000).as("duration_ms"),
        (pmod(xxhash64(col(payloadFrom), lit(3)), lit(300)) + 1).cast("int").as("n_frames"))
        .as("meta"))

  /** REAL image-header metadata (no codec required): parse pixel
    * dimensions out of PNG/GIF/BMP/JPEG container headers with pure
    * byte arithmetic — the `parse_exif`-class capability that actually
    * matters for corpus filtering at scale (resolution bucketing,
    * aspect-ratio filters) without decoding a single pixel. */
  def imageMeta(binary: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.plans.ImageHeaderMeta.column(binary)

  /** EXIF subset (`parse_exif`): orientation / camera make / model /
    * DateTime from the JPEG APP1 TIFF-IFD walk (bare TIFF too) — the
    * rotation-normalization and camera-provenance filters a 100 TB
    * image corpus needs, still without any codec. */
  def exifMeta(binary: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.plans.ExifMeta.column(binary)

  /** `fetcher`: url → {content, error} on the executors — the
    * reference's URL→blob bridge (`builtin/fetcher.cc:188`). */
  def fetch(url: org.apache.spark.sql.Column,
      timeoutMs: Int = 10000): org.apache.spark.sql.Column =
    graft.plans.Fetcher.column(url, timeoutMs)

  // ---------- real pixel codecs (JDK ImageIO) ----------

  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  /** Decode pixels and compute per-channel statistics: the standard
    * corpus-quality signals (black/blank frames, channel imbalance,
    * luma distribution) computed from REAL decoded pixels. Failures
    * yield a null-stats row with the error message. */
  def decodeImages(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("image", StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("mean_luma", DoubleType),
        StructField("mean_r", DoubleType),
        StructField("mean_g", DoubleType),
        StructField("mean_b", DoubleType),
        StructField("error", StringType)))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = try {
          val img = readImage(r.getAs[Array[Byte]](idx))
          if (img == null) Row(null, null, null, null, null, null, "undecodable")
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0.0, 0.0, 0.0)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                x += 1
              }
              y += 1
            }
            val n = (w.toLong * h).toDouble
            val (mr, mg, mb) = (sr / n, sg / n, sb / n)
            Row(w, h, 0.299 * mr + 0.587 * mg + 0.114 * mb, mr, mg, mb, null)
          }
        } catch {
          case e: Exception =>
            Row(null, null, null, null, null, null,
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Real resize: decode, scale so max(side) == maxSide (never
    * upscale), bilinear, re-encode. Adds `resized` (binary, null on
    * failure) and `resized_meta` (width, height, error). */
  def resizeImages(df: DataFrame, maxSide: Int,
      contentCol: String = "content", format: String = "png"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resized_meta", StructType(Seq(
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("error", StringType))))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (bin, meta) = try {
          val img = readImage(r.getAs[Array[Byte]](idx))
          if (img == null) (null, Row(null, null, "undecodable"))
          else {
            val scale = maxSide.toDouble / math.max(img.getWidth, img.getHeight)
            val (w, h) =
              if (scale >= 1.0) (img.getWidth, img.getHeight)
              else (math.max(1, math.floor(img.getWidth * scale).toInt),
                math.max(1, math.floor(img.getHeight * scale).toInt))
            // JPEG has no alpha channel — render onto RGB for "jpg"
            val target = new java.awt.image.BufferedImage(w, h,
              if (format == "png") java.awt.image.BufferedImage.TYPE_INT_ARGB
              else java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = target.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(target, format, bos)
            (bos.toByteArray, Row(w, h, null))
          }
        } catch {
          case e: Exception =>
            (null, Row(null, null, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
        Row.fromSeq(r.toSeq ++ Seq(bin, meta))
      }
    }(enc)
  }

  /** dHash perceptual fingerprint (public difference-hash algorithm:
    * 9×8 grayscale downsample, bit = left pixel brighter than right).
    * Near-identical images land within a few hamming bits, so image
    * near-dup dedup reduces to `Dedup.hammingPairs` on this column. */
  def imageDHash(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("phash", LongType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val hash: java.lang.Long = try {
          val img = readImage(r.getAs[Array[Byte]](idx))
          if (img == null) null
          else {
            val small = new java.awt.image.BufferedImage(9, 8,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val g = small.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, 9, 8, null)
            g.dispose()
            val raster = small.getRaster
            var bits = 0L
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                if (raster.getSample(x, y, 0) > raster.getSample(x + 1, y, 0))
                  bits |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            Long.box(bits)
          }
        } catch { case _: Exception => null }
        Row.fromSeq(r.toSeq :+ hash)
      }
    }(enc)
  }

  /** WAV/PCM audio decode (javax.sound.sampled): format facts +
    * RMS amplitude — the silence/clipping filters an audio corpus
    * needs. Non-WAV payloads yield the error slot (the JDK ships no
    * other audio codec — documented). */
  def decodeWav(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("audio", StructType(Seq(
        StructField("sample_rate", IntegerType),
        StructField("channels", IntegerType),
        StructField("n_frames", LongType),
        StructField("duration_ms", LongType),
        StructField("rms", DoubleType),
        StructField("error", StringType)))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](idx)))
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val bytes = in.readAllBytes()
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          var sumSq = 0.0
          var n = 0
          if (bytesPerSample == 2) {
            var i = 0
            while (i + 1 < bytes.length) {
              val s =
                if (fmt.isBigEndian)
                  ((bytes(i) << 8) | (bytes(i + 1) & 0xFF)).toShort
                else ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort
              sumSq += (s / 32768.0) * (s / 32768.0)
              n += 1
              i += 2
            }
          } else {
            var i = 0
            while (i < bytes.length) {
              val s = ((bytes(i) & 0xFF) - 128) / 128.0
              sumSq += s * s
              n += 1
              i += 1
            }
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          val durMs = (frames * 1000.0 / fmt.getFrameRate).toLong
          Row(fmt.getSampleRate.toInt, fmt.getChannels, frames, durMs, rms, null)
        } catch {
          case e: Exception =>
            Row(null, null, null, null, null,
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Fixed power-of-2 window of normalized mono samples from WAV
    * payloads (channel-averaged, zero-padded) — the bridge from the
    * real audio codec to the engine's FFT column functions: feature
    * extraction stays declarative Column math over this array. */
  def wavSamples(df: DataFrame, contentCol: String = "content",
      n: Int = 4096): DataFrame = {
    require((n & (n - 1)) == 0, s"window must be a power of 2, got $n")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType),
      StructField("samples", ArrayType(DoubleType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (rate, samples): (Any, Any) = try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](idx)))
          val fmt = in.getFormat
          val ch = fmt.getChannels
          val bps = fmt.getSampleSizeInBits / 8
          val frameBytes = ch * bps
          val need = n * frameBytes
          val buf = in.readNBytes(need)
          val out = new Array[Double](n)
          var f = 0
          while (f * frameBytes + frameBytes <= buf.length) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val off = f * frameBytes + c * bps
              val v =
                if (bps == 2) {
                  (if (fmt.isBigEndian)
                    ((buf(off) << 8) | (buf(off + 1) & 0xFF)).toShort
                  else ((buf(off + 1) << 8) | (buf(off) & 0xFF)).toShort) / 32768.0
                } else ((buf(off) & 0xFF) - 128) / 128.0
              acc += v
              c += 1
            }
            out(f) = acc / ch
            f += 1
          }
          (Int.box(fmt.getSampleRate.toInt), out.toSeq)
        } catch { case _: Exception => (null, null) }
        Row.fromSeq(r.toSeq ++ Seq(rate, samples))
      }
    }(enc)
  }

  /** Spectral centroid in Hz of a `wavSamples` window: index-weighted
    * mean of the FFT amplitude spectrum (DC excluded), scaled to Hz.
    * Pure Column math over the sample array — composes with any other
    * expression, no extra decode pass. */
  def spectralCentroidHz(samples: org.apache.spark.sql.Column,
      sampleRate: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    // Hann window before the FFT: a rectangular window's 1/Δ leakage
    // tails bias the amplitude-weighted mean by hundreds of Hz; Hann
    // sidelobes decay as 1/Δ³ so the centroid lands on the tone.
    val windowed = zip_with(samples, sequence(lit(0), lit(n - 1)),
      (x, i) => x * (lit(0.5) - lit(0.5) * cos(i * (2.0 * math.Pi / (n - 1)))))
    val amps = graft.functions.SignalFunctions.amplitude(
      graft.functions.SignalFunctions.fft(windowed))
    // positive-frequency bins 1..n/2 only (the FFT of a real signal is
    // mirror-symmetric; DC carries no frequency information). The slice
    // and the index sequence have the same length — zip_with pads the
    // shorter array with NULLs, which would poison the sum.
    val positive = slice(amps, 2, n / 2)
    val weighted = aggregate(
      zip_with(positive, sequence(lit(1), lit(n / 2)), (a, i) => a * i),
      lit(0.0), (acc, x) => acc + x)
    val total = aggregate(positive, lit(0.0), (acc, x) => acc + x)
    // CASE WHEN evaluates its branch lazily per row, so decode failures
    // (null/short sample arrays) never reach the FFT
    when(samples.isNotNull && size(samples) === lit(n),
      when(total > 0, weighted / total * sampleRate.cast("double") / n))
  }

  /** Byte-level statistics (no codec): cheap integrity/fingerprint
    * pass over any binary payload, including formats the JDK cannot
    * decode (video containers). */
  def decodeStats(df: DataFrame): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("decoded", StructType(Seq(
        StructField("n_bytes", LongType),
        StructField("mean_byte", DoubleType),
        StructField("checksum", LongType))))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // batch loop: the mapInPandas shape — decode many items per task,
      // never one JVM call per pixel
      rows.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        val bytes = if (content == null) Array.emptyByteArray else content
        var sum = 0L
        var crc = 1125899906842597L
        var i = 0
        while (i < bytes.length) {
          sum += (bytes(i) & 0xff)
          crc = crc * 31 + (bytes(i) & 0xff)
          i += 1
        }
        val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
        Row.fromSeq(r.toSeq :+ Row(bytes.length.toLong, mean, crc))
      }
    }(enc)
  }

  // ---- video: AVI/RIFF container walk + MJPEG frame decode ---------------

  /** Parsed AVI stream facts: codec fourcc, dimensions, fps, frame
    * chunks as (offset, length) into the original byte array, plus
    * the video `strf` BITMAPINFOHEADER facts needed to decode
    * paletted codecs (biBitCount, biCompression, the RGBQUAD palette
    * as 0xRRGGBB ints). */
  private case class AviInfo(codec: String, width: Int, height: Int,
      fps: Double, frames: IndexedSeq[(Int, Int)],
      bitCount: Int, compression: Int, palette: Array[Int])

  /** RIFF is a plain chunk grammar — fourcc + u32le size (+ 'LIST'
    * subtype) — so the walk is ~40 lines of pure JVM; no codec needed
    * to FIND frames. MJPEG frames are then whole JPEGs, which ImageIO
    * CAN decode, and MS-RLE8 (BI_RLE8 / fourcc 'mrle') is decoded by
    * `rleApply` below — so both an intra-frame and a true inter-frame
    * codec are real end to end. Other codecs (H264…) surface
    * per-frame errors instead of silently stubbing. */
  private def parseAvi(b: Array[Byte]): AviInfo = {
    def u32(off: Int): Long =
      ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def cc(off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(b.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ",
      "not a RIFF/AVI container")
    var codec = ""
    var width = 0
    var height = 0
    var usPerFrame = 0L
    var bitCount = 0
    var compression = 0
    var palette = Array.emptyIntArray
    var wantVidsStrf = false
    val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    def walk(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = cc(off)
        val size = u32(off + 4).toInt
        if (id == "LIST" && off + 12 <= end) {
          walk(off + 12, math.min(end, off + 8 + size))
        } else id match {
          case "avih" =>
            usPerFrame = u32(off + 8)
            width = u32(off + 8 + 32).toInt
            height = u32(off + 8 + 36).toInt
          case "strh" if cc(off + 8) == "vids" =>
            if (codec.isEmpty) { codec = cc(off + 12).trim; wantVidsStrf = true }
          case "strf" if wantVidsStrf =>
            // BITMAPINFOHEADER: biSize, biWidth, biHeight, planes+bits,
            // biCompression @+16; RGBQUAD palette (b,g,r,0) follows the
            // header at biSize bytes in, biClrUsed entries (0 → 2^bits)
            wantVidsStrf = false
            if (size >= 40) {
              val h0 = off + 8
              bitCount = (u32(h0 + 12) >> 16).toInt & 0xffff
              compression = u32(h0 + 16).toInt
              val clrUsed = u32(h0 + 32).toInt
              val biSize = u32(h0).toInt
              val entries =
                if (clrUsed > 0) clrUsed
                else if (bitCount > 0 && bitCount <= 8) 1 << bitCount
                else 0
              val pStart = h0 + biSize
              if (entries > 0 && pStart + entries * 4 <= off + 8 + size)
                palette = Array.tabulate(entries) { i =>
                  val p = pStart + i * 4
                  ((b(p + 2) & 0xff) << 16) | ((b(p + 1) & 0xff) << 8) |
                    (b(p) & 0xff)
                }
            }
          case f if f.length == 4 && f(0).isDigit && f(1).isDigit &&
              (f.endsWith("dc") || f.endsWith("db")) =>
            frames += ((off + 8, size))
          case _ => ()
        }
        off += 8 + size + (size & 1) // chunks pad to even
      }
    }
    walk(12, b.length)
    val fps = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
    AviInfo(codec, width, height, fps, frames.toIndexedSeq,
      bitCount, compression, palette)
  }

  /** Apply one MS-RLE8 frame (BI_RLE8 — the format Windows BMP/AVI
    * document publicly) onto the persistent 8-bit `surface`. This IS
    * an inter-frame codec: any pixel the frame's commands do not
    * write — regions jumped over by the delta escape (00 02 dx dy),
    * lines ended early (00 00), or everything after an early
    * end-of-bitmap (00 01) — keeps the PREVIOUS frame's value, so
    * delta frames carry only what changed. Rows run bottom-up as in
    * BMP; `surface` is kept top-down (row-major from the top) so the
    * stats pass reads it naturally. */
  private def rleApply(b: Array[Byte], off0: Int, len: Int,
      surface: Array[Byte], w: Int, h: Int): Unit = {
    var off = off0
    val end = off0 + len
    var x = 0
    var row = 0 // 0 = bottom row
    def put(v: Byte): Unit = {
      if (row < h && x < w) surface((h - 1 - row) * w + x) = v
      x += 1
    }
    var done = false
    while (!done && off + 2 <= end) {
      val n = b(off) & 0xff
      val v = b(off + 1) & 0xff
      off += 2
      if (n > 0) {
        var i = 0
        while (i < n) { put(v.toByte); i += 1 }
      } else v match {
        case 0 => row += 1; x = 0 // end of line
        case 1 => done = true     // end of bitmap — rest unchanged
        case 2 =>                 // delta: skip right dx, up dy
          if (off + 2 > end) done = true
          else { x += b(off) & 0xff; row += b(off + 1) & 0xff; off += 2 }
        case cnt =>               // absolute: cnt literal pixels, word-padded
          var i = 0
          while (i < cnt && off + i < end) { put(b(off + i)); i += 1 }
          off += cnt + (cnt & 1)
      }
    }
  }

  /** True when the stream decodes with `rleApply` — BI_RLE8 in the
    * strf header, or the 'mrle'/'RLE' fourccs some muxers write. */
  private def isRle8(info: AviInfo): Boolean =
    info.compression == 1 || info.codec.equalsIgnoreCase("mrle") ||
      info.codec.equalsIgnoreCase("rle")

  /** Decode an MS-RLE8 stream SEQUENTIALLY from frame 0 (the
    * inter-frame state lives in the surface) and emit the stats row
    * at each sampled index. A corrupt frame poisons every later
    * frame's state, so decode stops there and the remaining samples
    * carry the error. Cost is bounded by the last sampled frame, not
    * by k. */
  private def rleSampleStats(bytes: Array[Byte], info: AviInfo,
      wanted: Seq[Int]): Seq[Row] = {
    val w = info.width
    val h = info.height
    val surface = new Array[Byte](w * h)
    val wantSet = wanted.toSet
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    var fi = 0
    var failed: String = null
    val maxIdx = if (wanted.isEmpty) -1 else wanted.max
    while (fi <= maxIdx) {
      if (failed == null) {
        val (off, len) = info.frames(fi)
        try rleApply(bytes, off, len, surface, w, h)
        catch { case e: Exception =>
          failed = s"${e.getClass.getSimpleName}: ${e.getMessage}" }
      }
      if (wantSet(fi)) {
        if (failed != null)
          out += Row(fi, null, null, null, null, null, null, failed)
        else {
          val pal = info.palette
          var (sr, sg, sb) = (0.0, 0.0, 0.0)
          var i = 0
          while (i < surface.length) {
            val pi = surface(i) & 0xff
            // no palette → treat the index itself as gray
            val rgb = if (pi < pal.length) pal(pi)
              else (pi << 16) | (pi << 8) | pi
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            i += 1
          }
          val n = surface.length.toDouble
          val (mr, mg, mb) = (sr / n, sg / n, sb / n)
          out += Row(fi, w, h, 0.299 * mr + 0.587 * mg + 0.114 * mb,
            mr, mg, mb, null)
        }
      }
      fi += 1
    }
    out.toSeq
  }

  /** Container-level video metadata: codec, dimensions, fps, REAL
    * frame count (from the movi chunk walk, not the header's claim).
    * Errors as data, batch shape — the image-decode conventions. */
  def videoMeta(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("video", StructType(Seq(
        StructField("container", StringType),
        StructField("codec", StringType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("fps", DoubleType),
        StructField("n_frames", IntegerType),
        StructField("error", StringType)))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = try {
          val info = parseAvi(r.getAs[Array[Byte]](idx))
          Row("avi", info.codec, info.width, info.height, info.fps,
            info.frames.length, null)
        } catch {
          case e: Exception => Row(null, null, null, null, null, null,
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Sample k deterministic frames per video and DECODE them (MJPEG:
    * each frame chunk is a complete JPEG). Adds `frames`:
    * array of (frame_idx, width, height, mean_luma, mean_r/g/b,
    * error) — the per-frame twin of `decodeImages`. Non-MJPEG codecs
    * yield per-frame "codec not decodable" errors (the JDK ships no
    * inter-frame codec), never a crash. */
  def videoSampleFrames(df: DataFrame, k: Int,
      contentCol: String = "content"): DataFrame = {
    require(k > 0, "k must be positive")
    val frameStruct = StructType(Seq(
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", DoubleType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("error", StringType)))
    val schema = StructType(df.schema.fields :+
      StructField("frames", ArrayType(frameStruct)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val frames: Seq[Row] = try {
          val bytes = r.getAs[Array[Byte]](idx)
          val info = parseAvi(bytes)
          val chunks = info.frames
          if (chunks.isEmpty) Seq.empty
          else if (isRle8(info) && info.width > 0 && info.height > 0) {
            // inter-frame path: state lives in the surface, so decode
            // runs sequentially from frame 0 up to the last sample
            val wanted = (0 until math.min(k, chunks.length)).map { i =>
              if (k >= chunks.length) i
              else (i.toLong * chunks.length / k).toInt
            }
            rleSampleStats(bytes, info, wanted)
          }
          else (0 until math.min(k, chunks.length)).map { i =>
            // k ≥ frames → every frame once; otherwise evenly strided
            // (i·len/k collapses to repeated index 0 when k > len)
            val fi = if (k >= chunks.length) i
              else (i.toLong * chunks.length / k).toInt
            val (off, len) = chunks(fi)
            try {
              // a decodable frame starts with the JPEG SOI marker
              if (len < 2 || (bytes(off) & 0xff) != 0xff ||
                  (bytes(off + 1) & 0xff) != 0xd8)
                Row(fi, null, null, null, null, null, null,
                  "codec not decodable in the JVM (MJPEG/MS-RLE8 only)")
              else {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes, off, len))
                if (img == null)
                  Row(fi, null, null, null, null, null, null, "undecodable")
                else {
                  val (w, h) = (img.getWidth, img.getHeight)
                  var (sr, sg, sb) = (0.0, 0.0, 0.0)
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val p = img.getRGB(x, y)
                      sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF
                      sb += p & 0xFF
                      x += 1
                    }
                    y += 1
                  }
                  val n = (w.toLong * h).toDouble
                  val (mr, mg, mb) = (sr / n, sg / n, sb / n)
                  Row(fi, w, h, 0.299 * mr + 0.587 * mg + 0.114 * mb,
                    mr, mg, mb, null)
                }
              }
            } catch {
              case e: Exception => Row(fi, null, null, null, null, null,
                null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
            }
          }
        } catch {
          case e: Exception => Seq(Row(null, null, null, null, null, null,
            null, s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
        Row.fromSeq(r.toSeq :+ frames)
      }
    }(enc)
  }

  /** Frame sampling plan: k deterministic frame indices per item from
    * metadata — pure column math, no decode needed (the decode of the
    * SELECTED frames would be the stubbed step). */
  def frameSamplePlan(df: DataFrame, k: Int): DataFrame =
    df.withColumn("sample_frames",
      transform(sequence(lit(0), lit(k - 1)),
        i => least((i * col("meta.n_frames")) / k, col("meta.n_frames") - 1)))

  /** "Resize" plan: target dims preserving aspect ratio — metadata
    * math now, codec later. */
  def resizePlan(df: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = lit(maxSide.toDouble) / greatest(w, h)
    df.withColumn("resize_to", struct(
      when(scale >= 1, w).otherwise(floor(w * scale)).cast("int").as("width"),
      when(scale >= 1, h).otherwise(floor(h * scale)).cast("int").as("height")))
  }
}
