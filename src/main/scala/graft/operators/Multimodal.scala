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
  * mapInPandas batch shape. The actual codec step is a clearly-marked
  * DETERMINISTIC STUB (no image/audio libraries in this environment);
  * everything around it — schema, partition sizing, batch iteration,
  * output shape — is real and tested, so swapping in a real decoder
  * is a one-function change.
  */
object Multimodal {

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

  /** STUB decode: per-item "pixel statistics" derived deterministically
    * from the bytes. Real implementation would decode `content` with
    * an image codec here — same signature, same batch shape. */
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
