package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `fetcher` function (`/root/reference/builtin/fetcher.cc:188`):
  * url → struct(content: binary, error: string). The reference's
  * standard way of pulling external content (images, files) into a
  * pipeline; exactly one of content/error is non-null, and a fetch
  * failure NEVER fails the query — the error travels as data, the
  * reference's contract.
  *
  * Declared non-deterministic so Catalyst neither constant-folds a
  * fetch of a literal URL at plan time nor collapses/reorders repeated
  * fetches across filters. Runs on executors (one connection per row)
  * — for bulk ingest prefer partition-level readers; this is the
  * row-level convenience the reference exposes in SQL.
  *
  * `maxBytes` caps the response (64 MiB default) so one pathological
  * URL cannot OOM an executor. */
case class Fetcher(child: Expression, timeoutMs: Int, maxBytes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("content", BinaryType),
    StructField("error", StringType)))
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_fetcher"

  private def err(msg: String): InternalRow =
    InternalRow(null, UTF8String.fromString(msg))

  override def nullSafeEval(input: Any): Any = {
    val url = input.asInstanceOf[UTF8String].toString
    try {
      val conn = new java.net.URI(url).toURL.openConnection()
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      val in = conn.getInputStream
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0 && out.size() <= maxBytes) {
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        if (out.size() > maxBytes) err(s"response exceeds $maxBytes bytes")
        else InternalRow(out.toByteArray, null)
      } finally in.close()
    } catch {
      // the reference surfaces libcurl's message texts
      // (testing/MLDB-2100 greps "Timeout was reached", MLDB-2166
      // greps "No such file")
      case _: java.net.SocketTimeoutException =>
        err("Timeout was reached")
      case e: java.io.FileNotFoundException =>
        err(s"No such file or directory: ${String.valueOf(e.getMessage)}")
      case _: IllegalArgumentException | _: java.net.MalformedURLException |
           _: java.net.URISyntaxException =>
        err(s"No such file or directory: $url")
      case e: Exception =>
        err(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
    }
  }

  override protected def withNewChildInternal(c: Expression): Fetcher =
    copy(child = c)
}

object Fetcher {
  def column(url: Column, timeoutMs: Int = 10000,
      maxBytes: Int = 64 << 20): Column =
    GraftColumnBridge.column(
      Fetcher(GraftColumnBridge.expression(url), timeoutMs, maxBytes))
}
