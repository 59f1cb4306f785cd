package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Path / web / misc scalar functions completing the SURVEY §2.5
  * inventory.
  *
  * MLDB `Path` values (`/root/reference/sql/path.h`) are dotted
  * element lists (`a.b.3`); our wide mode stores them as dotted
  * strings, so the path functions are string/array conversions
  * (`parse_path` `sql/builtin_functions.cc:3153` … `path_length`
  * `:3260`). Web: `extract_domain`
  * (`sql/builtin_http_functions.cc:78`), `mime_type` (`:3612`).
  */
object PathFunctions {

  /** parse_path('a.b.c') → ['a','b','c']. QUOTE-AWARE like the
    * reference's Path parser: a double-quoted element keeps its dots
    * and unescapes doubled quotes (`"region.0"` is ONE element —
    * MLDB-1678's printed NAMED names round-trip). */
  def parsePath(s: Column): Column = {
    val toks = call_function("regexp_extract_all", s,
      lit("(\"(?:[^\"]|\"\")*\"|[^.]+)"), lit(1))
    transform(toks, t =>
      when(t.startsWith("\"") && t.endsWith("\"") && length(t) >= 2,
        regexp_replace(t.substr(lit(2), length(t) - 2),
          lit("\"\""), lit("\"")))
        .otherwise(t))
  }

  /** stringify_path(['a','b']) → 'a.b' — re-quoting elements that
    * contain dots or quotes, so printed paths round-trip. */
  def stringifyPath(p: Column): Column =
    array_join(transform(p, e =>
      when(e.rlike("[.\"]"),
        concat(lit("\""), regexp_replace(e, lit("\""), lit("\"\"")),
          lit("\"")))
        .otherwise(e)), ".")

  /** 0-based path element; a NEGATIVE index counts from the end
    * (rowPathElement(-1) = last element, MLDB-1636). Out-of-range
    * reads NULL. */
  def pathElement(p: Column, n: Column): Column = {
    val idx = when(n >= 0, n + 1).otherwise(n).cast("int")
    when(abs(idx) <= size(p), element_at(p, idx))
  }

  def pathLength(p: Column): Column = size(p)

  /** flatten_path: nested struct field ref → dotted column name is the
    * identity in our encoding; exposed for API parity. */
  def flattenPath(s: Column): Column = s

  /** extract_domain(url[, removeSubdomain]) — host of a URL. */
  def extractDomain(url: Column, removeSubdomain: Boolean = false): Column = {
    val host = parse_url(url, lit("HOST"))
    if (!removeSubdomain) host
    else {
      // keep last two labels (heuristic, like the reference's default)
      val parts = split(host, "\\.")
      when(size(parts) <= 2, host)
        .otherwise(concat_ws(".", slice(parts, -2, 2)))
    }
  }

  /** mime_type(blob): magic-byte sniffing for common formats
    * (reference uses libmagic; we cover the usual suspects). */
  /** The reference renders libmagic DESCRIPTIONS, not MIME ids
    * (`sql/builtin_functions.cc:3562` magic_holder;
    * testing/MLDB-2166_mime_type.py greps 'JPEG image data'). */
  def mimeType(blob: Column): Column = {
    val hexHead = hex(substring(blob, 1, 8))
    when(hexHead.startsWith("FFD8FF"), "JPEG image data")
      .when(hexHead.startsWith("89504E47"), "PNG image data")
      .when(hexHead.startsWith("47494638"), "GIF image data")
      .when(hexHead.startsWith("25504446"), "PDF document")
      .when(hexHead.startsWith("504B0304"), "Zip archive data")
      .when(hexHead.startsWith("1F8B"), "gzip compressed data")
      .when(hexHead.startsWith("494433"), "Audio file with ID3")
      .when(substring(blob, 5, 4).cast("string") === "ftyp",
        "ISO Media, MP4")
      .otherwise("data")
  }

  /** blob_length (`sql/builtin_functions.cc:2479`). */
  def blobLength(blob: Column): Column = length(blob).cast("long")

  /** ISO date parts the reference exposes beyond Spark's extract:
    * isodow (Mon=1..Sun=7), isoweek, isodoy. */
  def isoDow(ts: Column): Column =
    (pmod(dayofweek(ts) + 5, lit(7)) + 1).cast("long")

  def isoWeek(ts: Column): Column = weekofyear(ts).cast("long")
}
