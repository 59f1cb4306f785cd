package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML extraction for web corpora — the `html.parse` capability
  * family (`/root/reference/plugins/html/parse_html.cc:106-353`
  * tokenizes HTML with a full parser; corpus cleaning needs the three
  * extractions below, here as pure codegen'd Column regex chains).
  *
  * Every pattern stays inside the Java∩RE2 regex subset — no
  * backreferences, flags via (?is) — so an external SQL engine
  * (DuckDB/RE2) reproduces the extraction bit-for-bit; q80
  * hash-matches the full text path cross-engine.
  */
object HtmlFunctions {

  /** Visible text: drop script/style bodies and comments, strip tags,
    * decode the common entities (&amp; last, so &amp;lt; decodes to
    * the literal "&lt;" and not "<"), collapse whitespace. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** <title> content (first occurrence), entity-decoded + trimmed. */
  def htmlTitle(html: Column): Column =
    htmlToText(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1))

  /** href targets of anchor tags, in document order. */
  def htmlLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?is)href\\s*=\\s*[\"']([^\"'>]+)[\"']"), lit(1))
}
