package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `http.useragent` analog
  * (`/root/reference/plugins/html/useragent_function.cc:106`): parse a
  * User-Agent string into {os, browser, device, isSpider}. The
  * reference drives a uap-core regex YAML; this is a compact built-in
  * ruleset for the families that dominate real web logs, as pure
  * codegen'd Column regex — per-row work, no UDF, no config file.
  *
  * Match order matters and mirrors uap-core's: Edge and Opera carry a
  * "Chrome/" token and must match first; "Safari/" alone is not
  * Safari unless a "Version/" token is present (Chrome UAs carry
  * Safari/537.36).
  */
object UserAgentFunctions {

  private def ver(ua: Column, re: String): Column = {
    val v = regexp_extract(ua, re, 1)
    when(v === "", lit(null)).otherwise(v)
  }

  def parseUserAgent(ua: Column): Column = {
    val browser =
      when(ua.rlike("Edge?/"), struct(lit("Edge").as("family"),
        ver(ua, "Edge?/([0-9.]+)").as("version")))
      .when(ua.rlike("OPR/|Opera"), struct(lit("Opera").as("family"),
        ver(ua, "(?:OPR|Opera)[/ ]([0-9.]+)").as("version")))
      .when(ua.rlike("Chrom(e|ium)/"), struct(
        when(ua.contains("Chromium"), "Chromium").otherwise("Chrome").as("family"),
        ver(ua, "Chrom(?:e|ium)/([0-9.]+)").as("version")))
      .when(ua.rlike("Firefox/"), struct(lit("Firefox").as("family"),
        ver(ua, "Firefox/([0-9.]+)").as("version")))
      .when(ua.rlike("MSIE |Trident/"), struct(lit("IE").as("family"),
        coalesce(ver(ua, "MSIE ([0-9.]+)"), ver(ua, "rv:([0-9.]+)")).as("version")))
      .when(ua.rlike("Version/[0-9.]+.*Safari/"), struct(lit("Safari").as("family"),
        ver(ua, "Version/([0-9.]+)").as("version")))
      .otherwise(struct(lit("Other").as("family"),
        lit(null).cast("string").as("version")))

    val os =
      when(ua.rlike("Windows NT"), struct(lit("Windows").as("family"),
        ver(ua, "Windows NT ([0-9.]+)").as("version")))
      .when(ua.rlike("iPhone OS|iPad; CPU OS"), struct(lit("iOS").as("family"),
        regexp_replace(ver(ua, "OS ([0-9_]+)"), "_", ".").as("version")))
      .when(ua.rlike("Mac OS X"), struct(lit("Mac OS X").as("family"),
        regexp_replace(ver(ua, "Mac OS X ([0-9_.]+)"), "_", ".").as("version")))
      .when(ua.rlike("Android"), struct(lit("Android").as("family"),
        ver(ua, "Android ([0-9.]+)").as("version")))
      .when(ua.rlike("CrOS"), struct(lit("Chrome OS").as("family"),
        lit(null).cast("string").as("version")))
      .when(ua.rlike("Linux"), struct(lit("Linux").as("family"),
        lit(null).cast("string").as("version")))
      .otherwise(struct(lit("Other").as("family"),
        lit(null).cast("string").as("version")))

    val device =
      when(ua.rlike("iPhone"), struct(lit("Apple").as("brand"), lit("iPhone").as("model")))
      .when(ua.rlike("iPad"), struct(lit("Apple").as("brand"), lit("iPad").as("model")))
      .when(ua.rlike("Macintosh"), struct(lit("Apple").as("brand"), lit("Mac").as("model")))
      .when(ua.rlike("SM-[A-Za-z0-9]+"), struct(lit("Samsung").as("brand"),
        ver(ua, "(SM-[A-Za-z0-9]+)").as("model")))
      .when(ua.rlike("Android"), struct(lit("Generic_Android").as("brand"),
        lit(null).cast("string").as("model")))
      .otherwise(struct(lit("Other").as("brand"),
        lit(null).cast("string").as("model")))

    val isSpider = ua.rlike("(?i)bot|crawl|spider|slurp|archiver|curl/|wget/|httpclient|python-requests")

    struct(os.as("os"), browser.as("browser"), device.as("device"),
      isSpider.as("isSpider"))
  }
}
