package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Math/stats scalar functions the reference has beyond Spark
  * built-ins.
  *
  * Reference: `binomial_ub_80`/`binomial_lb_80` (Wilson score,
  * `/root/reference/sql/builtin_functions.cc:946-947`), `clamp`
  * (`:3133`), `quantize`, `replace_nan/replace_inf/replace_null`
  * (`:755-775`), `geo_distance` haversine
  * (`sql/builtin_geo_functions.cc:69`).
  *
  * All are deterministic scalar column expressions (codegen-friendly,
  * no UDFs).
  */
object MathFunctions {

  /** Wilson score interval bound. z=1.281551565545 is the 80%
    * two-sided normal quantile used by the reference's
    * binomial_ub_80/binomial_lb_80. */
  private def wilson(trials: Column, successes: Column, z: Double, upper: Boolean): Column = {
    val n = trials.cast("double")
    val p = successes.cast("double") / n
    val z2 = z * z
    val center = p + lit(z2) / (n * 2)
    val spread = lit(z) * sqrt(p * (lit(1.0) - p) / n + lit(z2) / (n * n * 4))
    val denom = lit(1.0) + lit(z2) / n
    if (upper) (center + spread) / denom else (center - spread) / denom
  }

  def binomialUb80(trials: Column, successes: Column): Column =
    wilson(trials, successes, 1.281551565545, upper = true)

  def binomialLb80(trials: Column, successes: Column): Column =
    wilson(trials, successes, 1.281551565545, upper = false)

  /** clamp(x, lo, hi) — reference `sql/builtin_functions.cc:3133`. */
  def clamp(x: Column, lo: Column, hi: Column): Column =
    least(greatest(x, lo), hi)

  /** quantize(x, step): round to the nearest multiple of step. */
  def quantize(x: Column, step: Column): Column =
    round(x / step, 0) * step

  def replaceNan(x: Column, v: Column): Column =
    when(isnan(x), v).otherwise(x)

  def replaceInf(x: Column, v: Column): Column =
    when(abs(x) === Double.PositiveInfinity, v).otherwise(x)

  def replaceNotFinite(x: Column, v: Column): Column =
    when(isnan(x) || abs(x) === Double.PositiveInfinity, v).otherwise(x)

  def replaceNull(x: Column, v: Column): Column = coalesce(x, v)

  /** Haversine great-circle distance in km (reference `geo_distance`
    * returns meters; we expose km and meters). */
  def geoDistanceKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = 6371.0088 // mean Earth radius, km (IUGG)
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * r) * asin(sqrt(a))
  }

  def geoDistanceM(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    geoDistanceKm(lat1, lon1, lat2, lon2) * 1000.0

  /** `ST_Contains_Point(polygon, lat, lon)` (reference
    * `sql/builtin_geo_functions.cc:282`, which takes a GeoJSON row; in
    * this typed engine the polygon is `array<array<double>>` of
    * [lat, lon] vertices — documented divergence). Standard ray-casting
    * in pure Column math: count edges the eastward ray from the point
    * crosses; odd → inside. Codegen'd, no UDF. */
  def stContainsPoint(poly: Column, lat: Column, lon: Column): Column = {
    val n = size(poly)
    val crossings = aggregate(sequence(lit(1), n), lit(0L), (acc, i) => {
      val pi = element_at(poly, i)
      val pj = element_at(poly, when(i === 1, n).otherwise(i - 1))
      val (yi, xi) = (element_at(pi, 1), element_at(pi, 2))
      val (yj, xj) = (element_at(pj, 1), element_at(pj, 2))
      when(((yi > lat) =!= (yj > lat)) &&
        (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi), acc + 1L)
        .otherwise(acc)
    })
    crossings % 2 === 1
  }
}
