package graft.functions

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.functions.udf

/** Geo point math — POINT(x, y) + DISTANCE(p1, p2, algo).
  *
  * Reference: dozer-sql/expression/src/geo/distance.rs:18-31 supports
  * GEODESIC (default), HAVERSINE, VINCENTY over (x=lon, y=lat) points
  * in degrees, returning meters. GEODESIC here uses the Vincenty
  * iteration (sub-mm agreement with Karney on non-antipodal inputs).
  */
object GeoUtils {
  private val R = 6371000.0 // mean earth radius, meters (haversine)
  private val WGS84_A = 6378137.0
  private val WGS84_B = 6356752.314245
  private val WGS84_F = 1.0 / 298.257223563

  def haversine(x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val dLat = math.toRadians(y2 - y1)
    val dLon = math.toRadians(x2 - x1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(y1)) * math.cos(math.toRadians(y2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * R * math.asin(math.sqrt(a))
  }

  /** Vincenty inverse formula on WGS-84; falls back to haversine if the
    * iteration fails to converge (near-antipodal points).
    */
  def vincenty(x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    if (x1 == x2 && y1 == y2) return 0.0
    val L = math.toRadians(x2 - x1)
    val U1 = math.atan((1 - WGS84_F) * math.tan(math.toRadians(y1)))
    val U2 = math.atan((1 - WGS84_F) * math.tan(math.toRadians(y2)))
    val sinU1 = math.sin(U1); val cosU1 = math.cos(U1)
    val sinU2 = math.sin(U2); val cosU2 = math.cos(U2)
    var lambda = L
    var iter = 0
    var cosSqAlpha = 0.0; var sinSigma = 0.0; var cosSigma = 0.0
    var sigma = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 200 && !converged) {
      val sinLambda = math.sin(lambda); val cosLambda = math.cos(lambda)
      sinSigma = math.sqrt(
        math.pow(cosU2 * sinLambda, 2) +
          math.pow(cosU1 * sinU2 - sinU1 * cosU2 * cosLambda, 2))
      if (sinSigma == 0.0) return 0.0
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLambda
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinLambda / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM =
        if (cosSqAlpha == 0.0) 0.0
        else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val C = WGS84_F / 16 * cosSqAlpha * (4 + WGS84_F * (4 - 3 * cosSqAlpha))
      val lambdaPrev = lambda
      lambda = L + (1 - C) * WGS84_F * sinAlpha *
        (sigma + C * sinSigma *
          (cos2SigmaM + C * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - lambdaPrev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) return haversine(x1, y1, x2, y2)
    val uSq = cosSqAlpha * (WGS84_A * WGS84_A - WGS84_B * WGS84_B) / (WGS84_B * WGS84_B)
    val A = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val B = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = B * sinSigma *
      (cos2SigmaM + B / 4 *
        (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
          B / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) *
            (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    WGS84_B * A * (sigma - deltaSigma)
  }

  def dispatch(algo: String, x1: Double, y1: Double, x2: Double, y2: Double): Double =
    algo.toUpperCase match {
      case "HAVERSINE"            => haversine(x1, y1, x2, y2)
      case "VINCENTY" | "GEODESIC" => vincenty(x1, y1, x2, y2)
      case other =>
        throw new IllegalArgumentException(s"unknown distance algorithm: $other")
    }
}

object GeoUdfs {
  private val distUdf = udf { (p1: Row, p2: Row, algo: String) =>
    if (p1 == null || p2 == null) null.asInstanceOf[java.lang.Double]
    else java.lang.Double.valueOf(GeoUtils.dispatch(
      if (algo == null) "GEODESIC" else algo,
      p1.getDouble(0), p1.getDouble(1), p2.getDouble(0), p2.getDouble(1)))
  }

  /** Codegen path: a `StaticInvoke` of [[GeoUtils]] — stays inside
    * whole-stage codegen (the generated code calls the static forwarder
    * directly), unlike a Scala UDF which breaks the codegen span.
    * The algorithm is resolved at plan time from the literal name.
    */
  def distance(p1: Column, p2: Column, algo: String): Column = {
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.types.DoubleType
    val fn = algo.toUpperCase match {
      case "HAVERSINE"             => "haversine"
      case "VINCENTY" | "GEODESIC" => "vincenty"
      case other =>
        throw new IllegalArgumentException(s"unknown distance algorithm: $other")
    }
    val args = Seq(p1.getField("x"), p1.getField("y"),
      p2.getField("x"), p2.getField("y")).map(GraftShims.expression)
    GraftShims.column(StaticInvoke(
      GeoUtils.getClass, DoubleType, fn, args))
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_distance",
      (x1: Double, y1: Double, x2: Double, y2: Double, algo: String) =>
        GeoUtils.dispatch(if (algo == null) "GEODESIC" else algo, x1, y1, x2, y2))
    spark.udf.register("distance", distUdf)
  }
}
