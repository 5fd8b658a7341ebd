package graft.spectral

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bootstrap false-alarm statistics for the GLS periodogram —
  * reference spectral.py:140-163 (GLS.bootstrap / fap / fal): resample
  * the values (keeping the time stamps), take each replicate's maximum
  * periodogram power, and read off the FAP of the observed best peak
  * and the 95% false-alarm level. Resampling is splitmix64-seeded per
  * (series, replicate) — deterministic cluster-wide. Rows-only oracle
  * (sequential per-series bootstrap; not SQL-expressible).
  */
object GlsBootstrap {
  private val B = 25 // bootstrap replicates
  private val NF = 50 // reduced frequency grid f_k = k/(30 d), k=1..NF
  private val DF = Gls.DF

  private def nextLong(state0: Long): (Long, Long) = {
    val state = state0 + 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (state, z ^ (z >>> 31))
  }

  /** Max GLS power (fit_mean, uniform weights) over the reduced grid. */
  private def maxPower(t: Array[Double], y: Array[Double]): Double = {
    val n = t.length
    val mean = y.sum / n
    val yc = y.map(_ - mean)
    var yy = 0.0
    yc.foreach(v => yy += v * v)
    yy /= n
    var best = 0.0
    var k = 1
    while (k <= NF) {
      val om = 2.0 * math.Pi * DF * k
      var c = 0.0; var s = 0.0; var ch = 0.0; var sh = 0.0
      var c2 = 0.0; var s2 = 0.0
      var i = 0
      while (i < n) {
        val a = om * t(i)
        val ca = math.cos(a); val sa = math.sin(a)
        c += ca; s += sa
        ch += yc(i) * ca; sh += yc(i) * sa
        c2 += ca * ca - sa * sa // cos(2a)
        s2 += 2.0 * sa * ca // sin(2a)
        i += 1
      }
      c /= n; s /= n; ch /= n; sh /= n; c2 /= n; s2 /= n
      val tan2 = (s2 - 2.0 * s * c) / (c2 - (c * c - s * s))
      val c2w = 1.0 / math.sqrt(1.0 + tan2 * tan2)
      val s2w = tan2 * c2w
      val cw = math.sqrt(0.5) * math.sqrt(1.0 + c2w)
      val sw = math.sqrt(0.5) * math.signum(s2w) * math.sqrt(1.0 - c2w)
      val yyc = ch * cw + sh * sw
      val yys = sh * cw - ch * sw
      val cc = 0.5 * (1.0 + c2 * c2w + s2 * s2w) -
        (c * cw + s * sw) * (c * cw + s * sw)
      val ss = 0.5 * (1.0 - c2 * c2w - s2 * s2w) -
        (s * cw - c * sw) * (s * cw - c * sw)
      val p = (yyc * yyc / cc + yys * yys / ss) / yy
      if (p > best) best = p
      k += 1
    }
    best
  }

  def glsFap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.series(spark, dir)
      .select(col("id").cast("long"), col("t"), col("y"),
        col("eid").cast("long"))
      .as[(Long, Double, Double, Long)]
      .groupByKey(_._1)
      .mapGroups { (id: Long, it: Iterator[(Long, Double, Double, Long)]) =>
        // (t, eid) sort: deterministic under repartitioning
        val rows = it.toArray.sortBy(r => (r._2, r._4))
        val t0 = rows.head._2
        val t = rows.map(_._2 - t0)
        val y = rows.map(_._3)
        val n = t.length
        val observed = maxPower(t, y)
        val maxima = new Array[Double](B)
        var b = 0
        var state = id * 0x5851f42d4c957f2dL
        while (b < B) {
          val ys = new Array[Double](n)
          var i = 0
          while (i < n) {
            val (st2, r) = nextLong(state)
            state = st2
            ys(i) = y(((r >>> 1) % n).toInt)
            i += 1
          }
          maxima(b) = maxPower(t, ys)
          b += 1
        }
        java.util.Arrays.sort(maxima)
        // FAP of observed peak = fraction of replicates above it
        var above = 0
        maxima.foreach(m => if (m > observed) above += 1)
        val fap = above.toDouble / B
        // 95% false-alarm level (nearest-rank quantile)
        val fal95 = maxima(math.min(B - 1, math.ceil(0.95 * B).toInt - 1))
        (id, math.rint(observed * 1e6) / 1e6, math.rint(fap * 1e4) / 1e4,
          math.rint(fal95 * 1e6) / 1e6)
      }
      .toDF("id", "best_power", "fap", "fal95")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gls_fap" -> (glsFap _))
}
