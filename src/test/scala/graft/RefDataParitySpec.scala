package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-data parity: the reference's own demo dataset (KIC 9655172,
  * data/spotted_star.npy — the light curve behind tests/test_gp.py)
  * read READ-ONLY through the npy DataSource, mapped to the series
  * table, and sent through the default-grid GLS. The reference's
  * published expectations for this star: rotation period ≈ 10.7 d
  * (prior maximum, test_gp.py:14) / 11.0 d (HarmonicGP MCMC median,
  * test_gp.py:56), with the P/2 harmonic present.
  *
  * Cancels (rather than fails) when the reference checkout is absent —
  * the engine itself never depends on it.
  */
class RefDataParitySpec extends AnyFunSuite {

  private val npyPath =
    "/root/reference/src/periodicity/data/spotted_star.npy"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** spotted_star.npy is (3, 2148): rows t [days], y, dy. Pivot to
    * samples and write a temp events.parquet (t in epoch seconds). */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_refdata").toString
    val raw = spark.read.format("graft.sources.NpyDataSource").load(npyPath)
    val byRow = raw.groupBy("idx").pivot("row", Seq(0L, 1L)).sum("value")
      .withColumnRenamed("0", "t_days").withColumnRenamed("1", "y")
    byRow.select(
        col("idx").cast("long").as("event_id"),
        (col("t_days") * 86400.0 * 1e9).cast("long").as("ts"),
        lit(31L).as("user_id"), lit("lc").as("event_type"),
        col("y").as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/ev")
    val f = new java.io.File(s"$d/ev")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(f.toPath,
      java.nio.file.Paths.get(s"$d/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    d
  }

  test("recovers KIC 9655172's ~11 d rotation period on the auto grid") {
    assume(new java.io.File(npyPath).exists(), "reference data not present")
    val best = spectral.GlsAuto.glsAutogridBest(spark, dir).collect()
    assert(best.length == 1)
    val periodDays = best(0).getDouble(1) / 86400.0
    val power = best(0).getDouble(2)
    // reference: prior max 10.7 d, MCMC median 11.0 d — the GLS peak
    // of the raw light curve sits at the same rotation signal
    assert(periodDays > 10.0 && periodDays < 12.0,
      s"expected the ~11 d rotation period, got $periodDays d")
    assert(power > 0.5, s"rotation peak should dominate, power=$power")
  }

  test("the P/2 spot harmonic is a secondary peak (prior peak at 5.6 d)") {
    assume(new java.io.File(npyPath).exists(), "reference data not present")
    val pg = spectral.GlsAuto.glsAutogrid(spark, dir)
      .orderBy("k").collect()
      .map(r => (r.getDouble(2), r.getDouble(3))) // (freq_uhz, power)
    // the 5000-frequency cap engages on this baseline/cadence
    assert(pg.length == 5000, s"expected the MaxNf cap, got ${pg.length}")
    val peaks = (1 until pg.length - 1).filter(i =>
      pg(i)._2 > pg(i - 1)._2 && pg(i)._2 > pg(i + 1)._2)
      .map(i => (1e6 / pg(i)._1 / 86400.0, pg(i)._2)) // (period d, power)
      .sortBy(-_._2)
    val half = peaks.take(5).find(p => p._1 > 5.0 && p._1 < 6.2)
    assert(half.isDefined,
      s"no P/2 harmonic in the top peaks: ${peaks.take(5).map(_._1)}")
  }
}
