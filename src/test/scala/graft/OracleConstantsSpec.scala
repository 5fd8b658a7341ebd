package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Two oracle SQL strings use constant ranges where DuckDB cannot take
  * lateral bounds (ts_fill_gaps' 6 h-bin grid, text_fingerprint's
  * shingle positions). A testdata refresh that leaves those ranges
  * must fail HERE, loudly, instead of silently breaking the oracle
  * compare. */
class OracleConstantsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("events time range stays inside the fill_gaps grid constant") {
    import org.apache.spark.sql.functions._
    for (dir <- dirs) {
      val r = Tables.series(spark, dir)
        .agg(floor(min(col("t")) / 21600.0).cast("long"),
          ceil(max(col("t")) / 21600.0).cast("long")).collect()(0)
      assert(r.getLong(0) >= 70000L && r.getLong(1) <= 90000L,
        s"$dir: 6h bins [${r.getLong(0)}, ${r.getLong(1)}] outside the " +
          "oracle's generate_series(70000, 90000) — widen tsFillGapsSql")
    }
  }

  test("events time range stays inside the ts_interp grid constant") {
    import org.apache.spark.sql.functions._
    for (dir <- dirs) {
      val r = Tables.series(spark, dir)
        .agg(floor(min(col("t")) / 18000.0).cast("long"),
          ceil(max(col("t")) / 18000.0).cast("long")).collect()(0)
      assert(r.getLong(0) >= 84000L && r.getLong(1) <= 108000L,
        s"$dir: 5h steps [${r.getLong(0)}, ${r.getLong(1)}] outside the " +
          "oracle's generate_series(84000, 108000) — widen tsInterpSql")
    }
  }

  test("document length stays inside the fingerprint shingle constant") {
    import org.apache.spark.sql.functions._
    for (dir <- dirs) {
      val maxLen = Tables.table(spark, dir, "documents")
        .agg(max(length(col("text")))).collect()(0).getInt(0)
      assert(maxLen - 7 <= 16384,
        s"$dir: max doc length $maxLen exceeds the oracle's " +
          "generate_series(1, 16384) — widen textFingerprintSql")
    }
  }
}
