package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loaders for the driver-generated star schema + events /
  * documents / embeddings tables (see TESTDATA.md).
  *
  * All graft operators consume the "series view" of `events`:
  * one row per sample of one of many independent series —
  * (id = series key, t = epoch seconds as double, y = value).
  * This is the Spark-native analogue of the reference's single
  * in-memory `TSeries` (reference core.py:460): the 100 TB axis is
  * the number of series, so every operator is keyed by `id` and
  * scales linearly with executors.
  */
object Tables {
  /** Fact tables arrive as ONE small parquet file locally, which Spark
    * reads as a single partition — every downstream expansion would
    * run in one task. Fan facts out to the full core count up front
    * (on a real cluster the many-file layout provides this for free;
    * the shuffle here is a few MB). Dimension tables stay as-is — they
    * broadcast. */
  private val factTables =
    Set("lineitem", "orders", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") // ts is parquet timestamp[ns] — see series()
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (factTables(name)) df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** events as a many-series table: id=user_id, t=epoch secs, y=value.
    *
    * events.ts is parquet timestamp[ns]; Spark reads it as a raw
    * nanosecond long (legacy.parquet.nanosAsLong) which we truncate to
    * exact integer microseconds (`div 1000`) — the same truncation
    * DuckDB applies reading ns into its µs timestamps — and then apply
    * the identical `µs / 1e6` double division on both sides, so `t` is
    * bit-identical to the oracle's. */
  def series(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events").select(
      col("user_id").as("id"),
      (expr("ts div 1000").cast("double") / 1000000.0).as("t"),
      col("value").as("y"),
      col("event_id").as("eid"))
  }

  /** Oracle-side twin of [[series]]. */
  val seriesSql: String =
    "SELECT user_id AS id, cast(epoch_us(ts) AS double)/1000000.0 AS t, " +
      "value AS y, event_id AS eid FROM events"
}
