package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned events layout — the 100 TB scan-reduction story.
  *
  * The driver testdata ships each table as ONE parquet file, so the
  * two biggest scan levers on a real cluster — static partition
  * pruning of the file listing and dynamic partition pruning (DPP)
  * of a dim-filtered fact join — are exercised nowhere by the flat
  * layout. This helper materializes the layout a production events
  * table would actually use (`.../day=<epoch-day>/part-*.parquet`,
  * Hive-style) under a builder-owned directory, plus the calendar dim
  * that joins against it; PartitionPruningSpec pins both levers on
  * the executed plans and Plans.scala commits the DPP plan to
  * PLANS.md.
  *
  * Day ids use the same explicit positive-mod floor division as
  * events_retention (EventsOps.scala) so pre-epoch timestamps bucket
  * consistently across the repo.
  */
object PartitionedEvents {

  private val DayUs = 86400000000L

  /** events + a `day` epoch-day partition column. */
  def withDay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.table(spark, dir, "events")
    // int day id: the Hive directory read-back infers INT, and a type
    // mismatch would wrap the partition key in a cast at the dim join,
    // defeating the DPP rule's partition-column match
    ev.withColumn("us", Tables.tsMicros(ev))
      .withColumn("day",
        expr(s"(us - pmod(us, $DayUs)) div $DayUs").cast("int"))
      .drop("us")
  }

  /** Write (once per source dir) the day-partitioned copy; returns
    * its path. Lives under target/ — testdata is read-only. The
    * output path is keyed on the SOURCE dir (advisor round 10): a
    * _SUCCESS-only memo served a stale layout from the previous
    * scale factor after switching sf dirs in one JVM. */
  def ensure(spark: SparkSession, dir: String,
      base: String = "target/tmp/events_by_day"): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = new java.io.File(s"$base-$key").getAbsolutePath
    val marker = new java.io.File(path, "_SUCCESS")
    if (!marker.exists()) {
      withDay(spark, dir).write.mode("overwrite")
        .partitionBy("day").parquet(path)
    }
    path
  }

  /** Calendar dim for the partitioned fact: one row per day with its
    * day-of-week — the classic shape whose filtered join should prune
    * fact partitions dynamically (a dim predicate the fact scan can't
    * see statically). */
  def calendarDim(spark: SparkSession, dir: String): DataFrame =
    withDay(spark, dir).select("day").distinct()
      .withColumn("dow", pmod(col("day") + 4, lit(7))) // 1970-01-01 = Thu

  /** The DPP probe: revenue-ish aggregate of the partitioned fact
    * restricted to one weekday via the dim join. The `day` equi-join
    * key is the fact's PARTITION column and the dim is broadcast-size,
    * so Spark inserts a DynamicPruningExpression on the fact scan:
    * only the matching day directories are read. */
  def dppJoin(spark: SparkSession, factPath: String,
      dim: DataFrame): DataFrame = {
    val fact = spark.read.parquet(factPath)
    fact.join(broadcast(dim.filter(col("dow") === 3)), "day")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
  }
}
