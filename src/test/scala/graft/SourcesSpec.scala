package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage: the engine round-trips its tables through
  * csv and json in addition to the native parquet, preserving schema
  * and values (the reference only reads bundled .npy files —
  * format-pluggable IO is part of the Spark-native surface). */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("series survives a csv sink/source round-trip") {
    val s = Tables.series(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    s.write.mode("overwrite").option("header", "true").csv(tmp)
    val back = spark.read.option("header", "true")
      .schema(s.schema).csv(tmp)
    assert(back.count() == s.count())
    val a = s.agg(sum("y")).collect()(0).getDouble(0)
    val b = back.agg(sum("y")).collect()(0).getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }

  test("documents survive a json sink/source round-trip") {
    val d = Tables.table(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString
    d.write.mode("overwrite").json(tmp)
    val back = spark.read.schema(d.schema).json(tmp)
    assert(back.count() == d.count())
    assert(back.agg(sum(length(col("text")))).collect()(0).getLong(0) ==
      d.agg(sum(length(col("text")))).collect()(0).getLong(0))
  }

  test("partitioned parquet sink prunes partitions on read") {
    val e = Tables.table(spark, dir, "events")
      .withColumn("etype", col("event_type"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    e.write.mode("overwrite").partitionBy("etype").parquet(tmp)
    val pruned = spark.read.parquet(tmp).filter(col("etype") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      e.filter(col("event_type") === "click").count())
    // partition filter must reach the scan, not a post-filter
    assert(plan.contains("PartitionFilters: [isnotnull(etype") ||
      plan.contains("PartitionFilters: [(etype"),
      s"partition pruning missing in plan:\n$plan")
  }
}
