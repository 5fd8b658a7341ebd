package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Per-operator metrics dump for one query — the measurement side of
  * the plan audit: `runMain graft.Prof <query>` runs the query twice
  * (warm-up + timed) and prints every physical node with its metric
  * values (output rows, agg/sort/shuffle times), so "where do the
  * seconds go" is read off the executed plan instead of guessed. */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      // AQE sizes coalesced partitions by BYTES; per-series kernels
      // (IIR/sift/Cholesky) are CPU-heavy at tiny byte sizes, so the
      // default 1 MB floor serializes them onto 1-2 threads. 64 KB
      // keeps parallelism-first targeting at full width (at real scale
      // partitions are byte-bound anyway, so this floor is inert).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1") // see Bench
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.series(spark, sfDir).persist().count()
    // collect(), not count(): count() plans a NEW QueryExecution, so
    // df.queryExecution's metrics would stay zero
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // warm-up: codegen + JIT
    val t0 = System.nanoTime()
    df.collect()
    println(s"== timed run: ${(System.nanoTime() - t0) / 1e9} s ==")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val m = p.metrics.toSeq
        .filter { case (_, v) => v.value > 0 }
        .sortBy(_._1)
        .map { case (k, v) => s"$k=${v.value}" }
        .mkString(" ")
      println(("  " * depth) + p.nodeName + "  " + m)
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case _ => p.children
      }
      kids.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
