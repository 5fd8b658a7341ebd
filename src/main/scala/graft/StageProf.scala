package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level measurement for queries whose work happens in jobs the
  * returned DataFrame's plan does not show (the streaming replays:
  * MemoryStream micro-batches execute inside runAppend, so Prof's
  * executed-plan walk sees only the memory-sink scan). A listener
  * aggregates task time / GC / shuffle bytes per stage name, printed
  * sorted by cost — `runMain graft.StageProf <query>`. */
object StageProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1") // see Bench
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.series(spark, sfDir).persist().count()
    val agg = new java.util.concurrent.ConcurrentHashMap[String,
      (Long, Long, Long, Long, Int)]() // runMs, cpuMs, gcMs, tasks, stages
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        val key = s.stageInfo.name.takeWhile(_ != '(').trim + " @ " +
          s.stageInfo.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("StageProf"))
            .getOrElse("").trim.take(80)
        agg.merge(key,
          (m.executorRunTime, m.executorCpuTime / 1000000,
            m.jvmGCTime, s.stageInfo.numTasks.toLong, 1),
          (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3,
            a._4 + b._4, a._5 + b._5))
      }
    })
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm-up
    agg.clear()
    // self-sampling profiler: every 400 ms, histogram the deepest
    // "interesting" frame of every Executor task thread (sandbox ps
    // cannot see the forked JVM, so jstack is unavailable)
    val samples = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            val top = st.take(14).map(f => f.getClassName + "." +
              f.getMethodName).mkString(" <- ")
            samples.computeIfAbsent(s"[${t.getState}] $top",
              _ => new java.util.concurrent.atomic.AtomicLong())
              .incrementAndGet()
          }
        }
        Thread.sleep(400)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    sampling = false
    println(f"== timed run: ${(System.nanoTime() - t0) / 1e9}%.2f s ==")
    import scala.jdk.CollectionConverters._
    println("== task-thread samples ==")
    samples.asScala.toSeq.sortBy(-_._2.get).take(12).foreach {
      case (k, v) => println(f"${v.get}%5d  $k")
    }
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    agg.asScala.toSeq.sortBy(-_._2._1).take(30).foreach {
      case (k, (run, cpu, gc, tasks, stages)) =>
        println(f"run=${run}%6d ms cpu=${cpu}%6d ms gc=${gc}%5d ms " +
          f"tasks=$tasks%4d stages=$stages%3d  $k")
    }
    spark.stop()
  }
}
