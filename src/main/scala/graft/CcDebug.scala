package graft

/** Stage-cost breakdown of the dedup_clusters chain on an arbitrary
  * corpus dir (candidates -> exact-Jaccard verification -> connected
  * components, each persisted and timed separately) — the diagnostic
  * behind the round-13 skew rows in SCALING.md.
  *
  * Usage: runMain graft.CcDebug <corpusDir>
  */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcDebug {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"[ccdebug] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      t0 = System.nanoTime()
    }
    val cand = dedup.Dedup.minhashCand(spark, dir, dedup.Dedup.MaxBucket)
      .persist()
    println(s"[ccdebug] cand pairs: ${cand.count()}"); lap("cand")
    val lsh = dedup.Dedup.dedupMinhashLsh(spark, dir).persist()
    println(s"[ccdebug] lsh rows: ${lsh.count()}"); lap("lsh-jaccard")
    val pairs = lsh.filter(col("jaccard") >= 0.5).select("id1", "id2")
    println(s"[ccdebug] edges(one-dir): ${pairs.count()}"); lap("edges")
    val edges = pairs.union(pairs.select(col("id2").as("id1"),
      col("id1").as("id2"))).toDF("src", "dst")
    val (labels, rounds) = dedup.Dedup.ccWithRounds(edges)
    println(s"[ccdebug] cc rounds: $rounds labels: ${labels.count()}")
    lap("cc")
    spark.stop()
  }
}
