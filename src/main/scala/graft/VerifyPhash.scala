package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Targeted correctness dump for the phash pair join at a CALLER-SIZED
  * band geometry (round 12 continuation #2): the driver gate always
  * runs the 6×10 default; this main re-runs `multimodal_phash_pairs`
  * with widened bands (band bits grow with the corpus so bucket
  * occupancy stays constant — the LSH analogue of SemDeDup's
  * corpus-derived K) and dumps parquet + the MATCHING oracle SQL, so
  * tools/check_oracle.py can hash-gate the scaled geometry on the
  * 10×/100× CorpusGen corpora. Prints the query's wall seconds for
  * the SCALING.md record.
  *
  * Usage: runMain graft.VerifyPhash <sfDir> <outDir> <nBands> <bandBits>
  */
object VerifyPhash {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, nbS, bbS) = args
    val nb = nbS.toInt
    val bb = bbS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // time the bare execution first (the dump below single-threads
    // through coalesce(1) and would dominate the wall clock)
    val timed = graft.multimodal.Phash.multimodalPhashPairs(spark, sfDir, nb, bb)
    val t0 = System.nanoTime()
    val n = timed.queryExecution.toRdd.count()
    println(f"phash_pairs ${nb}x$bb rows=$n exec_s=${(System.nanoTime() - t0) / 1e9}%.2f")
    graft.multimodal.Phash.multimodalPhashPairs(spark, sfDir, nb, bb)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/multimodal_phash_pairs")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = Map("multimodal_phash_pairs" ->
      graft.multimodal.Phash.multimodalPhashPairsSqlFor(nb, bb))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
