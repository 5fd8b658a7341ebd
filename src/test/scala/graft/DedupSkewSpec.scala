package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The band-bucket self-joins must stay bounded under bucket skew: a
  * hot bucket of k near-identical docs may contribute at most
  * cap·(cap−1)/2 candidate pairs, not k², because bucket occupancy is
  * capped at the first `cap` members in deterministic doc_id order. */
class DedupSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A corpus of k identical documents: every minhash band bucket (and
    * every simhash band bucket) holds all k docs — the worst case. */
  private lazy val hotDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hot").toString
    val text = "the quick brown fox jumps over the lazy dog again and again"
    (0 until 40)
      .map(i => (i.toLong, text, "en", "spec", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents")
    // Tables.table reads "$dir/<name>.parquet"
    val f = new java.io.File(s"$dir/documents")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(f.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("minhash LSH pair output is capped under a hot bucket") {
    val cap = 8
    val pairs = dedup.Dedup.dedupMinhashLsh(spark, hotDir, cap).count()
    // 40 identical docs, 4 identical band buckets; uncapped would give
    // 40*39/2 = 780 pairs — the cap keeps the first 8 per bucket.
    assert(pairs == cap.toLong * (cap - 1) / 2,
      s"expected ${cap * (cap - 1) / 2} capped pairs, got $pairs")
  }

  test("simhash banded-Hamming pair output is capped under a hot bucket") {
    val cap = 8
    val pairs = dedup.Dedup.dedupSimhashPairs(spark, hotDir, cap).count()
    assert(pairs == cap.toLong * (cap - 1) / 2,
      s"expected ${cap * (cap - 1) / 2} capped pairs, got $pairs")
  }

  test("identical docs verify at jaccard 1 and hamming 0") {
    import org.apache.spark.sql.functions._
    val j = dedup.Dedup.dedupMinhashLsh(spark, hotDir, 4)
      .agg(min("jaccard"), max("jaccard")).collect()(0)
    assert(j.getDouble(0) == 1.0 && j.getDouble(1) == 1.0)
    val h = dedup.Dedup.dedupSimhashPairs(spark, hotDir, 4)
      .agg(max("hamming")).collect()(0).getLong(0)
    assert(h == 0L)
  }
}
