package graft.sources

import org.apache.spark.sql.SparkSession

/** Deterministic synthetic documents/embeddings generator for scaling
  * evidence ABOVE the driver's largest testdata (round 11, VERDICT
  * item 5): the dedup/ANN/text pillar's 100 TB posture claims
  * (occupancy-capped band joins, bounded pair output, edge-∝ CC
  * shuffle) had never been measured past sf0.1. This emits a corpus
  * with the driver testdata's shape (token-salad text over a small
  * vocabulary, 5 langs / 20 sources, 64-dim clustered embeddings) at
  * a caller-chosen multiple, with planted exact (1%) and near (2%)
  * duplicates so the dedup family has real work at every scale.
  *
  * Generation is distributed (spark.range → map, no driver-side
  * materialization) and splitmix64-seeded per row id, so any scale
  * generates identically and in parallel.
  *
  * Usage: runMain graft.sources.CorpusGen <outDir> <nDocs> <nVecs>
  */
object CorpusGen {

  // same public constants as SeriesOps2's splitmix64
  private def mix(seed0: Long): () => Long = {
    var s = seed0
    () => {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }
  private def unif(next: () => Long): Double =
    (next() >>> 11).toDouble / (1L << 53).toDouble

  private val Vocab: Array[String] = Array(
    "spark", "line", "column", "order", "small", "sort", "fast", "value",
    "scan", "hash", "slow", "group", "batch", "agg", "filter", "query",
    "a", "big", "key", "window", "row", "part", "table", "stream",
    "merge", "data", "vector", "join", "the", "customer")
  private val Langs = Array("en", "es", "fr", "de", "zh")
  private val Dim = 64
  private val Clusters = 10

  private def docText(id: Long): String = {
    val next = mix(id * 0x9e3779b9L + 17)
    val len = 15 + (unif(next) * 45).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < len) {
      if (i > 0) sb.append(' ')
      sb.append(Vocab((unif(next) * Vocab.length).toInt))
      i += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "target/tmp/corpus10x"
    val nDocs = if (args.length > 1) args(1).toLong else 50000L
    val nVecs = if (args.length > 2) args(2).toLong else 20000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.range(0, nDocs, 1, 32).map { id =>
      val next = mix(id)
      val roll = unif(next)
      // planted duplicates reference EARLIER ids only (id >= 100):
      // 1% exact copies, 2% near copies with one token region rewritten
      val text =
        if (id >= 100 && roll < 0.01) docText(id % (id / 2 + 1))
        else if (id >= 100 && roll < 0.03) {
          val base = docText(id % (id / 2 + 1))
          val toks = base.split(' ')
          val j = (unif(next) * toks.length).toInt
          toks.updated(j, Vocab((unif(next) * Vocab.length).toInt))
            .mkString(" ")
        } else docText(id)
      val lang =
        if (unif(next) < 0.4) "en" else Langs(1 + (unif(next) * 4).toInt)
      (id, text, lang, s"src${(unif(next) * 20).toInt}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

    val vecs = spark.range(0, nVecs, 1, 32).map { id =>
      val next = mix(id + 0x5eedL)
      val label = (unif(next) * Clusters).toInt
      // cluster centers on coordinate axes + noise — the IVF/ANN
      // structure of the driver corpus (labels ≈ recoverable cells)
      val emb = Array.tabulate(Dim) { d =>
        val center = if (d % Clusters == label) 2.0f else 0.0f
        center + (unif(next) * 0.6 - 0.3).toFloat
      }
      (id, emb, label)
    }.toDF("vec_id", "embedding", "label")

    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$out/_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$out/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    new java.io.File(out).mkdirs()
    writeOne(docs, "documents")
    writeOne(vecs, "embeddings")
    println(s"""{"out":"$out","docs":$nDocs,"vecs":$nVecs}""")
    spark.stop()
  }
}
