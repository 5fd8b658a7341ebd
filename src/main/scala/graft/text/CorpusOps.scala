package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators a pretraining data pipeline runs
  * after filtering/dedup: sequence packing (concat-and-chunk token
  * binning) and temperature-based source mixing. Both are pure
  * aggregate/window algebra — no UDFs, no driver-side state.
  */
object CorpusOps {

  /** Fixed training-sequence token budget (GPT-style packing). */
  private val BinTokens = 512

  /** Prefix-sum chunk width: doc_id div 64 gives order-preserving
    * chunks so the global token prefix sum runs as ONE narrow window
    * per chunk + ONE tiny window over chunk totals (never a global
    * single-partition window over the corpus). At 100 TB the same
    * two-phase pattern nests — chunk totals are themselves chunkable,
    * depth log_W(N) — so no level ever exceeds W·(N/W^k) rows. */
  private val ChunkDocs = 64

  // -------------------------------------------------------------------
  // corpus_pack — concat-and-chunk sequence packing: lay every doc's
  // whitespace tokens out on one global tape in doc_id order, cut the
  // tape into fixed 512-token training sequences, and account each
  // bin: docs starting in it, their token mass, and how many of them
  // straddle a sequence boundary (the packing-efficiency stat every
  // pretraining run reports). The global tape offset is a TWO-PHASE
  // prefix sum (intra-chunk window + broadcast chunk offsets), not a
  // global window — the distributed prefix-sum shape that survives a
  // corpus that doesn't fit one partition.
  // -------------------------------------------------------------------
  def corpusPack(spark: SparkSession, dir: String): DataFrame =
    packTape(Tables.table(spark, dir, "documents"))

  /** The packing plan over any (doc_id, text) frame — split out so the
    * property spec can drive it with generated corpora and compare
    * against an independent in-memory packer. */
  private[graft] def packTape(docs: DataFrame): DataFrame = {
    val nt = docs
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= lit("")))
          .cast("long").as("ntok"))
      .filter(col("ntok") > 0)
      .withColumn("bucket", expr(s"doc_id div $ChunkDocs"))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = nt.withColumn("cum", sum("ntok").over(wIn))
    // chunk totals: bounded rows (N / ChunkDocs), broadcast back
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = nt.groupBy("bucket").agg(sum("ntok").as("btok"))
      .withColumn("off", coalesce(sum("btok").over(wOff), lit(0L)))
      .select("bucket", "off")
    cum.join(broadcast(off), "bucket")
      .withColumn("start", col("off") + col("cum") - col("ntok"))
      .withColumn("bin", expr(s"start div $BinTokens"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("ntok").as("n_tokens"),
        sum(when(expr(s"(start + ntok - 1) div $BinTokens") > col("bin"), 1L)
          .otherwise(0L)).as("n_split"),
        min("doc_id").as("first_doc"))
  }

  val corpusPackSql: String =
    s"""WITH nt AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS ntok,
       |    doc_id // $ChunkDocs AS bucket
       |  FROM documents
       |  WHERE len(list_filter(string_split(text, ' '), t -> t <> '')) > 0),
       |c AS (
       |  SELECT doc_id, ntok, bucket,
       |    sum(ntok) OVER (PARTITION BY bucket ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM nt),
       |o AS (
       |  SELECT bucket,
       |    coalesce(sum(btok) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM (SELECT bucket, sum(ntok) AS btok FROM nt GROUP BY 1)),
       |s AS (
       |  SELECT c.doc_id, c.ntok, o.off + c.cum - c.ntok AS start
       |  FROM c JOIN o USING (bucket))
       |SELECT start // $BinTokens AS bin,
       |  count(*) AS n_docs,
       |  cast(sum(ntok) AS BIGINT) AS n_tokens,
       |  cast(sum(CASE WHEN (start + ntok - 1) // $BinTokens > start // $BinTokens
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_split,
       |  min(doc_id) AS first_doc
       |FROM s GROUP BY 1""".stripMargin

  // -------------------------------------------------------------------
  // corpus_temperature — temperature-based source mixing (T = 0.7):
  // per (lang, source) the sampling share w_s ∝ n_s^T and the implied
  // per-source epoch count share·N/n_s — the up/down-sampling factor
  // each source sees under the mixture. One groupBy over the
  // documents scan + a 1-row broadcast of the normalizer; libm pow
  // drift (~1 ulp) is 1e-15-scale against the 5e-7 rounding grid.
  // -------------------------------------------------------------------
  def corpusTemperature(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.table(spark, dir, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
    val t = g.agg(sum(pow(col("n_docs"), 0.7)).as("sw"),
      sum("n_docs").as("nd"))
    g.crossJoin(broadcast(t))
      .select(col("lang"), col("source"), col("n_docs"), col("total_chars"),
        round(pow(col("n_docs"), 0.7) / col("sw"), 6).as("share"),
        round(pow(col("n_docs"), 0.7) / col("sw") * col("nd") / col("n_docs"),
          6).as("epochs"))
  }

  val corpusTemperatureSql: String =
    """WITH g AS (
      |  SELECT lang, source, count(*) AS n_docs,
      |    cast(sum(n_chars) AS BIGINT) AS total_chars
      |  FROM documents GROUP BY 1, 2),
      |t AS (
      |  SELECT sum(pow(n_docs, 0.7)) AS sw,
      |    cast(sum(n_docs) AS BIGINT) AS nd
      |  FROM g)
      |SELECT g.lang, g.source, g.n_docs, g.total_chars,
      |  round(pow(g.n_docs, 0.7) / t.sw, 6) AS share,
      |  round(pow(g.n_docs, 0.7) / t.sw * t.nd / g.n_docs, 6) AS epochs
      |FROM g CROSS JOIN t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_pack" -> (corpusPack _),
    "corpus_temperature" -> (corpusTemperature _))

  val oracles: Map[String, String] = Map(
    "corpus_pack" -> corpusPackSql,
    "corpus_temperature" -> corpusTemperatureSql)
}
