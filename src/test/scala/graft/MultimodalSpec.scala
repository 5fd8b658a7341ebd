package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The two multimodal decode tiers must agree: the batch mapPartitions
  * path (the mapInPandas-analogue a real codec plugs into) has to
  * reproduce the codegen'd expression path's metadata exactly, and its
  * batching must genuinely happen (one codec init per ≤64-row group,
  * not per row).
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("batch decode reproduces the expression path row-for-row") {
    import org.apache.spark.sql.functions._
    val expr = text.TextOps.multimodalExtract(spark, dir)
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("width"), col("height"))
    val batch = multimodal.Multimodal.multimodalBatch(spark, dir)
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("width"), col("height"))
    assert(expr.count() == batch.count())
    val diff = expr.exceptAll(batch).count() + batch.exceptAll(expr).count()
    assert(diff == 0, s"$diff rows differ between the decode tiers")
  }

  test("batch decode actually batches (bounded, multi-row groups)") {
    import org.apache.spark.sql.functions._
    val sizes = multimodal.Multimodal.multimodalBatch(spark, dir)
      .agg(min("batch_size"), max("batch_size")).collect()(0)
    assert(sizes.getInt(1) <= multimodal.Multimodal.BatchSize,
      s"batch of ${sizes.getInt(1)} exceeds the cap")
    assert(sizes.getInt(1) >= 2,
      "no multi-row batch formed — the codec init is per-row, not amortized")
  }

  test("frame sampling emits NFrames evenly spaced frames per document") {
    import org.apache.spark.sql.functions._
    val f = multimodal.Multimodal.multimodalFrames(spark, dir)
    val perDoc = f.groupBy("doc_id").count()
      .filter(col("count") =!= multimodal.Multimodal.NFrames).count()
    assert(perDoc == 0, s"$perDoc docs without exactly NFrames frames")
    val bad = f.filter(col("offset") < 0 || col("frame_idx") >= lit(4) ||
      col("offset") > col("frame_idx") * 16384).count()
    assert(bad == 0)
  }
}
