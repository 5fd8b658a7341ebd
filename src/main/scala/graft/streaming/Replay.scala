package graft.streaming

import graft.Tables
import graft.streaming.StreamingOps.{AsOfOut, Event, SemDrop, SessionOut, Vec}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Deterministic replay harness for the STATEFUL streaming twins —
  * the round-12 verdict's driver-gate item: each `streaming_*_replay`
  * query drives the real corpus through the actual Structured
  * Streaming plan (MemoryStream source → flatMapGroupsWithState →
  * memory sink) in a FIXED multi-micro-batch split, and returns the
  * sink as a DataFrame, so the streaming execution path lands under
  * the driver's DuckDB hash gate instead of spec-only parity pins.
  *
  * Determinism contract (what makes a hash gate possible at all):
  *  - the micro-batch split is a pure function of the data — rows
  *    sort by the twin's own processing key and slice into K
  *    contiguous batches, each drained with processAllAvailable()
  *    before the next is offered, so batch boundaries never depend
  *    on wall-clock or scheduler timing;
  *  - every stateful accumulation is exact: session value sums run
  *    in µ-units (whole doubles — integer-exact under addition), the
  *    as-of state carries values verbatim, and the semantic-dedup
  *    decisions compare 6 dp-quantized cosines (the batch plan's own
  *    discipline);
  *  - sessionize gets one final sentinel batch (a far-future flush
  *    event per user) so each user's last real session CLOSES and
  *    emits — the sentinel's own open session never emits, so the
  *    output is exactly the batch session set.
  *
  * MemoryStream is driver-fed by design, so this file materializes
  * the corpus on the driver — the ONE sanctioned exception to the
  * no-collect convention (PlanGuardSpec allowlists Replay.scala; the
  * registered query OUTPUT is still a distributed computation, and at
  * cluster scale the same plans read Kafka/files instead of a driver
  * feed — the replay exists to gate the semantics, not to model the
  * production source).
  */
object Replay {

  private val seq = new java.util.concurrent.atomic.AtomicLong()
  // previous memory-sink table per op: dropped when the op re-runs so
  // repeated Bench invocations don't accumulate sink tables
  private val lastSink =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      String]()

  /** Run `mk` over a MemoryStream fed `batches` (one micro-batch per
    * element, drained in order), sink to a fresh memory table, return
    * it as a DataFrame. */
  private def runAppend[T: Encoder](spark: SparkSession, op: String,
      batches: Seq[Seq[T]], mode: String = "append")(
      mk: Dataset[T] => DataFrame): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[T]
    val qn = s"${op}_${seq.incrementAndGet()}"
    val q = mk(input.toDS()).writeStream.outputMode(mode)
      .format("memory").queryName(qn).start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    Option(lastSink.put((spark, op), qn))
      .foreach(spark.catalog.dropTempView(_))
    spark.table(qn)
  }

  /** K contiguous slices of `rows` (already in processing order). */
  private def slices[T](rows: Seq[T], k: Int): Seq[Seq[T]] = {
    val n = rows.size
    (0 until k).map(i => rows.slice(i * n / k, (i + 1) * n / k))
      .filter(_.nonEmpty)
  }

  private val Gap = 1800L

  /** events as the streaming Event shape in processing order
    * (ts, event_id), with `value` in exact µ-units when `quantize`
    * (whole doubles ⇒ stateful sums are integer-exact, the repo's
    * standard cross-engine sum discipline). */
  private def eventRows(spark: SparkSession, dir: String,
      quantize: Boolean): Seq[Event] = {
    import spark.implicits._
    val ev = Tables.table(spark, dir, "events")
    val v = if (quantize) floor(col("value") * 10000.0 + 0.5).cast("double")
      else col("value")
    ev.select(col("event_id"), timestamp_micros(Tables.tsMicros(ev)).as("ts"),
        col("user_id"), col("event_type"), v.as("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
  }

  // -------------------------------------------------------------------
  // streaming_sessionize_replay — the stateful sessionize twin
  // (StreamingOps.sessionize) over 4 event-time-ordered micro-batches
  // + a sentinel flush batch; oracle = gap-sessionization at the
  // stream's epoch-second granularity with µ-unit sums.
  // -------------------------------------------------------------------
  def streamingSessionizeReplay(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val rows = eventRows(spark, dir, quantize = true)
    val maxT = rows.iterator.map(_.ts.getTime / 1000).max
    val sentinelTs = new java.sql.Timestamp((maxT + 10 * Gap) * 1000)
    val sentinels = rows.map(_.user_id).distinct.sorted
      .map(u => Event(-1L, sentinelTs, u, "flush", 0.0))
    runAppend(spark, "sess_replay", slices(rows, 4) :+ sentinels) { in =>
      StreamingOps.sessionize(in, gapSec = Gap, useTimeout = false).toDF()
    }
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("sum_value").cast("long").as("sum_value_u"))
  }

  val streamingSessionizeReplaySql: String =
    s"""WITH s AS (SELECT user_id, epoch_us(ts) // 1000000 AS t,
       |  cast(floor(value * 10000.0 + 0.5) AS BIGINT) AS vu,
       |  event_id AS eid FROM events),
       |b AS (SELECT *, CASE WHEN t - lag(t,1)
       |    OVER (PARTITION BY user_id ORDER BY t, eid) > $Gap
       |  THEN 1 ELSE 0 END AS brk FROM s),
       |sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
       |    ORDER BY t, eid ROWS UNBOUNDED PRECEDING) AS session FROM b)
       |SELECT user_id, cast(min(t) AS BIGINT) AS session_start,
       |  count(*) AS n_events, cast(sum(vu) AS BIGINT) AS sum_value_u
       |FROM sess GROUP BY user_id, session""".stripMargin

  // -------------------------------------------------------------------
  // streaming_asof_replay — the stateful as-of enrichment twin
  // (StreamingOps.asofEnrich): every event, enriched with the latest
  // purchase at or before its (epoch-second) time, over 4 micro-
  // batches sliced along the twin's own processing key (t, refs-
  // first, eid) so the multi-batch run is EXACT as-of (in-order
  // arrival — the twin's documented contract). Oracle: purchases
  // deduped per (user, second) to the max-eid row (the state's
  // last-overwrite-wins), then DuckDB's native ASOF LEFT JOIN.
  // -------------------------------------------------------------------
  def streamingAsofReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = eventRows(spark, dir, quantize = false)
    // every event probes; purchases additionally ride as refs — one
    // tagged stream (asofTagged) so a micro-batch carries a slice's
    // probes AND refs together (see asofTagged's race note), sliced
    // along the twin's own processing key (t, refs-first, eid)
    val tagged = rows.map((_, false)) ++
      rows.filter(_.event_type == "purchase").map((_, true))
    val ordered = tagged.sortBy { case (e, isRef) =>
      (e.ts.getTime / 1000, !isRef, e.event_id)
    }
    runAppend(spark, "asof_replay", slices(ordered, 4)) { in =>
      StreamingOps.asofTagged(in).toDF()
    }
  }

  val streamingAsofReplaySql: String =
    """WITH e AS (SELECT user_id, event_id AS eid,
      |  epoch_us(ts) // 1000000 AS t, value, event_type FROM events),
      |r AS (SELECT user_id, t, value, eid,
      |  row_number() OVER (PARTITION BY user_id, t ORDER BY eid DESC)
      |    AS rk
      |  FROM e WHERE event_type = 'purchase'),
      |ref AS (SELECT user_id, t AS rt, value AS rv FROM r WHERE rk = 1)
      |SELECT e.user_id, e.eid, e.t, ref.rt AS asof_t,
      |  ref.rv AS asof_value
      |FROM e ASOF LEFT JOIN ref
      |  ON e.user_id = ref.user_id AND e.t >= ref.rt""".stripMargin

  // -------------------------------------------------------------------
  // streaming_semantic_replay — the stateful SemDeDup twin
  // (StreamingOps.semanticDedupStream) against the batch-trained
  // static codebook, over 3 vec_id-ordered micro-batches (the order
  // under which the twin is batch-equal even at the occupancy cap).
  // Oracle: the batch dedup_semantic loser set.
  // -------------------------------------------------------------------
  def streamingSemanticReplay(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val coarse = centroidArrays(
      graft.sim.SemDedup.coarseCentroids(spark, dir), 1)
    val fine = centroidArrays(
      graft.sim.SemDedup.fineCentroids(spark, dir), 16)
    val corpus = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[Vec].collect().sortBy(_.vec_id).toSeq
    runAppend(spark, "sem_replay", slices(corpus, 3)) { in =>
      StreamingOps.semanticDedupStream(in, coarse, fine).toDF()
    }
  }

  /** The trained codebook as driver-side (key, components) arrays —
    * the static model the streaming twin's caller prepares (train
    * once, score forever). `keyMul` folds the coarse code into the
    * fine key (cluster = code·16 + f, 1 for the coarse tier whose key
    * IS the code). */
  private def centroidArrays(df: DataFrame,
      keyMul: Int): Array[(Long, Array[Double])] = {
    val rows = df.collect().map { r =>
      val code = r.getAs[Number]("code").longValue
      val key = if (keyMul == 1) code
        else code * keyMul + r.getAs[Number]("f").longValue
      (key, r.getAs[Number]("i").intValue,
        r.getAs[Number]("cv").doubleValue)
    }
    rows.groupBy(_._1).toArray.sortBy(_._1).map { case (key, rs) =>
      val arr = new Array[Double](rs.map(_._2).max + 1)
      rs.foreach { case (_, i, cv) => arr(i) = cv }
      (key, arr)
    }
  }

  val streamingSemanticReplaySql: String =
    s"""SELECT cluster, vec_id FROM (
       |${graft.sim.SemDedup.dedupSemanticSql}
       |) sem WHERE NOT keep""".stripMargin

  // -------------------------------------------------------------------
  // streaming_windowed_replay — the watermarked tumbling-window agg
  // twin (StreamingOps.windowedAgg), complete-mode over 4 event-time
  // micro-batches (the stateful partial aggregation accumulates
  // across batches; complete mode emits the final window table).
  // µ-unit values make the stateful sums integer-exact; second-level
  // truncation never crosses a 300 s window boundary, so the oracle's
  // (t // 300)·300 grouping is the stream's exact window assignment.
  // -------------------------------------------------------------------
  def streamingWindowedReplay(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val rows = eventRows(spark, dir, quantize = true)
    runAppend(spark, "win_replay", slices(rows, 4), mode = "complete") {
      in => StreamingOps.windowedAgg(in)
    }
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n"),
        col("sum_value").cast("long").as("sum_value_u"))
  }

  val streamingWindowedReplaySql: String =
    """WITH s AS (SELECT epoch_us(ts) // 1000000 AS t, event_type,
      |  cast(floor(value * 10000.0 + 0.5) AS BIGINT) AS vu FROM events)
      |SELECT (t // 300) * 300 AS window_start, event_type,
      |  count(*) AS n, cast(sum(vu) AS BIGINT) AS sum_value_u
      |FROM s GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // streaming_neardedup_replay — the stateful minhash near-dedup twin
  // (StreamingOps.nearDedupStream): documents replayed in doc_id
  // order over 3 micro-batches; keyed band-bucket state pairs each
  // arrival against earlier members, so candidates accumulate ACROSS
  // batches; doc_id-ordered arrival makes the capped stream admit the
  // same lowest-id bucket members the batch plan ranks in. Oracle:
  // the per-band capped bucket self-join (the batch band chain
  // WITHOUT the cross-band distinct — the stream emits one row per
  // shared band).
  // -------------------------------------------------------------------
  def streamingNeardedupReplay(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[StreamingOps.Doc].collect().sortBy(_.doc_id).toSeq
    runAppend(spark, "nd_replay", slices(docs, 3)) { in =>
      StreamingOps.nearDedupStream(in).toDF()
    }
  }

  val streamingNeardedupReplaySql: String =
    s"""WITH ${graft.dedup.Dedup.minhashCandSql}
       |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.band
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bkey = b.bkey
       |    AND a.doc_id < b.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "streaming_sessionize_replay" -> (streamingSessionizeReplay _),
    "streaming_asof_replay" -> (streamingAsofReplay _),
    "streaming_semantic_replay" -> (streamingSemanticReplay _),
    "streaming_windowed_replay" -> (streamingWindowedReplay _),
    "streaming_neardedup_replay" -> (streamingNeardedupReplay _))

  val oracles: Map[String, String] = Map(
    "streaming_sessionize_replay" -> streamingSessionizeReplaySql,
    "streaming_asof_replay" -> streamingAsofReplaySql,
    "streaming_semantic_replay" -> streamingSemanticReplaySql,
    "streaming_windowed_replay" -> streamingWindowedReplaySql,
    "streaming_neardedup_replay" -> streamingNeardedupReplaySql)
}
