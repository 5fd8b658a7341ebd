package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming twins driven synchronously via MemoryStream. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed aggregation counts events per 5-minute window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 2.0),
      Event(2, ts(1), 1, "click", 3.0),
      Event(3, ts(7), 2, "view", 1.0))
    val q = StreamingOps.windowedAgg(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql(
      "SELECT event_type, n, sum_value FROM win_out ORDER BY event_type")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "click" && rows(0).getLong(1) == 2 &&
      rows(0).getDouble(2) == 5.0)
    assert(rows(1).getString(0) == "view" && rows(1).getLong(1) == 1)
  }

  test("streaming exact dedup keeps one row per content hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.Doc]
    input.addData(
      StreamingOps.Doc(1, "alpha beta"),
      StreamingOps.Doc(2, "gamma"),
      StreamingOps.Doc(3, "alpha beta"), // exact dup of 1
      StreamingOps.Doc(4, "alpha beta"), // exact dup of 1
      StreamingOps.Doc(5, "delta"))
    val q = StreamingOps.dedupeStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT text FROM dedup_out").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).toSet == Set("alpha beta", "gamma", "delta"))
  }

  test("stream-stream interval join matches clicks in the preceding hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    purchases.addData(Event(100, ts(30), 1, "purchase", 9.99))
    clicks.addData(
      Event(1, ts(5), 1, "click", 0.0),  // 25 min before: match
      Event(2, ts(29), 1, "click", 0.0), // 1 min before: match
      Event(3, ts(31), 1, "click", 0.0), // AFTER the purchase: no match
      Event(4, ts(10), 2, "click", 0.0)) // other user: no match
    val q = StreamingOps.purchaseClickJoin(purchases.toDS(), clicks.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("joined_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT c_ts FROM joined_out ORDER BY c_ts").collect()
    assert(rows.length == 2, s"expected 2 matched clicks, got ${rows.length}")
    assert(rows.map(_.getTimestamp(0)).toSeq == Seq(ts(5), ts(29)))
  }

  test("stateful sessionization closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // session 1: minutes 0,1,2; gap > 10 min; session 2: minutes 20,21
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(1), 7, "click", 1.0),
      Event(3, ts(2), 7, "click", 1.0),
      Event(4, ts(20), 7, "click", 2.0),
      Event(5, ts(21), 7, "click", 2.0))
    val q = StreamingOps.sessionize(input.toDS(), gapSec = 600,
        useTimeout = false)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    // only the FIRST session is closed (second still open in state)
    val rows = spark.sql("SELECT * FROM sess_out").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_events") == 3)
    assert(rows(0).getAs[Double]("sum_value") == 3.0)
  }

  test("streaming as-of enrichment carries the latest reference across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val probes = MemoryStream[Event]
    val refs = MemoryStream[Event]
    // batch 1: purchase at min 5; probes at min 3 (before any ref ->
    // null match) and min 10 (matches the min-5 purchase)
    probes.addData(
      Event(1, ts(3), 1, "click", 0.0),
      Event(2, ts(10), 1, "click", 0.0))
    refs.addData(Event(100, ts(5), 1, "purchase", 9.99))
    // default microbatch trigger: AvailableNow would terminate after
    // the first batch and drop the cross-batch state assertion
    val q = StreamingOps.asofEnrich(probes.toDS(), refs.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out")
      .start()
    q.processAllAvailable()
    // batch 2: newer purchase at min 20; probes at min 19 (still the
    // min-5 purchase, held in state from batch 1) and min 25 (new one)
    probes.addData(
      Event(3, ts(19), 1, "click", 0.0),
      Event(4, ts(25), 1, "click", 0.0))
    refs.addData(Event(101, ts(20), 1, "purchase", 19.99))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT * FROM asof_out ORDER BY eid").collect()
    assert(rows.length == 4)
    assert(rows(0).isNullAt(rows(0).fieldIndex("asof_t")))
    assert(rows(1).getAs[Double]("asof_value") == 9.99)
    assert(rows(2).getAs[Double]("asof_value") == 9.99)
    assert(rows(3).getAs[Double]("asof_value") == 19.99)
  }
}
