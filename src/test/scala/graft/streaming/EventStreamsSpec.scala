package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.Events
import graft.streaming.EventStreams._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming operators driven through MemoryStream micro-batches; the
  * windowed aggregates must agree with their batch counterparts on the same
  * data (same expressions, two execution modes).
  */
class EventStreamsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val sample = Seq(
    EventRow(1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
    EventRow(2L, ts("2024-01-01 00:09:00"), 1L, "click", 2.0),
    EventRow(3L, ts("2024-01-01 00:11:00"), 2L, "view", 4.0),
    EventRow(4L, ts("2024-01-01 00:01:00"), 2L, "click", 8.0))

  test("streaming tumbling window agg matches batch result in complete mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(sample: _*)
    val q = EventStreams.tumbling(mem.toDF())
      .writeStream.format("memory").queryName("t_tumbling")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("t_tumbling")
      .select(unix_timestamp(col("w_start")).as("w_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = Events.tumbling(sample.toDF())
      .select("w_start", "event_type", "n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming sliding windows match the batch sliding aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(sample: _*)
    val q = mem.toDF().withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("w_start"), col("n"))
      .writeStream.format("memory").queryName("t_sliding")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_sliding").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Events.sliding(sample.toDF()).select("w_start", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("streaming dedup within watermark drops repeated event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(sample ++ Seq(sample.head, sample(1)): _*) // re-deliver two events
    val q = EventStreams.dedupWithinWatermark(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("t_dedup").count() == sample.length)
  }

  test("flatMapGroupsWithState: running per-user totals update across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("t_state")
      .outputMode("update").start()
    mem.addData(sample.take(2): _*) // user 1: 2 events
    q.processAllAvailable()
    mem.addData(sample.drop(2): _*) // user 2: 2 events
    q.processAllAvailable(); q.stop()

    val last = spark.table("t_state").groupBy("user_id")
      .agg(max("n_events").as("n"), max("sum_value").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(last == Set((1L, 2L, 3.0), (2L, 2L, 12.0)))
  }

  test("transformWithState: one threshold alert per user, state survives across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider —
    // per-query conf, read at query start; restore after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[EventRow]
      val q = EventStreams.spendAlerts(mem.toDS(), threshold = 10.0)
        .writeStream.format("memory").queryName("t_tws")
        .outputMode("update").start()
      def ev(id: Long, user: Long, v: Double) =
        EventRow(id, Timestamp.valueOf("2024-01-01 00:00:00"), user, "purchase", v)
      // one event per batch so crossing attribution is deterministic
      mem.addData(ev(1, 1L, 4.0)); q.processAllAvailable()  // u1: 4  (no alert)
      mem.addData(ev(2, 1L, 5.0)); q.processAllAvailable()  // u1: 9  (no alert)
      mem.addData(ev(3, 1L, 2.5)); q.processAllAvailable()  // u1: 11.5 -> alert on event 3
      mem.addData(ev(4, 2L, 25.0)); q.processAllAvailable() // u2: 25 -> alert on event 4
      mem.addData(ev(5, 1L, 99.0)); q.processAllAvailable() // u1 already alerted: nothing
      q.stop()
      val alerts = spark.table("t_tws")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(alerts == Set((1L, 11.5, 3L), (2L, 25.0, 4L)),
        s"exactly one crossing alert per user: $alerts")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream join pairs purchases with in-window views per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.purchasesWithRecentViews(mem.toDF())
      .writeStream.format("memory").queryName("t_ssjoin")
      .outputMode("append").start()
    mem.addData(
      EventRow(1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      EventRow(2L, ts("2024-01-01 00:30:00"), 1L, "view", 0.0),
      EventRow(3L, ts("2024-01-01 00:40:00"), 1L, "purchase", 9.0),
      EventRow(4L, ts("2024-01-01 03:00:00"), 2L, "purchase", 9.0)) // no view in window
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("t_ssjoin")
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // purchase 3 at 00:40 joins views at 00:00 and 00:30 (both within 1h);
    // purchase 4 has no matching view => absent in inner join
    assert(pairs == Set((3L, 1L), (3L, 2L)))
  }

  test("left-outer stream-stream join emits unmatched purchases after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.purchasesWithRecentViewsOuter(mem.toDF())
      .writeStream.format("memory").queryName("t_ssjoin_outer")
      .outputMode("append").start()
    mem.addData(
      EventRow(1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      EventRow(2L, ts("2024-01-01 00:30:00"), 1L, "purchase", 9.0),
      EventRow(3L, ts("2024-01-01 00:45:00"), 2L, "purchase", 9.0)) // user 2: no view
    q.processAllAvailable()
    // advance BOTH sides' watermarks (the advancing rows must survive the
    // view/purchase filters) so purchase 3 becomes provably unmatched...
    mem.addData(
      EventRow(98L, ts("2024-01-02 12:00:00"), 9L, "view", 0.0),
      EventRow(99L, ts("2024-01-02 12:00:00"), 9L, "purchase", 0.0))
    q.processAllAvailable()
    // ...and run one more micro-batch: null rows emit after the watermark
    // recorded at the previous batch's end takes effect
    mem.addData(EventRow(100L, ts("2024-01-02 13:00:00"), 9L, "view", 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("t_ssjoin_outer")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(rows.contains((2L, 1L)))  // matched pair
    assert(rows.contains((3L, -1L))) // unmatched purchase emitted with null view
  }

  test("streaming session windows close on gap (append mode after watermark)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.sessions(mem.toDF())
      .writeStream.format("memory").queryName("t_sessions")
      .outputMode("append").start()
    mem.addData(sample: _*)
    q.processAllAvailable()
    // a later event pushes the watermark past the open sessions => they close
    mem.addData(EventRow(99L, ts("2024-01-02 12:00:00"), 9L, "click", 0.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("t_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // user1: events at 00:01 & 00:09 merge; user2: 00:01 and 00:11 merge (gap 10m)
    assert(rows == Set((1L, 2L), (2L, 2L)))
  }

  test("dedup state sizing formula: executable and pinned to the PERF.md measured point") {
    // PERF.md round-9 measurement: 200 k rows/s grew state ~16 MB/s, i.e.
    // ~80 B/key steady-state cost. The executable formula must reproduce
    // that rate and make the 1-hour-horizon extrapolation (~56 GB) that
    // motivated promoting the horizon to a required parameter.
    val perSecond = EventStreams.dedupStateEstimateBytes(rowsPerSec = 200000L, horizonSec = 1L)
    assert(perSecond == 16000000L) // 16 MB/s of new state at 200 k rows/s
    val oneHour = EventStreams.dedupStateEstimateBytes(rowsPerSec = 200000L, horizonSec = 3600L)
    assert(oneHour == 57600000000L) // ~57.6 GB once a 1-hour horizon fills
    // the sizing a deployment actually does: pick the TRUE late-data bound
    // (say 5 minutes) and check the state fits the store budget
    val fiveMin = EventStreams.dedupStateEstimateBytes(200000L, 300L)
    assert(fiveMin < 5L * 1024 * 1024 * 1024) // 4.8 GB: fits a modest store
  }
}
