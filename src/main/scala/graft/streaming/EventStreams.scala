package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analogs of the batch event operators (SURVEY.md §2 group I).
  *
  * The aggregation expressions are the SAME ones graft.ops.Events uses in
  * batch — `window()`, `session_window()`, `dropDuplicates` — applied to a
  * streaming Dataset with a watermark. The reference has no streaming
  * surface at all (its chunk iterator is a batch pull loop, SURVEY.md §1.3);
  * this module is part of the driver-mandated extension.
  *
  * Scale notes: all stateful operators key their state by a partition column
  * (window start / user_id), so state shards across executors; watermarks
  * bound state size — without one, a 100 TB/day stream would accumulate
  * unbounded window state.
  */
object EventStreams {

  /** Tumbling 10-minute windowed counts/sums with a 1-hour watermark (late
    * events beyond the watermark are dropped, state is GC'd).
    */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Session windows per user, closed by a 30-minute gap. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming dedup on event_id within the watermark horizon — the
    * streaming form of exact dedup (state holds only ids inside the
    * watermark, so it is bounded).
    *
    * Bounded ∝ rate × horizon, to be precise: state ≈ rate (rows/s) ×
    * horizon (s) × per-key bytes (~80 B/key in RocksDB for the id +
    * store overhead) — measured at 200 k rows/s the state grew ~16 MB/s
    * until the horizon filled (PERF.md round-9 streaming table), which at
    * a 1-hour horizon extrapolates to ~56 GB. That is why `horizon` is a
    * REQUIRED parameter (round-10 change; it previously defaulted to
    * "1 hour"): the watermark must be sized to the deployment's TRUE
    * late-data bound, and a silently inherited demo default was the one
    * streaming foot-gun round 9 flagged. [[dedupStateEstimateBytes]] is
    * the executable form of the sizing formula — spec-compiled against
    * the measured PERF.md point. Throughput itself keeps up (228 k
    * rows/s sustained at local[32]); state size is the knob.
    */
  def dedupWithinWatermark(events: DataFrame, horizon: String): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Executable sizing formula for [[dedupWithinWatermark]] state: the
    * steady-state bytes held once the horizon fills. `bytesPerKey`
    * defaults to the measured RocksDB cost of a digest/id key (~80 B:
    * key + value + store overhead; PERF.md round-9: 16 MB/s at 200 k
    * rows/s). Callers size their horizon with this BEFORE deploying.
    */
  def dedupStateEstimateBytes(rowsPerSec: Long, horizonSec: Long,
                              bytesPerKey: Long = 80L): Long =
    rowsPerSec * horizonSec * bytesPerKey

  /** Stream-stream join: purchases joined to the views that preceded them
    * within one hour, per user. Both sides carry watermarks and the join
    * condition bounds the time range, so each side's state is GC-able —
    * the requirements for an unbounded-stream join to run with bounded
    * state. (The batch as-of in graft.ops.Events picks the single latest
    * view; the streaming form keeps all in-window matches.)
    */
  def purchasesWithRecentViews(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
  }

  /** Left-outer variant: purchases WITHOUT an in-window view still emit
    * (with null view columns) once the watermark passes the join window —
    * the streaming analog of the batch as-of's unmatched rows. Outer
    * stream-stream joins require the time-bound condition on both sides so
    * the engine knows when a row can no longer match and can emit the null
    * row + evict state.
    */
  def purchasesWithRecentViewsOuter(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
  }

  // ---- custom state: running per-user counters via flatMapGroupsWithState ----

  final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
                            event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  /** Custom stateful aggregation: a running per-user (count, sum) emitted on
    * every update — the `flatMapGroupsWithState` escape hatch for semantics
    * the built-in aggregates can't express. State is one small case class
    * per user (sharded by the groupBy key). A production deployment with
    * unbounded key cardinality would add an event-time timeout
    * (`EventTimeTimeout` + watermark) to evict idle users; left out here
    * because timeout-driven empty micro-batches make the query permanently
    * "busy" under test drivers.
    */
  def runningUserTotals(events: Dataset[EventRow]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { r => n += 1; s += r.value }
          val next = UserRunning(userId, n, s)
          state.update(next)
          Iterator.single(next)
      }
  }

  // ---- custom state, Spark-4 API: transformWithState ----

  final case class SpendAlert(user_id: Long, total: Double, event_id: Long)

  /** Threshold-crossing alert via `transformWithState` — the arbitrary-
    * state API that supersedes `flatMapGroupsWithState` in Spark 4
    * (typed composable state handles, timers, TTL; requires the RocksDB
    * state store provider). One `ValueState[Double]` per user holds the
    * cumulative spend; the processor emits EXACTLY ONE alert per user,
    * carrying the event whose arrival crossed the threshold.
    *
    * Attribution note: within one micro-batch the engine hands the group's
    * rows in no guaranteed order, so WHICH event is credited with the
    * crossing is batch-deterministic only across batches (the total
    * itself is order-free — addition over the batch). The spec drives one
    * event per batch where attribution matters.
    */
  class SpendThresholdProcessor(threshold: Double)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EventRow, SpendAlert] {
    @transient private var total: org.apache.spark.sql.streaming.ValueState[Double] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      total = getHandle.getValueState[Double]("total",
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[EventRow],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SpendAlert] = {
      var cur = if (total.exists()) total.get() else 0.0
      val out = scala.collection.mutable.ArrayBuffer.empty[SpendAlert]
      rows.foreach { r =>
        val was = cur
        cur += r.value
        if (was < threshold && cur >= threshold)
          out += SpendAlert(userId, cur, r.event_id)
      }
      total.update(cur)
      out.iterator
    }
  }

  /** `spendAlerts(stream)`: the query-shaped entry point over
    * [[SpendThresholdProcessor]]. State shards by user exactly like the
    * flatMapGroupsWithState form; `TimeMode.None` (no timers) keeps the
    * demo minimal — a production evictor would register event-time timers
    * against the watermark.
    */
  def spendAlerts(events: Dataset[EventRow], threshold: Double): Dataset[SpendAlert] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SpendThresholdProcessor(threshold),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}
