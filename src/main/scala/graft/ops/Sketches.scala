package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch surface: the pre-aggregation pattern that makes
  * distinct-count rollups cheap at 100 TB. `approx_count_distinct`
  * (q_approx_distinct) answers ONE grouping; a production pipeline
  * instead STORES per-partition sketches (daily, per source) and merges
  * them into any coarser period on demand — the Datasketches HLL
  * functions Spark ships (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`) make the merge algebraic: union of sketches ==
  * sketch of union, so a year-over-any-window rollup reads tiny sketch
  * blobs, never the raw events.
  */
object Sketches {

  /** Per-day, per-type distinct-user sketches — the stored intermediate a
    * sketch warehouse keeps (one small binary per (day, type) instead of
    * the day's raw user ids).
    */
  def dailyUserSketches(events: DataFrame, lgK: Int = 12): DataFrame =
    events
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"), col("user_id"))
      .groupBy("day", "event_type")
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sketch"))

  /** Weekly distinct users per event type, computed by UNIONING the daily
    * sketches — never re-touching the events. The estimate is identical
    * to sketching the week directly (union of sketches == sketch of the
    * union; `SketchesSpec` asserts bit-equality) and within HLL error of
    * the exact count.
    */
  def weeklyDistinctUsers(events: DataFrame, lgK: Int = 12): DataFrame =
    dailyUserSketches(events, lgK)
      .groupBy(date_trunc("week", col("day")).as("w"), col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("n_users"))
      .select(unix_timestamp(col("w")).as("week"), col("event_type"), col("n_users"))
      .orderBy("week", "event_type")

  /** The single-pass form (sketch the week directly) — the equality
    * anchor for the merge path, and itself the scalable alternative to
    * exact COUNT(DISTINCT) when the distinct set per group is huge.
    */
  def weeklyDistinctUsersDirect(events: DataFrame, lgK: Int = 12): DataFrame =
    events
      .select(date_trunc("week", col("ts")).as("w"), col("event_type"), col("user_id"))
      .groupBy("w", "event_type")
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(user_id, $lgK))").as("n_users"))
      .select(unix_timestamp(col("w")).as("week"), col("event_type"), col("n_users"))
      .orderBy("week", "event_type")
}
