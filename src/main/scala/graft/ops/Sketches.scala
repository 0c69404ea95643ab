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

  /** The registered, ORACLE-ANCHORED form of the weekly rollup (round-5
    * VERDICT): per (week, event_type), the exact distinct count, the
    * declared relative-error bound (kσ · 1.04/√2^lgK — the standard HLL
    * rse), and whether the union-rollup estimate lands inside it. The
    * estimate still comes from UNIONING the daily sketches (the mergeable
    * path under test); the sketch bits and the estimate itself stay OUT of
    * the output, so every emitted column is DuckDB-reproducible — the
    * oracle pins the exact counts and `within_bound = TRUE`, turning an
    * out-of-bound sketch into a hash mismatch instead of an unverifiable
    * rows-only row.
    */
  def weeklyDistinctReport(events: DataFrame, lgK: Int = 12,
                           kSigma: Double = 3.0): DataFrame = {
    val est = dailyUserSketches(events, lgK)
      .groupBy(date_trunc("week", col("day")).as("w"), col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("n_est"))
    val exact = events
      .select(date_trunc("week", col("ts")).as("w"), col("event_type"), col("user_id"))
      .groupBy("w", "event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    val bound = relErrBound(lgK, kSigma)
    // inner join: both sides group the same events, so the keys coincide
    est.join(exact, Seq("w", "event_type"))
      .select(unix_timestamp(col("w")).as("week"), col("event_type"),
        col("n_exact"),
        lit(bound).as("rel_err_bound"),
        (abs(col("n_est") - col("n_exact")) <= lit(bound) * col("n_exact"))
          .as("within_bound"))
      .orderBy("week", "event_type")
  }

  /** kσ · 1.04/√2^lgK rounded to 6 — shared by the operator and the
    * generated oracle so the declared bound cannot drift. */
  private[ops] def relErrBound(lgK: Int, kSigma: Double): Double =
    BigDecimal(kSigma * 1.04 / math.sqrt((1L << lgK).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Generated DuckDB oracle for [[weeklyDistinctReport]]: exact distinct
    * counts, the declared bound as a literal, and `TRUE` for every bound
    * check — the ISO-Monday week truncation q_events_cohort already pins.
    */
  def weeklyReportOracleSql(lgK: Int = 12, kSigma: Double = 3.0): String =
    s"""SELECT CAST(floor(epoch(date_trunc('week', ts))) AS BIGINT) AS week,
       |       event_type,
       |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       |       CAST(${relErrBound(lgK, kSigma)} AS DOUBLE) AS rel_err_bound,
       |       TRUE AS within_bound
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

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
