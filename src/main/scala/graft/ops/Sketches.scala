package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  // ---- Count-Min Sketch: the mergeable COUNTING sketch next to HLL ----
  // Fixed 4-row hash family over the MinhashP prime field, applied to the
  // md5-derived 48-bit key hash (Text.gramHash48) — every step is integer
  // arithmetic exact in 64 bits on BOTH engines, so unlike the HLL rollup
  // (exact-bound report) the CMS rollup carries a FULL value oracle: the
  // estimates themselves hash-match.
  private val CmsP = 2147483647L // 2^31 - 1 (the minhash field)
  private[ops] val CmsCoeffs: Seq[(Long, Long)] = Seq(
    (1234567L, 891011L), (2345679L, 910111L),
    (3456791L, 101112L), (4567913L, 111213L))

  private def cmsBucket(keyHash: Column, j: Int, width: Int): Column = {
    val (a, b) = CmsCoeffs(j)
    pmod(pmod(lit(a) * pmod(keyHash, lit(CmsP)) + lit(b), lit(CmsP)), lit(width))
  }

  private def cmsRows(keyHash: Column, width: Int): Column =
    array(CmsCoeffs.indices.map(j =>
      struct(lit(j).as("j"), cmsBucket(keyHash, j, width).as("bucket"))): _*)

  /** Per-day CMS of event-type occurrence counts: d×width counter rows
    * per day (the stored intermediate — a fixed-size table per period no
    * matter how many events or how hot one key runs). One combining
    * aggregate; the 4-row explode is row-local.
    */
  def dailyTypeCms(events: DataFrame, width: Int = 64): DataFrame =
    events
      .select(date_trunc("day", col("ts")).as("day"),
        explode(cmsRows(Text.gramHash48(col("event_type")), width)).as("r"))
      .groupBy(col("day"), col("r.j").as("j"), col("r.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Weekly per-type count report through the MERGED daily sketches:
    * counter-wise sum (sum of sketches == sketch of the union — the CMS
    * merge algebra, spec-asserted bit-equal to sketching the week
    * directly), then each type's estimate = min over the 4 probed
    * counters. `n_est ≥ n_exact` ALWAYS (CMS never undercounts without
    * deletions) and the oracle pins estimate, overcount and flag as exact
    * values — a full-value sketch oracle, not an error-bound report.
    */
  def weeklyTypeCountReport(events: DataFrame, width: Int = 64): DataFrame = {
    val weekly = dailyTypeCms(events, width)
      .groupBy(date_trunc("week", col("day")).as("w"), col("j"), col("bucket"))
      .agg(sum("cnt").as("cnt"))
    val exact = events
      .select(date_trunc("week", col("ts")).as("w"), col("event_type"))
      .groupBy("w", "event_type").agg(count(lit(1)).as("n_exact"))
    val probes = exact
      .select(col("w"), col("event_type"),
        explode(cmsRows(Text.gramHash48(col("event_type")), width)).as("r"))
      .select(col("w"), col("event_type"), col("r.j").as("j"), col("r.bucket").as("bucket"))
    val est = probes.join(weekly, Seq("w", "j", "bucket"))
      .groupBy("w", "event_type").agg(min("cnt").as("n_est"))
    exact.join(est, Seq("w", "event_type"))
      .select(unix_timestamp(col("w")).as("week"), col("event_type"),
        col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"),
        (col("n_est") >= col("n_exact")).as("never_undercounts"))
      .orderBy("week", "event_type")
  }

  /** Generated DuckDB oracle for [[weeklyTypeCountReport]] — the daily
    * build, the counter-wise weekly merge and the min-of-4 probe replayed
    * with the same coefficients; generated beside the operator so the
    * hash family cannot drift.
    */
  def cmsReportOracleSql(width: Int = 64): String = {
    val h = s"CAST('0x' || substring(md5(event_type), 1, 12) AS BIGINT)"
    def bucket(j: Int) = {
      val (a, b) = CmsCoeffs(j)
      s"(($a * (h % $CmsP) + $b) % $CmsP) % $width"
    }
    val dailyLegs = CmsCoeffs.indices.map(j =>
      s"SELECT day, $j AS j, ${bucket(j)} AS bucket FROM ev").mkString("\n           UNION ALL ")
    val probeLegs = CmsCoeffs.indices.map(j =>
      s"SELECT w, event_type, $j AS j, ${bucket(j)} AS bucket FROM exact").mkString("\n           UNION ALL ")
    s"""WITH ev AS MATERIALIZED (
       |  SELECT date_trunc('day', ts) AS day, event_type, $h AS h FROM events),
       |daily AS MATERIALIZED (
       |  SELECT day, j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |           $dailyLegs)
       |  GROUP BY day, j, bucket),
       |weekly AS MATERIALIZED (
       |  SELECT date_trunc('week', day) AS w, j, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
       |  FROM daily GROUP BY 1, 2, 3),
       |exact AS MATERIALIZED (
       |  SELECT date_trunc('week', ts) AS w, event_type, $h AS h,
       |         CAST(COUNT(*) AS BIGINT) AS n_exact
       |  FROM events GROUP BY 1, 2, 3),
       |probes AS (SELECT w, event_type, j, bucket FROM (
       |           $probeLegs)),
       |est AS (SELECT p.w, p.event_type, MIN(wk.cnt) AS n_est
       |        FROM probes p
       |        JOIN weekly wk ON p.w = wk.w AND p.j = wk.j AND p.bucket = wk.bucket
       |        GROUP BY 1, 2)
       |SELECT CAST(floor(epoch(e.w)) AS BIGINT) AS week, e.event_type,
       |       e.n_exact, est.n_est,
       |       est.n_est - e.n_exact AS overcount,
       |       est.n_est >= e.n_exact AS never_undercounts
       |FROM exact e JOIN est ON e.w = est.w AND e.event_type = est.event_type
       |ORDER BY week, e.event_type""".stripMargin
  }
}
