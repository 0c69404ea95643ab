package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Tables

class EventsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, Long, String, Double)*) = {
    import spark.implicits._
    rows.map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("tumbling: events land in their 10-minute bucket") {
    val d = ev(
      (1L, "2024-01-01 00:01:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:09:59", 1L, "click", 2.0),
      (3L, "2024-01-01 00:10:00", 1L, "click", 4.0))
    val out = Events.tumbling(d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.toSet == Set(
      (ts("2024-01-01 00:00:00").getTime / 1000, 2L, 3.0),
      (ts("2024-01-01 00:10:00").getTime / 1000, 1L, 4.0)))
  }

  test("sliding: every event appears in exactly two 10-min/5-min windows") {
    val d = ev((1L, "2024-01-01 00:01:00", 1L, "click", 1.0))
    val out = Events.sliding(d).collect()
    assert(out.map(_.getLong(0)).toSet ==
      Set(ts("2024-01-01 00:00:00"), ts("2023-12-31 23:55:00")).map(_.getTime / 1000))
  }

  test("sessions: strict 30-minute gap closes a session; exact-gap event extends it") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:29:59", 1L, "click", 1.0), // merges (gap < 30m)
      (3L, "2024-01-01 01:00:00", 1L, "click", 1.0), // 30m01s after #2 => new session
      (4L, "2024-01-01 01:30:00", 1L, "click", 1.0)) // exactly 30m after #3 => extends
    val out = Events.sessions(d).collect().map(r => (r.getLong(2)))
    assert(out.toSeq.sorted == Seq(2L, 2L))
  }

  test("sessions and sessionsViaLag agree on session structure (second-aligned data)") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L, "c", 1.0),
      (2L, "2024-01-01 00:10:00", 1L, "c", 1.0),
      (3L, "2024-01-01 02:00:00", 1L, "c", 1.0),
      (4L, "2024-01-01 00:05:00", 2L, "c", 1.0))
    val a = Events.sessions(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Events.sessionsViaLag(d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
  }

  test("asof: each purchase pairs with the latest view at-or-before it") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 00:05:00", 1L, "view", 0.0),
      (3L, "2024-01-01 00:07:00", 1L, "purchase", 9.0),
      (4L, "2024-01-01 00:05:00", 2L, "purchase", 9.0), // user 2: no view before
      (5L, "2024-01-01 00:06:00", 2L, "view", 0.0),
      (6L, "2024-01-01 00:06:00", 3L, "view", 0.0),
      (7L, "2024-01-01 00:06:00", 3L, "purchase", 9.0)) // tie ts: view counts
    val out = Events.asofPurchaseView(d).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(3L) == 2L)  // latest view wins
    assert(out(4L) == -1L) // no prior view
    assert(out(7L) == 6L)  // view at same instant counts
  }

  test("generic asofJoin matches the specialized purchase/view as-of") {
    val e = ev(
      (1L, "2024-01-01 00:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 00:05:00", 1L, "view", 0.0),
      (3L, "2024-01-01 00:07:00", 1L, "purchase", 9.0),
      (4L, "2024-01-01 00:05:00", 2L, "purchase", 9.0),
      (5L, "2024-01-01 00:06:00", 2L, "view", 0.0))
    val left = e.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
    val right = e.filter(org.apache.spark.sql.functions.col("event_type") === "view")
      .select("user_id", "ts", "event_id")
    val out = Events.asofJoin(left, right, "user_id", "ts").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(6)) -1L else r.getLong(6))).toMap
    // columns: event_id, ts, user_id, event_type, value, asof_ts, asof_event_id
    assert(out(3L) == 2L)
    assert(out(4L) == -1L)
  }

  test("fixture events: asof row count equals purchase count") {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(Events.asofPurchaseView(e).count() == purchases)
  }

  test("cohortRetention: cohorts by first-seen week, offsets count distinct active weeks") {
    // 2024-01-01 and 2024-01-08 are Mondays (ISO week starts)
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),  // user 1: cohort wk0
      (2L, "2024-01-09 10:00:00", 1L, "view", 0.0),  //   active wk1 too
      (3L, "2024-01-10 11:00:00", 1L, "click", 0.0), //   same week — ONE activity row
      (4L, "2024-01-08 10:00:00", 2L, "view", 0.0),  // user 2: cohort wk1
      (5L, "2024-01-03 09:00:00", 3L, "view", 0.0))  // user 3: cohort wk0, only wk0
    val out = Events.cohortRetention(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wk0 = ts("2024-01-01 00:00:00").getTime / 1000
    val wk1 = ts("2024-01-08 00:00:00").getTime / 1000
    assert(out == Map(
      (wk0, 0L) -> 2L,  // users 1 and 3 active in their cohort week
      (wk0, 1L) -> 1L,  // only user 1 returns the next week (once, despite 2 events)
      (wk1, 0L) -> 1L)) // user 2's own cohort
  }

  test("zscoreAnomalies: hand-computed moments; flag derives from the rounded z") {
    // 20 zeros + one spike of 100: mean = 100/21, sample std ≈ 21.822,
    // spike z ≈ 4.365 (> 3), zeros z ≈ -0.218 (clean)
    val rows = (1 to 20).map(i => (i.toLong, "2024-01-01 00:01:00", 1L, "a", 0.0)) :+
      ((21L, "2024-01-01 00:02:00", 1L, "a", 100.0))
    val out = Events.zscoreAnomalies(ev(rows: _*)).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    val n = 21.0
    val mean = 100.0 / n
    val std = math.sqrt((100.0 * 100.0 - 100.0 * 100.0 / n) / (n - 1))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(21L) == ((r6((100.0 - mean) / std), true)))
    assert(out(1L) == ((r6((0.0 - mean) / std), false)))
    assert(out.count(_._2._2) == 1, "exactly the spike is anomalous")
  }

  test("funnel: strictly-after ordering, first completions, partial and out-of-order users") {
    val e = ev(
      // user 1: full funnel in order
      (1L, "2024-01-01 00:01:00", 1L, "view", 0.0),
      (2L, "2024-01-01 00:02:00", 1L, "click", 0.0),
      (3L, "2024-01-01 00:01:30", 1L, "click", 0.0), // earlier click also after view: wins as first
      (4L, "2024-01-01 00:03:00", 1L, "purchase", 5.0),
      // user 2: purchase BEFORE any view → stage 3 not reached, click missing too
      (5L, "2024-01-01 00:00:30", 2L, "purchase", 5.0),
      (6L, "2024-01-01 00:01:00", 2L, "view", 0.0),
      // user 3: view then click, no purchase
      (7L, "2024-01-01 00:01:00", 3L, "view", 0.0),
      (8L, "2024-01-01 00:04:00", 3L, "click", 0.0),
      // user 4: click only — never enters the funnel (no view)
      (9L, "2024-01-01 00:01:00", 4L, "click", 0.0))
    val out = Events.funnel(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(4),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == ts("2024-01-01 00:01:30").getTime / 1000, "first click AFTER view wins")
    assert(out(2L)._1 == 1L, "pre-view purchase must not count")
    assert(out(3L)._1 == 2L)
    assert(!out.contains(4L), "users without the entry stage are outside the funnel")
  }

  test("attribution: first/last touch from strictly-preceding events; direct when none; stacked conversions share touches") {
    val d = ev(
      // user 1: view -> click -> purchase -> purchase (second purchase's
      // preceding frame contains the first purchase, which must NOT count
      // as a touch)
      (1L, "2024-01-01 00:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 00:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 00:02:00", 1L, "purchase", 5.0),
      (4L, "2024-01-01 00:03:00", 1L, "purchase", 2.0),
      // user 2: cold purchase => direct/direct
      (5L, "2024-01-01 00:00:00", 2L, "purchase", 9.0),
      // user 3: single click touch => first = last = click
      (6L, "2024-01-01 00:00:00", 3L, "click", 0.0),
      (7L, "2024-01-01 00:01:00", 3L, "purchase", 1.0))
    val out = Events.attribution(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_conversions"), r.getAs[Double]("revenue"))).toMap
    assert(out == Map(
      ("view", "click") -> ((2L, 7.0)),
      ("direct", "direct") -> ((1L, 9.0)),
      ("click", "click") -> ((1L, 1.0))))
  }

  test("asofJoinNearest: picks the closer side, exact tie goes to the past, no-match keeps nulls") {
    val spark2 = spark
    import spark2.implicits._
    val lefts = Seq(
      (10L, 1L, ts("2024-01-01 00:10:00")), // prev @00:09 (60s) vs next @00:12 (120s) => prev
      (11L, 1L, ts("2024-01-01 00:11:30")), // prev @00:09 (150s) vs next @00:12 (30s) => next
      (12L, 1L, ts("2024-01-01 00:15:00")), // prev @00:12 (180s) vs next @00:18 (180s) => TIE => past
      (13L, 2L, ts("2024-01-01 00:00:00")) // user 2 has no rights => nulls
    ).toDF("event_id", "user_id", "ts")
    val rights = Seq(
      (1L, ts("2024-01-01 00:09:00"), 900L),
      (1L, ts("2024-01-01 00:12:00"), 1200L),
      (1L, ts("2024-01-01 00:18:00"), 1800L)
    ).toDF("user_id", "ts", "tag")
    val out = Events.asofJoinNearest(lefts, rights, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getAs[Long]("near_tag") == 900L)
    assert(out(10L).getAs[Long]("near_delta_us") == -60L * 1000000)
    assert(out(11L).getAs[Long]("near_tag") == 1200L)
    assert(out(11L).getAs[Long]("near_delta_us") == 30L * 1000000)
    assert(out(12L).getAs[Long]("near_tag") == 1200L, "equal distance must go backward")
    assert(out(13L).isNullAt(out(13L).fieldIndex("near_tag")))
    // a right exactly AT the left's timestamp is distance 0 from both
    // directions and must match (backward wins, same row)
    val exact = Events.asofJoinNearest(
      Seq((1L, 1L, ts("2024-01-01 00:09:00"))).toDF("event_id", "user_id", "ts"),
      rights, "user_id", "ts").collect().head
    assert(exact.getAs[Long]("near_tag") == 900L &&
      exact.getAs[Long]("near_delta_us") == 0L)
  }

  test("eventTransitions: ML estimate of the chain; last event contributes no pair; rows normalize to 1") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 00:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 00:02:00", 1L, "view", 0.0),
      (4L, "2024-01-01 00:03:00", 1L, "click", 0.0),
      (5L, "2024-01-01 00:00:00", 2L, "view", 0.0),
      (6L, "2024-01-01 00:01:00", 2L, "buy", 0.0))
    val out = Events.eventTransitions(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // view->click x2, click->view x1, view->buy x1; view row: 2/3 + 1/3
    assert(out == Map(
      ("view", "click") -> ((2L, 0.666667)),
      ("view", "buy") -> ((1L, 0.333333)),
      ("click", "view") -> ((1L, 1.0))))
  }

  test("eventPaths: windows shorter than len don't count; ties rank by path string") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L, "a", 0.0),
      (2L, "2024-01-01 00:01:00", 1L, "b", 0.0),
      (3L, "2024-01-01 00:02:00", 1L, "c", 0.0), // paths: a>b>c
      (4L, "2024-01-01 00:00:00", 2L, "a", 0.0),
      (5L, "2024-01-01 00:01:00", 2L, "b", 0.0)) // too short: none
    val out = Events.eventPaths(d, len = 3, topK = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(("a>b>c", 1L, 1)))
    intercept[IllegalArgumentException](Events.eventPaths(d, len = 1))
  }

  test("overlapJoin: exact overlap set, touching counts at 0, each pair reported once for ANY bin width") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 100L, 500L), (2L, 900L, 1000L))
      .toDF("id", "start_s", "end_s")
    val right = Seq((10L, 450L, 950L), (20L, 500L, 600L), (30L, 1001L, 1100L))
      .toDF("id", "start_s", "end_s")
    def run(binSec: Long) = Events.overlapJoin(left, right, binSec)
      .select("a_id", "b_id", "overlap_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Set(
      (1L, 10L, 50L),  // [100,500] x [450,950]
      (1L, 20L, 0L),   // touching at 500 counts, overlap 0
      (2L, 10L, 50L))  // [900,1000] x [450,950]
      // (2, 30) do NOT overlap (1000 < 1001)
    // a long interval spans MANY bins at small widths — the anchor-bin
    // dedup must still report each pair exactly once
    for (bin <- Seq(1L, 7L, 100L, 3600L)) assert(run(bin) == want, s"bin=$bin")
  }

  test("overlapJoin: an interval spanning more than the bin cap fails loudly, not explodes") {
    val spark2 = spark
    import spark2.implicits._
    // a year-long interval at binSec=3600 is ~8.8k bins — past the default
    // 4096 cap the operator must raise with actionable advice rather than
    // silently multiplying the exploded row volume
    val pathological = Seq((1L, 0L, 365L * 24 * 3600)).toDF("id", "start_s", "end_s")
    val ok = Seq((2L, 0L, 100L)).toDF("id", "start_s", "end_s")
    val e = intercept[Exception] {
      Events.overlapJoin(pathological, ok, binSec = 3600).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("overlapJoin") && m.contains("binSec")),
      s"error must name the operator and the fix: $e")
    // the same interval passes at a bin width sized to it
    assert(Events.overlapJoin(pathological, ok, binSec = 24 * 3600).count() == 1L)
  }

  test("concurrentSessions: cross-user pairs only, aggregated overlap") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L, "c", 0.0),
      (2L, "2024-01-01 00:10:00", 1L, "c", 0.0), // u1 session [00:00,00:10]
      (3L, "2024-01-01 00:05:00", 2L, "c", 0.0),
      (4L, "2024-01-01 00:20:00", 2L, "c", 0.0), // u2 session [00:05,00:20]
      (5L, "2024-01-01 03:00:00", 1L, "c", 0.0), // u1 session 2: no overlap with u2
      (6L, "2024-01-01 00:07:00", 3L, "c", 0.0)) // u3 point-session inside both
    val out = Events.concurrentSessions(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out((1L, 2L)) == ((1L, 300L)), "u1 x u2 overlap 00:05-00:10")
    assert(out((1L, 3L)) == ((1L, 0L)), "a point-session overlaps at 0 seconds")
    assert(out((2L, 3L)) == ((1L, 0L)))
    assert(out.size == 3, s"no same-user pairs, no second-session pairs: $out")
  }

  test("cadenceStats: exact median gaps, single-event users dropped, relative fence flags the fastest decile") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L, "c", 0.0),
      (2L, "2024-01-01 00:00:01", 1L, "c", 0.0),
      (3L, "2024-01-01 00:00:02", 1L, "c", 0.0), // u1: gaps 1,1 => median 1
      (4L, "2024-01-01 00:00:00", 2L, "c", 0.0),
      (5L, "2024-01-01 01:00:00", 2L, "c", 0.0), // u2: one gap 3600
      (6L, "2024-01-01 00:00:00", 3L, "c", 0.0)) // u3: single event => no row
    val out = Events.cadenceStats(d, pct = 0.5).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L))
    assert(out(1L).getAs[Long]("n_events") == 3L &&
      out(1L).getAs[Long]("span_s") == 2L &&
      out(1L).getAs[Double]("median_gap_s") == 1.0 &&
      out(1L).getAs[Boolean]("is_rapid"))
    assert(out(2L).getAs[Double]("median_gap_s") == 3600.0 &&
      !out(2L).getAs[Boolean]("is_rapid"),
      "the slow user sits above the median-of-medians fence")
  }

  test("attribution: one user-keyed window exchange, no self-join") {
    val plan = Events.attribution(Tables.events(spark, sfDir))
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, BroadcastHashJoinExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def all[T](pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] =
      plan.collect(pf) ++ (plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect(pf)
        case _ => Nil
      })
    assert(all { case j: SortMergeJoinExec => j }.isEmpty &&
      all { case j: BroadcastHashJoinExec => j }.isEmpty,
      s"attribution must be window-only, not a self-join:\n$plan")
  }

  test("burstRuns: maximal above-threshold runs with exact stats") {
    val spark2 = spark
    import spark2.implicits._
    def ts(day: Int, i: Int) =
      new Timestamp(1700000000000L + day * 86400000L + i * 1000L)
    // daily counts 1,1,5,5,1,1,5,1,1,1: mean 2.2, std sqrt(3.36) -> thr 4.033
    val counts = Seq(1, 1, 5, 5, 1, 1, 5, 1, 1, 1)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i => (d.toLong, "view", ts(d, i)))
    }
    val out = Events.burstRuns(rows.toDF("user_id", "event_type", "ts")).collect()
    assert(out.length == 2, s"two bursts: ${out.mkString(";")}")
    assert(out(0).getAs[Long]("n_days") == 2L && out(0).getAs[Long]("peak") == 5L
      && out(0).getAs[Long]("total_events") == 10L)
    assert(out(1).getAs[Long]("n_days") == 1L && out(1).getAs[Long]("peak") == 5L)
  }

  test("funnelWindowed: per-window conversion against hand-placed latencies") {
    val spark2 = spark
    import spark2.implicits._
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val rows = Seq(
      (1L, "signup", ts(0)), (1L, "purchase", ts(30)),         // 30 min -> all windows
      (2L, "signup", ts(0)), (2L, "purchase", ts(2 * 24 * 60)),// 2 d -> 7 d only
      (3L, "signup", ts(0)),                                   // never converts
      (4L, "purchase", ts(0)), (4L, "signup", ts(10))          // purchase BEFORE signup: no
    ).toDF("user_id", "event_type", "ts")
    val out = Events.funnelWindowed(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.values.forall(_.getAs[Long]("n_entered") == 4L))
    assert(out(3600L).getAs[Long]("n_converted") == 1L)
    assert(out(86400L).getAs[Long]("n_converted") == 1L)
    assert(out(604800L).getAs[Long]("n_converted") == 2L)
    assert(out(3600L).getAs[Double]("conversion_rate") == 0.25)
    assert(out(604800L).getAs[Double]("conversion_rate") == 0.5)
  }
}
