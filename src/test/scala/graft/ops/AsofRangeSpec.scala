package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec, ShuffledHashJoinExec, BroadcastHashJoinExec}
import org.apache.spark.sql.functions._

/** The keyless range-binned merge-asof ([[Events.asofJoinRange]]): value
  * parity against a driver-side brute force (including every boundary the
  * binning machinery must survive), bin-count independence (the binning is
  * an execution strategy, never semantics), and the plan promise — zero
  * join operators of any kind.
  */
class AsofRangeSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // rights: before every left (carry into bin 0), duplicates at one
  // timestamp (tie contract), a long empty stretch (carry must cross
  // multiple empty bins), after every left (dropped unread)
  private lazy val right = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (ts(5L), 100L, 1.0),   // before lo: reachable only as carry-in
      (ts(8L), 101L, 2.0),   // latest before lo — must beat 100
      (ts(20L), 102L, 3.0),
      (ts(20L), 103L, 4.0),  // tie at ts=20: max (orderkey, price) wins -> 103
      (ts(21L), 104L, 5.0),
      (ts(500L), 105L, 6.0), // after hi: never matched, dropped
    ).toDF("rts", "rkey", "rprice")
  }
  private lazy val left = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, ts(3L)),    // before every right -> nulls
      (2L, ts(8L)),    // exactly at a right -> matches it
      (3L, ts(10L)),
      (4L, ts(20L)),   // at the tie -> 103
      (5L, ts(320L)),  // far past the last in-range right: carry crosses
      (6L, ts(400L)),  //   many empty bins -> still 104
    ).toDF("event_id", "lts")
  }

  private def bruteForce(): Seq[(Long, Option[Long])] = {
    val rs = right.collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    left.collect().map { l =>
      val cand = rs.filter(r => !r._1.after(l.getTimestamp(1)))
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy(r => (r._1.getTime, r._2, r._3))._2)
      (l.getLong(0), best)
    }.toSeq.sortBy(_._1)
  }

  private def run(nBins: Int): Seq[(Long, Option[Long])] =
    Events.asofJoinRange(left, right, "lts", "rts", nBins = nBins)
      .select(col("event_id"), col("asof_rkey"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq.sortBy(_._1)

  test("asofJoinRange equals brute force across carry-in, tie, empty-bin and drop-tail cases") {
    assert(run(32) == bruteForce())
  }

  test("asofJoinRange is bin-count independent (binning is strategy, not semantics)") {
    val want = bruteForce()
    for (n <- Seq(1, 2, 7, 64)) assert(run(n) == want, s"nBins=$n diverged")
  }

  test("asofJoinRange with empty sides: empty left -> empty out; empty right -> all-null matches") {
    val el = Events.asofJoinRange(left.limit(0), right, "lts", "rts")
    assert(el.count() == 0 && el.columns.toSeq ==
      Seq("event_id", "lts", "asof_rts", "asof_rkey", "asof_rprice"))
    val er = Events.asofJoinRange(left, right.limit(0), "lts", "rts")
    val got = er.select("event_id", "asof_rkey").collect()
    assert(got.length == left.count() && got.forall(_.isNullAt(1)))
  }

  test("asofJoinRange equals a driver reference on random tie-dense streams × random bin counts") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val spark2 = spark
    import spark2.implicits._
    // tiny shared time domain → dense boundary/tie coverage; rights carry
    // (key, price) payload, ties resolved by greatest (ts, rts, key, price)
    val rightsGen = Gen.listOfN(8, for {
      t <- Gen.chooseNum(0L, 9L); k <- Gen.chooseNum(100L, 103L)
      p <- Gen.chooseNum(1, 3)
    } yield (t, k, p.toDouble))
    val leftsGen = for {
      n <- Gen.chooseNum(1, 8)
      rows <- Gen.listOfN(n, for {
        id <- Gen.chooseNum(1L, 50L); t <- Gen.chooseNum(0L, 9L)
      } yield (id, t))
    } yield rows
    val prop = Prop.forAll(leftsGen, rightsGen, Gen.oneOf(1, 2, 5, 32)) { (ls, rs, nb) =>
      val left = ls.map { case (id, t) => (id, ts(t)) }.toDF("event_id", "lts")
      val right = rs.map { case (t, k, p) => (ts(t), k, p) }.toDF("rts", "rkey", "rprice")
      val got = Events.asofJoinRange(left, right, "lts", "rts", nBins = nb)
        .select(col("event_id"), col("lts"), col("asof_rkey"), col("asof_rprice"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3)))))
        .toSeq.sorted(Ordering.by((x: (Long, Long, Option[(Long, Double)])) => (x._1, x._2, x._3.toString)))
      val want = ls.map { case (id, t) =>
        val cand = rs.filter(_._1 <= t)
        val best = if (cand.isEmpty) None
          else { val m = cand.maxBy(r => (r._1, r._2, r._3)); Some((m._2, m._3)) }
        (id, t * 1000L, best)
      }.sorted(Ordering.by((x: (Long, Long, Option[(Long, Double)])) => (x._1, x._2, x._3.toString)))
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("q_asof_range plan: zero join operators, no cartesian — bins + carry windows only") {
    val plan = graft.SparkEntry.queries("q_asof_range")(spark, sfDir)
      .queryExecution.sparkPlan
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty, plan.toString)
    assert(plan.collect { case j: ShuffledHashJoinExec => j }.isEmpty, plan.toString)
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.isEmpty, plan.toString)
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, plan.toString)
    assert(plan.collect { case j: CartesianProductExec => j }.isEmpty, plan.toString)
  }

  test("q_asof_range values: every event carries the latest at-or-before order (fixture spot check)") {
    val out = graft.SparkEntry.queries("q_asof_range")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // non-null matches must satisfy order_ts <= event_ts
    val bad = out.filter(r => !r.isNullAt(4) && r.getLong(4) > r.getLong(1))
    assert(bad.isEmpty, s"asof order after its event: ${bad.take(3).toSeq}")
  }
}
