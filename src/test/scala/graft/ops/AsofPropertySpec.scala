package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property + plan pins for the as-of join (round-5 VERDICT item 5).
  *
  * The fixture's nanosecond timestamps contain NO duplicate (key, ts)
  * pairs at any scale factor (verified), so the DuckDB ASOF JOIN oracle
  * behind q_events_asof can never exercise tie semantics — and DuckDB
  * leaves right-side ties unspecified anyway. These properties pin the
  * operator's declared contract against a driver-side reference on random
  * streams dense in exactly the adversarial cases: duplicate right
  * timestamps, right-ts == left-ts boundary ties, duplicate left rows,
  * and multiple keys interleaved on a shared tiny timestamp domain.
  *
  * Contract under test (scaladoc'd on [[Events.asofJoin]]):
  *  - match = latest right row with right.ts <= left.ts on the same key
  *    ("at-or-before": equal ts DOES match);
  *  - duplicate right (key, ts) rows resolve to the GREATEST payload
  *    struct in field order — deterministic, not partition-luck;
  *  - left rows with no prior right row get null payload columns.
  */
class AsofPropertySpec extends SparkSpec {
  import AsofPropertySpec.{L, R}

  private val rightGen: Gen[List[R]] = for {
    n <- Gen.chooseNum(0, 12)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 2L)
      ts <- Gen.chooseNum(0L, 5L)
      a <- Gen.chooseNum(0, 2)
      b <- Gen.oneOf("p", "q", "r")
    } yield R(k, ts, a, b))
  } yield rows

  private val leftGen: Gen[List[L]] = for {
    n <- Gen.chooseNum(1, 10)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 2L)
      ts <- Gen.chooseNum(0L, 5L)
      tag <- Gen.oneOf("x", "y")
    } yield L(k, ts, tag))
  } yield rows

  /** Driver-side reference: latest right at-or-before, greatest (a, b)
    * payload on ties — the contract stated independently of any window
    * machinery. */
  private def reference(left: List[L], right: List[R]): Set[(Long, Long, String, Option[(Int, String)])] =
    left.map { l =>
      val cand = right.filter(r => r.k == l.k && r.ts <= l.ts)
      val best = if (cand.isEmpty) None else {
        val m = cand.map(r => (r.ts, r.a, r.b)).max // ts primary, then payload fields
        Some((m._2, m._3))
      }
      (l.k, l.ts, l.tag, best)
    }.toSet

  test("asofJoin equals the reference on tie-dense random streams") {
    import spark.implicits._
    val prop = Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.toDF("k", "ts", "tag")
      val right = rs.map(r => (r.k, r.ts, r.a, r.b)).toDF("k", "ts", "a", "b")
      val got = Events.asofJoin(left, right, "k", "ts").collect().map { row =>
        val m = if (row.isNullAt(3)) None
                else Some((row.getInt(3 + 1), row.getString(3 + 2)))
        (row.getLong(0), row.getLong(1), row.getString(2), m)
      }.toSet
      got == reference(ls, rs)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("asofJoin multiset cardinality: every left row survives, duplicates included") {
    import spark.implicits._
    val ls = List(L(0, 3, "x"), L(0, 3, "x"), L(1, 0, "y")) // exact duplicate left rows
    val rs = List(R(0, 3, 1, "p"), R(0, 3, 2, "q"))
    val out = Events.asofJoin(ls.toDF("k", "ts", "tag"),
      rs.map(r => (r.k, r.ts, r.a, r.b)).toDF("k", "ts", "a", "b"), "k", "ts")
    assert(out.count() == 3, "as-of is a left-preserving decoration, never a filter/dedup")
    // both duplicate left rows carry the SAME deterministic tie winner (2, "q")
    // (columns: k, ts, tag, asof_ts, asof_a, asof_b)
    val matched = out.filter(col("k") === 0).collect()
    assert(matched.forall(r => r.getInt(4) == 2 && r.getString(5) == "q"))
  }

  test("asofPurchaseView: duplicate view timestamps resolve to the greatest event_id") {
    import spark.implicits._
    // two views share the purchase's exact ts — the greatest event_id wins
    val ev = Seq(
      (10L, 7L, "view", java.sql.Timestamp.valueOf("2024-01-01 00:00:05")),
      (11L, 7L, "view", java.sql.Timestamp.valueOf("2024-01-01 00:00:05")),
      (12L, 7L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 00:00:05")),
      (13L, 8L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 00:00:09"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Events.asofPurchaseView(ev).collect()
    val byPurchase = out.map(r => r.getLong(1) -> r).toMap
    assert(byPurchase(12L).getLong(3) == 11L, "equal-ts views: max event_id is the match")
    assert(byPurchase(13L).isNullAt(3), "no prior view for user 8")
  }

  test("asofJoin accepts unorderable (map) payload columns; orderable fields still break ties") {
    import spark.implicits._
    // map columns cannot be sort keys: the tie comparison must use only
    // the orderable subset (here `a`), with the map riding along as payload
    val right = Seq(
      (1L, 10L, 1, Map("x" -> 1)),
      (1L, 10L, 2, Map("y" -> 2)), // same (k, ts): greater `a` must win
      (1L, 30L, 9, Map("z" -> 9))
    ).toDF("k", "ts", "a", "m")
    val left = Seq((1L, 20L, "p"), (1L, 5L, "q")).toDF("k", "ts", "tag")
    val out = graft.ops.Events.asofJoin(left, right, "k", "ts")
      .orderBy("ts").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(out(0).fieldIndex("asof_a")), "ts=5 has no prior right row")
    val hit = out(1)
    assert(hit.getInt(hit.fieldIndex("asof_a")) == 2,
      "duplicate (k, ts) must resolve to the greatest ORDERABLE payload")
    assert(hit.getMap[String, Int](hit.fieldIndex("asof_m")) == Map("y" -> 2),
      "the unorderable column must ride with its winning row")
  }

  test("asofJoin plan: one shuffle on the key, no broadcast-nested-loop, no cartesian") {
    import spark.implicits._
    val left = (0L until 200L).map(i => (i % 7, i, s"l$i")).toDF("k", "ts", "tag")
    val right = (0L until 100L).map(i => (i % 7, i * 2, i.toInt)).toDF("k", "ts", "v")
    val joined = Events.asofJoin(left, right, "k", "ts")
    joined.collect()
    // assert on the FINALIZED adaptive plan only — executedPlan.toString
    // renders the initial plan too, double-counting every exchange
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val adaptive = joined.queryExecution.executedPlan
      .collect { case a: AdaptiveSparkPlanExec => a }
    assert(adaptive.nonEmpty, "AQE must own the plan")
    val plan = adaptive.head.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"as-of must never plan a product join:\n$plan")
    // a single hash-partitioning exchange on _k — the union rides ONE shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one key shuffle, got $exchanges:\n$plan")
  }
}

object AsofPropertySpec {
  // top-level so Spark can encode them (inner classes need outer scope);
  // tiny domains force collisions: 3 keys, 6 timestamps, payloads that
  // collide on the first struct field so the second breaks ties
  case class R(k: Long, ts: Long, a: Int, b: String)
  case class L(k: Long, ts: Long, tag: String)
}
