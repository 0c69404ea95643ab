package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftExtensions

/** The optimizer rule must (1) turn a naive interval-containment θ-join
  * into an equi-plannable join and (2) change nothing about the result —
  * including reversed/null intervals and negative timestamps.
  */
class BinnedRangeJoinRuleSpec extends AnyFunSuite {

  private def withRuleSession[A](f: SparkSession => A): A = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(spark)
    finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  private def fixtures(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val points = (1L to 400L).map(i => (i, i * 37 % 5000 - 100)).toDF("pid", "pt")
    val intervals = Seq[(Long, Option[Long], Option[Long])](
      (1L, Some(0L), Some(600L)), (2L, Some(500L), Some(700L)), (3L, Some(4000L), Some(4600L)),
      (4L, Some(-200L), Some(-50L)),   // negative range
      (5L, Some(900L), Some(800L)),    // reversed => matches nothing
      (6L, None, Some(100L)), (7L, Some(100L), None) // null bounds => match nothing
    ).toDF("iid", "lo", "hi")
    (points, intervals)
  }

  private def joined(points: DataFrame, intervals: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "iid").orderBy("iid", "pid")
  }

  test("rewrites the theta join to an equi join and preserves the exact result") {
    withRuleSession { spark =>
      val (points, intervals) = fixtures(spark)
      // baseline: rule disabled (width unset) => naive nested-loop plan
      spark.conf.unset("spark.graft.binnedRangeJoin.width")
      val naive = joined(points, intervals)
      val naivePlan = naive.queryExecution.sparkPlan.toString
      assert(naivePlan.contains("BroadcastNestedLoopJoin") || naivePlan.contains("CartesianProduct"),
        "baseline should be the nested-loop form the rule exists to eliminate")
      val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

      spark.conf.set("spark.graft.binnedRangeJoin.width", "600")
      val binned = joined(points, intervals)
      val plan = binned.queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule did not rewrite to an equi join:\n$plan")
      val got = binned.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected)
      assert(got.nonEmpty)
    }
  }

  test("does not fire when an equi conjunct already exists or types are not long") {
    withRuleSession { spark =>
      import org.apache.spark.sql.functions.col
      spark.conf.set("spark.graft.binnedRangeJoin.width", "600")
      val (points, intervals) = fixtures(spark)
      // an existing cross-side equality => already equi-plannable, rule must not touch it
      val withEqui = points.join(intervals,
        col("pid") === col("iid") && col("pt") >= col("lo") && col("pt") <= col("hi"))
      assert(!withEqui.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
      // double operands => out of scope, stays a nested-loop join but still correct
      val d = points.selectExpr("pid", "CAST(pt AS DOUBLE) AS pt")
      val di = intervals.selectExpr("iid", "CAST(lo AS DOUBLE) AS lo", "CAST(hi AS DOUBLE) AS hi")
      assert(!joined(d, di).queryExecution.optimizedPlan.toString.contains("_graft_bin"))
    }
  }
}
