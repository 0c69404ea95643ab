package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RowNumberTopKRuleSpec extends SparkSpec {

  private def declarative(k: Int): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  private def hasTopK(df: DataFrame): Boolean =
    df.queryExecution.sparkPlan.collect { case e: TopKPerGroupExec => e }.nonEmpty

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.nonEmpty

  test("declarative row_number+filter rewrites to TopKPerGroupExec with identical rows") {
    TopK.install(spark)
    val df = declarative(3)
    assert(hasTopK(df), df.queryExecution.sparkPlan.toString)
    assert(!hasWindow(df))
    // the WindowGroupLimit inserted by InferWindowGroupLimit (which runs
    // before extraOptimizations) must be stripped — left in place its
    // physical forms re-introduce the full per-partition sorts
    val planStr = df.queryExecution.sparkPlan.toString
    assert(!planStr.contains("WindowGroupLimit"), planStr)
    assert(df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, planStr)
    // rows identical to the un-rewritten window form (fresh plan via a
    // no-op barrier the rule cannot see through: aggregate-and-rejoin)
    val expected = {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(spark, sfDir)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", rank().over(w)) // rank == row_number here only as plan foil
    }
    // independent expectation: row_number semantics recomputed driver-side
    val rows = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case ((c, o, p), i) => (c, o, p, i + 1) }
    }.toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want)
    assert(expected.columns.contains("rn")) // keep the foil referenced
  }

  test("residual conjuncts survive as a filter above the rewrite") {
    TopK.install(spark)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("o_totalprice") > 100000.0)
    assert(hasTopK(df))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaFacade = TopK.perGroup(
      Tables.orders(spark, sfDir).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
      .filter(col("o_totalprice") > 100000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == viaFacade.toSet)
    assert(got.nonEmpty)
  }

  test("does not fire: rank(), multi-expression windows, unpartitioned windows") {
    TopK.install(spark)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ranked = Tables.orders(spark, sfDir)
      .withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
    assert(!hasTopK(ranked) && hasWindow(ranked))
    val multi = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .filter(col("rn") <= 2)
    assert(!hasTopK(multi) && hasWindow(multi))
    val global = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 2)
    assert(!hasTopK(global) && hasWindow(global))
  }

  test("registered q_topk_group_auto leaves the calling session's planner untouched") {
    // a FRESH session stands in for the caller (the shared test session has
    // TopK installed by the suites above — deliberately)
    val caller = spark.newSession()
    def bare: DataFrame = {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(caller, sfDir)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
    }
    assert(!hasTopK(bare), "fresh session unexpectedly has the rewrite")
    val out = graft.SparkEntry.queries("q_topk_group_auto")(caller, sfDir)
    assert(out.count() > 0)
    // the registered query itself planned through the custom operator (on
    // its cloned session) ...
    assert(hasTopK(out), out.queryExecution.sparkPlan.toString)
    // ... but the caller's planner is unchanged: bare window-filter queries
    // keep their WindowExec plan regardless of execution order
    assert(!hasTopK(bare) && hasWindow(bare),
      "q_topk_group_auto leaked optimizer/strategy state into the calling session")
  }

  test("does not fire without an upper bound on the rank") {
    TopK.install(spark)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val unbounded = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") >= 2)
    assert(!hasTopK(unbounded) && hasWindow(unbounded))
  }

  test("rn = 1 (argmax per group) rewrites with k = 1") {
    TopK.install(spark)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(hasTopK(df))
    val counts = df.groupBy("o_custkey").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ == 1L))
  }
}
