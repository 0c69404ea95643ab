package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}

/** Plan + value audit for the subquery/decorrelation family: EXISTS must
  * plan as a semi join, NOT EXISTS / NOT IN as an anti join, scalar
  * subqueries as 1-row broadcasts (the only sanctioned BNLJ), correlated
  * aggregates as group-by + equi-join — and never a CartesianProduct.
  */
class SubqueriesSpec extends SparkSpec {

  private val family = Seq(
    "q_big_orders", "q_priority_exists", "q_important_parts",
    "q_order_count_dist", "q_supplier_counts", "q_small_qty_revenue",
    "q_disjunctive_join", "q_min_cost_supplier", "q_sole_blame",
    "q_idle_customers", "q_forecast_revenue", "q_top_supplier")

  test("whole family: rows at sf0.001, no CartesianProduct, BNLJ only for 1-row scalar broadcasts") {
    for (name <- family) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.sparkPlan
      assert(plan.collect { case j: CartesianProductExec => j }.isEmpty, s"$name:\n$plan")
      val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      // the scalar-subquery composites carry exactly one 1-row aggregate
      // broadcast; everything else must have zero BNLJ
      val allowed = Map("q_important_parts" -> 1, "q_idle_customers" -> 1,
        "q_top_supplier" -> 1)
      assert(bnlj.size <= allowed.getOrElse(name, 0), s"$name: unexpected BNLJ:\n$plan")
      assert(df.limit(1).count() == 1, s"$name must select rows at sf0.001")
    }
  }

  test("q_priority_exists: Catalyst rewrites EXISTS to a left-semi join with the date range pushed") {
    val plan = SparkEntry.queries("q_priority_exists")(spark, sfDir).queryExecution.sparkPlan
    val semis = plan.collect { case j: BaseJoinExec if j.joinType == LeftSemi => j }
    assert(semis.nonEmpty, s"EXISTS must become a semi join:\n$plan")
    val pushed = plan.collect { case s: FileSourceScanExec => s }
      .flatMap(_.metadata.get("PushedFilters"))
      .exists(f => f.contains("o_orderdate") && f.contains("GreaterThanOrEqual"))
    assert(pushed, s"o_orderdate range must reach the parquet scan:\n$plan")
  }

  test("q_sole_blame: arithmetic EXISTS/NOT-EXISTS — window over one pair aggregate, no pair joins") {
    // round-17 shape: the participation EXISTS and sole-return NOT EXISTS
    // are decided by per-order counts from ONE (orderkey, suppkey)
    // aggregate + an orderkey window — the semi/anti pair-join cascade
    // (two fact distincts + two fact-pair shuffle joins) must not return
    val df = SparkEntry.queries("q_sole_blame")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    assert(plan.collect { case j: BaseJoinExec
      if j.joinType == LeftSemi || j.joinType == LeftAnti => j }.isEmpty,
      s"the EXISTS pair must be arithmetic, not joins:\n$plan")
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }.nonEmpty,
      s"per-order counts must come from an orderkey window:\n$plan")
    // value parity with the literal semi+anti formulation on the fixture
    import graft.core.Tables
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sfDir)
    val rPairs = li.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_suppkey").distinct()
    val allPairs = li.select(col("l_orderkey").as("a_orderkey"),
      col("l_suppkey").as("a_suppkey")).distinct()
    val rOther = rPairs.select(col("l_orderkey").as("r_orderkey"),
      col("l_suppkey").as("r_suppkey"))
    val legacy = rPairs
      .join(allPairs, col("l_orderkey") === col("a_orderkey") &&
        col("l_suppkey") =!= col("a_suppkey"), "left_semi")
      .join(rOther, col("l_orderkey") === col("r_orderkey") &&
        col("l_suppkey") =!= col("r_suppkey"), "left_anti")
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, sfDir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "numwait")
    assert(df.collect().toSeq.sortBy(_.getString(0)) ===
      legacy.collect().toSeq.sortBy(_.getString(0)))
  }

  test("q_idle_customers / q_supplier_counts: NOT EXISTS / NOT IN plan as anti joins") {
    for (name <- Seq("q_idle_customers", "q_supplier_counts")) {
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
      assert(plan.collect { case j: BaseJoinExec if j.joinType == LeftAnti => j }.nonEmpty,
        s"$name:\n$plan")
    }
  }

  test("q_disjunctive_join: equi key separates from the OR residual — broadcast hash join, no BNLJ") {
    val plan = SparkEntry.queries("q_disjunctive_join")(spark, sfDir).queryExecution.sparkPlan
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"the partkey equi half must drive a hash join:\n$plan")
    assert(bhj.exists(_.condition.nonEmpty),
      s"the brand/size/quantity disjunction must ride as a residual condition:\n$plan")
  }

  test("q_small_qty_revenue: correlated scalar AVG decorrelates; SQL and DataFrame forms agree") {
    import graft.core.Tables
    import org.apache.spark.sql.functions._
    import Helpers._
    val plan = SparkEntry.queries("q_small_qty_revenue")(spark, sfDir).queryExecution.sparkPlan
    assert(plan.collect { case j: CartesianProductExec => j }.isEmpty, plan.toString)
    // hand-decorrelated DataFrame re-statement: per-part avg joined back
    val li = Tables.lineitem(spark, sfDir)
    val perPart = li.groupBy(col("l_partkey").as("ap_partkey")).agg(davg(col("l_quantity")).as("avg_qty"))
    val want = li
      .join(broadcast(Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#13").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
      .collect().toSeq
    val got = SparkEntry.queries("q_small_qty_revenue")(spark, sfDir).collect().toSeq
    assert(got == want, s"SQL-subquery form $got != decorrelated DataFrame form $want")
  }

  test("q_min_cost_supplier: ties keep every achieving supplier; min is per-part") {
    val rows = SparkEntry.queries("q_min_cost_supplier")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("min_price")))
    // one min price per part, regardless of how many suppliers achieve it
    rows.groupBy(_._1).foreach { case (pk, grp) =>
      assert(grp.map(_._2).distinct.size == 1, s"part $pk has multiple 'min' prices")
    }
  }
}
