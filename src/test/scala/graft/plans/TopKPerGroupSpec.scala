package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  private def customTopK(k: Int) = TopK.perGroup(
    Tables.orders(spark, sfDir).select("o_custkey", "o_orderkey", "o_totalprice"),
    groupCols = Seq("o_custkey"),
    sortSpec = Seq(("o_totalprice", false), ("o_orderkey", true)),
    k = k)

  test("row-identical to the window row_number formulation") {
    val expected = windowTopK(3).collect().map(_.toSeq).toSet
    val got = customTopK(3).collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("k larger than every group emits all rows, fully ranked") {
    val orders = Tables.orders(spark, sfDir)
    val n = orders.count()
    val all = customTopK(1000000)
    assert(all.count() == n)
    // ranks within each group are exactly 1..size
    val bad = all.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"), min("rn").as("mn"),
        countDistinct("rn").as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
    assert(bad.isEmpty)
  }

  test("plan: partial prune -> one exchange -> final; no WindowExec, no full Sort") {
    // sparkPlan, not executedPlan: AdaptiveSparkPlanExec hides its inner
    // plan from TreeNode.collect until execution
    val plan = customTopK(3).queryExecution.sparkPlan
    val partials = plan.collect { case e: TopKPerGroupExec if e.rankAttr.isEmpty => e }
    val finals = plan.collect { case e: TopKPerGroupExec if e.rankAttr.isDefined => e }
    assert(partials.size == 1 && finals.size == 1)
    val windows = plan.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "custom operator must not fall back to WindowExec")
    val sorts = plan.collect { case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.isEmpty, "no sort operator should appear — heaps replace it")
    // the exchange is inserted by EnsureRequirements during plan
    // preparation — visible only in the executed (adaptive) plan
    val df = customTopK(3)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("Exchange") || executed.contains("ShuffleQueryStage"),
      s"expected a hash exchange between partial and final:\n$executed")
  }

  test("null group keys form their own group; ties broken by the tiebreaker column") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), 10.0, 1L), (Some("a"), 10.0, 2L), (Some("a"), 5.0, 3L),
      (None: Option[String], 7.0, 4L), (None: Option[String], 9.0, 5L))
      .toDF("g", "v", "id")
    val out = TopK.perGroup(df, Seq("g"), Seq(("v", false), ("id", true)), 2)
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1), r.getLong(2), r.getLong(3)))
    val byGroup = out.groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // null group kept both rows, best first
    assert(byGroup(None).map(_._3).toSeq == Seq(5L, 4L))
    // "a": ties on v=10.0 resolved by ascending id
    assert(byGroup(Some("a")).map(_._3).toSeq == Seq(1L, 2L))
    assert(out.length == 4)
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[(String, Double, Long)].toDF("g", "v", "id")
    assert(TopK.perGroup(df, Seq("g"), Seq(("v", true)), 3).isEmpty)
  }

  test("composite group keys: top-1 per (status, priority) equals the window form") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderstatus", "o_orderpriority", "o_orderkey", "o_totalprice")
    val w = Window.partitionBy("o_orderstatus", "o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = orders.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") === 1).collect().map(_.toSeq).toSet
    val got = TopK.perGroup(orders, Seq("o_orderstatus", "o_orderpriority"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 1)
      .collect().map(_.toSeq).toSet
    assert(got == expected && got.nonEmpty)
  }
}
