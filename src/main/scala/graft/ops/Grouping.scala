package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Helpers._

/** Grouping extensions + set operators (SURVEY.md §2 group G).
  *
  * rollup/cube expand to grouping sets inside a single aggregate — one
  * shuffle, not one per grouping level. `approx_count_distinct` is HLL++
  * (constant memory per group) — the scale path when exact distinct counts
  * would blow the hash map at 100 TB.
  */
object Grouping {

  /** ROLLUP over (status, priority) with exact-decimal revenue. */
  def rollupRevenue(orders: DataFrame): DataFrame =
    orders.rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** CUBE over (returnflag, linestatus). */
  def cubeQuantity(lineitem: DataFrame): DataFrame =
    lineitem.cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact + approximate distinct counts side by side. The approx column is
    * not oracle-comparable (HLL estimate); the exact one is. Registered
    * query emits only the exact column; bench exercises the approx path.
    */
  def distinctCounts(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_cust"))
      .orderBy("o_orderstatus")

  def approxDistinctCounts(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderstatus")
      .agg(approx_count_distinct(col("o_custkey"), 0.01).as("n_cust_approx"))
      .orderBy("o_orderstatus")

  /** Pivot — status columns per priority row. Explicit pivot values keep
    * the plan static (no extra distinct-values job, mandatory at scale);
    * coalesce(0) aligns empty cells with the oracle's CASE-sum form.
    */
  def pivotStatusCounts(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont` semantics). The 100 TB variant swaps in
    * `percentile_approx` (t-digest sketch, constant memory) — registered
    * without an oracle since sketches are estimates.
    */
  def percentiles(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
      .orderBy("o_orderstatus")

  /** Sketch-based percentiles (t-digest `percentile_approx`) — the 100 TB
    * path next to [[percentiles]]: constant memory per group regardless of
    * row count. Estimate => rows-only check.
    */
  def approxPercentiles(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderstatus")
      .agg(
        round(expr("percentile_approx(o_totalprice, 0.5, 10000)"), 4).as("p50_approx"),
        round(expr("percentile_approx(o_totalprice, 0.9, 10000)"), 4).as("p90_approx"))
      .orderBy("o_orderstatus")

  /** Equal-width histogram over a numeric column — the distribution audit
    * next to [[percentiles]]. Two-pass, like `Windows.priceBuckets`: a
    * single-row min/max aggregate, then a row-local bucket assignment and
    * one groupBy — no sort, no window, bounded output (`nBins` rows). The
    * max value is clamped into the last bin (the standard closed-top
    * convention, mirrored by the oracle).
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int = 10): DataFrame = {
    require(nBins > 0)
    val bounds = df.agg(min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi")).head()
    if (bounds.isNullAt(0)) {
      val spark = df.sparkSession
      import spark.implicits._
      return Seq.empty[(Long, Double, Double, Long)]
        .toDF("bucket", "bucket_lo", "bucket_hi", "n")
    }
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val width = if (hi > lo) (hi - lo) / nBins else 1.0
    val bucket = least(
      floor((col(valueCol).cast("double") - lit(lo)) / lit(width)).cast("long"),
      lit(nBins - 1L))
    df.select(bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        round(lit(lo) + col("bucket") * lit(width), 6).as("bucket_lo"),
        round(lit(lo) + (col("bucket") + 1) * lit(width), 6).as("bucket_hi"),
        col("n"))
      .orderBy("bucket")
  }

  /** INTERSECT — customer nations that also host suppliers. */
  def intersectNations(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nationkey"))
      .intersect(supplier.select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** EXCEPT — customers who ordered, minus those who ever ordered URGENT. */
  def exceptUrgent(orders: DataFrame): DataFrame =
    orders.select(col("o_custkey").as("custkey"))
      .except(orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")

  /** GROUPING SETS via SQL text (also exercises the A3 surface — the
    * reference's `BigQueryClient.run(sql)` analog is `spark.sql`;
    * reference bqfetch/bqfetch.py:85-93).
    */
  def groupingSets(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    orders.createOrReplaceTempView("_graft_orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM _graft_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** UNION ALL + re-aggregation (reference D5 `pd.concat` analog — bag
    * semantics, no implicit dedup; reference bqfetch/bqfetch.py:358).
    */
  def unionAllCounts(orders: DataFrame): DataFrame = {
    val a = orders.filter(col("o_orderstatus") === "O")
    val b = orders.filter(col("o_orderstatus") =!= "O")
    a.unionByName(b)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }
}
