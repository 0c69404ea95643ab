package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Helpers._

/** Window / sort / limit surface (SURVEY.md §2 group F).
  *
  * All ranking/analytic windows partition by a key, so at scale each window
  * is evaluated inside one shuffle partition — one exchange on the partition
  * key, sort within partitions, no global sort. Global top-k deliberately
  * goes through `orderBy(...).limit(k)` which Catalyst plans as
  * `TakeOrderedAndProject` (per-partition bounded heaps + driver merge of k
  * rows), never a full sort of 100 TB.
  */
object Windows {

  /** row_number/rank/dense_rank — top-N orders per customer by price.
    * Catalyst plans the rn<=N filter as partial+final `WindowGroupLimit`
    * (per-partition bounded heaps before the shuffle), so the full sort
    * never materializes — verified via PlanAudit; no custom Rule needed
    * (SURVEY.md §7.3).
    */
  def topOrdersPerCustomer(orders: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .filter(col("rn") <= n)
      .orderBy("o_custkey", "rn")
  }

  /** lag/lead analytics — per-customer order-to-order price delta. */
  def orderPriceDelta(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") - lag("o_totalprice", 1).over(w), 4).as("price_delta"),
        lead("o_orderkey", 1).over(w).as("next_orderkey"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Running frame — cumulative revenue per customer in date order
    * (ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW). Sum runs in exact
    * decimal so the running values are order-stable vs the oracle.
    */
  def runningRevenue(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(w).cast("double").as("cum_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ntile — per-brand price quartiles. The window partitions by `p_brand`,
    * so each brand's tile assignment runs in its own task: no global
    * single-task sort (the former unpartitioned form funneled the whole —
    * scale-factor-growing — table through one task). For a GLOBAL quartile
    * on a scaling table, rank-based ntile is the wrong tool; use
    * [[priceBuckets]] (boundary bucketing — two narrow passes, no window).
    */
  def priceQuartiles(part: DataFrame): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice"), col("p_partkey"))
    part
      .select(col("p_partkey"), col("p_brand"), ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("p_partkey")
  }

  /** percent_rank + cume_dist — relative standing within a partitioned
    * window (per brand, so no global single-task sort; same scale contract
    * as [[priceQuartiles]]). The tiebreaker key makes the frame total-
    * ordered, which both engines' definitions then agree on exactly:
    * percent_rank = (rank−1)/(n−1), cume_dist = rank/n.
    */
  def relativeStanding(part: DataFrame): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice"), col("p_partkey"))
    part
      .select(col("p_partkey"), col("p_brand"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("p_partkey")
  }

  /** Global price quartile buckets WITHOUT a global window: aggregate the
    * three quartile boundaries (exact `percentile` — a distributed partial
    * aggregate), broadcast the 1-row result, bucket each row by comparison.
    * Value-based buckets (ties share a bucket) rather than rank-based
    * ntile — the semantics that parallelize. At extreme cardinality swap in
    * `percentile_approx` (bounded-memory sketch) — same shape, same plan.
    */
  def priceBuckets(part: DataFrame): DataFrame = {
    val bounds = part.agg(
      percentile(col("p_retailprice"), lit(0.25)).as("b1"),
      percentile(col("p_retailprice"), lit(0.5)).as("b2"),
      percentile(col("p_retailprice"), lit(0.75)).as("b3"))
    part.crossJoin(broadcast(bounds))
      .select(col("p_partkey"),
        (lit(1) + (col("p_retailprice") > col("b1")).cast("int")
          + (col("p_retailprice") > col("b2")).cast("int")
          + (col("p_retailprice") > col("b3")).cast("int")).cast("long").as("bucket"))
      .orderBy("p_partkey")
  }

  /** F "partition sort" — `sortWithinPartitions` made explicit: range-
    * partition on the sort key, then sort each partition locally. This is
    * exactly the decomposition `orderBy` plans to (RangePartitioning +
    * per-partition SortExec); spelled out it is also the write-side
    * clustering idiom (sorted parquet/bucketed output). Emitted order is
    * globally sorted because range partitions are contiguous and ordered.
    */
  def partitionSortedOrders(orders: DataFrame, nParts: Int = 8): DataFrame =
    orders.select("o_custkey", "o_orderkey", "o_totalprice")
      .repartitionByRange(nParts, col("o_custkey"), col("o_orderkey"))
      .sortWithinPartitions("o_custkey", "o_orderkey")

  /** RANGE frame — per customer, revenue of all their orders within ±7 days
    * of each order (event-time neighborhood aggregation). rangeBetween needs
    * a numeric ordering column: epoch seconds.
    */
  def revenueNearby(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("epoch_s"))
      .rangeBetween(-7L * 86400, 7L * 86400)
    orders
      .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(w).cast("double").as("nearby_revenue"),
        count(lit(1)).over(w).as("nearby_orders"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** first/last analytic functions over the full partition frame. */
  def firstLastOrder(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        first("o_orderkey").over(w).as("first_orderkey"),
        last("o_orderkey").over(w).as("last_orderkey"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Global top-k — TakeOrderedAndProject, not a full sort. */
  def topKOrders(orders: DataFrame, k: Int): DataFrame =
    orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Centered sliding frame — the smoothing window the frame family was
    * missing next to running (unbounded-preceding) and range (time-bound):
    * each order's price averaged with its ±2 neighbors in per-customer
    * date order (ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING). Exact-decimal
    * sum / count keeps the mean bit-stable vs the oracle; the window
    * partitions by customer — no global sort.
    */
  def smoothedPrice(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, 2)
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        round(
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .over(w).cast("double") / count(lit(1)).over(w), 6).as("smoothed_price"))
      .orderBy("o_custkey", "o_orderkey")
  }
}
