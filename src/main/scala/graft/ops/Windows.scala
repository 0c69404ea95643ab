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

  /** ntile — quartiles of parts by retail price. NOTE: an unpartitioned
    * window forces all rows through one task; acceptable for a dimension
    * table, never for a fact table (partition or pre-bucket there).
    */
  def priceQuartiles(part: DataFrame): DataFrame = {
    val w = Window.orderBy(col("p_retailprice"), col("p_partkey"))
    part
      .select(col("p_partkey"), ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("p_partkey")
  }

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
}
