package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Helpers._

/** Subquery / decorrelation composites — the TPC-H plan shapes built on
  * scalar subqueries, correlated aggregates, EXISTS / NOT EXISTS, and
  * disjunctive join predicates (Q2/Q4/Q11/Q13/Q16/Q17/Q18/Q19/Q21/Q22
  * adapted to this schema, which has no partsupp/commitdate columns).
  *
  * Two forms are deliberately SQL text ([[orderPriorityCheck]],
  * [[smallQuantityRevenue]]) so Catalyst's own subquery rewrites
  * (RewritePredicateSubquery, decorrelation of scalar aggregates) are on
  * the exercised path — the reference's `run(sql)` surface taken to the
  * shapes where the optimizer earns its keep. The rest are written in the
  * decorrelated DataFrame form directly: a correlated aggregate is a
  * groupBy + equi-join, an EXISTS is a left-semi, a NOT IN is a left-anti,
  * a scalar subquery is a 1-row broadcast — the plans Catalyst itself
  * produces, declared explicitly so the scale shape is visible in code.
  *
  * Scale notes common to the family: every 1-row "scalar subquery" side is
  * an aggregate broadcast (BNLJ with a construction-bounded single row —
  * the sanctioned pattern from [[Relational.dispersion]]); every
  * semi/anti join ships only join keys; the self-join decorrelations
  * (min-per-group, avg-per-group) shuffle on the group key once and reuse
  * that partitioning for the probe join.
  */
object Subqueries {

  /** TPC-H Q18-shaped "large volume customers": orders whose total line
    * quantity clears a threshold, with their customers. The correlated
    * `HAVING SUM(...)` is decorrelated into an aggregate + shuffle join on
    * the fact key; the customer dim joins AFTER the fact-side reduction so
    * the wide row never rides the big shuffle.
    */
  def bigOrders(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                minQty: Double = 200.0, k: Int = 100): DataFrame = {
    val qty = lineitem.groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .join(qty, col("o_orderkey") === col("l_orderkey"))
      .join(customer.select("c_custkey", "c_name"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_date"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(k)
  }

  /** TPC-H Q4-shaped "order priority checking" via SQL text: orders in a
    * date window having at least one returned line, counted per priority.
    * The EXISTS goes through Catalyst's RewritePredicateSubquery → left
    * semi join; the date range is pushed to the orders scan.
    */
  def orderPriorityCheck(orders: DataFrame, lineitem: DataFrame,
                         from: String = "1996-01-01", until: String = "1997-01-01"): DataFrame =
    withSqlViews("orders" -> orders, "lineitem" -> lineitem) { (spark, v) =>
      spark.sql(
        s"""SELECT o_orderpriority, COUNT(*) AS n_orders
           |FROM ${v("orders")}
           |WHERE o_orderdate >= TIMESTAMP '$from' AND o_orderdate < TIMESTAMP '$until'
           |  AND EXISTS (SELECT 1 FROM ${v("lineitem")}
           |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin)
    }

  /** Session-unique view counter for [[withSqlViews]] — readable names,
    * collision-free within the JVM. */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Register each input as a UNIQUELY-SUFFIXED temp view, build the query,
    * then drop the views: `spark.sql` analyzes eagerly, so the returned
    * DataFrame keeps working after the drop, no user view with a fixed name
    * gets clobbered, and two interleaved calls with different inputs can't
    * race on the registration (the round-5 ADVICE fix).
    */
  private def withSqlViews(frames: (String, DataFrame)*)(
      build: (org.apache.spark.sql.SparkSession, Map[String, String]) => DataFrame): DataFrame = {
    val spark = frames.head._2.sparkSession
    val suffix = s"_graft_sq_${viewSeq.incrementAndGet()}"
    val names = frames.map { case (base, df) =>
      val n = s"$suffix$base"
      df.createOrReplaceTempView(n)
      base -> n
    }.toMap
    try build(spark, names)
    finally names.values.foreach(spark.catalog.dropTempView(_))
  }

  /** TPC-H Q11-shaped "important parts": parts whose revenue exceeds a
    * fraction of TOTAL revenue. The scalar subquery (global total) is a
    * 1-row aggregate broadcast over the per-part aggregate — computed from
    * the same shuffled intermediate, so the fact table is scanned once.
    */
  def importantParts(lineitem: DataFrame, fraction: Double = 0.0008): DataFrame = {
    val perPart = lineitem.groupBy("l_partkey")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("part_value"))
    val total = perPart.agg(dsum(col("part_value"), 6).as("total_value"))
    perPart.crossJoin(broadcast(total))
      .filter(col("part_value") > col("total_value") * fraction)
      .select("l_partkey", "part_value")
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** TPC-H Q13-shaped "customer order-count distribution": LEFT join so
    * zero-order customers survive with count 0, then a second aggregate
    * over the counts. Two shuffles by construction (custkey, then count) —
    * the second is over at most |distinct counts| groups.
    */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame,
                             excludePriority: String = "1-URGENT"): DataFrame =
    customer.select("c_custkey")
      .join(orders.filter(col("o_orderpriority") =!= excludePriority)
        .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q16-shaped "supplier count by part attributes": distinct
    * (part, supplier) pairs observed in the fact table, minus suppliers on
    * a denylist (the NOT IN → left-anti), counted per part brand/type.
    * The pair-distinct is a partial-dedup aggregate before the shuffle;
    * the denylist is tiny and broadcast.
    */
  def supplierCounts(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                     minSize: Int = 1, maxSize: Int = 25): DataFrame = {
    val pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    val denied = supplier.filter(col("s_acctbal") < 0).select("s_suppkey")
    pairs
      .join(broadcast(denied), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(part.filter(col("p_size").between(minSize, maxSize))
        .select("p_partkey", "p_brand", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
  }

  /** TPC-H Q17-shaped "small-quantity revenue" via SQL text: revenue from
    * lines whose quantity is under half the part's average, as a yearly
    * figure. The correlated scalar AVG decorrelates to a per-part
    * aggregate joined back on partkey; the division stays in double so
    * both engines compare identical values (Helpers.davg discipline).
    */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
                           brand: String = "Brand#13"): DataFrame =
    withSqlViews("lineitem" -> lineitem, "part" -> part) { (spark, v) =>
      spark.sql(
        s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly
           |FROM ${v("lineitem")} l1 JOIN ${v("part")} ON l_partkey = p_partkey
           |WHERE p_brand = '$brand'
           |  AND l_quantity < 0.5 * (
           |    SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity)
           |    FROM ${v("lineitem")} l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
    }

  /** TPC-H Q19-shaped "discounted revenue" with a disjunctive join
    * predicate: three brand/size/quantity conjunctions OR-ed inside the
    * join condition. The equi half (partkey) drives a broadcast hash join;
    * the disjunction stays a residual filter on the matched rows — the
    * shape that degrades to a cartesian product if the equi key is not
    * separable, which the plan spec pins against.
    */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val p = broadcast(part.select("p_partkey", "p_brand", "p_size"))
    val cond = col("l_partkey") === col("p_partkey") && (
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 21)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#5" && col("p_size").between(1, 35) && col("l_quantity").between(20, 40)))
    lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(p, cond)
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q2-shaped "minimum-cost supplier": for each qualifying part,
    * the supplier(s) with the cheapest observed line price. The correlated
    * MIN decorrelates to a min-per-part aggregate self-joined back on
    * (partkey, price); both sides come from the same (partkey, suppkey)
    * pre-aggregate, so the shuffle partitioning is computed once and
    * reused. Ties keep every achieving supplier (standard Q2 semantics).
    */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                      nation: DataFrame, pType: String = "PROMO", minPSize: Int = 45): DataFrame = {
    val offers = lineitem.groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice")).as("offer_price"))
    // per-part minimum via a partkey window instead of a groupBy +
    // self-join (round 17): the argmin-per-group needs the offers rows
    // co-located by partkey either way, and the window form gets there
    // in ONE reshuffle of the offers table where the join form paid the
    // cheapest aggregate's shuffle AND a reshuffled join back. Part
    // groups are bounded (suppliers-per-part), so the window is skew-free.
    val byPart = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    offers
      .withColumn("min_price", min(col("offer_price")).over(byPart))
      .filter(col("offer_price") === col("min_price"))
      .join(broadcast(part.filter(col("p_type") === pType && col("p_size") >= minPSize)
        .select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        round(col("s_acctbal"), 2).as("s_acctbal"), col("min_price"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  /** TPC-H Q21-shaped "sole blame": suppliers who were the ONLY supplier
    * with returned lines in orders that involved several suppliers. The
    * EXISTS (another supplier participated) / NOT EXISTS (no other
    * supplier returned) pair is decided arithmetically, never by joins
    * (round 17; the semi+anti form cost two distinct fact aggregates
    * plus two fact-pair shuffle joins): ONE (orderkey, suppkey)
    * aggregate carries a has-return flag, an orderkey window counts the
    * order's suppliers and its returning suppliers, and a pair
    * qualifies iff it returned, the order has ≥ 2 suppliers, and it is
    * the order's ONLY returner. Orders bound the window partitions
    * (≤ 7 suppliers per order in TPC-H), so the shape is two bounded
    * shuffles of the deduped pair set — skew-free at any corpus size.
    */
  def soleBlame(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val pairs = lineitem
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("_has_r"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    pairs
      .withColumn("_n_supp", count(lit(1)).over(w))
      .withColumn("_n_r", sum(col("_has_r")).over(w))
      .filter(col("_has_r") === 1L && col("_n_supp") >= 2L && col("_n_r") === 1L)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_name", "numwait")
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** TPC-H Q6-shaped "forecast revenue change": the canonical
    * filter-then-aggregate — revenue delta if discounts in a band on
    * small-quantity lines were dropped, over one ship-year. No joins at
    * all: three pushable predicates and one exact-decimal aggregate, the
    * query shape where scan pruning IS the whole performance story.
    */
  def forecastRevenue(lineitem: DataFrame,
                      from: String = "1996-01-01", until: String = "1997-01-01",
                      discLo: Double = 0.05, discHi: Double = 0.07,
                      maxQty: Double = 24.0): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < maxQty)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue_effect"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q15-shaped "top supplier": supplier(s) achieving the MAXIMUM
    * revenue in a ship-date window — the argmax-via-scalar-subquery
    * shape. The max is a 1-row aggregate broadcast over the same
    * per-supplier aggregate (one fact scan, the [[importantParts]]
    * pattern); equality on the exact-decimal revenue keeps ties.
    */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame,
                  from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("total_revenue"))
    val maxRev = rev.agg(max("total_revenue").as("_mr"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("_mr"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q22-shaped "idle high-balance customers": customers whose
    * balance beats the average positive balance (scalar subquery → 1-row
    * broadcast) and who placed no order since a cutoff (NOT EXISTS →
    * left-anti against the date-pruned orders scan), rolled up by nation.
    */
  def idleCustomers(customer: DataFrame, orders: DataFrame,
                    sinceDate: String = "2000-01-01"): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    customer.select("c_custkey", "c_nationkey", "c_acctbal")
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders.filter(col("o_orderdate") >= lit(sinceDate).cast("timestamp"))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_custs"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_nationkey")
  }

  /** TPC-H Q20-shaped "excess shippers": suppliers who shipped more than a
    * `share` fraction of some part family member's total shipped quantity
    * inside a date window. Q20's nested correlated IN (availqty vs a
    * correlated half-of-shipped scalar) has no partsupp here, so the
    * correlated threshold compares each (part, supplier) shipped quantity
    * against the part's total — same decorrelation ladder: inner
    * aggregate, correlated scalar as a window over the group key,
    * qualifying keys dedup'd, then a semi-join shaped probe into the dim.
    *
    * Scale shape: part is name-filtered and broadcast so the fact scan is
    * pruned before its one shuffle (the (partkey, suppkey) aggregate); the
    * per-part total is a window over the ALREADY-reduced aggregate (rows =
    * distinct pairs, not lineitems); supplier joins last against the
    * deduped qualifying keys. Quantities are integral in the fixture, so
    * the double sum and the `share` multiply are exact — no decimal
    * accumulator needed for a > comparison.
    */
  def excessShippers(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                     namePrefix: String = "red", share: Double = 0.5,
                     from: String = "1996-01-01", until: String = "1997-01-01"): DataFrame = {
    val pairQty = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(part.filter(col("p_name").startsWith(namePrefix))
        .select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("l_quantity").as("qty"))
    val byPart = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val qualifying = pairQty
      .withColumn("_total", sum(col("qty")).over(byPart))
      .filter(col("qty") > lit(share) * col("_total"))
      .select("l_suppkey").distinct()
    supplier.select("s_suppkey", "s_name")
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .orderBy("s_suppkey")
  }
}
