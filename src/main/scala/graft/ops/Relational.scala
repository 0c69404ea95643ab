package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Helpers._

/** Relational operator surface: the reference's real query forms (SURVEY.md
  * §2 groups B/C — IN-list filtered scan, distinct, group-by count, scalar
  * sum, dispersion stats) plus the driver-mandated join breadth (§2 group E).
  *
  * Everything here is declarative DataFrame API so Catalyst keeps predicate
  * pushdown, column pruning and join planning; at 100 TB the scans stay
  * columnar/vectorized, small dimensions are broadcast (no shuffle of the
  * fact table for star joins), and fact-fact joins shuffle on their join key
  * once with AQE handling skew/coalescing.
  */
object Relational {

  /** A2/B1 — filtered scan with an IN-list predicate, the reference's only
    * predicate form (reference bqfetch/bqfetch.py:482-489 pushes
    * `row_restriction = col IN (...)` into the storage server). Catalyst
    * pushes `isin` to the parquet reader (`PushedFilters: [In(...)]`) —
    * same server-side filtering, zero custom code. Type-preserving (the
    * reference stringifies values — a wart we deliberately do not copy,
    * SURVEY.md §7.4).
    */
  def filteredScan(lineitem: DataFrame, flags: Seq[String]): DataFrame =
    lineitem
      .filter(col("l_returnflag").isin(flags: _*))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice")

  /** B4/C2 — single-column DISTINCT, used by the reference to enumerate
    * chunk keys (reference bqfetch/bqfetch.py:141-156). Distinct is a
    * hash-aggregate: partial per-partition dedup before the shuffle, so the
    * shuffle carries only unique keys — scales to 100 TB as long as the
    * distinct-key set itself is distributable (never collected).
    */
  def distinctValues(customer: DataFrame): DataFrame =
    customer.select("c_mktsegment").distinct().orderBy("c_mktsegment")

  /** C1 — group-by count (reference bqfetch/bqfetch.py:105-123, used for
    * chunk-dispersion statistics). Partial+final HashAggregate, map-side
    * combine built in.
    */
  def groupByCount(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** C3 — scalar aggregate (reference bqfetch/bqfetch.py:125-139 computes
    * SUM(size_bytes) over metadata; here over the fact table).
    */
  def scalarSum(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      dsum(col("l_quantity")).as("sum_qty"),
      dsum(col("l_extendedprice")).as("sum_price"),
      count(lit(1)).as("n"))

  /** C4 — chunk-key dispersion statistics (reference
    * bqfetch/bqfetch.py:410-419): mean of per-key counts and the fraction of
    * keys whose count falls outside ±25% of the mean. The reference computes
    * this client-side over a collected list; here it is two distributed
    * aggregates (counts, then a mean-joined second pass) — nothing visits
    * the driver.
    */
  def dispersion(orders: DataFrame, coeff: Double = 0.25): DataFrame = {
    val counts = orders.groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
    val stats  = counts.agg(avg("cnt").as("mean_cnt"))
    counts.crossJoin(broadcast(stats))
      .agg(
        round(first("mean_cnt"), 6).as("mean_cnt"),
        round(
          (sum(when(abs(col("cnt") - col("mean_cnt")) > col("mean_cnt") * coeff, 1).otherwise(0))
            / count(lit(1))).cast("double"), 6).as("frac_outside"))
  }

  /** E — star-schema join: fact joined through three broadcast dimensions.
    * `broadcast()` hints keep the 100 TB fact table un-shuffled: each
    * executor streams its fact partitions against replicated hash maps of
    * customer/nation/region.
    */
  def revenueByRegion(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("r_name")

  /** E — fact-fact equi inner join (lineitem ⋈ orders): both sides large, so
    * this is a shuffle join on the key; aggregation below it is partial
    * (map-side) first.
    */
  def joinInner(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority")

  /** E — left outer join preserving customers with no orders. */
  def joinLeft(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  /** E — right outer join preserving customers with no orders: the mirror
    * of [[joinLeft]] with the preserved side on the right. Spark plans
    * right-outer broadcast joins by broadcasting the LEFT side, so with a
    * large fact on the left this stays a shuffle join — same cost model as
    * the left form.
    */
  def joinRight(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"), "right")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  /** E — full outer join on key sets that only partially overlap. */
  def joinFullOuter(customer: DataFrame, orders: DataFrame): DataFrame = {
    val custSide = customer.select(col("c_custkey").as("k")).distinct()
    val bigCust  = orders.groupBy(col("o_custkey").as("k2"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 8)
    custSide.join(bigCust, col("k") === col("k2"), "full")
      .select(
        coalesce(col("k"), col("k2")).as("custkey"),
        col("k").isNotNull.as("in_customer"),
        col("k2").isNotNull.as("in_big"))
      .orderBy("custkey")
  }

  /** E — left semi: customers having at least one URGENT order. Semi joins
    * ship only the key column of the right side and stop at first match. */
  def joinSemi(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
        orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  /** E — left anti: customers with no urgent orders. */
  def joinAnti(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
        orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** E — theta/range join: parts priced into inline bands. The band table is
    * tiny and broadcast, so the non-equi condition runs as a
    * BroadcastNestedLoopJoin — O(n·bands), fine because bands is O(1); a
    * fact-fact range join would instead need binning into an equi prefix.
    */
  def joinRangeBands(part: DataFrame): DataFrame = {
    val spark = part.sparkSession
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 1200.0), ("mid", 1200.0, 1600.0), ("high", 1600.0, 1e18)
    ).toDF("band", "lo", "hi")
    part.join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice")).as("sum_price"))
      .orderBy("band")
  }

  /** TPC-H Q1-shaped pricing summary: the canonical wide aggregate — per
    * (returnflag, linestatus): quantities, prices, discounted+taxed
    * charges, means, count. One partial+final hash aggregate over the fact
    * scan; all sums exact-decimal for oracle stability.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumn("disc_price", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .withColumn("charge", col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("disc_price"), 6).as("sum_disc_price"),
        dsum(col("charge"), 6).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-shaped shipping priority: revenue of a customer segment's
    * orders, top 10 by revenue. Broadcast the filtered customer dim, one
    * shuffle join lineitem⋈orders, partial-agg revenue, TakeOrdered top-k.
    */
  def shippingPriority(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                       segment: String = "BUILDING", k: Int = 10): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        unix_timestamp(col("o_orderdate")).as("o_date"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(k)

  /** E — TPC-H Q5-shaped "local supplier volume": revenue per nation from
    * lineitems where the supplier and the ordering customer sit in the same
    * nation of one region, over an order-date window. Six tables at three
    * join depths — the join-ordering/broadcast-selection exercise beyond
    * the star schema of [[revenueByRegion]].
    *
    * Scale shape: nation⋈region is a genuine dim (≤ dozens of rows) and is
    * broadcast-pruned FIRST, so customer and supplier are each cut to one
    * region before any big join. orders is date-filtered at the scan
    * (pushed predicate), then orders⋈customer shuffles on custkey,
    * ⋈lineitem shuffles on orderkey. The region-pruned supplier side is
    * deliberately UNHINTED: at fixture scale Catalyst/AQE broadcast it; at
    * 100 TB (~10⁸ suppliers after pruning) it exceeds any broadcast budget
    * and AQE keeps the shuffle join — sizing decisions stay with the
    * optimizer, where they belong. The same-nation predicate
    * (c_nationkey = s_nationkey) rides the supplier equi-join.
    */
  def localSupplierVolume(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                          supplier: DataFrame, nation: DataFrame, region: DataFrame,
                          regionName: String = "ASIA",
                          from: String = "1996-01-01", until: String = "1998-01-01"): DataFrame = {
    val natInRegion = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer
      .join(broadcast(natInRegion), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey")
    val supp = supplier
      .join(broadcast(natInRegion), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select("o_orderkey", "o_custkey")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
        col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** E — TPC-H Q7-shaped "volume shipping": bilateral trade revenue between
    * two nations by ship-year — lines a nation-A supplier shipped to a
    * nation-B customer or vice versa. Deepest join in the suite after
    * [[localSupplierVolume]]: lineitem⋈orders⋈customer×nation on one side,
    * ⋈supplier×nation on the other, with the nation-pair predicate as a
    * disjunction over the two directions.
    *
    * Scale shape: both nation dims are filtered to ONE row each and
    * broadcast, so supplier and customer are pruned to two nations before
    * touching the fact table; lineitem is date-filtered at the scan. The
    * two big joins shuffle on l_orderkey and o_custkey — the minimum for
    * this topology; the pair disjunction rides the final (already
    * co-partitioned) join as a residual filter, costing no extra exchange.
    */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                     supplier: DataFrame, nation: DataFrame,
                     nationA: String = "NATION_18", nationB: String = "NATION_19",
                     from: String = "1995-01-01", until: String = "1999-01-01"): DataFrame = {
    val nat2 = nation.filter(col("n_name").isin(nationA, nationB))
    val supp = supplier
      .join(broadcast(nat2.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val cust = customer
      .join(broadcast(nat2.select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("n2_key"))
      .select("c_custkey", "cust_nation")
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** E — TPC-H Q10-shaped "returned items": the customers who returned the
    * most revenue in an order-date quarter — the churn/abuse report. orders
    * is date-pruned at the scan, lineitem is returnflag-pruned at the scan,
    * they shuffle-join on orderkey, aggregate by customer, and only THEN
    * join the (comparatively small) customer dim — aggregating before the
    * dim join keeps the wide customer row out of the big shuffle. Top-k by
    * revenue via TakeOrderedAndProject.
    */
  def returnedItems(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                    nation: DataFrame, from: String = "1996-01-01",
                    until: String = "1996-07-01", k: Int = 20): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select("o_orderkey", "o_custkey")
      .join(lineitem.filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /** E — TPC-H Q8-shaped "market share": a target nation's share of the
    * revenue that suppliers earn from one region's customers for one part
    * type, by order year. The deepest composite in the suite — seven
    * relations, nation joined in TWO roles (customer region pruning and
    * supplier attribution) — exercising join ordering, double broadcast
    * pruning, and the sum(CASE)/sum share pattern at depth.
    *
    * Scale shape: region⋈nation prunes customers FIRST (broadcast), part
    * is type-filtered and broadcast, the supplier-nation dim is broadcast
    * unfiltered (attribution needs all nations); the fact joins shuffle on
    * their keys, and the share division happens on two exact-decimal sums.
    *
    * Join order (round 14): the part broadcast prune lands on lineitem
    * BEFORE the l_orderkey⋈o_orderkey shuffle. The prune is map-side
    * (broadcast), so applying it first adds no exchange — but it selects
    * ~1/150 of parts, so the orderkey shuffle that follows carries ~150×
    * fewer rows than the r13 shape (which pruned after the fact-fact
    * join). At 100 TB that ordering is the difference between shuffling
    * the whole lineitem table and shuffling only the target part type.
    */
  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  supplier: DataFrame, nation: DataFrame, region: DataFrame,
                  part: DataFrame, targetNation: String = "NATION_19",
                  regionName: String = "ASIA", pType: String = "STANDARD",
                  from: String = "1995-01-01", until: String = "1999-01-01"): DataFrame = {
    val custInRegion = customer
      .join(broadcast(nation
        .join(broadcast(region.filter(col("r_name") === regionName)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNation = supplier
      .join(broadcast(nation.select(col("n_nationkey").as("_snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("_snk"))
      .select("s_suppkey", "supp_nation")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val liTyped = lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(part.filter(col("p_type") === pType).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
    orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .join(custInRegion, col("o_custkey") === col("c_custkey"))
      .join(liTyped, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        dsum(when(col("supp_nation") === targetNation, rev).otherwise(lit(0.0)), 6).as("nation_revenue"),
        dsum(rev, 6).as("total_revenue"))
      .withColumn("mkt_share",
        round(col("nation_revenue") / col("total_revenue"), 6))
      .orderBy("o_year")
  }

  /** E/G — TPC-H Q14-shaped "promo effect": the share of revenue from
    * promo-typed parts, per ship-month — the conditional-aggregate-over-a-
    * join pattern (sum(CASE)/sum). part is broadcast (dim); lineitem is
    * date-pruned at the scan; one partial+final aggregate per month.
    */
  def promoRevenue(lineitem: DataFrame, part: DataFrame,
                   from: String = "1996-01-01", until: String = "1997-01-01"): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")
      .join(broadcast(part.select("p_partkey", "p_type")), col("l_partkey") === col("p_partkey"))
      .groupBy(unix_timestamp(date_trunc("month", col("l_shipdate"))).as("ship_month"))
      .agg(
        dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)), 6).as("promo_revenue"),
        dsum(rev, 6).as("total_revenue"))
      .withColumn("promo_share",
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6))
      .orderBy("ship_month")
  }

  /** E — TPC-H Q9-shaped "nation profit": profit attribution by supplier
    * nation and order year for one part family. The fixture has no partsupp
    * table, so supply cost is proxied as a fixed fraction of the part's
    * retail price per unit — the plan shape (two broadcast dims pruning the
    * fact scan, one fact-fact shuffle join, exact-decimal signed aggregate)
    * is the Q9 shape regardless of the cost column's provenance.
    *
    * Scale shape: part is name-filtered and broadcast, so lineitem is
    * pruned to the part family before the orders join; supplier⋈nation is
    * broadcast (attribution dim); the single big shuffle is
    * lineitem⋈orders on orderkey. Profit can be negative — dsum's
    * DECIMAL(18,6) accumulator is sign-exact where a double sum would
    * drift under cancellation.
    */
  def nationProfit(lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
                   nation: DataFrame, part: DataFrame,
                   namePrefix: String = "red", costFactor: Double = 0.1): DataFrame = {
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      col("p_retailprice") * lit(costFactor) * col("l_quantity")
    lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(broadcast(part.filter(col("p_name").startsWith(namePrefix))
        .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier
        .join(broadcast(nation.select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "n_name")),
        col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(amount, 6).as("profit"))
      .orderBy("nation", "o_year")
  }

  /** E/G — TPC-H Q12-shaped "late lines by priority": for each return flag,
    * how many lines shipped ≥ `lagDays` after their order date, split by
    * order priority — the fact-fact join with CASE-bucketed counts. The
    * fixture lineitem has no shipmode/commitdate/receiptdate columns, so
    * the line dimension is the return flag and "late" is a ship-vs-order
    * date lag; the Q12 shape (date-window scan prune, orderkey shuffle
    * join, non-equi date residual, sum(CASE) buckets) is unchanged.
    */
  def latePriorityLines(lineitem: DataFrame, orders: DataFrame,
                        lagDays: Int = 90, from: String = "1996-01-01",
                        until: String = "1997-01-01"): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select("l_orderkey", "l_returnflag", "l_shipdate")
      .join(orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") + expr(s"INTERVAL $lagDays DAYS"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(high, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
        sum(when(high, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** J — scalar function surface in one pass: string, date, arithmetic,
    * array and JSON constructors (all codegen'd built-ins; SURVEY.md §2-J).
    */
  def scalarFunctions(orders: DataFrame): DataFrame =
    orders.select(
        col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        unix_timestamp(date_trunc("month", col("o_orderdate"))).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        round(abs(col("o_totalprice") - lit(150000.0)), 2).as("price_dev"),
        array_contains(split(col("o_orderpriority"), "-"), "URGENT").as("is_urgent"),
        element_at(split(col("o_orderpriority"), "-"), 1).as("prio_num"),
        to_json(struct(col("o_orderstatus").as("s"))).as("js"))
      .orderBy("o_orderkey")

  /** E — binned range join: the scale path for point-in-interval joins.
    * Spark plans a non-equi `pt BETWEEN lo AND hi` join between two LARGE
    * relations as BroadcastNestedLoopJoin / cartesian — O(n·m). Binning
    * makes it an equi-join: each point keys by floor(pt/width); each
    * interval explodes to every bin it covers (≈ span/width + 1 rows);
    * join on the bin, then apply the exact range predicate as a residual
    * filter. Exact (a point's single bin is always among its matching
    * interval's bins) and shuffle-partitioned by bin. Pick `binWidth` near
    * the typical interval span so intervals explode to O(1) bins.
    *
    * Columns: `left` must carry long column `ptCol`; `right` long columns
    * `loCol`/`hiCol` (inclusive bounds), e.g. epoch seconds.
    */
  def binnedRangeJoin(left: DataFrame, right: DataFrame,
                      ptCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    val lb = left.withColumn("_bin", floor(col(ptCol) / binWidth))
    val rb = right.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    lb.join(rb, "_bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bin")
  }

  /** E — cross join (small × small only; a guard for the 100 TB case is to
    * never cross-join two large relations — see Similarity for the LSH
    * pre-filtered alternative).
    */
  def crossCount(nation: DataFrame, region: DataFrame): DataFrame =
    nation.crossJoin(broadcast(region))
      .groupBy("r_name").agg(count(lit(1)).as("n_pairs"))
      .orderBy("r_name")

  /** RFM customer segmentation — recency / frequency / monetary quintile
    * scores and the classic named segments, the audience-analytics staple
    * over an order history. Recency is days from a customer's last order
    * to the corpus's last order (so the report is reproducible from the
    * data alone, no wall-clock); scores are 1–5 with 5 best (recency is
    * reverse-scored: recent = high).
    *
    * Scale shape — deliberately NOT `ntile(5) OVER (ORDER BY …)`: a global
    * unpartitioned window serializes the whole customer set through one
    * task. Instead the quintile fences are ONE 1-row exact-percentile
    * aggregate broadcast back, and scoring is a row-local fence count —
    * the [[graft.ops.Events.zscoreAnomalies]] broadcast-moments shape. Per
    * customer: one groupBy(o_custkey) shuffle of orders, two 1-row
    * broadcasts (corpus max date, fences), zero windows, zero self-joins.
    * Ties sit AT a fence and score below it on both engines (strict `>`
    * replayed verbatim), so equal metric values always get equal scores —
    * the one semantic difference from ntile, and the right one (ntile
    * splits ties by arbitrary row order; a segmentation must not).
    *
    * Determinism: metrics are exact (datediff on truncated dates, count,
    * decimal sum rounded once); fences are the established Spark
    * `percentile` ↔ DuckDB `quantile_cont` pair; every comparison is over
    * identical doubles.
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val maxd = orders.agg(max(col("o_orderdate").cast("date")).as("_maxd"))
    val raw = orders
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        max(col("o_orderdate").cast("date")).as("_last"),
        count(lit(1)).as("frequency"),
        round(dsum(col("o_totalprice"), 6), 2).as("monetary"))
      .crossJoin(broadcast(maxd))
      .select(col("c_custkey"),
        datediff(col("_maxd"), col("_last")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
    val fences = raw.agg(
      expr("percentile(recency_days, array(0.2D, 0.4D, 0.6D, 0.8D))").as("_rf"),
      expr("percentile(frequency, array(0.2D, 0.4D, 0.6D, 0.8D))").as("_ff"),
      expr("percentile(monetary, array(0.2D, 0.4D, 0.6D, 0.8D))").as("_mf"))
    def bucket(v: org.apache.spark.sql.Column, f: String): org.apache.spark.sql.Column =
      (1 to 4).map(i => when(v > element_at(col(f), i), 1).otherwise(0))
        .reduce(_ + _) + lit(1)
    val seg = when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "champion")
      .when(col("r_score") >= 4 && col("f_score") >= 3, "loyal")
      .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
      .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
      .otherwise("regular")
    raw.crossJoin(broadcast(fences))
      .select(col("c_custkey"), col("recency_days"), col("frequency"),
        col("monetary"),
        (lit(6) - bucket(col("recency_days"), "_rf")).as("r_score"),
        bucket(col("frequency"), "_ff").as("f_score"),
        bucket(col("monetary"), "_mf").as("m_score"))
      .withColumn("segment", seg)
      .orderBy("c_custkey")
  }

  /** Generated DuckDB oracle for [[rfmSegments]]: same metrics, same
    * quantile fences, same strict-`>` fence counts and segment CASE. */
  def rfmOracleSql(table: String = "orders"): String = {
    def b(v: String, f: String): String =
      (1 to 4).map(i => s"(CASE WHEN $v > $f[$i] THEN 1 ELSE 0 END)")
        .mkString("1 + ", " + ", "")
    s"""WITH mx AS (SELECT CAST(max(o_orderdate) AS DATE) AS maxd FROM $table),
       |raw AS (
       |  SELECT o_custkey AS c_custkey,
       |         date_diff('day', CAST(max(o_orderdate) AS DATE), maxd)
       |           AS recency_days,
       |         COUNT(*) AS frequency,
       |         round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
       |               AS DOUBLE), 2) AS monetary
       |  FROM $table CROSS JOIN mx GROUP BY o_custkey, maxd),
       |f AS (SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rf,
       |             quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS ff,
       |             quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mf
       |      FROM raw),
       |s AS (SELECT c_custkey, recency_days, frequency, monetary,
       |             6 - (${b("recency_days", "rf")}) AS r_score,
       |             ${b("frequency", "ff")} AS f_score,
       |             ${b("monetary", "mf")} AS m_score
       |      FROM raw CROSS JOIN f)
       |SELECT c_custkey, recency_days, frequency, monetary,
       |       r_score, f_score, m_score,
       |       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
       |              THEN 'champion'
       |            WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
       |            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
       |            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
       |            ELSE 'regular' END AS segment
       |FROM s ORDER BY c_custkey""".stripMargin
  }
}
