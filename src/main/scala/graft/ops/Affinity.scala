package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket affinity mining: frequent item pairs and association
  * rules (support / confidence / lift) — the classic co-occurrence
  * analytics next to the graph projections ([[Graph.basketEdges]] censuses
  * the same baskets structurally; this scores them statistically).
  *
  * Scale shape — Apriori, level 2, all keyed shuffles:
  *   1. one distinct projects (basket, item) pairs;
  *   2. item supports are one map-side-combining aggregate;
  *   3. baskets are pruned to FREQUENT items before any pairing
  *      (monotonicity: a pair can never out-support its rarer item), so
  *      the quadratic-in-basket-size pair explosion runs over the pruned
  *      baskets only — with a sane support threshold the surviving items
  *      per basket are few even when raw baskets are huge;
  *   4. pair counts are another combining aggregate keyed by the pair.
  * Nothing is collected; the basket count rides as a 1-row broadcast (the
  * scalar-subquery pattern).
  *
  * Determinism: all counts are exact longs; support/confidence/lift are
  * single double divisions of those longs written identically in the
  * oracle (round(·, 6) discipline), and the output carries a total
  * (antecedent, consequent) order.
  */
object Affinity {

  /** Distinct (basket, item) pairs from order lines — the input shape
    * [[associationRules]] mines. */
  def basketItems(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .distinct()

  /** Association rules over item pairs co-occurring in at least `minPairs`
    * baskets. Both directions of each frequent pair are emitted:
    * support = c(x,y)/N, confidence = c(x,y)/c(antecedent),
    * lift = confidence / (c(consequent)/N) — lift is direction-symmetric
    * (spec-asserted).
    */
  def associationRules(baskets: DataFrame, minPairs: Long = 2L): DataFrame = {
    require(minPairs >= 1, s"minPairs must be >= 1, got $minPairs")
    // read three times (basket count, item supports, pair generation) —
    // one scan, scoped persist
    val b = Helpers.releaseAfterFirstAction(
      baskets.select("basket", "item").distinct().persist())
    val nBaskets = b.agg(countDistinct("basket").as("n"))
    val itemN = b.groupBy("item").agg(count(lit(1)).as("c"))
    val frequent = itemN.filter(col("c") >= minPairs).select("item")
    val fb = b.join(frequent, Seq("item"), "left_semi")
    val x = fb.select(col("basket"), col("item").as("x"))
    val y = fb.select(col("basket"), col("item").as("y"))
    val pairs = x.join(y, "basket").filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("cp"))
      .filter(col("cp") >= minPairs)
    val joined = pairs
      .join(itemN.select(col("item").as("x"), col("c").as("cx")), "x")
      .join(itemN.select(col("item").as("y"), col("c").as("cy")), "y")
    val fwd = joined.select(col("x").as("antecedent"), col("y").as("consequent"),
      col("cp"), col("cx").as("ca"), col("cy").as("cc"))
    val bwd = joined.select(col("y").as("antecedent"), col("x").as("consequent"),
      col("cp"), col("cy").as("ca"), col("cx").as("cc"))
    fwd.unionByName(bwd)
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("cp").as("pair_n"),
        round(col("cp").cast("double") / col("n").cast("double"), 6).as("support"),
        round(col("cp").cast("double") / col("ca").cast("double"), 6).as("confidence"),
        round((col("cp").cast("double") / col("ca").cast("double")) /
          (col("cc").cast("double") / col("n").cast("double")), 6).as("lift"))
      .orderBy("antecedent", "consequent")
  }
}
