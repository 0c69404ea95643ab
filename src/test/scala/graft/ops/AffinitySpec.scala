package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Association-rule invariants: hand-computed micro example, Apriori
  * pruning transparency, lift symmetry, partitioning stability.
  */
class AffinitySpec extends SparkSpec {

  private def baskets(pairs: (Long, Long)*) = {
    val spark2 = spark
    import spark2.implicits._
    pairs.toDF("basket", "item")
  }

  test("associationRules: hand-computed support/confidence/lift") {
    // baskets 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b}  (a=10, b=20, c=30)
    val b = baskets((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L), (4L, 20L))
    val rules = Affinity.associationRules(b, minPairs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // (a,b): cp=2; (a,c): cp=2; (b,c): cp=1 pruned. N=4, c(a)=3 c(b)=3 c(c)=2
    assert(rules.keySet == Set((10L, 20L), (20L, 10L), (10L, 30L), (30L, 10L)))
    val (n1, s1, conf1, l1) = rules((10L, 20L)) // a->b
    assert(n1 == 2L && s1 == 0.5 && conf1 == 0.666667 && l1 == 0.888889)
    val (_, _, conf2, l2) = rules((30L, 10L)) // c->a: conf 2/2=1, lift 1/(3/4)
    assert(conf2 == 1.0 && l2 == 1.333333)
  }

  test("associationRules: lift is direction-symmetric, confidence generally is not") {
    val rules = Affinity.associationRules(
      Affinity.basketItems(graft.core.Tables.lineitem(spark, sfDir)), minPairs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(rules.nonEmpty, "fixture baskets should produce rules")
    rules.foreach { case ((a, c), (_, lift)) =>
      assert(rules((c, a))._2 == lift, s"lift must be symmetric for ($a, $c)")
    }
  }

  test("associationRules: Apriori item pruning is invisible in the result") {
    // recompute pair counts WITHOUT the frequent-item pre-filter; the
    // surviving rules must be identical (monotonicity). basketItems no
    // longer dedups (the operators own that), so the recount distincts
    val b = Affinity.basketItems(graft.core.Tables.lineitem(spark, sfDir)).distinct()
    val x = b.select(col("basket"), col("item").as("x"))
    val y = b.select(col("basket"), col("item").as("y"))
    val unpruned = x.join(y, "basket").filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("cp"))
      .filter(col("cp") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pruned = Affinity.associationRules(b, minPairs = 2)
      .filter(col("antecedent") < col("consequent"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pruned == unpruned)
  }

  test("associationRules: bit-identical under repartitioning") {
    val b = Affinity.basketItems(graft.core.Tables.lineitem(spark, sfDir))
    assert(Affinity.associationRules(b).collect().toSeq ==
      Affinity.associationRules(b.repartition(7)).collect().toSeq)
  }

  test("pruneItems is a pure performance guard — rules and neighbors are bit-identical either way") {
    val b = Affinity.basketItems(graft.core.Tables.lineitem(spark, sfDir))
    assert(Affinity.associationRules(b, minPairs = 2, pruneItems = false).collect().toSeq ==
      Affinity.associationRules(b, minPairs = 2, pruneItems = true).collect().toSeq)
    assert(Affinity.itemNeighbors(b, topK = 3, minPairs = 2, pruneItems = false).collect().toSeq ==
      Affinity.itemNeighbors(b, topK = 3, minPairs = 2, pruneItems = true).collect().toSeq)
  }

  test("associationRules: rejects a degenerate threshold") {
    intercept[IllegalArgumentException](
      Affinity.associationRules(baskets((1L, 2L)), minPairs = 0))
  }

  test("itemNeighbors: hand-computed cosine ranking through the bounded-heap top-k") {
    // baskets 1:{a,b,c} 2:{a,b} 3:{a,c} 4:{b}; c(a)=3 c(b)=3 c(c)=2
    // cos(a,b) = 2/sqrt(9) = 0.666667; cos(a,c) = 2/sqrt(6) = 0.816497
    val b = baskets((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L), (4L, 20L))
    val out = Affinity.itemNeighbors(b, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(4)) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(out((10L, 1L)) == ((30L, 0.816497)), "a's best neighbor is c")
    assert(out((10L, 2L)) == ((20L, 0.666667)))
    assert(out((20L, 1L)) == ((10L, 0.666667)))
    assert(out((30L, 1L)) == ((10L, 0.816497)))
    assert(out.size == 4)
  }

  test("itemNeighbors: rank bound respected, cosine symmetric, deterministic under repartitioning") {
    val b = Affinity.basketItems(graft.core.Tables.lineitem(spark, sfDir))
    val rows = Affinity.itemNeighbors(b, topK = 3).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(4) <= 3L))
    val cos = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    cos.foreach { case ((i, n), c) =>
      cos.get((n, i)).foreach(c2 => assert(c2 == c, s"cosine must be symmetric for ($i,$n)"))
    }
    assert(Affinity.itemNeighbors(b, topK = 3).collect().toSeq ==
      Affinity.itemNeighbors(b.repartition(7), topK = 3).collect().toSeq)
  }
}
