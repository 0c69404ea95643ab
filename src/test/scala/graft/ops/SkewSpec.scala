package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin produces exactly the rows of the plain join") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey").as("k"), col("o_totalprice"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val plain = orders.join(cust, "k")
      .select("o_orderkey", "c_mktsegment")
    val salted = Skew.saltedJoin(orders, cust, "k", saltFactor = 8)
      .select("o_orderkey", "c_mktsegment")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedJoin spreads a hot key over multiple partitions") {
    import spark.implicits._
    // one hot key carrying 90% of rows
    val fact = ((1 to 9000).map(i => (i.toLong, 1L)) ++ (1 to 1000).map(i => (i.toLong, (i % 50 + 2).toLong)))
      .toDF("id", "k")
    val dim = (1L to 60L).map(k => (k, s"dim$k")).toDF("k", "label")
    val joined = Skew.saltedJoin(fact, dim, "k", saltFactor = 8)
    assert(joined.count() == 10000)
    // the hot key's rows must not all share one post-shuffle partition:
    // count distinct salts actually used for k=1 before the join drops them
    val salts = fact.filter($"k" === 1L)
      .withColumn("_salt", pmod(xxhash64($"k", monotonically_increasing_id()), lit(8)))
      .select("_salt").distinct().count()
    assert(salts > 1)
  }

  test("saltedCountDistinct equals plain countDistinct") {
    val orders = Tables.orders(spark, sfDir)
    val plain = orders.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("n_distinct"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedCountDistinct(orders, "o_orderstatus", "o_custkey", 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("AQE splits a skewed join partition at runtime (the re-plan path next to manual salting)") {
    // isolated session: skew thresholds tuned down to fixture scale, and
    // broadcast disabled so the join stays a sort-merge join AQE can split
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    import s2.implicits._
    // one hot key carrying ~95% of the left side, with a padded payload so
    // its partition crosses the (lowered) skew threshold
    val left = (0 until 40000).map(i => (if (i % 20 == 0) i.toLong % 50 + 1 else 0L, "x" * 64))
      .toDF("k", "pad")
    val right = (0L to 50L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val joined = left.join(right, "k")
    // execute THIS frame's own queryExecution so AQE finalizes it (count()
    // would spawn a separate execution and leave this plan un-adapted)
    assert(joined.collect().length == 40000)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val adaptive = joined.queryExecution.executedPlan
      .collect { case a: AdaptiveSparkPlanExec => a }
    assert(adaptive.nonEmpty, "AQE must own the join plan")
    // the skewed join sits inside query-stage leaves, which collect() does
    // not descend into — assert on the finalized plan's rendering
    val rendered = adaptive.head.executedPlan.toString
    assert(rendered.contains("skew=true") && rendered.contains("AQEShuffleRead skewed"),
      s"the hot-key partition must be split by OptimizeSkewedJoin:\n$rendered")
  }
}
