package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle strategy for repeated co-located joins at
  * 100 TB: both sides written bucketed by the join key join WITHOUT any
  * shuffle exchange. This is the durable analog of the reference's chunking
  * (data pre-partitioned by key on storage).
  */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("join of two tables bucketed on the join key plans zero shuffles") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse;
    // DROP TABLE below removes the managed files
    import graft.core.Tables
    try {
    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    // disable broadcast so the join would otherwise shuffle both sides
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), "o_custkey")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      val shuffles = collect(joined.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s
      }
      // only the final 5-group aggregate may shuffle; the join must not
      assert(shuffles.size <= 1, s"expected bucketed join without join-side shuffles, got ${shuffles.size}")
    }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
