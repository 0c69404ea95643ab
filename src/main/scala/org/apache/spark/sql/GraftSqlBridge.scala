package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` API: converting between a public
  * `Column` and its Catalyst `Expression` so graft can define native
  * codegen expressions (graft.functions.VectorExpressions) without
  * forking Spark. This is the only `org.apache.spark.sql`-packaged code
  * in the project and it delegates 1:1 to Spark's own helpers.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a Catalyst logical plan back into a public DataFrame — the hook a
    * custom whole-operator node (graft.plans.TopKPerGroupPlan) needs to
    * enter a query from the DataFrame API. Delegates to
    * `classic.Dataset.ofRows`, which runs the normal analyzer/optimizer/
    * planner pipeline on the plan.
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Whether the session's shared CacheManager holds NO live SQL cache
    * entries — the observability hook behind the scoped-persist contract
    * (graft.ops.Helpers.releaseAfterFirstAction): specs assert an operator
    * leaves no orphaned cache entry behind once its first consuming action
    * completes.
    */
  def sqlCacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Drop every SQL cache entry (test isolation for cache-hygiene specs). */
  def clearSqlCache(spark: SparkSession): Unit =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.clearCache()

  /** Number of registered QueryExecutionListeners — cache-hygiene specs use
    * this to pin the bounded residual of a never-consumed scoped-persist
    * frame (exactly one pending release listener) and its disappearance
    * once the frame is finally consumed.
    */
  def queryListenerCount(spark: SparkSession): Int =
    spark.listenerManager.listListeners().length

  /** Release the storage blocks behind a `localCheckpoint()`ed DataFrame.
    *
    * `Dataset.unpersist` cannot do this — checkpoint blocks live on the
    * internal RDD wrapped in the plan's `LogicalRDD`, not in the
    * CacheManager. Iterative operators (graft.ops.Dedup.clusterPairs)
    * checkpoint every round; without an explicit release each round's
    * blocks survive until JVM garbage collection triggers the
    * ContextCleaner — unbounded resident storage over a long-running
    * session. ONLY call this on checkpoints that are fully superseded:
    * a localCheckpoint has no lineage, so a released RDD that is
    * referenced again cannot be recomputed and the job fails.
    */
  def releaseLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ =>
    }
}
