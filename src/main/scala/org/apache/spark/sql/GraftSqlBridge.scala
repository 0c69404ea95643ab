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

  /** `might_contain(bloom, value)` as a Column — the Bloom-probe
    * expression Spark uses for its own runtime row-level filters
    * (`BloomFilterMightContain`, codegen'd, deserializes the constant
    * filter once per plan). It is not in the public FunctionRegistry, so
    * in-plan Bloom probing (graft.ops.Dedup.contaminatedProbe) routes
    * through this bridge instead of a ScalaUDF.
    */
  def mightContain(bloom: Column, value: Column): Column =
    column(catalyst.expressions.BloomFilterMightContain(
      expression(bloom), expression(value)))

  /** Wrap a Catalyst logical plan back into a public DataFrame — the hook a
    * custom whole-operator node (graft.plans.TopKPerGroupPlan) needs to
    * enter a query from the DataFrame API. Delegates to
    * `classic.Dataset.ofRows`, which runs the normal analyzer/optimizer/
    * planner pipeline on the plan.
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Planned scan task count of a physical plan WITHOUT instantiating RDD
    * lineage — the driver-side check behind
    * `graft.ops.Helpers.spreadForCompute`.
    *
    * `df.rdd.getNumPartitions` answers the same question but builds the
    * whole RDD DAG on the driver (and, under AQE with exchanges below,
    * `AdaptiveSparkPlanExec.doExecute` would even materialize query
    * stages). This instead replays Spark's own file-split planning
    * (`FilePartition.maxSplitBytes` + `PartitionedFileUtil.splitFiles` +
    * `FilePartition.getFilePartitions` — exactly what
    * `FileSourceScanExec.createReadRDD` does) over the scan's file
    * listing: pure driver-side arithmetic over already-listed file sizes.
    *
    * Returns None when the width is not a narrow function of file splits —
    * any shuffle in the plan (post-exchange width is config-sized, never
    * under-split relative to it), a bucketed scan, or a non-file leaf
    * (local relation, DSv2). Callers treat None as "already wide enough".
    */
  def plannedScanSplits(df: Dataset[_]): Option[Int] = {
    import org.apache.spark.sql.execution.{FileSourceScanLike, PartitionedFileUtil}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    if (plan.exists(_.isInstanceOf[ShuffleExchangeLike])) None
    else {
      val leaves = plan.collectLeaves()
      val scans = leaves.collect { case f: FileSourceScanLike => f }
      if (scans.length != leaves.length || scans.isEmpty ||
          scans.exists(_.bucketedScan)) None
      else Some(scans.map { scan =>
        // selectedPartitions, not dynamicallySelectedPartitions: runtime
        // (DPP) filters haven't arrived pre-execution, and the dynamic
        // variant is protected — static pruning is the planning-time truth
        val listing = scan.selectedPartitions
        val maxSplit = FilePartition.maxSplitBytes(session, listing)
        val splits = listing.filePartitionIterator.flatMap { lp =>
          lp.files.flatMap { f =>
            val splitable = scan.relation.fileFormat.isSplitable(
              session, scan.relation.options, f.getPath)
            PartitionedFileUtil.splitFiles(f, f.getPath, splitable, maxSplit, lp.values)
          }
        }.toSeq
        FilePartition.getFilePartitions(session, splits, maxSplit).length
      }.sum)
    }
  }

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
    * frame (exactly one pending release listener PER SCOPED PERSIST — an
    * operator may legitimately hold several, e.g. Dedup.jaccardPairs holds
    * two: shingle arrays + shared df-ranked prefix; Dedup.minhashPairs two:
    * shingle arrays + band buckets) and its disappearance once the frame
    * is finally consumed.
    */
  def queryListenerCount(spark: SparkSession): Int =
    spark.listenerManager.listListeners().length

  /** Stable per-session identity as a plain String (holds no session
    * reference) — `SparkSession.sessionUUID` is `private[sql]`, and
    * graft.core.Tables needs it as a retention key that cannot itself keep
    * the session alive.
    */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

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

  /** Whether `df` IS a materialized checkpoint shell — its analyzed plan is
    * exactly one `LogicalRDD` whose backing RDD is persisted. Re-running
    * `localCheckpoint()` on such a frame duplicates its blocks and strands
    * the inner copy with no release path (round-14 ADVICE: the
    * components/LPA memos wrapped already-checkpointed results);
    * graft.ops.ProbeCache uses this to memoize the frame as-is instead.
    * Deliberately narrow: any operator on top of a checkpoint (a sort, a
    * project) makes the root a non-LogicalRDD node and the frame is
    * checkpointed normally.
    */
  def isMaterializedCheckpointShell(df: Dataset[_]): Boolean =
    df.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
      case _ => false
    }
}
