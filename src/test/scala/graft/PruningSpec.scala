package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Partition pruning — the storage-layout analog of the reference's
  * chunk-by-key fetch: data written partitioned by a key column, and a
  * key-filtered query must only read the matching directories.
  */
class PruningSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("key filter on partitioned parquet prunes to matching partitions only") {
    val dir = Files.createTempDirectory("graft_part").toString
    graft.core.Tables.orders(spark, sfDir)
      .write.partitionBy("o_orderstatus").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("o_orderstatus") === "O")
    q.collect()
    val scans = collect(q.queryExecution.executedPlan) { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val scan = scans.head
    // the scan carries a partition filter, and the runtime numFiles metric
    // shows only a subset of the table's files were read
    assert(scan.partitionFilters.nonEmpty)
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = spark.read.parquet(dir).inputFiles.length
    assert(filesRead > 0)
    assert(filesRead < totalFiles, s"read $filesRead of $totalFiles — no pruning happened")
  }
}
