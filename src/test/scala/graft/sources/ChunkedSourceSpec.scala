package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

class ChunkedSourceSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def read(rows: Long, chunks: Int) =
    spark.read.format("graft.sources.ChunkedSource")
      .option("numRows", rows).option("numChunks", chunks).load()

  test("serves the full deterministic table, one partition per chunk") {
    val df = read(1000, 4)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select(countDistinct("id")).collect().head.getLong(0) == 1000)
    val byChunk = df.groupBy("chunk").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(byChunk == Map(0 -> 250L, 1 -> 250L, 2 -> 250L, 3 -> 250L))
  }

  test("id predicates push into the source (row_restriction analog)") {
    val df = read(1000, 4).filter(col("id") >= 100 && col("id") < 200)
    assert(df.count() == 100)
    val scan = collect(df.queryExecution.executedPlan) { case s: BatchScanExec => s }.head
    val desc = scan.scan.description()
    assert(desc.contains("GreaterThanOrEqual(id,100)"), desc)
    assert(desc.contains("LessThan(id,200)"), desc)
  }

  test("column pruning reaches the source") {
    val df = read(100, 2).select("id")
    val scan = collect(df.queryExecution.executedPlan) { case s: BatchScanExec => s }.head
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("id"))
    assert(df.collect().length == 100)
  }

  test("chunked source joins with engine operators like any relation") {
    val df = read(500, 8)
    val agg = df.filter(col("id") % 2 === 0)
      .groupBy("chunk").agg(count(lit(1)).as("n"))
    assert(agg.collect().map(_.getLong(1)).sum == 250)
  }
}
