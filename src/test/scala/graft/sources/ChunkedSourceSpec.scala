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

  private def aggScanOf(df: org.apache.spark.sql.DataFrame) =
    collect(df.queryExecution.executedPlan) { case s: BatchScanExec => s }
      .map(_.scan.description()).find(_.contains("AGGPUSHED"))

  test("COUNT/MIN/MAX are absorbed into the scan (metadata-query analog)") {
    val df = read(1000, 4).agg(count(lit(1)).as("n"),
      min("id").as("lo"), max("id").as("hi"))
    val desc = aggScanOf(df)
    assert(desc.isDefined, df.queryExecution.executedPlan.toString)
    assert(desc.get.contains("CountRows") && desc.get.contains("MinId") &&
      desc.get.contains("MaxId"), desc.get)
    assert(df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      Seq((1000L, 0L, 999L)))
  }

  test("pushed aggregates compose with pushed filters (count over an id range)") {
    val df = read(1000, 4).filter(col("id") >= 100 && col("id") < 200)
      .agg(count(lit(1)).as("n"), max("id").as("hi"))
    val desc = aggScanOf(df)
    assert(desc.isDefined && desc.get.contains("GreaterThanOrEqual(id,100)"), desc)
    assert(df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) == Seq((100L, 199L)))
  }

  test("group-by chunk pushes down; partial rows merge to per-chunk counts") {
    val df = read(1000, 4).groupBy("chunk")
      .agg(count(lit(1)).as("n"), min("id").as("lo"))
    val desc = aggScanOf(df)
    assert(desc.isDefined && desc.get.contains("groupByChunk=true"), desc)
    val got = df.collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(0 -> ((250L, 0L)), 1 -> ((250L, 250L)),
      2 -> ((250L, 500L)), 3 -> ((250L, 750L))))
  }

  test("gate query: agg leg is metadata-answered, rows leg folds the id range") {
    // q_chunked_source's value is only as strong as its plan shape — pin
    // that the agg leg really engages aggregate pushdown (group-by-chunk)
    // and the rows leg really pushes its id range, so the oracle hash
    // keeps covering both connector paths
    val df = ChunkedSource.gateQuery(spark)
    val descs = collect(df.queryExecution.executedPlan) { case s: BatchScanExec => s }
      .map(_.scan.description())
    assert(descs.exists(d => d.contains("AGGPUSHED") && d.contains("groupByChunk=true")),
      descs.mkString("\n"))
    assert(descs.exists(d => !d.contains("AGGPUSHED") &&
      d.contains("GreaterThanOrEqual(id,150)") && d.contains("LessThan(id,250)")),
      descs.mkString("\n"))
    val rows = df.collect()
    assert(rows.length == ChunkedSource.gateChunks + 1)
    assert(rows.count(_.getString(0) == "rows") == 1)
    val r = rows.find(_.getString(0) == "rows").get
    assert((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((1, 100L, 150L, 249L)))
  }

  test("group-by-only pushdown (pruned nested aggregate / count-over-groupBy)") {
    // Catalyst prunes the inner agg of `groupBy(...).agg(...).count()` to a
    // zero-aggregate GROUP BY chunk before offering it to the source; the
    // builder must either answer that shape with the [chunk]-only agg scan
    // or decline it — accepting it and then building a row scan trips
    // V2ScanRelationPushDown's schema assertion (the RegistrySpec crash
    // this pins against)
    assert(read(1000, 4).groupBy("chunk")
      .agg(count(lit(1)).as("n"), min("id").as("lo")).count() == 4L)
    val distinctChunks = read(1000, 4).select("chunk").distinct()
    val desc = aggScanOf(distinctChunks)
    assert(desc.isDefined && desc.get.contains("groupByChunk=true"), desc)
    assert(distinctChunks.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3))
    // filter-folded: chunks whose id range empties out must not emit groups
    val filtered = read(1000, 4).filter(col("id") < 260).select("chunk").distinct()
    assert(filtered.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1))
    // the full gate query still counts under the same pruning
    assert(ChunkedSource.gateQuery(spark).count() == ChunkedSource.gateChunks + 1L)
  }

  test("unsupported aggregates fall back to the row-scan path, still correct") {
    val df = read(1000, 4).agg(sum("id").as("s"), countDistinct("chunk").as("d"))
    assert(aggScanOf(df).isEmpty, "SUM/COUNT DISTINCT must not be claimed by the source")
    assert(df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((1000L * 999L / 2, 4L)))
  }

  test("empty filtered range: pushed count merges to zero, min/max to null") {
    val df = read(1000, 4).filter(col("id") > 5000)
      .agg(count(lit(1)).as("n"), max("id").as("hi"))
    val r = df.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("LIMIT pushes down partially: readers clamp their ranges, global limit stays exact") {
    val df = read(1000, 4).limit(7)
    assert(df.count() == 7)
    val scan = collect(df.queryExecution.executedPlan) { case s: BatchScanExec => s }.head
    assert(scan.scan.description().contains("limit=7"), scan.scan.description())
    // composes with pushed filters: the clamp applies AFTER range folding
    val filtered = read(1000, 4).filter(col("id") >= 100).limit(5)
    assert(filtered.collect().map(_.getLong(0)).forall(_ >= 100))
    assert(filtered.count() == 5)
    // a limit wider than the table is harmless
    assert(read(10, 2).limit(100).count() == 10)
  }

  test("chunked source joins with engine operators like any relation") {
    val df = read(500, 8)
    val agg = df.filter(col("id") % 2 === 0)
      .groupBy("chunk").agg(count(lit(1)).as("n"))
    assert(agg.collect().map(_.getLong(1)).sum == 250)
  }

  // ---- write path: the DSv2 two-phase commit protocol ----

  private def freshTarget(name: String): String = {
    val t = s"spec_${name}_${System.nanoTime()}"
    graft.sources.ChunkedSink.drop(t); t
  }

  private def sinkDf(rows: Seq[(Long, Int, String)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("id", "chunk", "payload")
  }

  test("write: append publishes atomically on commit; round-trips through the store") {
    val t = freshTarget("append")
    sinkDf(Seq((1L, 0, "a"), (2L, 0, "b"), (3L, 1, "c")))
      .repartition(3) // exercise multiple task writers + commit messages
      .write.format("graft.sources.ChunkedSource")
      .option("target", t).mode("append").save()
    assert(graft.sources.ChunkedSink.rows(t).map(r => (r.id, r.chunk, r.payload)) ==
      Vector((1L, 0, "a"), (2L, 0, "b"), (3L, 1, "c")))
    // second append accumulates
    sinkDf(Seq((4L, 1, "d"))).write.format("graft.sources.ChunkedSource")
      .option("target", t).mode("append").save()
    assert(graft.sources.ChunkedSink.rows(t).map(_.id) == Vector(1L, 2L, 3L, 4L))
    graft.sources.ChunkedSink.drop(t)
  }

  test("write: overwrite truncates the target before publishing") {
    val t = freshTarget("overwrite")
    sinkDf(Seq((1L, 0, "old"))).write.format("graft.sources.ChunkedSource")
      .option("target", t).mode("append").save()
    sinkDf(Seq((9L, 2, "new"))).write.format("graft.sources.ChunkedSource")
      .option("target", t).mode("overwrite").save()
    assert(graft.sources.ChunkedSink.rows(t).map(r => (r.id, r.payload)) ==
      Vector((9L, "new")))
    graft.sources.ChunkedSink.drop(t)
  }

  test("write: a failing task aborts the job and the sink is untouched (atomicity)") {
    val t = freshTarget("abort")
    sinkDf(Seq((1L, 0, "keep"))).write.format("graft.sources.ChunkedSource")
      .option("target", t).mode("append").save()
    val before = graft.sources.ChunkedSink.rows(t)
    val poisoned = sinkDf(Seq((2L, 0, "x"), (3L, 0, "boom")))
      .withColumn("chunk",
        when(col("payload") === "boom",
          (lit(1) / lit(0)).cast("int")).otherwise(col("chunk")))
    // division by zero under ANSI off yields null -> null.getInt fails in
    // the writer; either way the JOB must fail and publish must not happen
    val failed = try {
      poisoned.na.drop().write.format("graft.sources.ChunkedSource")
        .option("target", t).mode("append").save()
      false
    } catch { case _: Throwable => true }
    if (!failed) {
      // na.drop removed the poison row — force a real task failure instead
      val spark2 = spark
      import spark2.implicits._
      val thrown = try {
        spark2.range(2).map { i =>
          if (i == 1) throw new RuntimeException("task failure")
          (i, 0, "z")
        }.toDF("id", "chunk", "payload")
          .write.format("graft.sources.ChunkedSource")
          .option("target", t).mode("append").save()
        false
      } catch { case _: Throwable => true }
      assert(thrown, "poisoned write job must fail")
    }
    assert(graft.sources.ChunkedSink.rows(t) == before,
      "a failed job must leave the sink exactly as it was")
    graft.sources.ChunkedSink.drop(t)
  }
}
