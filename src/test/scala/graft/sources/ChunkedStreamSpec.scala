package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.functions._

/** The connector's micro-batch read path: one offset unit = one chunk (the
  * reference's chunk-iterator consumption loop as a Structured Streaming
  * source), `chunksPerTrigger` chunks admitted per batch.
  */
class ChunkedStreamSpec extends SparkSpec {

  test("streaming read delivers the whole table exactly once, chunksPerTrigger per batch") {
    val q = spark.readStream.format("graft.sources.ChunkedSource")
      .option("numRows", "1000").option("numChunks", "8")
      .option("chunksPerTrigger", "3")
      .load()
      .writeStream.format("memory").queryName("t_chunk_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_chunk_stream")
    assert(got.count() == 1000L)
    // content parity with the batch read — same readers, same ranges
    val batch = spark.read.format("graft.sources.ChunkedSource")
      .option("numRows", "1000").option("numChunks", "8").load()
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // admission control: 8 chunks at 3/trigger = 3 non-empty batches of
    // 375/375/250 rows (125-row chunks)
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    assert(sizes == Seq(375L, 375L, 250L), s"batch sizes: $sizes")
  }

  test("offset contract: batch end derives from the checkpointed start, restart-safe by construction") {
    // the restart guarantee is structural: latestOffset(start, limit) is a
    // pure function of the CHECKPOINTED start offset, so a fresh instance
    // (post-restart) continues exactly where the offset log says — pin
    // that contract directly on the stream object
    val stream = new ChunkedMicroBatchStream(1000L, 8, 3,
      Array.empty, ChunkedSource.schema, Int.MaxValue)
    assert(stream.initialOffset().json() == "0")
    // round-trip a checkpointed offset and continue from it
    val resumed = stream.deserializeOffset("5")
    val end = stream.latestOffset(resumed, ReadLimit.allAvailable())
    assert(end.json() == "8") // min(5 + 3, 8): clamped at the table's end
    // a drained stream stays drained (no phantom batches past the end)
    assert(stream.latestOffset(stream.deserializeOffset("8"),
      ReadLimit.allAvailable()).json() == "8")
    // partitions for [5, 8) are chunks 5..7 with the batch path's ranges
    val parts = stream.planInputPartitions(resumed, end)
      .map(_.asInstanceOf[ChunkPartition])
    assert(parts.toSeq == Seq(
      ChunkPartition(5, 625L, 750L), ChunkPartition(6, 750L, 875L),
      ChunkPartition(7, 875L, 1000L)))
  }

  test("streaming stages compose: per-chunk aggregation over the stream equals batch") {
    val q = spark.readStream.format("graft.sources.ChunkedSource")
      .option("numRows", "400").option("numChunks", "4")
      .load()
      .groupBy("chunk").agg(count(lit(1)).as("n"), sum("id").as("sum_id"))
      .writeStream.format("memory").queryName("t_chunk_stream_agg")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_chunk_stream_agg").orderBy("chunk")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val want = spark.read.format("graft.sources.ChunkedSource")
      .option("numRows", "400").option("numChunks", "4").load()
      .groupBy("chunk").agg(count(lit(1)).as("n"), sum("id").as("sum_id"))
      .orderBy("chunk")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }
}
