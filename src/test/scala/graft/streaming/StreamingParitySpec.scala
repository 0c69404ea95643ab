package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.core.Tables
import graft.ops.Events
import graft.streaming.EventStreams._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** ONE suite tying every I-group windowed operator's STREAMING form to its
  * BATCH sibling on the REAL fixture events table (sf0.001), not a
  * hand-built sample: the same expressions must produce the same result
  * whether they run as one batch job or as MemoryStream micro-batches.
  *
  * Comparison contract: counts and keys compare exactly; double sums
  * compare to 1e-6 (the batch side sums in exact decimal via Helpers.dsum,
  * the streaming side in double accumulation order — bit-equality is not
  * the streaming engine's contract, value equality is).
  */
class StreamingParitySpec extends SparkSpec {

  private lazy val fixtureRows: Seq[EventRow] = {
    val df = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    import df.sparkSession.implicits._
    df.as[EventRow].collect().toSeq
  }

  /** A sentinel far past every fixture event: pushes the watermark so
    * append-mode queries flush all real windows/sessions.
    */
  private lazy val sentinel: EventRow = {
    val maxTs = fixtureRows.map(_.ts.getTime).max
    EventRow(-1L, new Timestamp(maxTs + 7L * 24 * 3600 * 1000), -1L, "sentinel", 0.0)
  }

  private def runStream(name: String, mode: String, twoPhase: Boolean = false)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = build(mem.toDF()).writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    mem.addData(fixtureRows: _*)
    q.processAllAvailable()
    if (twoPhase) { // advance the watermark, then run one more micro-batch
      mem.addData(sentinel)
      q.processAllAvailable()
      mem.addData(sentinel.copy(event_id = -2L,
        ts = new Timestamp(sentinel.ts.getTime + 3600 * 1000)))
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name)
  }

  private def approxEq(a: Double, b: Double): Boolean = math.abs(a - b) <= 1e-6

  test("parity 1/5 tumbling: streaming micro-batches equal the batch window aggregate") {
    val streamed = runStream("p_tumbling", "complete")(EventStreams.tumbling)
      .select(unix_timestamp(col("w_start")).as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    import spark.implicits._
    val batch = Events.tumbling(fixtureRows.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed.keySet == batch.keySet)
    assert(batch.size > 100, "fixture should produce a real window population")
    batch.foreach { case (k, (n, s)) =>
      assert(streamed(k)._1 == n, s"window $k count")
      assert(approxEq(streamed(k)._2, s), s"window $k sum: ${streamed(k)._2} vs $s")
    }
  }

  test("parity 2/5 sliding: every event lands in both its 5-minute-slide windows") {
    val streamed = runStream("p_sliding", "complete")(df =>
        df.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
          .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
          .select(unix_timestamp(col("w.start")).as("w_start"), col("n"), col("sum_value")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    import spark.implicits._
    val batch = Events.sliding(fixtureRows.toDF())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (k, (n, s)) =>
      assert(streamed(k)._1 == n, s"window $k count")
      assert(approxEq(streamed(k)._2, s), s"window $k sum")
    }
  }

  test("parity 3/5 sessions: append-mode session windows equal the batch sessionization") {
    val streamed = runStream("p_sessions", "append", twoPhase = true)(EventStreams.sessions)
      .select(col("user_id"), unix_timestamp(col("session_start")).as("session_start"),
        col("n_events"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    import spark.implicits._
    val batch = Events.sessions(fixtureRows.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // the sentinel user's own session is streaming-only bookkeeping
    val streamedReal = streamed.filter { case ((u, _), _) => u >= 0 }
    assert(streamedReal.keySet == batch.keySet)
    assert(batch.size > 100, "fixture should produce a real session population")
    batch.foreach { case (k, (n, s)) =>
      assert(streamedReal(k)._1 == n, s"session $k count")
      assert(approxEq(streamedReal(k)._2, s), s"session $k sum")
    }
  }

  test("parity 4/5 dedup: re-delivered fixture events collapse to the batch distinct count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.dedupWithinWatermark(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("p_dedup").outputMode("append").start()
    mem.addData(fixtureRows: _*)
    q.processAllAvailable()
    mem.addData(fixtureRows.take(500): _*) // duplicate re-delivery within the watermark
    q.processAllAvailable()
    q.stop()
    val batchDistinct = fixtureRows.toDF().dropDuplicates("event_id").count()
    assert(spark.table("p_dedup").count() == batchDistinct)
    assert(batchDistinct == fixtureRows.length, "fixture event ids are unique")
  }

  test("parity 5/5 stateful: flatMapGroupsWithState totals equal the batch group-by") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("p_state").outputMode("update").start()
    val (first, second) = fixtureRows.splitAt(fixtureRows.length / 2)
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(second: _*) // state carries across micro-batches
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("p_state").groupBy("user_id")
      .agg(max("n_events").as("n"), max("sum_value").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batch = fixtureRows.toDF().groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (u, (n, s)) =>
      assert(streamed(u)._1 == n, s"user $u count")
      assert(approxEq(streamed(u)._2, s), s"user $u sum")
    }
  }
}
