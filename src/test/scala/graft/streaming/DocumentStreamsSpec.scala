package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming document curation driven through MemoryStream micro-batches:
  * the gate must agree with the batch quality predicate, dedup must drop
  * exact copies inside the watermark horizon, and the source stats must
  * match a hand computation.
  */
class DocumentStreamsSpec extends SparkSpec {

  case class DocRow(doc_id: Long, source: String, text: String, ingest_ts: Timestamp)

  private def ts(s: String) = Timestamp.valueOf(s)

  // mean_tok_len for `good` = 35 chars / 6 tokens ≈ 5.83 (passes 4..9);
  // `junk` = 21 chars / 11 tokens ≈ 1.91 fails the lower bound
  private val good = "alpha beta gamma delta epsilon zeta"
  private val junk = "a b a b a b a b a b a"

  private val sample = Seq(
    DocRow(1L, "web", good, ts("2024-01-01 00:01:00")),
    DocRow(2L, "web", good, ts("2024-01-01 00:02:00")),        // exact dup of 1
    DocRow(3L, "web", junk, ts("2024-01-01 00:03:00")),        // fails the gate
    DocRow(4L, "books", good + " eta theta", ts("2024-01-01 00:04:00")))

  test("curateStream: gate drops low quality, watermark dedup drops exact copies") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocRow]
    mem.addData(sample: _*)
    val q = DocumentStreams.curateStream(mem.toDF())
      .writeStream.format("memory").queryName("t_curate")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("t_curate").select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 3 fails quality; exactly one of the duplicate pair {1, 2} survives
    assert(!kept.contains(3L))
    assert(kept.contains(4L))
    assert((kept & Set(1L, 2L)).size == 1, s"kept=$kept")
    // digest column rides along for downstream exact-dedup joins
    assert(spark.table("t_curate").columns.contains("digest"))
  }

  test("sourceStatsStream: per-source windowed doc/token counts match hand computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocRow]
    mem.addData(sample: _*)
    val q = DocumentStreams.sourceStatsStream(mem.toDF())
      .writeStream.format("memory").queryName("t_docstats")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("t_docstats")
      .select(unix_timestamp(col("w_start")).as("w"), col("source"), col("n_docs"), col("total_tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // window 00:00-00:05 holds everything; stats run BEFORE gating/dedup
    val w0 = ts("2024-01-01 00:00:00").getTime / 1000
    val tokens = (s: String) => "[A-Za-z0-9]+".r.findAllIn(s).size.toLong
    assert(got == Set(
      (w0, "web", 3L, tokens(good) * 2 + tokens(junk)),
      (w0, "books", 1L, tokens(good + " eta theta"))))
  }
}
