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
    val q = DocumentStreams.curateStream(mem.toDF(), "10 minutes")
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

  test("curateStreamDecontaminated: benchmark overlap drops in-stream, batch-verdict parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // distinct GOOD texts (pass the gate, no dups); doc 11 copies the
    // benchmark item verbatim, doc 12 quotes a 3-gram of it, 13/14 clean
    val bench = Seq((100L, "secret holdout question answer tokens here"))
      .toDF("doc_id", "text")
    val rows = Seq(
      DocRow(11L, "web", "secret holdout question answer tokens here", ts("2024-01-01 00:01:00")),
      DocRow(12L, "web", "prefix words then secret holdout question trailer", ts("2024-01-01 00:02:00")),
      DocRow(13L, "web", "alpha beta gamma delta epsilon zeta", ts("2024-01-01 00:03:00")),
      DocRow(14L, "books", "walrus pelican otter badger zebra falcon", ts("2024-01-01 00:04:00")))
    val mem = MemoryStream[DocRow]
    mem.addData(rows: _*)
    val q = DocumentStreams.curateStreamDecontaminated(mem.toDF(), bench, "10 minutes")
      .writeStream.format("memory").queryName("t_decon")
      .outputMode("append").start()
    q.processAllAvailable()
    // plan pin (r16): the decontamination probe is in-plan (might_contain
    // over a constant Bloom binary) — the micro-batch physical plan must
    // carry no ScalaUDF / BatchEvalPython node anywhere
    val planStr = q
      .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .explainInternal(false)
    q.stop()
    assert(!planStr.contains("ScalaUDF") && !planStr.contains("UDF(") &&
      !planStr.contains("BatchEvalPython"),
      s"decontamination stream must stay UDF-free:\n$planStr")
    assert(planStr.contains("might_contain"),
      s"expected the in-plan Bloom probe in the stream plan:\n$planStr")
    val kept = spark.table("t_decon").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(13L, 14L), s"kept=$kept")
    // parity: the stream's verdict per doc equals the batch Bloom operator's
    val batchKept = graft.ops.Dedup.decontaminateBloom(
        rows.map(r => (r.doc_id, r.text)).toDF("doc_id", "text"), bench)
      .collect().map(_.getLong(0)).toSet
    assert(kept == batchKept, s"stream $kept vs batch $batchKept")
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
      (w0, "books", 1L, tokens(good) + 2L)))
  }

  test("tokenHeavyHittersStream: MG sandwich vs the exact batch operator across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // skewed corpus split across two micro-batches, all in one window
    val mkDoc = (id: Long, text: String) => DocRow(id, "web", text, ts("2024-01-01 00:01:00"))
    val batch1 = (1 to 6).map(i => mkDoc(i, "alpha " * 20 + "beta " * 8 + s"rare$i unique$i"))
    val batch2 = (7 to 12).map(i => mkDoc(i, "alpha " * 10 + "gamma " * 9 + s"tail$i"))
    val k = 5
    val mem = MemoryStream[DocRow]
    val q = DocumentStreams.tokenHeavyHittersStream(mem.toDF(), k = k)
      .writeStream.format("memory").queryName("t_hh").outputMode("update").start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable(); q.stop()
    // latest emission per (window, token) is the live answer
    val rows = spark.table("t_hh").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val latestN = rows.map(_._3).max // n_window after the second batch
    val latest = rows.filter(_._3 == latestN)
    val candidates = latest.map(_._1).toSet
    val guaranteed = latest.filter(_._4).map(_._1).toSet
    // exact heavy hitters over the SAME documents via the batch operator
    val allDocs = (batch1 ++ batch2).map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val exact = graft.ops.Text.heavyHitters(allDocs, k).collect().map(_.getString(0)).toSet
    assert(exact.nonEmpty, "fixture must produce heavy hitters")
    assert(exact.subsetOf(candidates),
      s"every true heavy hitter must be a streaming candidate: $exact vs $candidates")
    assert(guaranteed.subsetOf(exact),
      s"guaranteed flags must never mark a non-heavy token: $guaranteed vs $exact")
    // estimates undercount by at most n/k
    latest.foreach { case (_, est, n, _) => assert(est <= n && est >= 0) }
  }

  test("curateStream -> foreachBatch -> DSv2 two-phase sink: curated docs land atomically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val target = s"stream_sink_${System.nanoTime()}"
    graft.sources.ChunkedSink.drop(target)
    val mem = MemoryStream[DocRow]
    // each micro-batch of the curated stream commits through the
    // connector's batch write path — the canonical streaming-into-a-
    // transactional-sink composition (foreachBatch + idempotent-by-
    // batchId is the production recipe; asserted here: per-batch
    // atomicity and accumulation across batches)
    val q = graft.streaming.DocumentStreams.curateStream(mem.toDF(), "10 minutes")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select(col("doc_id").as("id"),
            lit(0).as("chunk"), col("source").as("payload"))
          .write.format("graft.sources.ChunkedSource")
          .option("target", target).mode("append").save()
      }
      .outputMode("append").start()
    mem.addData(sample.take(3): _*) // good, dup-of-good, junk
    q.processAllAvailable()
    val afterFirst = graft.sources.ChunkedSink.rows(target).map(_.id)
    assert(afterFirst == Vector(1L), s"gate+dedup leave only doc 1: $afterFirst")
    mem.addData(sample.drop(3): _*) // the books doc
    q.processAllAvailable(); q.stop()
    val ids = graft.sources.ChunkedSink.rows(target).map(_.id)
    assert(ids == Vector(1L, 4L), s"second batch appends atomically: $ids")
    graft.sources.ChunkedSink.drop(target)
  }

  test("nearDupCandidatesStream: streamed candidate pairs equal the batch band-join candidates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Dedup
    val corpus = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 150).select("doc_id", "source", "text")
    // the batch candidate set: the distinct pairs the band-bucket
    // equi-join materializes (exactly what minhashPairs verifies)
    val coeffs = Dedup.minhashCoeffs(64)
    val buckets = Dedup.minhashBuckets(
      Dedup.shingles(Dedup.shingleArrays48(corpus)), coeffs, 16, 4)
    val batchPairs = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty, "fixture must contain band-collision candidates")
    val rows = corpus.collect().map(r =>
      DocRow(r.getLong(0), r.getString(1), r.getString(2), ts("2024-01-01 00:01:00")))
    val mem = MemoryStream[DocRow]
    mem.addData(rows.take(rows.length / 2): _*)
    val q = DocumentStreams.nearDupCandidatesStream(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("t_neardup")
      .outputMode("update").start()
    q.processAllAvailable()
    mem.addData(rows.drop(rows.length / 2): _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    assert(streamed == batchPairs,
      s"stream-only=${(streamed -- batchPairs).take(5)} batch-only=${(batchPairs -- streamed).take(5)}")
    // signature-identical pairs estimate 1.0 — and estimates are valid fractions
    val ests = spark.table("t_neardup").collect().map(_.getDouble(2))
    assert(ests.forall(e => e >= 0.0 && e <= 1.0))
  }

  test("nearDupCandidatesStream: bucket state evicts once the watermark passes the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val mem = MemoryStream[DocRow]
    val q = DocumentStreams.nearDupCandidatesStream(mem.toDF(), "5 minutes")
      .writeStream.format("memory").queryName("t_evict")
      .outputMode("update").start()
    // batch 1: the original document
    mem.addData(DocRow(1L, "web", text, ts("2024-01-01 00:01:00")))
    q.processAllAvailable()
    // batch 2: an unrelated doc an hour later advances the watermark far
    // past doc 1's bucket timeout (00:01 + 5 min)
    mem.addData(DocRow(2L, "web", "one two three four five six seven", ts("2024-01-01 01:00:00")))
    q.processAllAvailable()
    // batch 3: an exact copy of doc 1 — its bucket was evicted, so no
    // cross-horizon candidate may appear
    mem.addData(DocRow(3L, "web", text, ts("2024-01-01 01:05:00")))
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("t_evict").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((3L, 1L)) && !pairs.contains((1L, 3L)),
      s"evicted bucket must not match across the horizon: $pairs")
    // sanity on a fresh stream: a copy INSIDE the horizon does match
    // (MemoryStream does not replay for a second query, so a new one)
    val mem2 = MemoryStream[DocRow]
    mem2.addData(
      DocRow(3L, "web", text, ts("2024-01-01 01:05:00")),
      DocRow(4L, "web", text, ts("2024-01-01 01:06:00")))
    val q2 = DocumentStreams.nearDupCandidatesStream(mem2.toDF(), "5 minutes")
      .writeStream.format("memory").queryName("t_evict2")
      .outputMode("update").start()
    q2.processAllAvailable(); q2.stop()
    val pairs2 = spark.table("t_evict2").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(pairs2.contains((3L, 4L)), s"in-horizon copy must match: $pairs2")
  }

  test("scoreStream: trained weights score the stream identically to the batch classifier") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // train on the fixture corpus (the offline half), then stream the
    // same documents through the live scorer and demand row-identical
    // scores/preds — single-definition feature + softsign expressions
    val corpus = graft.core.Tables.documents(spark, sfDir)
    val weights = graft.ops.Text.qualityClassifierWeights(corpus)
    val batch = graft.ops.Text.qualityClassifier(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    val rows = corpus.select("doc_id", "source", "text").collect().map(r =>
      DocRow(r.getLong(0), r.getString(1), r.getString(2), ts("2024-01-01 00:01:00")))
    val mem = MemoryStream[DocRow]
    mem.addData(rows.take(rows.length / 2): _*)
    val q = DocumentStreams.scoreStream(mem.toDF(), weights)
      .writeStream.format("memory").queryName("t_score")
      .outputMode("append").start()
    q.processAllAvailable()
    mem.addData(rows.drop(rows.length / 2): _*) // scores are batch-invariant
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_score").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
    assert(streamed.size == rows.length)
    assert(streamed == batch, "stream scores must equal batch scores row-for-row")
    // a genuinely trained model: scores spread, they are not one constant
    // (threshold calibration is a deployment choice, not asserted here —
    // class separation itself is pinned in TextSpec's driver-replay test)
    assert(streamed.values.map(_._1).toSet.size > 1)
  }
}
