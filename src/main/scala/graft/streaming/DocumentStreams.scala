package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Text}

/** Streaming front-end of the curation pipeline (SURVEY.md §2 group I ×
  * group H): the same quality-gate and exact-dedup semantics as the batch
  * [[graft.ops.Pipelines.curate]] stages, applied to a continuously
  * ingested document stream — the shape a 100 TB/day crawl pipeline runs
  * BEFORE documents ever land in the batch corpus.
  *
  * Input schema: (doc_id, source, text, ingest_ts). Scale notes: the
  * quality gate is stateless (row-local codegen predicate, identical
  * expressions to batch via [[Text.qualityRatios]]); dedup state holds one
  * 32-byte digest per document INSIDE the watermark horizon only, so state
  * is bounded by ingest rate × horizon, not corpus size; the stats
  * aggregate keys state by (window, source) — shardable and GC'd by the
  * same watermark.
  */
object DocumentStreams {

  /** Quality gate + exact content dedup within the watermark horizon.
    * Emits the surviving documents with their content digest.
    *
    * `watermark` is REQUIRED (round-10 change, was a "10 minutes"
    * default): dedup state ≈ ingest rate × horizon × ~80 B/key (32-byte
    * digest + store overhead) — the formula is executable as
    * [[EventStreams.dedupStateEstimateBytes]] — so the horizon is a
    * capacity decision the deployment must make, not inherit.
    */
  def curateStream(docs: DataFrame,
                   watermark: String,
                   minMeanTokLen: Double = 4.0,
                   maxMeanTokLen: Double = 9.0,
                   minTypeToken: Double = 0.3): DataFrame = {
    val ratios = Text.qualityRatios
    docs
      .withWatermark("ingest_ts", watermark)
      .withColumn("_mtl", ratios.meanTokLen)
      .withColumn("_ttr", ratios.typeTokenRatio)
      .filter(col("_mtl").between(minMeanTokLen, maxMeanTokLen) &&
        col("_ttr") >= minTypeToken)
      .drop("_mtl", "_ttr")
      // dedup on the digest, not the body: stream state carries 32 bytes
      // per in-horizon document (unhex folds sha2's 64-char hex string to
      // the raw 32-byte binary — same trade as batch hashDedup)
      .withColumn("digest", unhex(sha2(col("text"), 256)))
      .dropDuplicatesWithinWatermark("digest")
  }

  /** [[curateStream]] with a benchmark-decontamination stage — the live
    * form of the batch gate→dedup→decontaminate chain. The benchmark is a
    * STATIC frame: its shingle hashes fold into a Bloom filter once at
    * query build ([[graft.ops.Dedup.contaminationFilterBytes]] — the
    * map-side form of `decontaminateBloom`'s test), which rides the plan
    * as a constant binary probed by Spark's `might_contain` expression
    * over the document's in-plan gram hashes
    * ([[graft.ops.Dedup.contaminatedProbe]]) — no stream-static join, no
    * ScalaUDF node on the stream scan (round 16: the previous closure UDF
    * was the last UDF in main code; plan-pinned in the spec), no
    * per-trigger state beyond [[curateStream]]'s digest dedup. Guarantees
    * carry over from the Bloom construction: a document sharing a real
    * benchmark n-gram can NEVER pass (no false negatives); clean documents
    * drop at ≈ the configured fpp. Spec-asserted against the batch
    * operator's verdicts in `DocumentStreamsSpec`.
    */
  def curateStreamDecontaminated(docs: DataFrame, benchmark: DataFrame,
                                 watermark: String,
                                 n: Int = 3,
                                 expectedShingles: Long = 1000000L,
                                 fpp: Double = 0.001,
                                 minMeanTokLen: Double = 4.0,
                                 maxMeanTokLen: Double = 9.0,
                                 minTypeToken: Double = 0.3): DataFrame = {
    val bfBytes = Dedup.contaminationFilterBytes(benchmark, n, expectedShingles, fpp)
    curateStream(docs, watermark, minMeanTokLen, maxMeanTokLen, minTypeToken)
      // tokens materialize as a real column BEFORE the gram lambda
      // (interpreted HOFs re-evaluate inline expressions per element)
      .withColumn("_toks", regexp_extract_all(
        lower(coalesce(col("text"), lit(""))), lit("[a-z0-9]+"), lit(0)))
      .filter(!Dedup.contaminatedProbe(col("_toks"), bfBytes, n))
      .drop("_toks")
  }

  /** Score an incoming document stream with a TRAINED quality classifier
    * — the deployment half of the train-batch / score-stream split: the
    * weights come from [[graft.ops.Text.qualityClassifierWeights]] (a
    * 4-double model artifact trained offline on the corpus) and ride the
    * plan as literals, so scoring is a STATELESS row-local codegen
    * expression on the stream scan — no stream-static join, no state
    * store, sustained at whatever rate the scan itself runs. The scoring
    * expression is the batch operator's own softsign over the same
    * feature columns (single definitions: [[graft.ops.Text.softsign]],
    * [[graft.ops.Text.qualityRatios]], [[graft.ops.Text.gopherSignals]]),
    * so stream scores ≡ batch scores row-for-row — spec-asserted in
    * `DocumentStreamsSpec`.
    *
    * Emits every document with its score and keep flag; compose with
    * [[curateStream]] upstream for gating + dedup, or filter on `pred`
    * directly for a score-gated ingest.
    */
  def scoreStream(docs: DataFrame, weights: Array[Double],
                  threshold: Double = 0.5): DataFrame = {
    require(weights.length == 4,
      s"weights must be (b, w1, w2, w3), got length ${weights.length}")
    val q = Text.qualityRatios
    val z = lit(weights(0)) +
      lit(weights(1)) * Text.gopherSignals.meanWordLen +
      lit(weights(2)) * q.stopwordRatio +
      lit(weights(3)) * q.typeTokenRatio
    docs.select(col("doc_id"), col("source"), col("ingest_ts"),
        round(Text.softsign(z), 6).as("score"))
      .withColumn("pred", col("score") >= threshold)
  }

  /** Per-source ingest audit over tumbling windows: documents and token
    * volume per source per window — the live counterpart of the batch
    * [[Text.sourceStats]] a mixture controller watches.
    */
  def sourceStatsStream(docs: DataFrame,
                        window_ : String = "5 minutes",
                        watermark: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .groupBy(window(col("ingest_ts"), window_).as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(regexp_extract_all(col("text"), lit(Text.wordRe), lit(0))).cast("long"))
          .as("total_tokens"))
      .select(col("w.start").as("w_start"), col("source"),
        col("n_docs"), col("total_tokens"))

  final case class BandedDoc(doc_id: Long, ingest_ts: Timestamp,
                             band: Int, bucket: String, sig: Array[Long])
  final case class BucketEntry(doc_id: Long, sig: Array[Long], seen_ms: Long)
  final case class BucketState(entries: List[BucketEntry])
  final case class NearDupCandidate(doc_id: Long, matched_id: Long,
                                    est_jaccard: Double, band: Int)

  /** Streaming MinHash-LSH near-dup detection — the live prefilter of the
    * batch [[graft.ops.Dedup.minhashPairs]]: each arriving document's
    * k-min signature is computed ROW-LOCALLY (same md5-derived 48-bit
    * shingle hashes, same seeded prime-field affine family —
    * `Dedup.minhashCoeffs` is the single source, so streamed signatures
    * are bit-identical to the batch aggregate's), banded into the same
    * (band, row-values) buckets, and compared against the documents seen
    * in that bucket inside the watermark horizon. Emits one candidate row
    * per (arriving doc, stored bucket-mate, band) with the SIGNATURE
    * estimate of their Jaccard (matching-position fraction — unbiased,
    * ±~1/√k): the batch operator's exact shingle-set verification needs
    * both documents' full shingle sets, which streaming state deliberately
    * does not hold, so the contract here is CANDIDATES — a downstream
    * `foreachBatch` verifies exactly against the corpus store, exactly as
    * the batch operator verifies its band-join candidates. Candidate
    * GENERATION is therefore parity-complete with batch by construction
    * (same buckets ⇒ same co-bucket pairs, spec-asserted), modulo the two
    * documented stream bounds below.
    *
    * State per bucket: up to `maxBucketDocs` (doc_id, signature, seen-ms)
    * entries — 8·k bytes of signature per doc, NEVER shingle sets or text
    * — newest kept on overflow (a saturated bucket means a degenerate
    * near-dup cluster; its members are already pairwise-candidates via
    * the retained entries). Buckets evict wholesale via EVENT-TIME
    * timeout once the watermark passes their last arrival + horizon, so
    * state ≈ in-horizon docs × bands × (8k+24) B, rate-bounded like
    * [[curateStream]]'s digest dedup. Within a micro-batch, arrivals
    * process in (ingest_ts, doc_id) order, so output is deterministic for
    * a given batch decomposition; a pair co-bucketed in several bands
    * emits once per band (at-least-once per pair — the downstream
    * verifier dedups, as the batch operator's `distinct()` does).
    */
  def nearDupCandidatesStream(docs: DataFrame, watermark: String,
                              bands: Int = 16, rows: Int = 4,
                              maxBucketDocs: Int = 64)
      : org.apache.spark.sql.Dataset[NearDupCandidate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(bands >= 1 && rows >= 1 && maxBucketDocs >= 2,
      s"need bands/rows >= 1 and maxBucketDocs >= 2, got $bands/$rows/$maxBucketDocs")
    val spark = docs.sparkSession
    import spark.implicits._
    val k = bands * rows
    val coeffs = Dedup.minhashCoeffs(k).toArray
    val p = Dedup.MinhashP
    val tokenRe = "[a-z0-9]+".r
    val banded = docs
      .select(col("doc_id"), col("ingest_ts"), lower(col("text")).as("t"))
      .as[(Long, Timestamp, String)]
      .flatMap { case (id, ts, text) =>
        val toks = tokenRe.findAllIn(if (text == null) "" else text).toArray
        if (toks.length < 3) Iterator.empty // no shingles — absent in batch too
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val hs = new java.util.HashSet[Long]()
          var i = 0
          while (i <= toks.length - 3) {
            val d = md.digest(
              s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}".getBytes("UTF-8"))
            var h = 0L
            var j = 0
            while (j < 6) { h = (h << 8) | (d(j) & 0xFFL); j += 1 }
            hs.add(h): Unit
            i += 1
          }
          // k minima of the affine family over the distinct shingle hashes
          // — identical arithmetic to the batch pmod aggregate (operands
          // positive, products < 2^62)
          val sig = Array.tabulate(k) { ki =>
            val (a, b) = coeffs(ki)
            var m = Long.MaxValue
            val it = hs.iterator()
            while (it.hasNext) {
              val v = (a * (it.next() % p) + b) % p
              if (v < m) m = v
            }
            m
          }
          Iterator.tabulate(bands) { bnd =>
            BandedDoc(id, ts, bnd,
              (bnd * rows until (bnd + 1) * rows).map(sig(_)).mkString(","), sig)
          }
        }
      }
      // watermark AFTER the typed flatMap: event-time tracking attaches to
      // the output column the stateful operator actually sees
      .withWatermark("ingest_ts", watermark)
    banded
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, String), rows_ : Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arrivals = rows_.toArray.sortBy(d => (d.ingest_ts.getTime, d.doc_id))
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupCandidate]
            arrivals.foreach { d =>
              entries.foreach { e =>
                if (e.doc_id != d.doc_id) {
                  var eq = 0
                  var i = 0
                  while (i < k) { if (d.sig(i) == e.sig(i)) eq += 1; i += 1 }
                  val est = BigDecimal(eq.toDouble / k)
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                  out += NearDupCandidate(d.doc_id, e.doc_id, est, key._1)
                }
              }
              entries = BucketEntry(d.doc_id, d.sig, d.ingest_ts.getTime) :: entries
              if (entries.length > maxBucketDocs) entries = entries.take(maxBucketDocs)
            }
            state.update(BucketState(entries))
            // evict once the watermark passes the bucket's newest arrival
            // + the horizon (the dedupWithinWatermark retention shape)
            state.setTimeoutTimestamp(entries.map(_.seen_ms).max, watermark)
            out.iterator
          }
      }
  }

  final case class TokenWindowRow(w_start: java.sql.Timestamp, tok: String)
  final case class MgState(counters: Map[String, Long], total: Long)
  final case class HeavyHitterEstimate(w_start: java.sql.Timestamp, tok: String,
                                       est_count: Long, n_window: Long,
                                       guaranteed: Boolean)

  /** Live heavy hitters: a windowed Misra-Gries summary over the token
    * stream — the streaming front-end of the batch two-pass
    * [[graft.ops.Text.heavyHitters]]. State per window is the k-1-counter
    * summary plus a token total (O(k), NOT vocabulary-sized), updated per
    * micro-batch via `flatMapGroupsWithState` keyed by window start.
    *
    * The MG guarantees survive streaming untouched, and the emission
    * carries them explicitly: `est_count` undercounts a true count by at
    * most `n_window`/k, so every true heavy hitter (count > n/k) is
    * PRESENT among the candidates, and any candidate with
    * `guaranteed = est_count·k > n_window` is CERTAINLY one (the estimate
    * only undercounts). The spec sandwiches both bounds against the exact
    * batch operator. Emitted in Update mode (each micro-batch refreshes a
    * window's candidate set — a live dashboard consumes the latest row per
    * (window, token)); production eviction of closed windows would add an
    * event-time timeout, left out here for the same test-driver reason as
    * [[EventStreams.runningUserTotals]].
    */
  def tokenHeavyHittersStream(docs: DataFrame, k: Int = 40,
                              window_ : String = "5 minutes"): org.apache.spark.sql.Dataset[HeavyHitterEstimate] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val spark = docs.sparkSession
    import spark.implicits._
    require(k > 1, s"k must be > 1, got $k")
    docs
      .select(window(col("ingest_ts"), window_).as("w"),
        explode(regexp_extract_all(lower(col("text")), lit(Text.wordRe), lit(0))).as("tok"))
      .select(col("w.start").as("w_start"), col("tok")).as[TokenWindowRow]
      .groupByKey(_.w_start)
      .flatMapGroupsWithState[MgState, HeavyHitterEstimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (wStart: java.sql.Timestamp, rows: Iterator[TokenWindowRow], state: GroupState[MgState]) =>
          val counters = scala.collection.mutable.HashMap.empty[String, Long]
          val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
          counters ++= prev.counters
          var total = prev.total
          rows.foreach { r =>
            total += 1
            counters.get(r.tok) match {
              case Some(c) => counters(r.tok) = c + 1
              case None if counters.size < k - 1 => counters(r.tok) = 1L
              case None =>
                val dead = List.newBuilder[String]
                counters.keysIterator.foreach { key =>
                  val c = counters(key) - 1
                  if (c == 0) dead += key else counters(key) = c
                }
                dead.result().foreach(counters.remove)
            }
          }
          state.update(MgState(counters.toMap, total))
          val n = total
          counters.iterator.map { case (tok, est) =>
            HeavyHitterEstimate(wStart, tok, est, n, est * k > n)
          }
      }
  }
}
