package graft.streaming

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
    * STATIC frame: its shingle hashes fold into a broadcast Bloom filter
    * once at query build ([[graft.ops.Dedup.contaminationCheck]] — the
    * map-side form of `decontaminateBloom`'s test), and each micro-batch
    * applies it as a row-local predicate — no stream-static join, no
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
    val contaminated = Dedup.contaminationCheck(benchmark, n, expectedShingles, fpp)
    val clean = udf((text: String) => !contaminated(text))
    curateStream(docs, watermark, minMeanTokLen, maxMeanTokLen, minTypeToken)
      .filter(clean(col("text")))
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
