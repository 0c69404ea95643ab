package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Text

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
    */
  def curateStream(docs: DataFrame,
                   minMeanTokLen: Double = 4.0,
                   maxMeanTokLen: Double = 9.0,
                   minTypeToken: Double = 0.3,
                   watermark: String = "10 minutes"): DataFrame = {
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
}
