package graft.core

/** A unit of fetch work: a chunk column plus the key values in the chunk.
  * Reference analog: `FetchingChunk` (reference bqfetch/bqfetch.py:43-50).
  * Type-preserving — values keep their native type; the reference
  * stringifies into SQL literals (bqfetch/bqfetch.py:171), a wart we do not
  * copy (SURVEY.md §7.4).
  */
final case class FetchingChunk[A](column: String, elements: Seq[A])

/** Raised when the chunk-key distribution is too dispersed to produce
  * same-sized chunks. The reference *intends* this (it exports
  * `InvalidChunkRangeException` at bqfetch/__init__.py:6) but never defines
  * it and only prints a warning (bqfetch/bqfetch.py:417-419); we implement
  * the intended behavior (SURVEY.md §0).
  */
final class InvalidChunkRangeException(msg: String) extends RuntimeException(msg)

/** Pure chunk-planning math, kept API-shaped like the reference for parity
  * and property tests (SURVEY.md §2 group D). On Spark, chunking is a
  * plan-time concept (`repartition(n, col)`); this object exists for the
  * small-cardinality façade and to preserve the reference's sizing formula.
  */
object ChunkPlanner {

  /** D1 — split a sequence into n contiguous, order-preserving slices whose
    * sizes differ by at most 1 (float-stride splitting, parity with
    * reference bqfetch/utils.py:18-28).
    */
  def divideInChunks[A](seq: Seq[A], n: Int): Seq[Seq[A]] = {
    require(n > 0, "n must be > 0")
    if (seq.isEmpty) Seq.empty
    else {
      val k  = math.min(n, seq.length)
      val sz = seq.length.toDouble / k
      (0 until k).map(i => seq.slice(math.round(i * sz).toInt, math.round((i + 1) * sz).toInt))
    }
  }

  /** D2 — number of chunks needed so each holds ~`chunkSize` elements
    * (parity with reference bqfetch/utils.py:9-16).
    */
  def scopeSplitCount(total: Int, chunkSize: Int): Int = {
    require(chunkSize > 0, "chunkSize must be > 0")
    math.ceil(total.toDouble / chunkSize).toInt
  }

  /** D6 — the reference's chunk-count formula (bqfetch/bqfetch.py:438-454):
    * ceil(tableGB / min(chunkGBPerCore * cores, freeMemoryGB)). One chunk is
    * fetched at a time; a chunk must fit in free memory and saturate the
    * cores. Retained verbatim as pure math for parity tests; on Spark the
    * equivalent decisions are made by `spark.sql.files.maxPartitionBytes`
    * and AQE from plan statistics.
    */
  def approximateNbChunks(tableGB: Double, chunkGBPerCore: Double,
                          cores: Int, freeMemoryGB: Double): Int = {
    require(tableGB >= 0 && chunkGBPerCore > 0 && cores > 0 && freeMemoryGB > 0)
    val budget = math.min(chunkGBPerCore * cores, freeMemoryGB)
    math.max(1, math.ceil(tableGB / budget).toInt)
  }

  /** C4/D-guard — dispersion check (reference bqfetch/bqfetch.py:410-419,
    * coeff=0.25): fraction of per-key counts outside ±coeff of the mean.
    * Throws the (intended) InvalidChunkRangeException instead of the
    * reference's warning print when the fraction exceeds coeff.
    */
  def checkDispersion(counts: Seq[Long], coeff: Double = 0.25): Double = {
    if (counts.isEmpty) return 0.0
    val mean = counts.map(_.toDouble).sum / counts.size
    val frac = counts.count(c => math.abs(c - mean) > coeff * mean).toDouble / counts.size
    if (frac > coeff)
      throw new InvalidChunkRangeException(
        f"$frac%.2f of chunk keys have counts outside ±${coeff * 100}%.0f%% of the mean " +
          f"($mean%.1f) — chunks would be badly skewed; pick a more uniform chunk column")
    frac
  }
}
