package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate-volume scaling bounds for the text dedup / LSH family
  * (round-6 VERDICT #4): the 100 TB claims rest on candidate generation
  * staying near-LINEAR in corpus size, so this spec measures it instead of
  * asserting it in prose. Corpus scaling uses [[Dedup.saltedCopies]] /
  * [[Similarity.rotatedCopies]] — replicas whose INTERNAL dup structure is
  * exactly the base corpus's (true-pair mass grows linearly by
  * construction), so any superlinear growth is the ALGORITHM's. Candidate
  * volume = Σ per-bucket C(size, 2) over the operator's own bucket/
  * signature frames — exactly the row count each band/bucket equi-join
  * materializes, measured without running the join.
  *
  * The hyperplane-LSH families are asserted in their 100 TB operating mode
  * (bitsPerTable raised by log2(scale), the documented knob): fixed bits
  * are MEASURABLY quadratic (PerfProbe `scaling` at sf0.01: volume x4.0
  * per corpus doubling vs x2.05 with the knob) — that contrast is also
  * pinned here. The wall-time curve lives in PERF.md (PerfProbe scaling).
  */
class ScalingSpec extends SparkSpec {

  private def volume(buckets: DataFrame, keys: Seq[String]): Long =
    buckets.groupBy(keys.map(col): _*).agg(count(lit(1)).as("s"))
      .agg(coalesce(sum(expr("s * (s - 1) DIV 2")), lit(0L))).head().getLong(0)

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val embs = Tables.embeddings(spark, sfDir)

  private def minhashVolume(d: DataFrame): Long =
    volume(Dedup.minhashBuckets(
      Dedup.shingles(Dedup.shingleArrays48(d)), Dedup.minhashCoeffs(64), 16, 4),
      Seq("band", "bucket"))

  private def lshVolume(e: DataFrame, nTables: Int, bits: Int): Long = {
    val eN = e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    volume(Similarity.lshSignatures(eN, nTables, bits, 64), Seq("tbl", "bucket"))
  }

  test("minhash banding: candidate volume grows near-linearly with corpus size") {
    val v1 = minhashVolume(Dedup.saltedCopies(docs, 1))
    val v4 = minhashVolume(Dedup.saltedCopies(docs, 4))
    // linear = 4x; quadratic would be 16x. md5 band buckets over 4x48-bit
    // rows make chance cross-replica collisions negligible at any realistic
    // n, so the slack is small.
    assert(v4 >= v1, s"4x corpus cannot shrink volume: $v1 -> $v4")
    assert(v4 <= 4 * v1 * 2 + 64,
      s"minhash candidate volume must stay near-linear: $v1 -> $v4 at 4x corpus")
  }

  test("simhash pigeonhole blocks: near-linear volume at fixture scale") {
    val d1 = Dedup.saltedCopies(docs, 1)
    val d4 = Dedup.saltedCopies(docs, 4)
    val v1 = volume(Dedup.simhashBlocks(Dedup.simhash(d1)), Seq("blk", "v"))
    val v4 = volume(Dedup.simhashBlocks(Dedup.simhash(d4)), Seq("blk", "v"))
    // 12-bit blocks have 4096 values, so CHANCE block collisions grow
    // quadratically with a 1/4096 constant — negligible against true-dup
    // mass while n/4096 per block value stays small (the fixture regime),
    // which is why the slack here is looser than minhash's; past that
    // regime the documented knob is widening the fingerprint/blocks with
    // log(n), exactly like the hyperplane families' bitsPerTable.
    assert(v4 <= 4 * v1 * 3 + 256,
      s"simhash candidate volume left the near-linear regime: $v1 -> $v4 at 4x corpus")
  }

  test("hyperplane LSH: bits+log2(scale) holds volume near-linear; fixed bits go quadratic") {
    val e1 = Similarity.rotatedCopies(embs, 1)
    val e4 = Similarity.rotatedCopies(embs, 4)
    for ((nTables, bits) <- Seq((24, 2), (8, 4))) { // cosinePairsLsh / knnGraphLsh registered knobs
      val v1 = lshVolume(e1, nTables, bits)
      val vScaled = lshVolume(e4, nTables, bits + 2) // log2(4x) extra bits
      val vFixed = lshVolume(e4, nTables, bits)
      assert(vScaled <= 4 * v1 * 2 + 128,
        s"(L=$nTables b=$bits) scaled-knob volume must stay near-linear: $v1 -> $vScaled at 4x")
      assert(vFixed >= vScaled * 2,
        s"(L=$nTables b=$bits) fixed bits should measurably exceed the scaled knob " +
          s"(quadratic contrast): fixed=$vFixed scaled=$vScaled")
    }
  }

  test("scaledBits: the registered auto-knob widens with the corpus, never below b0") {
    // gate anchors — the sf0.01 oracle replay depends on these staying b0:
    // cosinePairsLsh/semanticKeeplistLsh run over the 2n augmented frame
    // (n=500 -> 1000 at the gate, nRef=1024); knnGraphLsh over the raw
    // frame (500 at the gate, nRef=512)
    assert(Similarity.scaledBits(8, 1024L, 1000L) == 8)
    assert(Similarity.scaledBits(4, 512L, 500L) == 4)
    // +1 bit per corpus doubling past the calibration size (CEIL: a
    // partial doubling already widens — the verify join is the cost driver)
    assert(Similarity.scaledBits(8, 1024L, 2048L) == 9)
    assert(Similarity.scaledBits(8, 1024L, 4000L) == 10)  // sf0.1 augmented
    assert(Similarity.scaledBits(8, 1024L, 40000L) == 14) // sf1x augmented
    assert(Similarity.scaledBits(4, 512L, 2000L) == 6)    // sf0.1 raw
    assert(Similarity.scaledBits(4, 512L, 20000L) == 10)  // sf1x raw
    // small fixtures keep their calibration width (RegistrySpec at sf0.001)
    assert(Similarity.scaledBits(8, 1024L, 10L) == 8)
    assert(Similarity.scaledBits(4, 512L, 1L) == 4)
  }

  test("recall floor at 10x data under the SHIPPED ceil widths (the knob's other side)") {
    // the scaledBits knob has two sides: the volume assertions above pin
    // the CANDIDATE side at scale, and the sf0.01 gate pins recall at the
    // calibration width — this pins the RECALL side at 10x the gate
    // corpus, under exactly the widths the registered q_cosine_pairs_lsh
    // would compute there (b = scaledBits(8, 1024, n), L from
    // scaledTables). The corpus is 10 rotated copies of the gate
    // embeddings, augmented with the registered synthetic near-dups so
    // true >= 0.9 pairs exist (the raw fixture's natural pairs top out
    // near 0.6); aug n = 10 000 sits exactly at the quadratic-anchor cap,
    // so the exact baseline still runs. Deterministic planes => the
    // measured recall is reproducible, not flaky.
    val aug = Similarity.withSyntheticNearDups(Similarity.rotatedCopies(embs, 10))
    val n = aug.count()
    val b = Similarity.scaledBits(8, 1024L, n)
    val L = Similarity.scaledTables(8, 0.9, 8, b)
    assert(b > 8, s"10x corpus must widen past the calibration b0: b=$b at n=$n")
    def pairSet(df: DataFrame): Set[(Long, Long)] = df.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Similarity.cosineDupPairs(aug, 0.9, sorted = false))
    val lsh = pairSet(Similarity.cosinePairsLsh(aug, 0.9,
      nTables = L, bitsPerTable = b, sorted = false))
    assert(lsh.subsetOf(exact), "LSH pairs must be exact-verified (no false positives)")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    info(f"10x recall=$recall%.4f at b=$b L=$L (${lsh.size} of ${exact.size} exact pairs, n=$n)")
    // measured 0.99+ at these widths (PERF.md round-10); conservative floor
    assert(recall >= 0.95,
      f"pair recall at 10x under shipped widths too low: $recall%.4f " +
        s"(b=$b, L=$L, ${lsh.size} of ${exact.size} exact pairs)")
  }

  test("scaledTables: recall-preserving table growth, exactly l0 at the gate") {
    // at the gate width, the registered L (and with it the plane set the
    // replay oracle embeds) is untouched
    assert(Similarity.scaledTables(8, 0.9, 8, 8) == 8)
    // +1 bit at θ=0.9 multiplies L by 1/p ≈ 1.168 (p = 1 - acos(0.9)/π)
    assert(Similarity.scaledTables(8, 0.9, 8, 9) == 10)
    // the sf1x operating point measured in PERF.md: b 8→13 → L 8→18
    assert(Similarity.scaledTables(8, 0.9, 8, 13) == 18)
    // growth is n^(log2(1/p)) ≈ n^0.22 — ~2.2× tables per 5 bits, far
    // under the 32× bucket gain those bits buy
    assert(Similarity.scaledTables(8, 0.9, 8, 18) < 40)
  }
}
