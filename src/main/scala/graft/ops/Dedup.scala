package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication surface (SURVEY.md §2 group H): exact, hash-keyed exact,
  * exact n-gram Jaccard (inverted-index join), MinHash+LSH banding, SimHash.
  *
  * Scale design: exact dedup groups on a 256-bit digest (32 bytes shuffled
  * per row, never the document body). Near-dup candidate generation never
  * goes pairwise-quadratic: the exact-Jaccard path joins on shared shingles
  * (inverted index — candidates only where intersection > 0) and the LSH
  * path joins on band buckets (candidates only where a band collides). Both
  * shuffle keys + ids, not documents.
  */
object Dedup {

  private val wordRe = "[a-z0-9]+"

  /** Distinct lower-cased word-n-gram shingles per doc as an array column. */
  private def shingleArray(n: Int = 3): Column = {
    val toks = regexp_extract_all(lower(col("text")), lit(wordRe), lit(0))
    array_distinct(filter(
      transform(toks, (_, i) => when(i <= size(toks) - n,
        concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*))),
      c => c.isNotNull))
  }

  /** Exploded form: one (doc_id, shingle) row per distinct shingle. */
  private def shingles(documents: DataFrame, n: Int = 3): DataFrame =
    documents.select(col("doc_id"), explode(shingleArray(n)).as("shingle"))

  /** Exact dedup, oracle-comparable form: one keeper (min doc_id) per
    * distinct text + the duplicate count. `dropDuplicates` keeps an
    * arbitrary row, which is nondeterministic under parallelism; a dedup
    * pipeline that must be reproducible keys on min-id per group instead.
    */
  def exactDedup(documents: DataFrame): DataFrame =
    documents.groupBy("text")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .select("keeper_id", "n_copies")
      .orderBy("keeper_id")

  /** Exact dedup at scale: group on sha2-256 of the text, so the shuffle
    * carries 32-byte digests instead of document bodies. Collision risk
    * 2^-128 — the standard trade at 100 TB.
    */
  def hashDedup(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
      .groupBy("digest")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .select("keeper_id", "n_copies")
      .orderBy("keeper_id")

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index:
    * explode distinct shingles, self-join on shingle (only colliding docs
    * ever meet — no quadratic cross join), count the intersection, compute
    * |A∩B| / (|A|+|B|-|A∩B|), threshold. This is the exact/verification
    * path; [[minhashPairs]] is the approximate pre-filter for when even the
    * inverted index is too hot (stop-shingle skew at 100 TB: drop shingles
    * with document frequency above a cap — not needed at fixture scale).
    */
  def jaccardPairs(documents: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(documents)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(col("n_inter").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("n_inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** MinHash signature + LSH banding near-dup detection (approximate
    * candidate generation, exact verification).
    *
    * k hash functions are affine permutations of one xxhash64:
    * h_i(s) = a_i * xxhash64(s) + b_i (wrapping 64-bit arithmetic — a full
    * bijection, so min over shingles is a valid MinHash). Signature = k
    * per-doc minima (one hash-aggregate). Banding: k = bands × rows; docs
    * sharing any band bucket are candidates (groupBy band-hash join), then
    * candidates are verified with exact Jaccard so the output has no false
    * positives. False-negative probability for J=0.8 with 16×4 banding:
    * (1 - (1-0.8^4))^16 ≈ 2e-4.
    */
  def minhashPairs(documents: DataFrame, threshold: Double = 0.5,
                   bands: Int = 16, rows: Int = 4): DataFrame = {
    val k = bands * rows
    val sh = shingles(documents)
    // hash family: fold the function index into xxhash64 (ANSI-safe — no
    // wrapping arithmetic), one independent hash per index
    val sigCols = (0 until k).map(i => min(xxhash64(col("shingle"), lit(i))).as(s"m$i"))
    val sig = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        xxhash64((bnd * rows until (bnd + 1) * rows).map(i => col(s"m$i")): _*).as("bucket"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    // exact verification on candidates ONLY (never the full pair space):
    // join each candidate pair back to its two shingle sets and compute
    // exact Jaccard — LSH is a pre-filter, not the answer (SURVEY.md §7.4)
    val arrs = documents.select(col("doc_id"), shingleArray().as("sh"))
    cand
      .join(arrs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(arrs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** 64-bit SimHash fingerprint per document: per-token xxhash64, each bit
    * votes ±1, sign of the vote-sum forms the fingerprint bit. Near-dups =
    * fingerprints within small Hamming distance. One explode + one
    * hash-aggregate with 64 codegen'd sums — no UDAF.
    */
  def simhash(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit(wordRe), lit(0))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"s$i")
    }
    val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("doc_id"), fp.as("simhash")).orderBy("doc_id")
  }

  /** SimHash near-dup pairs within a Hamming radius, banded for scale: split
    * the 64-bit fingerprint into 4 16-bit blocks; within radius r<=3 at
    * least one block matches exactly (pigeonhole), so candidates come from 4
    * equi-joins on blocks, never a cross join.
    */
  def simhashPairs(documents: DataFrame, radius: Int = 3): DataFrame = {
    require(radius <= 3, "4-block banding guarantees recall only for radius <= 3")
    val fp = simhash(documents)
    val blocks = (0 until 4).map { b =>
      struct(lit(b).as("blk"), shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
    }
    val keyed = fp.select(col("doc_id"), col("simhash"), explode(array(blocks: _*)).as("kb"))
      .select(col("doc_id"), col("simhash"), col("kb.blk").as("blk"), col("kb.v").as("v"))
    val cand = keyed.as("x").join(keyed.as("y"),
        col("x.blk") === col("y.blk") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
    cand
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= radius)
      .orderBy("id_a", "id_b")
  }
}
