package graft.ops

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("train: hand-computed merge sequence with deterministic tie-breaks") {
    // corpus: aaab ×3 → pieces per word: a a a b </w>
    // round 1: (a,a) 6 beats (a,b) 3 and (b,</w>) 3 → merge 'aa'
    //          (left-to-right, non-overlapping: [aa, a, b, </w>])
    // round 2: (aa,a) 3, (a,b) 3, (b,</w>) 3 all tie → lexicographic
    //          smallest pair wins: ("a","b") → merge 'ab'
    val d = docs((1L, "aaab aaab"), (2L, "aaab"))
    val rules = Bpe.train(d, nMerges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rules.toSeq == Seq(
      (0L, "a", "a", "aa", 6L),
      (1L, "a", "b", "ab", 3L)))
  }

  test("train: stops early when no pair repeats; empty corpus yields no rules") {
    val once = Bpe.train(docs((1L, "xyz")), nMerges = 50).collect()
    // every pair in the single 'xyz' occurs once — below the count-2 floor
    assert(once.isEmpty)
    assert(Bpe.train(docs((1L, "")), nMerges = 10).collect().isEmpty)
  }

  test("train: invariant under input partitioning") {
    val d = docs((1L, "lower lower newest newest newest wider"), (2L, "low lowest newest"))
    val a = Bpe.train(d, nMerges = 10).collect().toSeq
    val b = Bpe.train(d.repartition(7), nMerges = 10).collect().toSeq
    assert(a == b)
  }

  test("encode: zero merges hits the char floor; more merges never increase the count") {
    val d = docs((1L, "banana bandana"), (2L, "ban ban banana"))
    def totals(n: Int): (Long, Long) = {
      val rows = Bpe.encode(d, nMerges = n).collect()
      (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    }
    val (t0, floor0) = totals(0)
    assert(t0 == floor0, "no merges → every word is chars + end marker")
    val (t5, _) = totals(5)
    val (t30, _) = totals(30)
    assert(t5 <= t0, "merges must not increase token counts")
    assert(t30 <= t5, "a merge-list prefix is applied identically, extras only shrink")
    assert(t30 < t0, "repeated subwords must actually merge")
  }

  test("encode: a corpus of one repeated word collapses to one token per word") {
    val d = docs((1L, "hello hello hello"), (2L, "hello"))
    val out = Bpe.encode(d, nMerges = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 3L)
    assert(out(2L) == 1L)
  }

  test("encode agrees with training segmentation on the training corpus") {
    // 'aaab' after the two hand-computed merges is [aa, ab, </w>] → 3 pieces
    val d = docs((1L, "aaab aaab"), (2L, "aaab"))
    val out = Bpe.encode(d, nMerges = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 6L)
    assert(out(2L) == 3L)
  }

  test("tokenizerAudit: per-source fertility separates a well-fit source from a poor fit") {
    import spark.implicits._
    // source 'rep': one word repeated → the vocabulary learns it whole,
    // fertility 1.0, compression = chars-per-token = 4.0 ('cat' + </w>).
    // source 'rare': two once-seen words → no merge applies, every word
    // stays at the char floor: fertility (3+1) = 4.0, compression 1.0.
    val d = Seq((1L, "rep", "cat cat"), (2L, "rep", "cat"),
        (3L, "rare", "xyz qrs"))
      .toDF("doc_id", "source", "text")
    val out = Bpe.tokenizerAudit(d, nMerges = 30).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(out("rep") == ((2L, 3L, 3L, 12L, 1.0, 4.0)))
    assert(out("rare") == ((1L, 2L, 8L, 8L, 4.0, 1.0)))
    // zero merges: every source sits at the char floor (compression 1.0)
    val floor = Bpe.tokenizerAudit(d, nMerges = 0).collect()
      .map(r => r.getString(0) -> (r.getDouble(5), r.getDouble(6))).toMap
    assert(floor("rep") == ((4.0, 1.0)) && floor("rare") == ((4.0, 1.0)))
  }
}
