package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the round-5 additions:
  *
  *  - heavyHitters claims EXACTNESS (the Misra-Gries candidate pass loses
  *    no true heavy hitter, the verify pass adds no false one) — checked
  *    against brute-force counts on random skewed corpora across random k
  *    and partitionings.
  *
  *  - Bpe.encode: merges can only shrink a document (char floor is an
  *    upper bound) and encoding is deterministic under repartitioning.
  *
  *  - Layout.zOrderKey is a bijection on its domain: distinct coordinate
  *    pairs always get distinct keys (the property file-skipping relies
  *    on — two different tiles must never collide into one key range).
  */
class TextPropertySpec extends SparkSpec {

  private val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "g", "hh")

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 8)
    docs <- Gen.listOfN(n, Gen.chooseNum(1, 30).flatMap(len =>
      // skew: low-index vocab words drawn far more often
      Gen.listOfN(len, Gen.frequency(vocab.indices.map(i =>
        (vocab.size - i) * (vocab.size - i) -> Gen.const(vocab(i))): _*))
        .map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("heavyHitters equals brute force on random skewed corpora, any k, any partitioning") {
    import spark.implicits._
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(2, 9), Gen.chooseNum(1, 5)) {
      (docs, k, parts) =>
        val words = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
        val n = words.size.toLong
        val want = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
          .filter { case (_, c) => c * k > n }
        val got = Text.heavyHitters(docs.toDF("doc_id", "text").repartition(parts), k)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("Bpe.encode: char floor bounds the token count; invariant under partitioning") {
    import spark.implicits._
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(0, 12)) { (docs, nMerges) =>
      val df = docs.toDF("doc_id", "text")
      val out = Bpe.encode(df, nMerges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val repart = Bpe.encode(df.repartition(3), nMerges).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      out.forall { case (_, nTok, floor) => nTok <= floor && nTok >= 0 } &&
        out.sortBy(_._1).sameElements(repart.sortBy(_._1))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("duplicateRuns equals a brute-force reference on random corpora, any partitioning") {
    import spark.implicits._
    val k = 3
    val minRun = 4
    val tokRe = "[a-z0-9]+".r
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(1, 5)) { (docs, parts) =>
      // independent reference: shared k-grams by TEXT equality (the
      // operator's 48-bit md5 hashes collide with probability ~|grams|²/2⁴⁹
      // — negligible at these sizes), islands merged by hand
      val toks = docs.map { case (id, t) =>
        id -> tokRe.findAllIn(t.toLowerCase).toVector }
      val occurrences = toks.flatMap { case (id, ts) =>
        (0 to ts.length - k).map(i => (ts.slice(i, i + k).mkString(" "), id, i + 1)) }
      val shared = occurrences.groupBy(_._1)
        .filter(_._2.map(_._2).distinct.size >= 2).keySet
      val want = toks.flatMap { case (id, ts) =>
        val pos = (0 to ts.length - k)
          .filter(i => shared(ts.slice(i, i + k).mkString(" "))).map(_ + 1)
        // group runs of consecutive positions into maximal islands
        val spans = pos.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.reverse
        spans.map { case (s, e) => (id, s.toLong, (e + k - 1).toLong,
          (e + k - 1 - s + 1).toLong) }
          .filter(_._4 >= minRun)
      }.toSet
      val got = Text.duplicateRuns(
          docs.toDF("doc_id", "text").repartition(parts), k, minRun)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("zOrderKey is injective: distinct coordinate pairs get distinct keys") {
    import spark.implicits._
    val pairsGen = Gen.listOfN(200, for {
      a <- Gen.chooseNum(0, 255); b <- Gen.chooseNum(0, 255)
    } yield (a, b))
    val prop = Prop.forAll(pairsGen) { pairs =>
      val distinct = pairs.distinct
      val keys = distinct.toDF("a", "b")
        .select(Layout.zOrderKey(col("a"), col("b"), 8).as("z"))
        .collect().map(_.getInt(0))
      keys.distinct.length == distinct.length
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
