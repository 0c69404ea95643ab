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
