package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the two most intricate text algorithms:
  *
  *  - jaccardPairs' PPJoin prefix filter claims EXACTNESS (no candidate a
  *    full O(n²) comparison would find is lost) — checked against a naive
  *    driver-side all-pairs computation on random corpora drawn from a
  *    small vocabulary (small vocab → dense overlaps → the prefix filter
  *    is actually exercised, not vacuously empty).
  *
  *  - winnowing's selection guarantee: any two documents sharing a
  *    substring of ≥ w+k-1 tokens must share at least one fingerprint.
  */
class DedupPropertySpec extends SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(2, 10)
    docs <- Gen.listOfN(n, Gen.chooseNum(3, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def exactJaccardPairs(docs: List[(Long, String)],
                                threshold: Double): Set[(Long, Long)] = {
    def shingles(t: String): Set[String] =
      t.split(" ").toList.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val sh = docs.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= threshold
    } yield (a, b)).toSet
  }

  test("jaccardPairs prefix filter is exact: equals naive all-pairs on random corpora") {
    import spark.implicits._
    val prop = Prop.forAll(docsGen, Gen.oneOf(0.3, 0.5, 0.7)) { (docs, t) =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.jaccardPairs(df, t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got == exactJaccardPairs(docs, t)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("winnowing guarantee: docs sharing >= w+k-1 consecutive tokens share a fingerprint") {
    import spark.implicits._
    // k=3, w=4: shared runs of >= 6 tokens guarantee a shared fingerprint
    val sharedRunGen = for {
      run <- Gen.listOfN(7, Gen.oneOf(vocab)).map(_.mkString(" "))
      pre <- Gen.listOfN(5, Gen.oneOf(vocab)).map(_.mkString(" "))
      post <- Gen.listOfN(5, Gen.oneOf(vocab)).map(_.mkString(" "))
    } yield (s"$pre $run", s"$run $post")
    val prop = Prop.forAll(sharedRunGen) { case (ta, tb) =>
      val df = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
      val fps = Text.winnowing(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      fps.getOrElse(1L, Set.empty).intersect(fps.getOrElse(2L, Set.empty)).nonEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
