package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure chunk-planning math (SURVEY.md §5.3):
  * chunk concatenation == input, size skew <= 1, formula monotonicity,
  * dispersion guard.
  */
class ChunkPlannerSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("divideInChunks: concatenation reproduces the input in order") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-1000, 1000)), Gen.chooseNum(1, 50)) {
      (xs: List[Int], n: Int) =>
        ChunkPlanner.divideInChunks(xs, n).flatten == xs
    })
  }

  test("divideInChunks: produces min(n, len) non-empty chunks") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 100)), Gen.chooseNum(1, 50)) {
      (xs: List[Int], n: Int) =>
        val chunks = ChunkPlanner.divideInChunks(xs, n)
        chunks.length == math.min(n, xs.length) && chunks.forall(_.nonEmpty)
    })
  }

  test("divideInChunks: chunk sizes differ by at most 1") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 100)), Gen.chooseNum(1, 50)) {
      (xs: List[Int], n: Int) =>
        val sizes = ChunkPlanner.divideInChunks(xs, n).map(_.length)
        sizes.max - sizes.min <= 1
    })
  }

  test("divideInChunks: empty input, n=0 rejection") {
    assert(ChunkPlanner.divideInChunks(Seq.empty[Int], 5) == Seq.empty)
    intercept[IllegalArgumentException](ChunkPlanner.divideInChunks(Seq(1), 0))
  }

  test("approximateNbChunks: monotonically non-decreasing in table size") {
    check(Prop.forAll(Gen.chooseNum(0.0, 1e5), Gen.chooseNum(0.0, 1e5),
      Gen.chooseNum(1, 128), Gen.chooseNum(0.1, 1e3)) {
      (gb1: Double, gb2: Double, cores: Int, free: Double) =>
        val (lo, hi) = (math.min(gb1, gb2), math.max(gb1, gb2))
        ChunkPlanner.approximateNbChunks(lo, 2.0, cores, free) <=
          ChunkPlanner.approximateNbChunks(hi, 2.0, cores, free)
    })
  }

  test("approximateNbChunks: reference formula parity (ceil(table / min(chunk*cores, free)))") {
    // bqfetch/bqfetch.py:438-454: table 100GB, 2GB/core, 8 cores => 16GB budget
    // but only 7GB free => budget 7GB => ceil(100/7) = 15
    assert(ChunkPlanner.approximateNbChunks(100.0, 2.0, 8, 7.0) == 15)
    assert(ChunkPlanner.approximateNbChunks(100.0, 2.0, 8, 100.0) == math.ceil(100.0 / 16).toInt)
    assert(ChunkPlanner.approximateNbChunks(0.0, 2.0, 8, 7.0) == 1) // floor at 1 chunk
  }

  test("checkDispersion: uniform counts pass, skewed counts throw") {
    assert(ChunkPlanner.checkDispersion(Seq(10L, 10L, 10L, 10L)) == 0.0)
    // 3 of 4 counts far from mean => frac 0.75 > 0.25 => intended
    // InvalidChunkRangeException (the reference only warns and its exported
    // exception class is undefined — SURVEY.md §0)
    intercept[InvalidChunkRangeException](
      ChunkPlanner.checkDispersion(Seq(1L, 100L, 1L, 100L)))
    assert(ChunkPlanner.checkDispersion(Seq.empty) == 0.0)
  }
}
