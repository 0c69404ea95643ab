package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Buffer algebra of the typed centroid aggregator — exercised directly
  * because the merge edge cases (zero buffers carrying counts) only arise
  * under specific partition layouts in a real job.
  */
class VecMeanAggregatorSpec extends AnyFunSuite {

  test("merge: counts add even when one side's sums are empty") {
    val zeroWithCount = (Array.empty[Double], 2L) // zero buffer after merges
    val real = (Array(3.0, 6.0), 3L)
    assert(VecMeanAggregator.merge(zeroWithCount, real)._2 == 5L)
    assert(VecMeanAggregator.merge(real, zeroWithCount)._2 == 5L)
    assert(VecMeanAggregator.merge(real, zeroWithCount)._1.toSeq == Seq(3.0, 6.0))
  }

  test("reduce + merge + finish: element-wise mean over split buffers") {
    val b1 = VecMeanAggregator.reduce(VecMeanAggregator.zero, Array(1.0f, 2.0f))
    val b2 = VecMeanAggregator.reduce(VecMeanAggregator.zero, Array(3.0f, 6.0f))
    val out = VecMeanAggregator.finish(VecMeanAggregator.merge(b1, b2))
    assert(out.toSeq == Seq(2.0, 4.0))
  }

  test("ragged or empty vectors are rejected, not silently truncated") {
    val b = VecMeanAggregator.reduce(VecMeanAggregator.zero, Array(1.0f, 2.0f))
    intercept[IllegalArgumentException](VecMeanAggregator.reduce(b, Array(1.0f)))
    intercept[IllegalArgumentException](VecMeanAggregator.reduce(b, Array.empty[Float]))
    intercept[IllegalArgumentException](
      VecMeanAggregator.merge(b, (Array(1.0), 1L)))
  }
}
