package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("binnedRangeJoin equals the naive range join on random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextInt(10000).toLong)).toDF("pid", "pt")
    val intervals = (1 to 200).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, lo, lo + rnd.nextInt(500).toLong)
    }.toDF("iid", "lo", "hi")

    val naive = points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "iid")
    for (width <- Seq(1L, 100L, 250L, 5000L)) {
      val binned = Relational.binnedRangeJoin(points, intervals, "pt", "lo", "hi", width)
        .select("pid", "iid")
      assert(binned.count() == naive.count(), s"width=$width")
      assert(binned.except(naive).isEmpty && naive.except(binned).isEmpty, s"width=$width")
    }
  }

  test("binnedRangeJoin bin-boundary cases: point exactly on lo/hi/bin edge") {
    import spark.implicits._
    val points = Seq((1L, 0L), (2L, 100L), (3L, 199L), (4L, 200L), (5L, 201L))
      .toDF("pid", "pt")
    val intervals = Seq((10L, 100L, 200L)).toDF("iid", "lo", "hi")
    val out = Relational.binnedRangeJoin(points, intervals, "pt", "lo", "hi", 100L)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(2L, 3L, 4L)) // inclusive bounds, exclusive outside
  }
}
