package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zOrderKey: hand-computed Morton interleave") {
    import spark.implicits._
    // a=5 (101), b=3 (011), bits=3: a bits land at even positions, b at odd
    // → positions 0,4 from a; 1,3 from b → 0b011011 = 27
    val out = Seq((5, 3)).toDF("a", "b")
      .select(Layout.zOrderKey(col("a"), col("b"), 3).as("z")).head().getInt(0)
    assert(out == 27)
    // order matters: swapping operands gives a different curve position
    val swapped = Seq((3, 5)).toDF("a", "b")
      .select(Layout.zOrderKey(col("a"), col("b"), 3).as("z")).head().getInt(0)
    assert(swapped == 0b100111)
  }

  test("zorderStats: buckets cover all rows; invariant under partitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val d = (1 to 4000).map(_ => (rng.nextInt(1000).toLong, rng.nextInt(1000).toLong))
      .toDF("x", "y")
    val s1 = Layout.zorderStats(d, "x", "y").collect()
    assert(s1.map(_.getLong(1)).sum == 4000L)
    val s2 = Layout.zorderStats(d.repartition(7), "x", "y").collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
  }

  test("writeZOrdered: per-file footer ranges bound both dimensions tighter than the unordered layout") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val d = (1 to 8000).map(_ => (rng.nextInt(1024).toLong, rng.nextInt(1024).toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    def fileBoxes(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x").as("ax"), max("x").as("bx"), min("y").as("ay"), max("y").as("by"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    try {
      Layout.writeZOrdered(d, "x", "y", s"$dir/z", nFiles = 16)
      val zBoxes = fileBoxes(s"$dir/z")
      assert(zBoxes.length == 16, s"expected 16 files, got ${zBoxes.length}")
      // same row count round-trips
      assert(spark.read.parquet(s"$dir/z").count() == 8000L)
      d.repartition(16).write.parquet(s"$dir/naive")
      val nBoxes = fileBoxes(s"$dir/naive")
      def area(bs: Array[(Long, Long, Long, Long)]) =
        bs.map { case (ax, bx, ay, by) => (bx - ax + 1).toDouble * (by - ay + 1) }.sum
      // hash-partitioned files each span ~the full domain; Z-ordered files
      // must cut total bbox area by a wide margin (4x is conservative —
      // ideal tiling gives ~16x)
      assert(area(zBoxes) * 4 < area(nBoxes),
        s"z=${area(zBoxes)} naive=${area(nBoxes)}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("zorderStats: Z-buckets bound BOTH dimensions — total bbox area beats single-column bucketing") {
    import spark.implicits._
    // uniform grid: the adversarial case for single-column layout
    val d = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val z = Layout.zorderStats(d, "x", "y", bits = 6, bucketBits = 6).collect()
    val zArea = z.map(r => (r.getLong(3) - r.getLong(2) + 1) * (r.getLong(5) - r.getLong(4) + 1)).sum
    // single-column layout: 64 equal buckets by x only — each spans ALL of y
    val single = d.withColumn("bucket", col("x"))
      .groupBy("bucket")
      .agg(min("x").as("min_a"), max("x").as("max_a"),
        min("y").as("min_b"), max("y").as("max_b"))
      .collect()
    val sArea = single.map(r => (r.getLong(2) - r.getLong(1) + 1) * (r.getLong(4) - r.getLong(3) + 1)).sum
    // 64 Z-buckets of a 64×64 grid are 8×8 tiles: area 64 each, total 4096;
    // 64 x-slices span y fully: area 64 each too — so compare PER-DIM spans:
    // every Z-bucket must bound y strictly tighter than the full domain
    assert(z.forall(r => r.getLong(5) - r.getLong(4) + 1 <= 8), s"y-span leaked: ${z.mkString(",")}")
    assert(zArea.toDouble <= sArea.toDouble)
    // and a 2-D range predicate touches fewer Z-buckets than rows/bucket
    // parity would suggest: an 8×8 query box hits at most 4 tiles
    val hit = z.count(r => r.getLong(2) <= 15 && r.getLong(3) >= 8 &&
      r.getLong(4) <= 15 && r.getLong(5) >= 8)
    assert(hit <= 4, s"8x8 box should hit <= 4 of 64 Z-tiles, hit $hit")
  }
}
