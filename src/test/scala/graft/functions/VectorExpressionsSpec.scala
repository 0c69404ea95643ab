package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.sorted_intersect_size

/** SortedIntersectSize: the allocation-free merge-scan replacement for
  * size(array_intersect) on the dedup verify path. The contract under test:
  * bit-equal counts vs the built-in on sorted-distinct inputs (the shape
  * shingleArrays guarantees), across codegen, plus the null discipline.
  */
class VectorExpressionsSpec extends SparkSpec {

  test("sorted_intersect_size == size(array_intersect) on seeded sorted-distinct arrays") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      def arr() = Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("fused", sorted_intersect_size(col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
    val mismatches = df.filter(col("fused") =!= col("builtin")).count()
    assert(mismatches == 0)
    // includes empty arrays (nextInt(40) can be 0) — both forms give 0 there
    assert(df.filter(size(col("a")) === 0 && col("fused") === 0).count() ==
      df.filter(size(col("a")) === 0).count())
  }

  test("sorted_intersect_size: null array and null element both yield null") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Seq(1L, 2L), Seq(2L, 3L))).toDF("id", "a", "b")
    val nullArray = df.select(
      sorted_intersect_size(lit(null).cast("array<bigint>"), col("b")).as("r"))
      .collect().head
    assert(nullArray.isNullAt(0))
    val nullElem = df.select(
      sorted_intersect_size(array(lit(1L), lit(null).cast("bigint")), col("b")).as("r"))
      .collect().head
    assert(nullElem.isNullAt(0))
  }

  test("sorted_intersect_size usable from SQL via GraftExtensions") {
    import org.apache.spark.sql.SparkSession
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s.sql(
        "SELECT sorted_intersect_size(array(1L, 3L, 7L), array(3L, 5L, 7L, 9L)) AS n")
        .collect().head
      assert(r.getInt(0) == 2)
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
