package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: on arbitrary (group, value, id) data with duplicate
  * values (forcing tie-breaking through the id column) and arbitrary k,
  * the custom bounded-heap operator is row-identical to the declarative
  * window formulation. Uses moderate iteration counts — each trial runs
  * two Spark jobs.
  */
class TopKPropertySpec extends SparkSpec {

  private val rowsGen: Gen[List[(String, Double, Long)]] = for {
    n <- Gen.chooseNum(0, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c", "d")
      // small value domain: ties are the norm, not the exception
      v <- Gen.chooseNum(0, 5).map(_.toDouble)
      id <- Gen.chooseNum(0L, 1000000L)
    } yield (g, v, id))
  } yield rows.distinctBy(r => (r._1, r._3)) // unique (group, id): total tie-break order

  test("TopK.perGroup == window row_number for arbitrary data, ties, and k") {
    import spark.implicits._
    val prop = Prop.forAll(rowsGen, Gen.chooseNum(1, 7)) { (rows, k) =>
      val df = rows.toDF("g", "v", "id")
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val expected = df.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .collect().map(_.toSeq).toSet
      val got = TopK.perGroup(df, Seq("g"), Seq(("v", false), ("id", true)), k)
        .collect().map(_.toSeq).toSet
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
