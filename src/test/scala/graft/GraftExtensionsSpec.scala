package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("vec_dot / vec_norm usable from SQL via SparkSessionExtensions") {
    // getOrCreate returns any existing default session and would ignore
    // extensions — clear them so a fresh session (reusing the context)
    // gets the injected functions, then restore
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_norm(array(3.0D, 4.0D)) AS n""".stripMargin).collect().head
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 5.0)
      // float arrays implicitly cast to double at analysis (the natural
      // usage on the fixture's array<float> embedding column)
      val f = spark.sql(
        """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |               array(3.0D, 4.0D)) AS d,
          |       vec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n""".stripMargin)
        .collect().head
      assert(f.getDouble(0) == 11.0)
      assert(f.getDouble(1) == 5.0)
      // null ELEMENTS yield null, not garbage doubles
      val nulls = spark.sql(
        """SELECT vec_dot(array(1.0D, NULL), array(3.0D, 4.0D)) AS d,
          |       vec_norm(array(NULL, 4.0D)) AS n""".stripMargin).collect().head
      assert(nulls.isNullAt(0) && nulls.isNullAt(1))
      // non-array input is rejected at analysis, not at runtime
      intercept[Exception](spark.sql("SELECT vec_norm('not a vector')").collect())
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
