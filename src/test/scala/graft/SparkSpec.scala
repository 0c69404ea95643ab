package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // legacy nanos-era fixture support; Tables.load adapts per era
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sfDir: String = TestSpark.sfDir

  /** Cache-hygiene helper shared by every scoped-persist spec: the release
    * listener (Helpers.releaseAfterFirstAction) fires on the ASYNC listener
    * bus, so specs must wait out the bus before asserting the session's SQL
    * cache is empty. Returns whether it emptied within the timeout.
    */
  def awaitSqlCacheEmpty(timeoutMs: Long = 30000): Boolean = {
    import org.apache.spark.sql.GraftSqlBridge
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!GraftSqlBridge.sqlCacheIsEmpty(spark) && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    GraftSqlBridge.sqlCacheIsEmpty(spark)
  }
}
