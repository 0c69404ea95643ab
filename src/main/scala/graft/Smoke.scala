package graft

import org.apache.spark.sql.SparkSession

/** Smoke driver mirroring the round driver's t1 check: run the flagship
  * `SparkEntry.entry` and assert rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // legacy nanos-era fixture support; Tables.load adapts per era
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    val n = df.count()
    println(s"SMOKE rows=$n ${if (n > 0) "OK" else "FAIL"}")
    spark.stop()
  }
}
