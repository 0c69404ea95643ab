package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registered query at the scale
  * factor in SPARK_GRAFT_SF_DIR. Emits the full per-query JSON line (with
  * an explicit `errors` object — a failing query must be a visible error,
  * never a fast "-1 s" timing) SANDWICHED between two copies of a short
  * total-only line: round 1's driver truncated the long line in its tail
  * capture, and the duplicated short line guarantees a complete parseable
  * JSON line survives whichever end of the output a capture keeps.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // fixture events.parquet is TIMESTAMP(NANOS)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once (JIT/codegen/classloading, parquet reader and
    // footer init for each fixture table) so the alphabetically-first
    // measured query isn't charged the one-time open costs
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "orders", "lineitem",
        "documents", "embeddings", "part", "supplier").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    core.Tables.load(spark, sfDir, "events").count() // nanos-ts handling path
    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          name -> Right((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          name -> Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
        }
      }
    val ok = results.collect { case (k, Right(v)) => k -> v }
    val errs = results.collect { case (k, Left(m)) => k -> m }
    val total = ok.map(_._2).sum
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val shortLine = s"""{"metric":"total","value":$total,"unit":"sec","sf":${jstr(sfDir)},""" +
      s""""n_queries":${results.size},"n_errors":${errs.size}}"""
    // short line BEFORE and AFTER the long per-query line: whichever end a
    // log-tail capture keeps, one complete parseable JSON line survives
    println(shortLine)
    val qs = ok.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val es = errs.map { case (k, m) => s""""$k":${jstr(m)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}""")
    println(shortLine)
    spark.stop()
  }
}
