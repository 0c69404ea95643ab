package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.TextExpressions.nfc_normalize

/** NfcNormalize: the native Unicode canonicalizer behind Text.normalizeText.
  * Contracts under test: composed == normalize(decomposed) (the hashing
  * motivation), identity on NFC/ASCII input, null discipline, codegen ≡
  * interpreted, and the SQL registration through GraftExtensions.
  */
class TextExpressionsSpec extends SparkSpec {

  // "é" precomposed (U+00E9) vs decomposed ("e" + combining acute U+0301)
  private val composed = "caf\u00e9"
  private val decomposed = "cafe\u0301"

  test("NFC maps a decomposed combining sequence onto its precomposed form") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"), (4L, null))
      .toDF("id", "s")
      .withColumn("n", nfc_normalize(col("s")))
    val out = df.orderBy("id").collect()
    assert(out(0).getString(2) == composed,
      "decomposed e + U+0301 must compose to U+00E9")
    assert(out(1).getString(2) == composed, "already-NFC input is unchanged")
    assert(out(2).getString(2) == "plain ascii")
    assert(out(3).isNullAt(2), "null in, null out")
    // the hashing motivation: after NFC the two spellings hash identically
    assert(df.filter(col("id").isin(1L, 2L))
      .select(md5(col("n"))).distinct().count() == 1)
  }

  test("codegen and interpreted paths agree (wholestage on/off)") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq((1L, decomposed), (2L, composed), (3L, ""), (4L, "\u212b ring"),
      (5L, "mixed cafe\u0301 and \u212b"))
    def run(codegen: Boolean): Seq[(Long, String)] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try rows.toDF("id", "s").withColumn("n", nfc_normalize(col("s")))
        .select("id", "n").as[(Long, String)].collect().toSeq.sortBy(_._1)
      finally spark.conf.set("spark.sql.codegen.wholeStage", true)
    }
    assert(run(codegen = true) == run(codegen = false))
  }

  test("nfc_normalize is callable from SQL via GraftExtensions") {
    // getOrCreate returns any existing default session and would ignore
    // extensions \u2014 clear them so a fresh session (reusing the context)
    // gets the injected functions, then restore (GraftExtensionsSpec pattern)
    import org.apache.spark.sql.SparkSession
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      val one = s.sql("SELECT nfc_normalize('cafe\u0301') AS n").head().getString(0)
      assert(one == composed)
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
