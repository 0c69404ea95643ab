package graft.ops

import graft.SparkSpec
import graft.core.Tables

class SearchSpec extends SparkSpec {

  private val terms = Seq("join", "vector", "spark")

  /** Independent driver-side BM25 over the collected fixture corpus —
    * classic formulation with explicit tf/df maps, mirroring the operator's
    * rounding contract (per-term round(9), exact sum, round(6)).
    */
  private def referenceScores(k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq)
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.size).sum.toDouble / n
    val dfMap = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    docs.map { case (id, toks) =>
      val dl = toks.size.toDouble
      val score = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) BigDecimal(0)
        else {
          val idf = math.log(1.0 + (n - dfMap(t) + 0.5) / (dfMap(t) + 0.5))
          val w = idf * tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
          BigDecimal(w).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
      id -> score.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  test("bm25 matches the classic tf/df formulation, ranked and tie-broken deterministically") {
    val k = 25
    val got = Search.bm25(Tables.documents(spark, sfDir), terms, k)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expected = referenceScores().toSeq
      .filter(_._2 > 0)
      .sortBy { case (id, s) => (-s, id) }
      .take(k)
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gid, gs), (eid, es)) =>
      assert(gid == eid, s"rank order diverged: got $gid expected $eid")
      assert(math.abs(gs - es) < 1e-6, s"doc $gid score $gs vs $es")
    }
  }

  test("n_terms counts matched query terms") {
    val byId = Search.bm25(Tables.documents(spark, sfDir), terms, 25)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSet)
      .toMap
    byId.foreach { case (id, hits) =>
      assert(hits == terms.count(docs(id).contains), s"doc $id")
      assert(hits >= 1)
    }
  }

  test("a term absent from the corpus contributes nothing; alone it returns no rows") {
    val d = Tables.documents(spark, sfDir)
    val without = Search.bm25(d, terms, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val padded = Search.bm25(d, terms :+ "zzzznotaword", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(without.sameElements(padded))
    assert(Search.bm25(d, Seq("zzzznotaword"), 10).isEmpty)
  }

  test("scale shape: one scan + broadcast stats + bounded take — no corpus-sized shuffle") {
    val plan = Search.bm25(Tables.documents(spark, sfDir), terms, 10)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("tf is token equality, not a \\b word match: spark_sql's 'spark' token counts") {
    import spark.implicits._
    // same dl (5 tokens each); d1 has tf=2 for 'spark' ONLY under token
    // semantics ('spark' inside 'spark_sql' — a \b regex can't see it
    // because '_' is a word character)
    val d = Seq(
      (1L, "spark_sql aa bb spark"),
      (2L, "spark cc dd ee ff")).toDF("doc_id", "text")
    val out = Search.bm25(d, Seq("spark"), 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) > out(2L), s"tf=2 doc must outscore tf=1 doc: $out")
  }

  test("empty corpus and null text are handled, not NPEs") {
    import spark.implicits._
    assert(Search.bm25(Seq.empty[(Long, String)].toDF("doc_id", "text"), terms, 5).isEmpty)
    val withNull = Seq((1L, "join the join"), (2L, null: String)).toDF("doc_id", "text")
    val out = Search.bm25(withNull, Seq("join"), 5).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("bm25Lazy: row-identical to the eager form") {
    val d = Tables.documents(spark, sfDir)
    val eager = Search.bm25(d, terms, 25).collect().toSeq
    val lzy = Search.bm25Lazy(d, terms, 25).collect().toSeq
    assert(eager == lzy)
    assert(eager.nonEmpty)
  }

  test("bm25Lazy: building the frame runs no Spark job (everything-is-lazy contract)") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    // load the table BEFORE arming the listener: spark.read.parquet may run
    // its own footer/schema job, which is table loading, not the operator
    val d = Tables.documents(spark, sfDir)
    d.schema
    spark.sparkContext.addSparkListener(l)
    try {
      val df = Search.bm25Lazy(d, terms, 10)
      Thread.sleep(1000) // listener bus is async; give submissions time to surface
      assert(counter.get() == 0,
        s"bm25Lazy construction submitted ${counter.get()} job(s)")
      assert(df.columns.toSeq == Seq("doc_id", "score", "n_terms"))
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("non-token query terms are rejected") {
    intercept[IllegalArgumentException](
      Search.bm25(Tables.documents(spark, sfDir), Seq("bad term!"), 5))
    intercept[IllegalArgumentException](
      Search.bm25(Tables.documents(spark, sfDir), Seq.empty, 5))
  }

  test("hybridRrf: rrf arithmetic from the two pool ranks; single-pool docs score one term") {
    val d = Tables.documents(spark, sfDir)
    val terms = Seq("join", "vector")
    val poolK = 20
    val out = Search.hybridRrf(d, terms, k = 10, poolK = poolK).collect()
    assert(out.nonEmpty && out.length <= 10)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { r =>
      val (rrf, rl, rq) = (r.getDouble(1), r.getLong(2), r.getLong(3))
      val expect = r6((if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rq > 0) 1.0 / (60 + rq) else 0.0))
      assert(rrf == expect, s"doc ${r.getLong(0)}: $rrf != $expect")
      assert(rl >= 0 && rl <= poolK && rq >= 0 && rq <= poolK)
      assert(rl > 0 || rq > 0, "a fused doc must appear in at least one pool")
    }
    // descending rrf with doc_id tiebreak
    val pairs = out.map(r => (r.getDouble(1), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy { case (s, id) => (-s, id) }))
    // determinism across runs (driver-side rank assignment is stable)
    val again = Search.hybridRrf(d, terms, k = 10, poolK = poolK).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("hybridRrfLazy: row-identical to the eager form") {
    val d = Tables.documents(spark, sfDir)
    val terms = Seq("join", "vector")
    val eager = Search.hybridRrf(d, terms, k = 10, poolK = 20).collect().map(_.toSeq).toSeq
    val lzy = Search.hybridRrfLazy(d, terms, k = 10, poolK = 20).collect().map(_.toSeq).toSeq
    assert(eager == lzy)
    assert(eager.nonEmpty)
  }

  test("hybridRrfLazy: building the frame runs no Spark job (everything-is-lazy contract)") {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    val d = Tables.documents(spark, sfDir)
    d.schema
    spark.sparkContext.addSparkListener(l)
    try {
      val df = Search.hybridRrfLazy(d, Seq("join", "vector"), k = 10, poolK = 20)
      Thread.sleep(1000) // listener bus is async; give submissions time to surface
      assert(counter.get() == 0,
        s"hybridRrfLazy construction submitted ${counter.get()} job(s)")
      assert(df.columns.toSeq == Seq("doc_id", "rrf", "rank_lex", "rank_q"))
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("ndcgReport: perfect ranking scores 1.0; no-match query scores 0 with n_rel 0") {
    import spark.implicits._
    // equal doc lengths, so the 2-term doc outranks the 1-term docs and
    // BM25's ranking equals the ideal grade ordering exactly
    val df = Seq(
      (1L, "alpha beta"), (2L, "alpha zz"), (3L, "beta yy"), (4L, "ww vv")
    ).toDF("doc_id", "text")
    val out = Search.ndcgReport(df, Seq(Seq("alpha", "beta"), Seq("missing")), k = 5)
      .collect().map(r => r.getString(0) -> r).toMap
    val hit = out("alpha beta")
    assert(hit.getAs[Long]("n_rel") == 3L)
    assert(hit.getAs[Double]("ndcg") == 1.0,
      s"BM25 order matches the ideal order here: $hit")
    assert(hit.getAs[Double]("dcg") == hit.getAs[Double]("idcg"))
    val miss = out("missing")
    assert(miss.getAs[Long]("n_rel") == 0L)
    assert(miss.getAs[Double]("dcg") == 0.0 && miss.getAs[Double]("ndcg") == 0.0)
  }

  test("ndcgReport: a deliberately inverted ranking scores below 1 and DCG matches a driver replay") {
    import spark.implicits._
    // doc 10 matches both terms but is LONG (length-normalized score drops
    // below the short single-term docs), so BM25's order diverges from the
    // grade-ideal order and nDCG < 1
    val filler = Seq.fill(60)("filler").mkString(" ")
    val df = Seq(
      (10L, s"alpha beta $filler"), (2L, "alpha zz"), (3L, "beta yy")
    ).toDF("doc_id", "text")
    val row = Search.ndcgReport(df, Seq(Seq("alpha", "beta")), k = 3).collect().head
    assert(row.getAs[Double]("ndcg") < 1.0)
    assert(row.getAs[Double]("ndcg") > 0.0)
    // driver replay: ideal puts grade-2 doc 10 first; observed ranking is
    // whatever BM25 produced — recompute DCG from the operator's own
    // ranking to pin the discount arithmetic
    val ranked = Search.bm25Lazy(df, Seq("alpha", "beta"), 3).collect()
    def dcgOf(grades: Seq[Long]): Double = {
      val terms = grades.zipWithIndex.map { case (g, i) =>
        BigDecimal((math.pow(2.0, g.toDouble) - 1.0) /
          (math.log(i + 2.0) / math.log(2.0)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      BigDecimal(terms.sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = dcgOf(ranked.map(_.getAs[Long]("n_terms")).toSeq)
    assert(row.getAs[Double]("dcg") == want)
  }
}
