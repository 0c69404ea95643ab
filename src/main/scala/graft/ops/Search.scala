package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked text retrieval (SURVEY.md §2 group H extension): BM25 scoring of a
  * document corpus against a bag-of-words query — the relevance primitive a
  * training-data pipeline uses for targeted corpus search and quality-biased
  * sampling.
  *
  * Scale design: NO inverted-index explode. Per-term term frequencies come
  * from `regexp_extract_all` counts per row (codegen'd, one narrow pass over
  * the corpus — the query has a handful of terms, so this is a few regex
  * scans per document, not a token-granularity shuffle). Corpus statistics
  * (N, avgdl, per-term document frequencies) reduce to ONE single-row
  * aggregate that is broadcast back; scoring is then row-local arithmetic
  * and the top-k is a TakeOrderedAndProject. Total cost at 100 TB: one scan
  * + one 1-row broadcast + one bounded take — no shuffle proportional to
  * corpus size.
  */
object Search {

  /** BM25 top-k: standard Robertson/Okapi scoring with the Lucene-style
    * always-positive idf, `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b
    * + b·dl/avgdl))`.
    *
    * Determinism contract (oracle rule): each per-term partial score is
    * rounded to 9 decimals and summed in DECIMAL(18,9) — exact and
    * order-independent — then the total is rounded to 6. Term regexes are
    * plain `\btoken\b` word matches, expressible identically in DuckDB.
    */
  def bm25(documents: DataFrame, queryTerms: Seq[String], k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    require(terms.nonEmpty, "at least one query term")
    require(terms.forall(_.matches("[a-z0-9]+")),
      s"query terms must be plain tokens, got: ${terms.mkString(", ")}")

    val text = lower(col("text"))
    // regexp_count, not size(regexp_extract_all): identical match counts
    // without materializing a per-row array of every token — the counting
    // scan stays allocation-free inside codegen
    val dl = regexp_count(text, lit("[a-z0-9]+")).cast("long")
    val tfCols = terms.indices.map(i =>
      regexp_count(text, lit("\\b" + terms(i) + "\\b"))
        .cast("long").as(s"tf$i"))
    // persist the counted projection (doc_id + a few longs — ~48 bytes/doc,
    // spillable), not the corpus: the stats aggregate and the scoring pass
    // both read it, so the regex scan over the text runs exactly once
    val base = documents.select(
      col("doc_id") +: dl.as("dl") +: tfCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // one single-row aggregate: collection size, total length, per-term df
    val statAggs =
      count(lit(1)).as("n") +:
      (sum("dl").cast("double") / count(lit(1))).as("avgdl") +:
      terms.indices.map(i => sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)

    val oneMinusB = 1.0 - b
    def termScore(i: Int): Column = {
      val tf = col(s"tf$i")
      val df = col(s"df$i")
      // identical parse shape to the SQL oracle: ln(1+(n-df+0.5)/(df+0.5))
      // * tf*(k1+1) / (tf + k1*((1-b) + b*dl/avgdl))
      val idf = log(lit(1.0) + (col("n") - df + lit(0.5)) / (df + lit(0.5)))
      val w = idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(oneMinusB) + lit(b) * col("dl") / col("avgdl")))
      when(tf > 0, round(w, 9)).otherwise(lit(0.0))
    }
    val scoreDec = terms.indices
      .map(i => termScore(i).cast("decimal(18,9)"))
      .reduce(_ + _)
    val hits = terms.indices.map(i => when(col(s"tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _)

    base.crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(scoreDec.cast("double"), 6).as("score"),
        hits.cast("long").as("n_terms"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** The matching DuckDB oracle text for [[bm25]] — generated next to the
    * operator so the formula can never drift from the Spark side.
    */
  def bm25OracleSql(queryTerms: Seq[String], k: Int = 10,
                    k1: Double = 1.2, b: Double = 0.75): String = {
    val terms = queryTerms.map(_.toLowerCase).distinct
    val tfs = terms.indices.map(i =>
      s"len(regexp_extract_all(lower(text), '\\b${terms(i)}\\b')) AS tf$i").mkString(",\n                ")
    val dfs = terms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(",\n                ")
    val oneMinusB = 1.0 - b
    val scores = terms.indices.map { i =>
      s"""CAST(CASE WHEN tf$i > 0 THEN round(ln(1 + (n - df$i + 0.5) / (df$i + 0.5))
         * tf$i * ${k1 + 1.0} / (tf$i + $k1 * ($oneMinusB + $b * dl / avgdl)), 9)
         ELSE 0 END AS DECIMAL(18,9))"""
    }.mkString(" + ")
    val hits = terms.indices.map(i => s"(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH base AS (SELECT doc_id,
                CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS dl,
                $tfs
              FROM documents),
       stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                $dfs
              FROM base),
       sc AS (SELECT doc_id, $scores AS s, $hits AS hits FROM base, stats)
       SELECT doc_id, round(CAST(s AS DOUBLE), 6) AS score, CAST(hits AS BIGINT) AS n_terms
       FROM sc WHERE round(CAST(s AS DOUBLE), 6) > 0
       ORDER BY score DESC, doc_id LIMIT $k"""
  }
}
