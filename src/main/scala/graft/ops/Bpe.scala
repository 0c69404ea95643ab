package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning and tokenization (Sennrich et al.
  * 2016 — the subword scheme under the GPT/Llama tokenizer family), as the
  * learned-counterpart to the fixed pretokenizer proxy in
  * [[Text.tokenCounts]].
  *
  * Scale shape — the 100 TB discipline is the same as
  * [[Text.unigramSurprisal]]'s CCNet pattern: the only corpus-wide work is
  * ONE map-side-combined word-count aggregate (the shuffle carries
  * (word, partial count), never token instances); merge learning then runs
  * on the word-FREQUENCY table truncated to `maxVocabWords` — an explicitly
  * bounded driver materialization (Zipf coverage makes the truncation
  * standard practice; production BPE trainers all learn from a frequency
  * table, not the raw corpus). Encoding is one narrow typed pass with the
  * merge table broadcast and a per-partition word→length memo, so repeated
  * words (the common case by Zipf) tokenize once per task.
  *
  * Deterministic by construction (count-desc / pair-lexicographic
  * tie-breaks), and — though iterative — fully replayable in SQL:
  * [[mergesOracleSql]] / [[encodeOracleSql]] unroll the merge loop as
  * chained DuckDB CTEs (the pageRankOracleSql pattern), so both registered
  * queries are hash-matched against a generated oracle. Hand-computed
  * merge sequences are additionally asserted in BpeSpec.
  */
object Bpe {

  /** End-of-word marker (Sennrich's `</w>`): lets a merge distinguish
    * word-final from word-internal occurrences, and makes "whole word
    * becomes one token" expressible.
    */
  private[ops] val EndOfWord = "</w>"

  /** Learn `nMerges` merge rules from the corpus word-frequency table.
    * Returns (rank, left, right, merged, pair_count): rank is merge order,
    * pair_count the weighted adjacent-pair count that won the round.
    * Learning stops early when no pair occurs at least twice.
    */
  def train(documents: DataFrame, nMerges: Int = 50,
            maxVocabWords: Int = 10000): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val rules = trainRules(documents, nMerges, maxVocabWords)
    rules.zipWithIndex
      .map { case ((l, r, c), i) => (i.toLong, l, r, l + r, c) }
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** The merge list itself — shared by [[train]] (as a DataFrame) and
    * [[encode]] (broadcast). Driver-side over the BOUNDED frequency table.
    */
  private[ops] def trainRules(documents: DataFrame, nMerges: Int,
                              maxVocabWords: Int): Seq[(String, String, Long)] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    require(maxVocabWords > 0, s"maxVocabWords must be > 0, got $maxVocabWords")
    val wordCounts = documents
      .select(explode(regexp_extract_all(lower(col("text")), lit(Text.wordRe), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocabWords) // bounded driver materialization (Zipf coverage)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // word representations: chars + end-of-word marker
    var reps: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ EndOfWord, c)
    }
    val rules = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      reps.foreach { case (pieces, c) =>
        var i = 0
        while (i < pieces.length - 1) {
          val k = (pieces(i), pieces(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      // best = highest count, ties broken lexicographically — deterministic
      val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, kv @ (k, c)) => acc match {
          case Some((bk, bc)) if c < bc || (c == bc && Ordering[(String, String)].gteq(k, bk)) => acc
          case _ => Some(kv)
        }
      }
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          rules += ((l, r, c))
          val merged = l + r
          reps = reps.map { case (pieces, cnt) =>
            if (pieces.length < 2) (pieces, cnt)
            else {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < pieces.length) {
                if (i < pieces.length - 1 && pieces(i) == l && pieces(i + 1) == r) {
                  out += merged; i += 2
                } else { out += pieces(i); i += 1 }
              }
              (out.result(), cnt)
            }
          }
        case _ => exhausted = true
      }
      round += 1
    }
    rules.result()
  }

  /** Tokenize with a learned merge table: per word, repeatedly apply the
    * LOWEST-rank applicable merge (the standard BPE encode order — NOT
    * left-to-right greedy, so encoding agrees with training exactly).
    * Returns per-document learned-BPE token counts next to the char-level
    * floor, in one narrow pass (merge table broadcast, per-partition memo).
    */
  def encode(documents: DataFrame, nMerges: Int = 50,
             maxVocabWords: Int = 10000): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] =
      trainRules(documents, nMerges, maxVocabWords)
        .zipWithIndex.map { case ((l, r, _), i) => (l, r) -> i }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val tokenRe = Text.wordRe.r
    documents.select(col("doc_id"), lower(col("text")).as("t")).as[(Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        val rk = bc.value
        def encodeWord(w: String): Int = memo.getOrElseUpdate(w, {
          var pieces = w.map(_.toString).toVector :+ EndOfWord
          var done = false
          while (!done && pieces.length > 1) {
            var bestI = -1
            var bestRank = Int.MaxValue
            var i = 0
            while (i < pieces.length - 1) {
              rk.get((pieces(i), pieces(i + 1))) match {
                case Some(r) if r < bestRank => bestRank = r; bestI = i
                case _ =>
              }
              i += 1
            }
            if (bestI < 0) done = true
            else pieces = (pieces.take(bestI) :+ (pieces(bestI) + pieces(bestI + 1))) ++
              pieces.drop(bestI + 2)
          }
          pieces.length
        })
        it.map { case (id, text) =>
          val ws = if (text == null) Array.empty[String] else tokenRe.findAllIn(text).toArray
          var nTok = 0L
          var nChar = 0L
          ws.foreach { w => nTok += encodeWord(w); nChar += w.length + 1 } // +1: </w>
          (id, nTok, nChar)
        }
      }
      .toDF("doc_id", "n_bpe_tokens", "n_char_floor")
      .orderBy("doc_id")
  }

  /** Generated DuckDB oracle replaying [[trainRules]] exactly — the merge
    * loop unrolled as chained CTEs (the `Graph.pageRankOracleSql` pattern).
    *
    * Encoding trick: a word's current pieces are stored as a string with
    * every piece wrapped in `|` separators (`[a, b, </w>]` →
    * `|a||b||</w>|`), so applying merge (l, r) is exactly
    * `replace(rep, '|l||r|', '|lr|')` — SQL `replace` scans left-to-right,
    * non-overlapping, continuing AFTER each replacement, which is the same
    * scan the Scala merge loop performs (`i += 2` on match). `|` can never
    * appear inside a piece because [[Text.wordRe]] admits only `[A-Za-z0-9]`
    * (plus the `</w>` marker), which also makes DuckDB's binary collation
    * agree with Scala's string ordering on the tie-break.
    *
    * Per round i: `p_i` recounts weighted adjacent pairs from the wrapped
    * reps, `b_i` picks the winner (count desc, pair lexicographic — the
    * [[trainRules]] fold), `r_i` applies it via LEFT JOIN + COALESCE so an
    * exhausted round (best count < 2 → `b_i` empty) passes reps through
    * unchanged and every later round stays empty, matching the early stop.
    */
  def mergesOracleSql(nMerges: Int = 30, maxVocabWords: Int = 10000): String = {
    s"""${trainCtes(nMerges, maxVocabWords)}
       |SELECT * FROM (${mergesUnion(nMerges)}) ORDER BY rank""".stripMargin
  }

  /** Generated DuckDB oracle replaying [[encode]]: reuses the training CTE
    * chain, then applies the learned merge list IN RANK ORDER, each rule
    * exhaustively (the same `replace` trick), over the distinct-word table.
    * Rank-order exhaustive application equals [[encode]]'s
    * lowest-rank-first loop because any rule whose side contains a merged
    * token was necessarily learned after the rule that created that token
    * (so no lower-rank pair can newly appear), and merging the leftmost
    * occurrence can never create an earlier occurrence of the same pair —
    * together these collapse the priority loop into one in-order sweep.
    */
  def encodeOracleSql(nMerges: Int = 30, maxVocabWords: Int = 10000): String =
    s"""${encodeCtes(nMerges, maxVocabWords)}
       |SELECT d.doc_id, COALESCE(n_bpe_tokens, 0) AS n_bpe_tokens,
       |       COALESCE(n_char_floor, 0) AS n_char_floor
       |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Training chain + per-document encode aggregate (`agg`), shared by the
    * per-document and per-source oracles. */
  private def encodeCtes(nMerges: Int, maxVocabWords: Int): String = {
    val encRounds = (1 to nMerges).map { i =>
      s"""e$i AS MATERIALIZED (SELECT w, COALESCE(
         |    replace(rep, '|' || b.l || '||' || b.r || '|', '|' || b.l || b.r || '|'),
         |    rep) AS rep
         |  FROM e${i - 1} LEFT JOIN b$i b ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""${trainCtes(nMerges, maxVocabWords)},
       |dt AS MATERIALIZED (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
       |  FROM documents),
       |e0 AS (SELECT w, '|' || array_to_string(string_split(w, ''), '||') || '||$EndOfWord|' AS rep
       |       FROM (SELECT DISTINCT w FROM dt)),
       |$encRounds,
       |elen AS (SELECT w, len(string_split(trim(rep, '|'), '||')) AS n FROM e$nMerges),
       |agg AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bpe_tokens,
       |               CAST(SUM(len(w) + 1) AS BIGINT) AS n_char_floor
       |        FROM dt JOIN elen USING (w) GROUP BY doc_id)""".stripMargin
  }

  /** Per-source tokenizer audit over the learned BPE: fertility (tokens
    * per word — THE cost metric a tokenizer is judged by: fertility ≈ 1
    * means whole words merged back, high fertility means the vocabulary
    * fits the source badly and every training step pays more sequence
    * positions for the same text) and compression (chars per token), next
    * to the raw totals. The per-source stratification is the point: a
    * vocabulary trained on the corpus mixture can still be a poor fit for
    * ONE source (code, another language), and this is the query that
    * shows it before a mixture decision bakes the cost in.
    *
    * Determinism/scale: rides [[encode]] (broadcast merge table,
    * per-partition word memo, one narrow pass) joined back to the doc's
    * source + regex word count — one co-partitioned join and one
    * combining aggregate on top; doubles only in the two final rounded
    * divisions. Sources are few, so the output is a broadcast-size frame.
    */
  def tokenizerAudit(documents: DataFrame, nMerges: Int = 30,
                     maxVocabWords: Int = 10000): DataFrame = {
    val enc = encode(documents, nMerges, maxVocabWords)
    val words = documents.select(col("doc_id"), col("source"),
      size(regexp_extract_all(lower(coalesce(col("text"), lit(""))),
        lit(Text.wordRe), lit(0))).cast("long").as("n_words"))
    words.join(enc, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_bpe_tokens").as("n_tokens"),
        sum("n_char_floor").as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_words"), col("n_tokens"),
        col("n_chars"),
        round(col("n_tokens").cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"), 6).as("fertility"),
        round(col("n_chars").cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double"), 6).as("compression"))
      .orderBy("source")
  }

  /** Generated DuckDB oracle for [[tokenizerAudit]]: the shared encode
    * chain rolled up by source with the same rounded divisions. */
  def tokenizerAuditOracleSql(nMerges: Int = 30,
                              maxVocabWords: Int = 10000): String =
    s"""${encodeCtes(nMerges, maxVocabWords)},
       |wcnt AS (SELECT doc_id, source,
       |           CAST(len(regexp_extract_all(lower(COALESCE(text, '')),
       |                                       '[a-z0-9]+')) AS BIGINT) AS n_words
       |         FROM documents),
       |per AS (SELECT w.source, w.n_words,
       |               COALESCE(a.n_bpe_tokens, 0) AS n_tokens,
       |               COALESCE(a.n_char_floor, 0) AS n_chars
       |        FROM wcnt w LEFT JOIN agg a ON w.doc_id = a.doc_id)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_words) AS BIGINT) AS n_words,
       |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |       round(CAST(SUM(n_tokens) AS DOUBLE)
       |             / CAST(greatest(SUM(n_words), 1) AS DOUBLE), 6) AS fertility,
       |       round(CAST(SUM(n_chars) AS DOUBLE)
       |             / CAST(greatest(SUM(n_tokens), 1) AS DOUBLE), 6) AS compression
       |FROM per GROUP BY source ORDER BY source""".stripMargin

  /** Shared WITH-chain: word counts → wrapped char reps → nMerges rounds of
    * (pair count, winner, merge application). MATERIALIZED throughout —
    * each round is referenced twice and DuckDB would otherwise re-inline
    * the whole chain combinatorially.
    */
  private def trainCtes(nMerges: Int, maxVocabWords: Int): String = {
    val rounds = (1 to nMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT l, r, CAST(SUM(c) AS BIGINT) AS pc FROM (
         |    SELECT pcs[i] AS l, pcs[i + 1] AS r, c FROM (
         |      SELECT unnest(generate_series(1, len(pcs) - 1)) AS i, pcs, c FROM (
         |        SELECT string_split(trim(rep, '|'), '||') AS pcs, c FROM r${i - 1})))
         |  GROUP BY l, r),
         |b$i AS MATERIALIZED (SELECT l, r, pc FROM p$i WHERE pc >= 2 ORDER BY pc DESC, l, r LIMIT 1),
         |r$i AS MATERIALIZED (SELECT c, COALESCE(
         |    replace(rep, '|' || b.l || '||' || b.r || '|', '|' || b.l || b.r || '|'),
         |    rep) AS rep
         |  FROM r${i - 1} LEFT JOIN b$i b ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH wc AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents)
       |  GROUP BY w ORDER BY c DESC, w LIMIT $maxVocabWords),
       |r0 AS (SELECT c, '|' || array_to_string(string_split(w, ''), '||') || '||$EndOfWord|' AS rep FROM wc),
       |$rounds""".stripMargin
  }

  /** One SELECT per learned rule, stitched with UNION ALL — empty rounds
    * contribute no row, so early stop falls out naturally. */
  private def mergesUnion(nMerges: Int): String =
    (1 to nMerges).map { i =>
      s"""SELECT CAST(${i - 1} AS BIGINT) AS rank, l AS "left", r AS "right", l || r AS merged, pc AS pair_count FROM b$i"""
    }.mkString("\nUNION ALL\n")
}
