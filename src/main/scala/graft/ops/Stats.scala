package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-statistics surface: the exact-arithmetic siblings of
  * [[Text.linearFit]] for relational profiling. Everything follows the
  * engine-portability discipline — exact DECIMAL sums, then double
  * arithmetic over identical operands — so the outputs carry full value
  * oracles (generated beside the operator, the minhashOracleSql pattern).
  */
object Stats {

  /** Pairwise Pearson correlation over `cols` in ONE aggregation pass:
    * every Σx, Σx², Σxy lands in a single partial-aggregable hash
    * aggregate (k + k + k(k−1)/2 terms), the 1-row result explodes into
    * one row per column pair — no per-pair scan, no driver math, no
    * second job. DECIMAL(30,6) sums: exact for fixture magnitudes up to
    * ~1e24 (a 100 TB lineitem's Σprice² fits with 8 digits to spare).
    * Degenerate pairs (a constant column) yield null r rather than ±Inf.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    def ds(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")
    val pairs = cols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val aggCols =
      Seq(count(lit(1)).cast("double").as("_n")) ++
        cols.map(c => ds(col(c)).as(s"_s_$c")) ++
        cols.map(c => ds(col(c) * col(c)).as(s"_ss_$c")) ++
        pairs.map { case (a, b) => ds(col(a) * col(b)).as(s"_sp_${a}_$b") }
    // the 2k + k(k-1)/2 decimal sums are the per-row cost here; spread an
    // under-split scan so the partial aggregate isn't serialized on one task
    val agg = Helpers.spreadForCompute(df.select(cols.map(col): _*))
      .agg(aggCols.head, aggCols.tail: _*)
    val n = col("_n")
    val pairStructs = pairs.map { case (a, b) =>
      val cov = n * col(s"_sp_${a}_$b") - col(s"_s_$a") * col(s"_s_$b")
      val dx = n * col(s"_ss_$a") - col(s"_s_$a") * col(s"_s_$a")
      val dy = n * col(s"_ss_$b") - col(s"_s_$b") * col(s"_s_$b")
      struct(
        lit(a).as("col_x"), lit(b).as("col_y"),
        n.cast("long").as("n_rows"),
        when(dx > 0.0 && dy > 0.0, cov / sqrt(dx * dy)).as("r"))
    }
    agg.select(explode(array(pairStructs: _*)).as("p"))
      .select("p.*")
      .orderBy("col_x", "col_y")
  }

  /** Tukey-fence (IQR) outlier report per group — the data-quality trim a
    * pipeline applies before fitting anything: per group, exact Q1/Q3
    * (interpolated `percentile`, the engine-portable exact form
    * q_percentiles already pins), the k·IQR fences, and how many rows
    * fall outside. Two passes — a per-group percentile aggregate (one row
    * per group) joined back onto the scan — so the fact table is read
    * twice but never sorted globally; the fences ride the second scan as
    * a codegen'd predicate. The join side is NOT hint-forced broadcast:
    * one-row-per-group is only small when the group column is — with a
    * high-cardinality group the planner must be free to shuffle instead
    * (round-5 ADVICE), and below the autoBroadcast threshold it still
    * picks the broadcast plan on its own.
    */
  def iqrOutliers(df: DataFrame, valueCol: String, groupCol: String,
                  k: Double = 1.5): DataFrame = {
    val v = col(valueCol)
    val fences = df.groupBy(col(groupCol))
      .agg(
        expr(s"percentile($valueCol, 0.25)").as("q1"),
        expr(s"percentile($valueCol, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(k) * (col("q3") - col("q1")))
    df.select(col(groupCol), v)
      .join(fences, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        round(first("q1"), 4).as("q1"),
        round(first("q3"), 4).as("q3"),
        sum(when(v < col("lo") || v > col("hi"), 1L).otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_rows"))
      .orderBy(groupCol)
  }

  /** Winsorized robust statistics per group — the remediation sibling of
    * [[iqrOutliers]] (that one counts the tail, this one shows what the
    * mean looks like with the tail CLAMPED to the [lo, hi] percentile
    * fences): per group, row count, clamped-row count, raw vs winsorized
    * mean, and the two fences. The standard robust-mean report a pipeline
    * reads before deciding whether outliers are data or noise.
    *
    * Determinism: the fences are the same Spark `percentile` ↔ DuckDB
    * `quantile_cont` pair the percentile/IQR queries already hash-match
    * on; they are then cast to the value column's OWN DecimalType
    * (derived from the schema, round-14 ADVICE fix — previously a
    * hard-coded DECIMAL(15,2) that silently quantized other scales and
    * NULLed out-of-range fences under the non-ANSI cast, disabling the
    * clamp) so every comparison and the clamped value itself stay EXACT
    * decimals — the winsorized sum is an order-free DECIMAL(30,6)
    * aggregate, never a float sum (a double clamp would make the mean
    * partition-order dependent). Non-decimal value columns take a
    * documented DECIMAL(30,6) fence — 6-decimal fence quantization on a
    * double/integer input, stated here rather than silent. Callers
    * generating a DuckDB oracle must pass the matching fence type to
    * [[winsorizedOracleSql]]. Doubles appear only in the four final
    * rounded outputs.
    *
    * Scale shape: the [[iqrOutliers]] two-pass — one-row-per-group fence
    * aggregate joined back onto the scan (deliberately NOT hint-forced
    * broadcast: high-cardinality groups must be free to shuffle), then
    * one combining aggregate. No global sort at any scale.
    */
  def winsorizedStats(df: DataFrame, valueCol: String, groupCol: String,
                      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got $lo/$hi")
    val v = col(valueCol)
    val fenceType = df.schema(valueCol).dataType match {
      case d: DecimalType => d
      case _ => DecimalType(30, 6)
    }
    val fences = df.groupBy(col(groupCol))
      .agg(
        expr(s"percentile($valueCol, $lo)").as("plo"),
        expr(s"percentile($valueCol, $hi)").as("phi"))
      .withColumn("plo_d", col("plo").cast(fenceType))
      .withColumn("phi_d", col("phi").cast(fenceType))
    val clamped = when(v < col("plo_d"), col("plo_d"))
      .when(v > col("phi_d"), col("phi_d"))
      .otherwise(v)
    df.select(col(groupCol), v)
      .join(fences, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(v < col("plo_d") || v > col("phi_d"), 1L).otherwise(0L))
          .as("n_clamped"),
        round(sum(v.cast(DecimalType(30, 6))).cast("double") / count(lit(1)), 6)
          .as("mean_raw"),
        round(sum(clamped.cast(DecimalType(30, 6))).cast("double") / count(lit(1)), 6)
          .as("mean_winsorized"),
        round(first("plo"), 4).as("p_lo"),
        round(first("phi"), 4).as("p_hi"))
      .orderBy(groupCol)
  }

  /** Generated DuckDB oracle for [[winsorizedStats]]: the same fence pair,
    * decimal clamp and exact sums replayed. `fenceType` must name the
    * value column's own DecimalType — the type [[winsorizedStats]] derives
    * from the schema (DECIMAL(30,6) for non-decimal value columns). */
  def winsorizedOracleSql(table: String, valueCol: String, groupCol: String,
                          lo: Double = 0.05, hi: Double = 0.95,
                          fenceType: String = "DECIMAL(15,2)"): String =
    s"""WITH f AS (SELECT $groupCol,
       |             quantile_cont($valueCol, $lo) AS plo,
       |             quantile_cont($valueCol, $hi) AS phi
       |           FROM $table GROUP BY $groupCol),
       |fd AS (SELECT $groupCol, plo, phi,
       |              CAST(plo AS $fenceType) AS plo_d,
       |              CAST(phi AS $fenceType) AS phi_d FROM f)
       |SELECT t.$groupCol, COUNT(*) AS n_rows,
       |       CAST(SUM(CASE WHEN $valueCol < plo_d OR $valueCol > phi_d
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
       |       round(CAST(SUM(CAST($valueCol AS DECIMAL(30,6))) AS DOUBLE)
       |             / COUNT(*), 6) AS mean_raw,
       |       round(CAST(SUM(CAST(CASE WHEN $valueCol < plo_d THEN plo_d
       |                                WHEN $valueCol > phi_d THEN phi_d
       |                                ELSE $valueCol END AS DECIMAL(30,6)))
       |                  AS DOUBLE) / COUNT(*), 6) AS mean_winsorized,
       |       round(plo, 4) AS p_lo, round(phi, 4) AS p_hi
       |FROM $table t JOIN fd USING ($groupCol)
       |GROUP BY t.$groupCol, plo, phi
       |ORDER BY t.$groupCol""".stripMargin

  /** Generated DuckDB oracle for [[corrMatrix]] — same sums, same double
    * sequence, one UNION ALL branch per pair off a shared aggregate CTE.
    */
  def corrOracleSql(table: String, cols: Seq[String]): String = {
    def ds(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(30,6))) AS DOUBLE)"
    val pairs = cols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val aggExprs =
      Seq("CAST(COUNT(*) AS DOUBLE) AS _n") ++
        cols.map(c => s"${ds(c)} AS _s_$c") ++
        cols.map(c => s"${ds(s"$c * $c")} AS _ss_$c") ++
        pairs.map { case (a, b) => s"${ds(s"$a * $b")} AS _sp_${a}_$b" }
    val branches = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(_n AS BIGINT) AS n_rows,
         |  CASE WHEN (_n * _ss_$a - _s_$a * _s_$a) > 0 AND (_n * _ss_$b - _s_$b * _s_$b) > 0
         |       THEN (_n * _sp_${a}_$b - _s_$a * _s_$b)
         |            / sqrt((_n * _ss_$a - _s_$a * _s_$a) * (_n * _ss_$b - _s_$b * _s_$b))
         |  END AS r
         |FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (SELECT ${aggExprs.mkString(",\n  ")} FROM $table)
       |$branches
       |ORDER BY col_x, col_y""".stripMargin
  }

  /** MAD (median absolute deviation) outlier report per group — the
    * breakdown-point-0.5 sibling of [[iqrOutliers]]: per group, the exact
    * median, the median of |x − median|, and how many rows sit beyond
    * k · 1.4826 · MAD (1.4826 is the standard consistency constant making
    * MAD estimate σ under normality, so k is in σ-equivalents like
    * [[Events.zscoreAnomalies]]' threshold — but immune to the outliers
    * themselves, which inflate a plain z-score's σ and mask each other).
    *
    * Three passes, each a one-row-per-group aggregate joined back onto the
    * scan (the [[iqrOutliers]] shape, one level deeper because MAD is a
    * percentile OF a percentile-residual): median aggregate → deviation
    * join → MAD aggregate → flag join + combining count. The deviation
    * frame is persisted (released after the first action) because both the
    * MAD aggregate and the final count read it — without the barrier the
    * median join would execute twice. No global sort at any scale; the
    * per-group fence tables are free to broadcast or shuffle as the
    * planner sizes them (high-cardinality groups must not be hint-pinned —
    * the round-5 iqrOutliers lesson).
    *
    * Determinism: Spark `percentile` ↔ DuckDB `quantile_cont` is the
    * established exact pair; deviations and the fence product
    * k·1.4826·mad are identical double sequences on both engines, and the
    * flag compares raw doubles computed from identical operands.
    */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
                  k: Double = 3.0): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val v = col(valueCol)
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = Helpers.releaseAfterFirstAction(
      df.select(col(groupCol), v)
        .join(med, Seq(groupCol))
        .withColumn("adev", abs(v - col("med")))
        .persist())
    val madAgg = dev.groupBy(col(groupCol))
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(madAgg, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("adev") > lit(k) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(first("med"), 4).as("median"),
        round(first("mad"), 4).as("mad"))
      .orderBy(groupCol)
  }

  /** Population stability index per period: how far each period's
    * categorical mix has drifted from the FIRST period's —
    * PSI = Σ_c (p_c − b_c) · ln(p_c / b_c), the industry-standard drift
    * monitor a pipeline reads before trusting a model trained on the
    * baseline mix (rule of thumb: < 0.1 stable, > 0.25 retrain — the
    * `drifted` flag uses the caller's threshold on the ROUNDED psi so a
    * boundary period cannot flip engines).
    *
    * Add-one (Laplace) smoothing over the GLOBAL category set makes every
    * share strictly positive — a category absent from one period
    * contributes a finite term instead of ±∞/NaN, and the complete
    * period×category grid is built from the two tiny post-aggregation
    * distinct frames (never from the raw scan). Each PSI term is ≥ 0 by
    * construction (sign(p−b) = sign(ln(p/b))), rounded to 9 decimals and
    * summed in exact DECIMAL(18,9) — the bm25/surprisal portability
    * contract — then rounded once to 6.
    *
    * Scale shape: ONE (period, cat) combining aggregate over the scan;
    * everything after operates on bounded frames (|periods| × |cats|
    * grid, 1-row category-count broadcast). No windows, no scan re-reads.
    */
  def psiDrift(df: DataFrame, catCol: String, periodCol: Column,
               threshold: Double = 0.1): DataFrame = {
    val counts = df.select(periodCol.as("period"), col(catCol).as("cat"))
      .groupBy("period", "cat").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("period").agg(sum("n").as("tot"))
    val cats = counts.select("cat").distinct()
    val kDf = cats.agg(count(lit(1)).as("_k"))
    val filled = totals.select("period").crossJoin(cats)
      .join(counts, Seq("period", "cat"), "left")
      .join(totals, "period")
      .select(col("period"), col("cat"),
        coalesce(col("n"), lit(0L)).as("n"), col("tot"))
    val basePeriod = totals.agg(min("period").as("_bp"))
    val baseline = filled.join(broadcast(basePeriod), col("period") === col("_bp"))
      .select(col("cat"), col("n").as("bn"), col("tot").as("btot"))
    val p = (col("n") + lit(1)).cast("double") / (col("tot") + col("_k")).cast("double")
    val b = (col("bn") + lit(1)).cast("double") / (col("btot") + col("_k")).cast("double")
    filled.join(baseline, "cat")
      .crossJoin(broadcast(kDf))
      .withColumn("_p", p).withColumn("_b", b)
      .withColumn("_term",
        round((col("_p") - col("_b")) * log(col("_p") / col("_b")), 9)
          .cast(DecimalType(18, 9)))
      .groupBy("period")
      .agg(max("tot").as("n_rows"),
        round(sum("_term").cast("double"), 6).as("psi"))
      .withColumn("drifted", col("psi") > threshold)
      .orderBy("period")
  }

  /** Generated DuckDB oracle for [[psiDrift]]: same grid, same smoothed
    * shares, same round-9 decimal term sum. `periodExpr`/`catExpr` must
    * compute exactly what the Spark call's columns compute. */
  def psiOracleSql(table: String, catExpr: String, periodExpr: String,
                   threshold: Double = 0.1): String =
    s"""WITH src AS (SELECT $periodExpr AS period, $catExpr AS cat FROM $table),
       |counts AS (SELECT period, cat, CAST(COUNT(*) AS BIGINT) AS n
       |           FROM src GROUP BY period, cat),
       |totals AS (SELECT period, CAST(SUM(n) AS BIGINT) AS tot
       |           FROM counts GROUP BY period),
       |cats AS (SELECT DISTINCT cat FROM counts),
       |kk AS (SELECT COUNT(*) AS k FROM cats),
       |filled AS (
       |  SELECT g.period, g.cat, COALESCE(c.n, 0) AS n, t.tot
       |  FROM (SELECT period, cat FROM totals CROSS JOIN cats) g
       |  LEFT JOIN counts c ON g.period = c.period AND g.cat = c.cat
       |  JOIN totals t ON g.period = t.period),
       |bp AS (SELECT min(period) AS bpv FROM totals),
       |base AS (SELECT cat, n AS bn, tot AS btot
       |         FROM filled CROSS JOIN bp WHERE period = bpv),
       |terms AS (
       |  SELECT f.period, f.tot,
       |         CAST(f.n + 1 AS DOUBLE) / CAST(f.tot + k AS DOUBLE) AS p,
       |         CAST(b.bn + 1 AS DOUBLE) / CAST(b.btot + k AS DOUBLE) AS b
       |  FROM filled f JOIN base b ON f.cat = b.cat CROSS JOIN kk)
       |SELECT period, MAX(tot) AS n_rows,
       |       round(CAST(SUM(CAST(round((p - b) * ln(p / b), 9)
       |                          AS DECIMAL(18,9))) AS DOUBLE), 6) AS psi,
       |       round(CAST(SUM(CAST(round((p - b) * ln(p / b), 9)
       |                          AS DECIMAL(18,9))) AS DOUBLE), 6) > $threshold
       |         AS drifted
       |FROM terms GROUP BY period ORDER BY period""".stripMargin

  /** Generated DuckDB oracle for [[madOutliers]]: the same two
    * quantile_cont passes, deviation join and fence comparison replayed
    * operand for operand. */
  def madOracleSql(table: String, valueCol: String, groupCol: String,
                   k: Double = 3.0): String =
    s"""WITH m AS (SELECT $groupCol, quantile_cont($valueCol, 0.5) AS med
       |           FROM $table GROUP BY $groupCol),
       |d AS (SELECT t.$groupCol AS $groupCol, med,
       |             abs($valueCol - med) AS adev
       |      FROM $table t JOIN m USING ($groupCol)),
       |md AS (SELECT $groupCol, quantile_cont(adev, 0.5) AS mad
       |       FROM d GROUP BY $groupCol)
       |SELECT d.$groupCol, COUNT(*) AS n_rows,
       |       CAST(SUM(CASE WHEN adev > $k * 1.4826 * mad
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |       round(med, 4) AS median, round(mad, 4) AS mad
       |FROM d JOIN md USING ($groupCol)
       |GROUP BY d.$groupCol, med, mad
       |ORDER BY d.$groupCol""".stripMargin
}
