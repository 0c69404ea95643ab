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
}
