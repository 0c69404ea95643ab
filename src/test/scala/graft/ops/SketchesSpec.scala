package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("weekly rollup from daily sketches == sketching the week directly (merge algebra)") {
    val ev = Tables.events(spark, sfDir)
    val merged = Sketches.weeklyDistinctUsers(ev).collect().toSeq
    val direct = Sketches.weeklyDistinctUsersDirect(ev).collect().toSeq
    assert(merged.nonEmpty)
    assert(merged == direct,
      "union of daily sketches must estimate identically to the direct weekly sketch")
  }

  test("sketch estimates stay within HLL error of the exact distinct counts") {
    val ev = Tables.events(spark, sfDir)
    val est = Sketches.weeklyDistinctUsers(ev).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = ev
      .select(unix_timestamp(date_trunc("week", col("ts"))).as("week"),
        col("event_type"), col("user_id"))
      .groupBy("week", "event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val e = est(k).toDouble
      // lgK=12 -> relative standard error ~1.6%; 5 sigma guard band
      assert(math.abs(e - n) <= math.max(2.0, 0.08 * n),
        s"$k: estimate $e too far from exact $n")
    }
  }

  test("weeklyDistinctReport: exact counts with every union-rollup estimate in bound") {
    val ev = Tables.events(spark, sfDir)
    val report = Sketches.weeklyDistinctReport(ev).collect()
    assert(report.nonEmpty)
    val exact = ev
      .select(unix_timestamp(date_trunc("week", col("ts"))).as("week"),
        col("event_type"), col("user_id"))
      .groupBy("week", "event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(report.map(r => (r.getLong(0), r.getString(1))).toSet == exact.keySet)
    report.foreach { r =>
      assert(r.getLong(2) == exact((r.getLong(0), r.getString(1))),
        s"n_exact must be the true distinct count at ${(r.getLong(0), r.getString(1))}")
      assert(r.getDouble(3) == Sketches.relErrBound(12, 3.0))
      assert(r.getBoolean(4),
        s"estimate out of declared bound at ${(r.getLong(0), r.getString(1))}")
    }
  }
}
