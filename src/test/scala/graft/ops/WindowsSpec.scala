package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {

  test("priceQuartiles: partitioned window — tile sizes per brand differ by at most 1") {
    val part = Tables.part(spark, sfDir)
    val out = Windows.priceQuartiles(part).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    out.groupBy(_._1).foreach { case (brand, rows) =>
      val sizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
      val vals = sizes.values
      assert(vals.max - vals.min <= 1, s"brand $brand tile sizes $sizes")
    }
    // plan must not contain an unpartitioned window (single-task sort):
    // inspect the physical WindowExec nodes' partition specs directly — a
    // string match on the plan text cannot distinguish empty from nonempty
    val windows = Windows.priceQuartiles(part).queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec
    }
    assert(windows.nonEmpty, "expected a WindowExec in the plan")
    windows.foreach(ps => assert(ps.nonEmpty, "unpartitioned window in plan"))
  }

  test("relativeStanding: pct_rank/cume span (0..1], partitioned window, SQL-definition exact") {
    val part = Tables.part(spark, sfDir)
    val out = Windows.relativeStanding(part).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    out.groupBy(_._1).foreach { case (brand, rows) =>
      assert(rows.map(_._2).min == 0.0, s"$brand: first row must have pct_rank 0")
      assert(rows.map(_._3).max == 1.0, s"$brand: last row must have cume_dist 1")
      assert(rows.forall { case (_, pr, cd) => pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0 })
      // (rank-1)/(n-1) and rank/n against a driver recompute on one brand
      val n = rows.length
      if (n > 1) {
        val expected = (0 until n).map(i =>
          (BigDecimal(i.toDouble / (n - 1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            BigDecimal((i + 1).toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        assert(rows.map(r => (r._2, r._3)).sortBy(_._1).toSeq == expected,
          s"$brand standing mismatch")
      }
    }
    val windows = Windows.relativeStanding(part).queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec
    }
    assert(windows.nonEmpty && windows.forall(_.nonEmpty), "unpartitioned window in plan")
  }

  test("priceBuckets: value-based global quartiles, monotone in price, no window in plan") {
    val part = Tables.part(spark, sfDir)
    val priced = Windows.priceBuckets(part)
      .join(part.select("p_partkey", "p_retailprice"), "p_partkey")
      .collect().map(r => (r.getDouble(2), r.getLong(1))).sortBy(_._1)
    assert(priced.forall { case (_, b) => b >= 1 && b <= 4 })
    assert(priced.map(_._2).sliding(2).forall {
      case Array(a, b) => a <= b
      case _ => true
    }, "bucket not monotone in price")
    // ~n/4 per bucket (ties can shift boundaries slightly)
    val n = priced.length
    val counts = priced.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts.size == 4)
    counts.values.foreach(c => assert(math.abs(c - n / 4.0) <= n * 0.05 + 2))
    val plan = Windows.priceBuckets(part).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("window"), "priceBuckets should not use a window")
  }

  test("partitionSortedOrders: range partition + local sort emits global order") {
    val orders = Tables.orders(spark, sfDir)
    val rows = Windows.partitionSortedOrders(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == orders.count())
    assert(rows.sameElements(rows.sorted), "emitted order is not globally sorted")
  }

  test("smoothedPrice: centered +-2 frame, truncated at partition edges") {
    import spark.implicits._
    import java.sql.Timestamp
    val d = (1 to 5).map(i =>
        (1L, i.toLong, Timestamp.valueOf(f"2024-01-0$i 00:00:00"), i * 10.0)) :+
      ((2L, 9L, Timestamp.valueOf("2024-01-01 00:00:00"), 70.0))
    val df = d.toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val out = Windows.smoothedPrice(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 1L)) == (10.0 + 20 + 30) / 3)       // left edge: 3-row frame
    assert(out((1L, 3L)) == (10.0 + 20 + 30 + 40 + 50) / 5) // full 5-row frame
    assert(out((1L, 5L)) == (30.0 + 40 + 50) / 3)       // right edge
    assert(out((2L, 9L)) == 70.0, "singleton partition averages itself")
  }
}
