package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The typed-cogroup determinism obligations (see Typed scaladoc): group
  * iterator order must not leak into results, and zero-order keys follow
  * the left-cogroup shape.
  */
class TypedSpec extends SparkSpec {

  test("customerOrderRollup: partitioning-invariant and preserves zero-order customers") {
    val spark2 = spark
    import spark2.implicits._
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq((1L, 10.5), (1L, 20.25), (3L, 5.0))
      .toDF("o_custkey", "o_totalprice")
    val a = Typed.customerOrderRollup(customer, orders).collect().toSeq
    val b = Typed.customerOrderRollup(
      customer.repartition(5), orders.repartition(7)).collect().toSeq
    assert(a == b, "BigDecimal accumulation must make the rollup order-free")
    val byKey = a.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byKey(1L) == ((2L, 30.75)))
    assert(byKey(2L) == ((0L, 0.0)), "zero-order customer must survive with zeros")
    assert(byKey(3L) == ((1L, 5.0)))
  }

  test("customerOrderRollup: orphan order keys (no customer row) are skipped") {
    val spark2 = spark
    import spark2.implicits._
    val customer = Seq(1L).toDF("c_custkey")
    val orders = Seq((1L, 1.0), (99L, 2.0)).toDF("o_custkey", "o_totalprice")
    val keys = Typed.customerOrderRollup(customer, orders).collect().map(_.getLong(0)).toSet
    assert(keys == Set(1L))
  }
}
