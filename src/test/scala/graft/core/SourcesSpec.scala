package graft.core

import java.nio.file.Files

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  test("TableRef resolves through the offline parquet mapping") {
    val ref = TableRef("proj", "ds", "orders")
    assert(ref.fqn == "proj.ds.orders")
    val df = Sources.resolve(spark, ref, sfDir)
    assert(df.count() == Tables.orders(spark, sfDir).count())
  }

  test("csv and json sources round-trip the same relation") {
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val schemaDdl = "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double"
    val base = Files.createTempDirectory("graft_src").toString

    orders.write.option("header", "true").mode("overwrite").csv(s"$base/csv")
    orders.write.mode("overwrite").json(s"$base/json")

    val fromCsv = Sources.readCsv(spark, s"$base/csv", schemaDdl)
    val fromJson = Sources.readJson(spark, s"$base/json", schemaDdl)
    assert(fromCsv.count() == orders.count())
    assert(fromJson.count() == orders.count())
    assert(fromCsv.except(orders).isEmpty && orders.except(fromCsv).isEmpty)
    assert(fromJson.except(orders).isEmpty && orders.except(fromJson).isEmpty)
  }

  test("orc round-trips with schema and type fidelity") {
    val orders = Tables.orders(spark, sfDir)
    val base = Files.createTempDirectory("graft_orc").toString
    orders.write.mode("overwrite").orc(s"$base/orc")
    val fromOrc = spark.read.orc(s"$base/orc")
    assert(fromOrc.schema == orders.schema)
    assert(fromOrc.except(orders).isEmpty && orders.except(fromOrc).isEmpty)
  }
}
