package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (see TESTDATA.md / FIXTURES.md).
  *
  * Reference analog: `BigQueryTable` (reference bqfetch/bqfetch.py:20-41) is a
  * pure (project, dataset, table) path triple; here a table is identified by
  * (scale-factor dir, name) and materializes lazily as a DataFrame. In
  * production the same call sites would be `spark.read.format("bigquery")` /
  * a catalog table; the engine code is source-agnostic — everything operates
  * on DataFrames.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown fixture table: $name")
    if (name == "events") {
      // fixture ts is TIMESTAMP(NANOS) which Spark's parquet reader rejects
      // without spark.sql.legacy.parquet.nanosAsLong=true. All entry points
      // set it at session BUILD (Bench/Verify/Smoke/PlanAudit/TestSpark);
      // the guard below only repairs sessions built elsewhere — idempotent,
      // so our own sessions see no per-call conf mutation. The nanos arrive
      // as long and are rebuilt into a micro-precision timestamp. DIV keeps
      // the arithmetic in exact integer space (a double would lose
      // precision above 2^53 ns).
      if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
