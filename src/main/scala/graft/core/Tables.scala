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

  // Catalog-style resolution memo (round 10): `spark.read.parquet` re-runs
  // file listing + footer schema inference on EVERY call — measured at
  // 70-90 ms per table on this host (PerfProbe `floor`) — and Tables.load
  // runs once per table per query per bench rep, so at 177 registered
  // queries the re-resolution alone is ~15-25 s of headline bench total.
  // A real deployment resolves a table ONCE into a catalog (metastore /
  // temp view) and reuses the relation across queries; this memo is that
  // catalog analog for the fixture loader. Fixture dirs are immutable by
  // contract (TESTDATA.md), so a cached listing snapshot cannot go stale.
  // Retention is keyed PER SESSION with weak keys (round-11, from round-10
  // review): the previous single last-session-wins slot meant two
  // concurrently active sessions (parallel suites using newSession)
  // ping-ponged the memo and silently lost all resolution caching. A
  // WeakHashMap keyed by session keeps one map per LIVE session — a
  // stopped/unreferenced session's entry (and its cached plans) falls away
  // with the session itself, so residency stays bounded by live sessions.
  // Only resolution is cached — no data is persisted; every query still
  // scans.
  private val memo =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown fixture table: $name")
    // WeakHashMap is not thread-safe: the brief lock covers only the map
    // lookup; resolution itself runs outside it on the per-session TrieMap.
    val frames = memo.synchronized {
      var m = memo.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        memo.put(spark, m)
      }
      m
    }
    // TrieMap.getOrElseUpdate may resolve twice under a first-load race;
    // both results are equivalent plans, so last-write-wins is harmless.
    frames.getOrElseUpdate((dir, name), resolve(spark, dir, name))
  }

  private def resolve(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The events fixture's `ts` physical type has drifted across fixture
      // regenerations (TIMESTAMP(NANOS) through round 6, TIMESTAMP(MICROS,
      // isAdjustedToUTC=false) since round 8), so the loader adapts to
      // whatever dtype the parquet reader actually produced instead of
      // assuming one era:
      //   - LongType: nanos-as-long era (requires
      //     spark.sql.legacy.parquet.nanosAsLong=true, set at session build
      //     by all entry points and repaired idempotently below). Rebuilt
      //     into a micro-precision timestamp; DIV keeps the arithmetic in
      //     exact integer space (a double loses precision above 2^53 ns).
      //   - TimestampNTZType: micros without UTC adjustment. Cast to the
      //     session-zone timestamp; all entry points pin the session zone
      //     to UTC, matching how the DuckDB oracle reads the same file.
      //   - TimestampType: already what every consumer expects.
      // FixturesSpec pins the post-load schema so the NEXT drift fails one
      // named test instead of every events consumer.
      if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      raw.schema("ts").dataType match {
        case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => raw
        case other => throw new IllegalStateException(
          s"events.ts loaded as unsupported dtype $other — extend Tables.load for this fixture era")
      }
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
