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
  // Retention is keyed PER SESSION (round-11, from round-10 review): the
  // previous single last-session-wins slot meant two concurrently active
  // sessions (parallel suites using newSession) ping-ponged the memo and
  // silently lost all resolution caching. Round-12 (from round-11 review):
  // the per-session keying must NOT be a WeakHashMap keyed by the session —
  // the cached DataFrames strongly reference their SparkSession, so a
  // value→key chain kept every weak key reachable forever and the map grew
  // with every session ever created. Instead the key is `sessionUUID` (a
  // plain String holding no session reference) and retention is explicitly
  // bounded two ways:
  //   - stopped sessions are swept on every access (an `isStopped` flag
  //     read per resident entry — entries are capped, so O(8) per load);
  //   - the map is a small access-ordered LRU over sessions (parallel
  //     suites run a handful of concurrent sessions; the 178-session
  //     churn of a full test run retains only the live tail).
  // Only resolution is cached — no data is persisted; every query still
  // scans.
  private val maxSessions = 8
  private val memo =
    new java.util.LinkedHashMap[String,
        (SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame])](
        16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String,
            (SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame])])
        : Boolean = size() > maxSessions
    }

  /** Test hook: resident session entries (bounded by `maxSessions`). */
  private[graft] def memoSessionCount: Int = memo.synchronized(memo.size())

  // `sessionUUID` is private[sql], so it routes through the bridge; the
  // identity-hash fallback keeps the key total for any non-classic
  // SparkSession implementation without referencing the session itself.
  private def sessionKey(spark: SparkSession): String =
    try org.apache.spark.sql.GraftSqlBridge.sessionUUID(spark)
    catch { case _: ClassCastException =>
      "idhash-" + System.identityHashCode(spark).toHexString }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown fixture table: $name")
    // LinkedHashMap is not thread-safe: the brief lock covers the sweep and
    // lookup; resolution itself runs outside it on the per-session TrieMap.
    val frames = memo.synchronized {
      val it = memo.values.iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
      var m = memo.get(sessionKey(spark))
      if (m == null) {
        m = (spark, scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
        memo.put(sessionKey(spark), m)
      }
      m._2
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
