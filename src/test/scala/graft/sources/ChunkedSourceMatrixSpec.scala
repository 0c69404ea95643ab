package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pushdown-shape matrix for the DSv2 connector: every combination of
  * pushable filter × projection × terminal shape, each compared against the
  * IDENTICAL operations over a plain non-DSv2 DataFrame with the same
  * contents. Catalyst decides per-plan which of
  * filters/pruning/aggregates/limit to offer the ScanBuilder — including
  * shapes no direct query spells out (the round-7 RegistrySpec crash came
  * from `groupBy().agg().count()` being pruned to a zero-aggregate GROUP
  * BY before pushdown; this matrix exists so the NEXT unanticipated shape
  * fails here, in a test named after the combination, not in a downstream
  * count). Results must be identical whether or not the source absorbed
  * the work — pushdown is an optimization, never a semantics change.
  */
class ChunkedSourceMatrixSpec extends SparkSpec {

  private val nRows = 1000L
  private val nChunks = 4
  private val per = 250L // ceil(1000/4) — ChunkedScan's per-chunk range width

  private def src: DataFrame =
    spark.read.format("graft.sources.ChunkedSource")
      .option("numRows", nRows).option("numChunks", nChunks).load()

  /** The same deterministic table through the ordinary non-connector path. */
  private def ref: DataFrame =
    spark.range(0, nRows).select(
      col("id"),
      (col("id") / per).cast("int").as("chunk"),
      concat(lit("row-"), col("id").cast("string"),
        lit("-of-chunk-"), (col("id") / per).cast("int").cast("string")).as("payload"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private val filters: Seq[(String, DataFrame => DataFrame)] = Seq(
    "nofilter" -> identity,
    "range" -> (_.filter(col("id") >= 100 && col("id") < 600)),
    "point" -> (_.filter(col("id") === 250)),
    "empty" -> (_.filter(col("id") < 0)),
    "chunk-col" -> (_.filter(col("chunk") === 2)), // NOT pushable — stays in Spark
    "payload" -> (_.filter(col("payload").endsWith("-of-chunk-1"))))

  private val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
    "rows" -> (df => df),
    "prune-id" -> (_.select("id")),
    "prune-payload" -> (_.select("payload")),
    "distinct-chunk" -> (_.select("chunk").distinct()),
    "global-agg" -> (_.agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))),
    "groupby-chunk" -> (_.groupBy("chunk")
      .agg(count(col("id")).as("n"), min("id").as("lo"), max("id").as("hi"))),
    // the pruned-nested-aggregate shape behind the round-7 crash
    "groupby-then-count" -> (df => {
      val n = df.groupBy("chunk").agg(count(lit(1)).as("n")).count()
      df.sparkSession.range(1).select(lit(n).as("n"))
    }),
    "count-distinct" -> (_.agg(countDistinct("chunk").as("d"))), // not pushable
    "sum" -> (_.agg(sum("id").as("s")))) // not pushable

  for ((fName, f) <- filters; (sName, s) <- shapes)
    test(s"matrix: $fName × $sName matches the non-connector reference") {
      assert(canon(s(f(src))) == canon(s(f(ref))),
        s"connector result diverged from reference under $fName × $sName")
    }

  test("runtime V2 filtering: a filtered dim join delivers its key set and prunes whole chunks") {
    // The DPP analog (SupportsRuntimeV2Filtering): the dimension's chunk
    // set is only observable at runtime, yet the scan must plan ONLY the
    // matching chunk partitions. Dim is tiny (broadcast side), its filter
    // selective — the shape PartitionPruning plants a DynamicPruningSubquery
    // for.
    ChunkedRuntimeFilterProbe.reset()
    val dim = spark.range(0, nChunks).select(col("id").cast("int").as("chunk"),
        (col("id") * 10).as("weight"))
      .filter(col("weight") === 20) // selects exactly chunk 2
    val rows = src.join(dim, "chunk").collect()
    val planned = ChunkedRuntimeFilterProbe.lastPlannedChunks
    val received = ChunkedRuntimeFilterProbe.lastReceived
    // semantics first: identical to the non-connector reference join
    assert(rows.length == per && rows.forall(_.getAs[Int]("chunk") == 2),
      s"join result wrong: ${rows.length} rows")
    // the runtime key set must actually arrive at the scan...
    assert(received.nonEmpty, "no runtime predicate was delivered to the scan")
    assert(received.mkString(",").contains("chunk"),
      s"runtime predicate should target the chunk attribute: $received")
    // ...and whole chunks must drop out of the plan before any row is read
    assert(planned == Seq(2),
      s"runtime filter should prune the chunk list to Seq(2), planned: $planned")
  }

  test("runtime V2 filtering: an unsupported runtime shape is safely ignored (no pruning, same rows)") {
    // contract: runtime predicates are an optimization — a shape the scan
    // cannot fold must not change results, and pruning simply doesn't occur
    ChunkedRuntimeFilterProbe.reset()
    val dim = spark.range(0, nChunks)
      .select((col("id") % 2).cast("string").as("payload_suffix"))
      .filter(col("payload_suffix") === "1")
    val joined = src.filter(col("id") < 10)
      .join(dim, col("payload").endsWith(col("payload_suffix")))
    val n = joined.count()
    val want = ref.filter(col("id") < 10)
      .join(dim, col("payload").endsWith(col("payload_suffix"))).count()
    assert(n == want, s"non-equi join through the connector diverged: $n vs $want")
  }

  test("matrix: limit composes with filters (partial pushdown keeps exact k)") {
    for ((fName, f) <- filters) {
      val full = f(ref).count()
      val k = math.min(7L, full)
      val got = f(src).limit(7).collect()
      assert(got.length == k, s"limit under $fName returned ${got.length}, want $k")
      // the k rows must be genuine table rows (readers clamp, never invent)
      val valid = canon(f(ref)).toSet
      assert(got.map(_.toSeq.map(String.valueOf).mkString("|")).forall(valid),
        s"limit under $fName returned rows outside the table")
    }
  }
}
