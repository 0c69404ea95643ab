package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import graft.ops.Graph
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming PageRank refresh (round-5 VERDICT stretch): trade-graph edges
  * delivered in prefix batches must produce, at every refresh, EXACTLY the
  * batch pageRank over the edges delivered so far — same edge set, same
  * decimal-exact arithmetic, so equality, not tolerance.
  */
class GraphStreamsSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  private def batchRanks(edges: Seq[GraphStreams.Edge]): Map[Long, Double] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("every refresh equals the batch pageRank over edges-so-far; duplicates don't re-trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      // the trade graph, unweighted: nation -> nation supply edges
      val all = Graph.tradeEdges(Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
          Tables.customer(spark, sfDir), Tables.supplier(spark, sfDir))
        .select(col("src").cast("long"), col("dst").cast("long")).collect()
        .map(r => GraphStreams.Edge(r.getLong(0), r.getLong(1))).toSeq
      assert(all.size > 50, s"trade graph should be dense enough to split: ${all.size}")
      val (c1, rest) = all.splitAt(all.size / 3)
      val (c2, c3) = rest.splitAt(rest.size / 3)

      val refreshes = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Long, Double])]
      val mem = MemoryStream[GraphStreams.Edge]
      val q = GraphStreams.streamingPageRank(mem.toDS(), iters = 5) { (id, ranks) =>
        refreshes += ((id, ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap))
      }
      try {
        mem.addData(c1); q.processAllAvailable()
        // c2 re-delivers some of c1: the first-seen state must swallow them
        mem.addData(c2 ++ c1.take(5)); q.processAllAvailable()
        mem.addData(c3); q.processAllAvailable()
        // pure re-delivery: no new edges -> NO refresh fires
        mem.addData(c1.take(3)); q.processAllAvailable()
      } finally q.stop()

      assert(refreshes.size == 3,
        s"three delta-bearing batches -> three refreshes, got ${refreshes.size}")
      assert(refreshes.map(_._2) ==
        Seq(batchRanks(c1), batchRanks(c1 ++ c2), batchRanks(all)),
        "each refresh must equal the batch pageRank over exactly the edges so far")
    }
  }

  test("durable variant: a restarted query ranks the FULL delivered graph") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ckpt = java.nio.file.Files.createTempDirectory("gs-restart-ckpt").toString
      val target = s"t_restart_edges_${System.nanoTime()}"
      graft.sources.ChunkedSink.drop(target)
      val c1 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).map((GraphStreams.Edge.apply _).tupled)
      val c2 = Seq((4L, 1L), (2L, 4L), (3L, 4L)).map((GraphStreams.Edge.apply _).tupled)
      val refreshes = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Double]]
      val mem = MemoryStream[GraphStreams.Edge]
      def start() = GraphStreams.streamingPageRankDurable(mem.toDS(), target,
        iters = 5, checkpointLocation = Some(ckpt)) { (_, ranks) =>
        refreshes += ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      }
      val q1 = start()
      try { mem.addData(c1); q1.processAllAvailable() } finally q1.stop()
      assert(refreshes.last == batchRanks(c1))
      // NEW incarnation, same checkpoint: the state store recovers (and
      // swallows c1's re-delivery), the edge accumulator is rebuilt from
      // the transactional sink — post-restart refreshes rank ALL edges
      val q2 = start()
      try {
        mem.addData(c2 ++ c1.take(2)); q2.processAllAvailable()
      } finally q2.stop()
      assert(refreshes.last == batchRanks(c1 ++ c2),
        "post-restart refresh must equal the batch pageRank over ALL delivered edges")
      graft.sources.ChunkedSink.drop(target)
    }
  }

  test("demo variant fails fast on checkpoint resume instead of ranking a truncated graph") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ckpt = java.nio.file.Files.createTempDirectory("gs-demo-ckpt").toString
      val mem = MemoryStream[GraphStreams.Edge]
      def start() = GraphStreams.streamingPageRank(mem.toDS(), iters = 5,
        checkpointLocation = Some(ckpt)) { (_, _) => () }
      val q1 = start()
      try { mem.addData(GraphStreams.Edge(1, 2), GraphStreams.Edge(2, 1)); q1.processAllAvailable() }
      finally q1.stop()
      val q2 = start()
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        try { mem.addData(GraphStreams.Edge(2, 3)); q2.processAllAvailable() }
        finally q2.stop()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("streamingPageRankDurable")),
        s"expected the truncated-graph fail-fast, got: $ex")
    }
  }

  test("firstSeenEdges emits each distinct edge once across the whole stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[GraphStreams.Edge]
      val q = GraphStreams.firstSeenEdges(mem.toDS())
        .writeStream.format("memory").queryName("t_first_seen")
        .outputMode("update").start()
      try {
        mem.addData(GraphStreams.Edge(1, 2), GraphStreams.Edge(1, 2), GraphStreams.Edge(2, 3))
        q.processAllAvailable()
        mem.addData(GraphStreams.Edge(1, 2), GraphStreams.Edge(3, 1))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("t_first_seen").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.sorted == Seq((1L, 2L), (2L, 3L), (3L, 1L)),
        s"each distinct edge exactly once: $got")
    }
  }
}
