package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine: symmetric, 1.0 for parallel vectors, 0 for orthogonal") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)), (3L, Seq(0.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineDupPairs(df, -1.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) == 0.0)
    assert(out((2L, 3L)) == 0.0)
  }

  test("quantizeInt8: codes in [0,255], exact on constant dims, matches a driver-side recompute") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0f, 10.0f, 7.0f)),
      (2L, Seq(1.0f, 10.0f, -3.0f)),
      (3L, Seq(0.5f, 10.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, dim = 3).collect()
    val codes = out.map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(_.forall(c => c >= 0 && c <= 255)))
    // dim 1 spans [0,1]: scale 1/255, code = round(x*255)
    assert(codes(1L)(0) == 0 && codes(2L)(0) == 255 && codes(3L)(0) == 128)
    // dim 2 is CONSTANT: code 0, scale 1 => reconstruction exact
    assert(codes.values.forall(_.apply(1) == 0))
    // per-vector error bound: half of the largest dimension scale
    val maxScale = math.max(1.0 / 255, 13.0 / 255) // dim spans: [0,1], const, [-3,10]
    out.foreach(r => assert(r.getDouble(3) <= maxScale / 2 + 1e-9,
      s"vec ${r.getLong(0)} err ${r.getDouble(3)} exceeds scale/2"))
    // driver recompute of vec 2's reconstructed norm
    val recon2 = Seq(0.0 + 255 * (1.0 / 255), 10.0, -3.0 + math.round((-3.0 + 3.0) / (13.0 / 255)) * (13.0 / 255))
    val expNorm = BigDecimal(math.sqrt(recon2.map(x => x * x).sum))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.find(_.getLong(0) == 2L).get.getDouble(2) == expNorm)
  }

  test("quantizeInt8 on the fixture: error bounded by half the widest dimension span / 255") {
    val e = Tables.embeddings(spark, sfDir)
    val out = Similarity.quantizeInt8(e).collect()
    assert(out.length == e.count())
    val errs = out.map(_.getDouble(3))
    assert(errs.forall(_ >= 0.0))
    // embeddings are unit-ish vectors: every dimension spans < 2.5, so no
    // per-vector error can exceed 2.5/255/2
    assert(errs.max <= 2.5 / 255 / 2 + 1e-9, s"max err ${errs.max}")
  }

  test("norms: all positive, matches hand-computed value") {
    import spark.implicits._
    val df = Seq((1L, Seq(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val out = Similarity.norms(df).collect()
    assert(out.head.getDouble(1) == 5.0)
    val fixture = Similarity.norms(Tables.embeddings(spark, sfDir)).collect()
    assert(fixture.forall(_.getDouble(1) > 0))
  }

  test("cosineTopK: neighbors are sorted by sim desc and exclude self") {
    val e = Tables.embeddings(spark, sfDir)
    val rows = Similarity.cosineTopK(e, nQueries = 5, k = 3).collect()
    assert(rows.length == 15)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val sims = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
      assert(rs.forall(_.getLong(1) != qid))
    }
  }

  test("annTopK: returns a subset of candidates with exact sims; top-1 recall vs brute force is sane") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = Similarity.cosineTopK(e, nQueries = 20, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ann = Similarity.annTopK(e, nQueries = 20, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // (L=8, b=4) multi-table LSH: expected top-1 recall ~0.8 at cos≈0.45;
    // assert a conservative floor, not equality (it IS approximate)
    val hits = ann.count { case (q, c) => exact.get(q).contains(c) }
    assert(ann.size >= 15)
    assert(hits >= 6, s"ANN top-1 recall too low: $hits of ${ann.size}")
  }

  test("ivfTopK: probing more cells converges toward brute force") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = Similarity.cosineTopK(e, nQueries = 20, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val few = Similarity.ivfTopK(e, nQueries = 20, k = 1, nCells = 16, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val all = Similarity.ivfTopK(e, nQueries = 20, k = 1, nCells = 16, nProbe = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // probing every cell = exhaustive search = brute-force answer
    assert(all == exact)
    val hitsFew = few.count { case (q, c) => exact.get(q).contains(c) }
    assert(hitsFew >= 5, s"IVF nProbe=4 recall too low: $hitsFew of ${few.size}")
  }

  test("ivfTopK: partitioning-invariant (decimal-exact Lloyd means)") {
    // before the Lloyd mean ran through DECIMAL(38,18) this did NOT hold:
    // a double avg() sums in partial-aggregation order, so the trained
    // centroids (and borderline cell assignments) shifted with the input
    // partitioning — the same property the replay oracle depends on
    val e = Tables.embeddings(spark, sfDir)
    val base = Similarity.ivfTopK(e, nQueries = 20, k = 5).collect().toSeq
    val repart = Similarity.ivfTopK(e.repartition(7), nQueries = 20, k = 5).collect().toSeq
    assert(base == repart, "IVF result must not depend on input partitioning")
  }

  test("annRecallReport: all three method floors hold; recall arithmetic matches a driver recount") {
    val e = Tables.embeddings(spark, sfDir)
    val report = Similarity.annRecallReport(e, 20, 5).collect()
    assert(report.map(_.getString(0)).toSeq == Seq("ivf", "lsh", "pq"))
    report.foreach { r =>
      assert(r.getLong(1) == 20 && r.getLong(2) == 5)
      assert(r.getBoolean(4), s"${r.getString(0)} recall below its declared floor")
    }
    // recount one leg driver-side: lsh hits over the exact set
    val exact = Similarity.cosineTopK(e, 20, 5).select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshHits = Similarity.annTopK(e, 20, 5).select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).count(exact.contains)
    val floor = 0.55 // the declared lsh default
    assert((lshHits.toDouble / exact.size >= floor) ==
      report.find(_.getString(0) == "lsh").get.getBoolean(4))
  }

  test("lshFidelityReport: every structural guarantee and recall floor holds") {
    val report = Similarity.lshFidelityReport(Tables.embeddings(spark, sfDir)).collect()
    assert(report.map(_.getString(0)).toSeq ==
      Seq("knn_top1", "pair_graph", "semantic_keeplist"))
    report.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: structural guarantee VIOLATED (real bug)")
      assert(r.getBoolean(4), s"${r.getString(0)}: recall below declared floor")
    }
  }

  test("dashboard probe memoization: refreshes reuse artifacts bit-identically; clear releases") {
    val e = Tables.embeddings(spark, sfDir)
    ProbeCache.clear()
    val first = Similarity.lshFidelityReport(e).collect().toSeq
    val afterFirst = ProbeCache.size
    assert(afterFirst >= 6, s"expected the six fidelity artifacts cached, got $afterFirst")
    // a refresh over a semantically-equal input must hit every entry
    // (no growth) and report BIT-IDENTICAL rows — and the hit counter the
    // bench's `memoized` marker brackets must advance
    val hits0 = ProbeCache.hits
    val second = Similarity.lshFidelityReport(Tables.embeddings(spark, sfDir)).collect().toSeq
    assert(ProbeCache.size == afterFirst, "refresh over same input must not rebuild artifacts")
    assert(ProbeCache.hits > hits0, "a memoized refresh must register on the hit counter")
    assert(second == first)
    // a DIFFERENT probe parameterization (tighter cap → different bounded
    // plan) must MISS — memoization never crosses input semantics
    Similarity.lshFidelityReport(e, maxVectors = 100L).collect()
    assert(ProbeCache.size > afterFirst, "different probe cap must rebuild, not reuse")
    val recall = Similarity.annRecallReport(e, 20, 5).collect().toSeq
    val afterRecall = ProbeCache.size
    assert(Similarity.annRecallReport(e, 20, 5).collect().toSeq == recall)
    assert(ProbeCache.size == afterRecall)
    ProbeCache.clear()
    assert(ProbeCache.size == 0)
    // artifacts rebuild cleanly after a clear (released checkpoints are
    // never referenced again)
    assert(Similarity.lshFidelityReport(e).collect().toSeq == first)
    ProbeCache.clear()
  }

  test("pqTopK: recall@5 floor vs brute force; partitioning-invariant; coarser codes degrade") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = Similarity.cosineTopK(e, nQueries = 20, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pq5 = Similarity.pqTopK(e, nQueries = 20, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byQ = pq5.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // defaults m=16, ks=64 → 12-byte codes: measured recall@5 = 17/20 on
    // the fixture (deterministic sample + Lloyd init); conservative floor
    val hits = exact.count { case (q, c) => byQ.get(q).exists(_.contains(c)) }
    assert(byQ.size >= 15)
    assert(hits >= 14, s"PQ recall@5 too low: $hits of ${exact.size}")
    // candidate emission is partitioning-invariant after the global re-rank
    val repart = Similarity.pqTopK(e.repartition(7), nQueries = 20, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(repart.toSeq == pq5.toSeq, "PQ result must not depend on input partitioning")
    // the compression knob trades recall monotonically enough to matter:
    // 4-byte codes (m=8, ks=16) must not beat the 12-byte default
    val coarse = Similarity.pqTopK(e, nQueries = 20, k = 5, m = 8, ks = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val coarseByQ = coarse.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val coarseHits = exact.count { case (q, c) => coarseByQ.get(q).exists(_.contains(c)) }
    assert(coarseHits <= hits, s"coarser codes should not beat finer: $coarseHits vs $hits")
  }

  test("labelCentroids: typed Aggregator computes the element-wise mean") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(2.0f, 0.0f), 0), (2L, Seq(4.0f, 0.0f), 0),
      (3L, Seq(0.0f, 10.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroids(df).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    assert(out(0) == 3.0)  // mean of (2,0) and (4,0) = (3,0), norm 3
    assert(out(1) == 10.0)
  }

  test("cosineDupPairs: block-partitioned plan — equi-join, no nested-loop/cartesian") {
    val e = Tables.embeddings(spark, sfDir)
    val plan = Similarity.cosineDupPairs(e, 0.4).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "all-pairs fell back to BNLJ")
    assert(!plan.contains("CartesianProduct"), "all-pairs fell back to cartesian")
  }

  test("cosineDupPairs: block-partitioned join equals the naive all-pairs result") {
    val e = Tables.embeddings(spark, sfDir)
    val out = Similarity.cosineDupPairs(e, 0.4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // naive reference computed driver-side from the raw vectors (test-only)
    val vecs = e.collect().map(r => (r.getLong(0),
      r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)).sortBy(_._1)
    def nrm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val expected = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      (ia, va) = vecs(i); (ib, vb) = vecs(j)
      sim = va.zip(vb).map { case (x, y) => x * y }.sum / (nrm(va) * nrm(vb))
      if sim >= 0.4
    } yield ((ia, ib), math.rint(sim * 1e6) / 1e6)).toMap
    assert(out.keySet == expected.keySet)
    out.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-9) }
  }

  test("cosinePairsLsh: subset of exact pairs with exact sims; near-total recall at fixture params") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = Similarity.cosineDupPairs(e, 0.4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Similarity.cosinePairsLsh(e, 0.4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // no false positives (candidates are verified with exact cosine) ...
    assert(lsh.keySet.subsetOf(exact.keySet))
    lsh.foreach { case (k, v) => assert(v == exact(k)) }
    // ... and (L=24, b=2) detection prob >= 1-5e-6 per pair at sim 0.4:
    // deterministic seed, so recall on the fixture is a fixed number
    assert(lsh.size >= math.ceil(exact.size * 0.95).toInt,
      s"LSH recall too low: ${lsh.size} of ${exact.size}")
  }

  test("cosinePairsLsh high-threshold regime: near-total recall on the synthetic near-dup corpus") {
    val aug = Similarity.withSyntheticNearDups(Tables.embeddings(spark, sfDir))
    val exact = Similarity.cosineDupPairs(aug, 0.9).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Similarity.cosinePairsLsh(aug, 0.9, nTables = 8, bitsPerTable = 8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // the augmentation plants ~one >=0.9 pair per vector (cos ≈ 1/√(1+α²))
    assert(exact.size >= 400, s"expected planted pairs, got ${exact.size}")
    // exact verification => no false positives, identical sims
    assert(lsh.keySet.subsetOf(exact.keySet))
    lsh.foreach { case (k, v) => assert(v == exact(k)) }
    // (L=8, b=8) at cos≈0.97: per-pair detection ≥0.99; deterministic seed
    assert(lsh.size >= math.ceil(exact.size * 0.95).toInt,
      s"LSH recall too low: ${lsh.size} of ${exact.size}")
  }

  test("semanticDedupKeepList over LSH pairs: survivors are a superset of the exact form's") {
    val aug = Similarity.withSyntheticNearDups(Tables.embeddings(spark, sfDir))
    val exactKept = Similarity.semanticDedupKeepList(aug, 0.9)
      .collect().map(_.getLong(0)).toSet
    val lshKept = Similarity.semanticDedupKeepList(aug,
        Similarity.cosinePairsLsh(aug, 0.9, nTables = 8, bitsPerTable = 8, sorted = false))
      .collect().map(_.getLong(0)).toSet
    // every LSH edge is a real edge (exact verification), so every doc the
    // LSH form drops is also dropped by the exact form — never the reverse
    assert(exactKept.subsetOf(lshKept))
    // and near-total recall keeps the over-retention tiny
    assert((lshKept -- exactKept).size <= math.max(5, exactKept.size / 20),
      s"LSH kept ${(lshKept -- exactKept).size} extra survivors")
  }

  test("labelCohesion: closed form matches the pairwise formulation") {
    val e = Tables.embeddings(spark, sfDir)
    val closed = Similarity.labelCohesion(e).collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getLong(2)))).toMap
    val pairwise = Similarity.labelCohesionPairwise(e).collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(closed.keySet == pairwise.keySet)
    closed.foreach { case (label, (sim, nPairs)) =>
      assert(nPairs == pairwise(label)._2)
      assert(math.abs(sim - pairwise(label)._1) <= 2e-6,
        s"label $label: closed $sim vs pairwise ${pairwise(label)._1}")
    }
  }

  test("labelCohesion: one row per label, pair counts match n*(n-1)/2") {
    val e = Tables.embeddings(spark, sfDir)
    val counts = e.groupBy("label").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val out = Similarity.labelCohesion(e).collect()
    assert(out.length == counts.size)
    out.foreach { r =>
      val n = counts(r.getInt(0))
      assert(r.getLong(2) == n * (n - 1) / 2)
    }
  }

  test("semanticDedupKeepList: exactly the component-minimum of the cosine pair graph survives") {
    val e = Tables.embeddings(spark, sfDir)
    val kept = Similarity.semanticDedupKeepList(e, 0.4).collect().map(_.getLong(0)).toSet
    // independent driver-side union-find over the exact pair graph
    val pairs = Similarity.cosineDupPairs(e, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    val dropped = nodes.filter(v => find(v) != v).toSet
    val all = e.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dropped.nonEmpty, "fixture should contain at least one semantic dup")
    assert(kept == all -- dropped)
  }

  test("semanticDedupKeepList: an empty pair graph (threshold > 1) keeps every vector") {
    val e = Tables.embeddings(spark, sfDir)
    val kept = Similarity.semanticDedupKeepList(e, 1.01).collect().map(_.getLong(0)).toSet
    val all = e.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == all)
  }

  test("knnGraph: exactly k ranked neighbors per node; agrees with cosineTopK on the query prefix") {
    val e = Tables.embeddings(spark, sfDir)
    val g = Similarity.knnGraph(e, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val n = e.count()
    assert(g.groupBy(_._1).size == n, "every node must appear")
    g.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.length == 5, s"node $id: ${rows.length} neighbors")
      assert(rows.map(_._4).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    }
    // the independent brute-force ranker (broadcast-queries formulation)
    // must produce identical edges for the nodes it covers
    val ct = Similarity.cosineTopK(e, nQueries = 5, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(g.filter(_._1 < 5).toSet == ct)
  }

  test("knnGraphLsh: top-1 sim never beats exact; top-1 recall floor at (L=8, b=4)") {
    val e = Tables.embeddings(spark, sfDir)
    val exact1 = Similarity.knnGraph(e, k = 1).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val lsh1 = Similarity.knnGraphLsh(e, k = 1).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    lsh1.foreach { case (id, (_, sim)) =>
      assert(sim <= exact1(id)._2 + 1e-9, s"node $id: LSH sim beats exact optimum")
    }
    val hits = lsh1.count { case (id, (nb, _)) => exact1(id)._1 == nb }
    // same hash family as annTopK (~0.8 expected top-1 recall at the
    // fixture's ~0.45 neighbor cosines); conservative floor at half
    assert(hits * 2 >= lsh1.size, s"kNN-graph LSH top-1 recall too low: $hits of ${lsh1.size}")
  }

  test("quadratic anchors fail fast above the row cap and name their LSH sibling") {
    val e = Tables.embeddings(spark, sfDir)
    val capKey = "spark.graft.quadraticAnchorMaxRows"
    spark.conf.set(capKey, "10")
    try {
      val exKnn = intercept[Similarity.QuadraticAnchorException] {
        Similarity.knnGraph(e, k = 1).count()
      }
      assert(exKnn.getMessage.contains("knnGraphLsh"))
      val exPairs = intercept[Similarity.QuadraticAnchorException] {
        Similarity.cosineDupPairs(e, 0.4).count()
      }
      assert(exPairs.getMessage.contains("cosinePairsLsh"))
      // the threshold form of semanticDedupKeepList goes through the same
      // exact pair join, so the fence covers it transitively
      intercept[Similarity.QuadraticAnchorException] {
        Similarity.semanticDedupKeepList(e, 0.4).count()
      }
      // raising the cap back re-enables the oracle run
      spark.conf.set(capKey, Similarity.QuadraticAnchorDefaultMaxRows.toString)
      assert(Similarity.knnGraph(e, k = 1).count() > 0)
    } finally spark.conf.unset(capKey)
  }

  test("kmeansPrototypes: shape invariants and partitioning invariance") {
    val e = Tables.embeddings(spark, sfDir)
    val out = Similarity.kmeansPrototypes(e, nCells = 8, perCell = 3).collect()
    assert(out.nonEmpty)
    // per-cell: at most perCell rows, rn contiguous from 1, centrality
    // non-increasing within the cell
    out.groupBy(_.getLong(0)).foreach { case (cell, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.length <= 3, s"cell $cell emitted ${sorted.length} rows")
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length).toSeq)
      val cents = sorted.map(_.getDouble(2)).toSeq
      assert(cents == cents.sorted.reverse, s"cell $cell centrality not ranked: $cents")
      assert(sorted.map(_.getLong(4)).distinct.length == 1, "cell_n must be constant per cell")
    }
    // cell populations partition the corpus
    val n = e.count()
    val popSum = out.map(r => (r.getLong(0), r.getLong(4))).distinct.map(_._2).sum
    assert(popSum == n, s"cell populations must sum to the corpus: $popSum vs $n")
    // decimal-exact Lloyd means make the trained prototypes partitioning-
    // invariant — the same contract the IVF oracle depends on
    val shuffled = Similarity.kmeansPrototypes(
      e.repartition(13), nCells = 8, perCell = 3).collect()
    assert(out.map(_.toSeq).toSeq == shuffled.map(_.toSeq).toSeq,
      "kmeansPrototypes must not depend on input partitioning")
  }

  test("decontaminateSemantic: copies and paraphrases of benchmark vectors drop, orthogonal content survives") {
    val spark2 = spark
    import spark2.implicits._
    val train = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0), "a"),   // = benchmark vector: self-match at 1.0
      (2L, Array(0.9, 0.1, 0.0, 0.0), "a"),   // paraphrase-shaped: cos ~0.994
      (3L, Array(0.0, 1.0, 0.0, 0.0), "a"),   // orthogonal: clean
      (4L, Array(0.0, 0.5, 0.5, 0.0), "a")    // orthogonal: clean
    ).toDF("vec_id", "embedding", "label")
    val bench = Seq((100L, Array(1.0, 0.0, 0.0, 0.0), "b"))
      .toDF("vec_id", "embedding", "label")
    val kept = Similarity.decontaminateSemantic(train, bench, 0.8)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L, 4L), s"kept: $kept")
    // raising the threshold keeps a superset (fewer things count as dirty)
    val keptHi = Similarity.decontaminateSemantic(train, bench, 0.999)
      .collect().map(_.getLong(0)).toSeq
    assert(kept.toSet.subsetOf(keptHi.toSet))
    assert(keptHi == Seq(2L, 3L, 4L), s"only the verbatim copy drops at 0.999: $keptHi")
    // scale contract: the benchmark side is broadcast and the test is a
    // short-circuiting LEFT SEMI — no shuffle of the training corpus
    val plan = Similarity.decontaminateSemantic(train, bench, 0.8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi join in:\n$plan")
  }

  test("hammingTopK: sign-code distances, strict >0 bit rule, cosine rerank order") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (0L, Seq(1.0f, 1.0f, -1.0f, 1.0f)),   // the query (vec_id < nQueries)
      (10L, Seq(2.0f, 2.0f, -2.0f, 2.0f)),  // same signs -> hamming 0, sim 1
      (11L, Seq(1.0f, 1.0f, -1.0f, -1.0f)), // one sign flip -> hamming 1
      (12L, Seq(-1.0f, -1.0f, 1.0f, -1.0f)),// all flipped -> hamming 4, sim -1
      (13L, Seq(0.0f, 1.0f, -1.0f, 1.0f))   // 0.0 is NOT a set bit -> hamming 1
    ).toDF("vec_id", "embedding")
    val out = Similarity.hammingTopK(df, nQueries = 1, k = 4, nCand = 10, dim = 4)
      .collect()
    assert(out.forall(_.getLong(0) == 0L))
    val byCid = out.map(r => r.getLong(1) -> r).toMap
    assert(byCid(10L).getAs[Long]("hamming") == 0L)
    assert(byCid(10L).getAs[Double]("sim") == 1.0)
    assert(byCid(10L).getAs[Long]("rn") == 1L)
    assert(byCid(11L).getAs[Long]("hamming") == 1L)
    assert(byCid(11L).getAs[Double]("sim") == 0.5)
    assert(byCid(13L).getAs[Long]("hamming") == 1L)
    assert(byCid(12L).getAs[Long]("hamming") == 4L)
    assert(byCid(12L).getAs[Double]("sim") == -1.0)
    assert(byCid(12L).getAs[Long]("rn") == 4L, "rerank is by cosine desc")
  }

  test("embedOutlierProfile: hand-computed centroid distances, z-scores, degenerate-label safety") {
    val spark2 = spark
    import spark2.implicits._
    val df = (Seq.tabulate(4)(i => (i.toLong, Seq(0.0f, 0.0f), 0)) :+
      ((4L, Seq(10.0f, 0.0f), 0))) ++ Seq((5L, Seq(3.0f, 3.0f), 1), (6L, Seq(3.0f, 3.0f), 1))
    val out = Similarity.embedOutlierProfile(df.toDF("vec_id", "embedding", "label"), dim = 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    val l0 = out(0)
    // centroid (2,0): dists 2,2,2,2,8 -> mean 3.2, std 2.4, far z = 2.0
    assert(l0.getAs[Long]("n_vectors") == 5L)
    assert(l0.getAs[Double]("mean_dist") == 3.2)
    assert(l0.getAs[Double]("std_dist") == 2.4)
    assert(l0.getAs[Long]("far_vec_id") == 4L)
    assert(l0.getAs[Double]("far_dist") == 8.0)
    assert(l0.getAs[Double]("far_z") == 2.0)
    assert(!l0.getAs[Boolean]("is_outlier"), "threshold is strict >")
    val strict = Similarity.embedOutlierProfile(
      df.toDF("vec_id", "embedding", "label"), zThresh = 1.5, dim = 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(strict(0).getAs[Boolean]("is_outlier"))
    // all-identical label: std 0 -> z defined 0, never flagged
    val l1 = out(1)
    assert(l1.getAs[Double]("std_dist") == 0.0)
    assert(l1.getAs[Double]("far_z") == 0.0 && !l1.getAs[Boolean]("is_outlier"))
  }

  test("hammingTopK: with nCand >= corpus the rerank recovers brute-force cosine top-k exactly") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val n = e.count().toInt
    val viaHamming = Similarity.hammingTopK(e, nQueries = 5, k = 5, nCand = n)
      .select("qid", "cid", "sim", "rn")
    val brute = Similarity.cosineTopK(e, nQueries = 5, k = 5)
      .select("qid", "cid", "sim", "rn")
    assert(viaHamming.exceptAll(brute).isEmpty && brute.exceptAll(viaHamming).isEmpty,
      "full-shortlist Hamming rerank must equal brute-force cosine top-k")
  }

  test("hnswGraph: nested layers, degree caps, deterministic under repartitioning") {
    val e = Tables.embeddings(spark, sfDir)
    val m = 8
    val g = Similarity.hnswGraph(e, m)
    val rows = g.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val byLevel = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lMax = byLevel.keys.max
    // layers nest: every node appearing at level l also appears at l-1
    for (l <- 1 to lMax)
      assert(byLevel(l).subsetOf(byLevel(l - 1)),
        s"level $l members must be a subset of level ${l - 1}")
    // geometric shrink: each upper layer is a strict minority of the base
    for (l <- 1 to lMax)
      assert(byLevel(l).size < byLevel(0).size, s"level $l did not shrink")
    // degree caps: <= 2m at the base layer, <= m above
    rows.groupBy(r => (r._1, r._2)).foreach { case ((l, v), es) =>
      val cap = if (l == 0) 2 * m else m
      assert(es.length <= cap, s"node $v at level $l has ${es.length} > $cap edges")
    }
    // pure function of the corpus: identical under repartitioning
    val g2 = Similarity.hnswGraph(e.repartition(7), m)
    assert(g.exceptAll(g2).isEmpty && g2.exceptAll(g).isEmpty,
      "hnswGraph must be partitioning-invariant")
  }

  test("hnswGraph: fused exact-layer build equals the per-layer knnGraph loop") {
    // round 18: the build fuses every exact-path layer into one block join
    // + per-(level, node) window. This pins bit-identical parity against
    // the pre-r18 reference formulation — a separate knnGraph build and
    // symmetrize/re-cap per layer — over the full fixture corpus.
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir)
    val m = 8
    val fused = Similarity.hnswGraph(e, m)
    // reference: the pre-r18 per-layer loop (exact path only — the fixture
    // corpus sits under exactCap at every layer, as the build's own path
    // decision requires for this comparison to cover the fused code)
    val mL = 1.0 / math.log(m.toDouble)
    val lvl = e.select(col("vec_id"), col("embedding"))
      .withColumn("level", Similarity.hnswLevelForTest(mL, 6))
    val lMax = lvl.agg(max("level")).head().getInt(0)
    val reference = (0 to lMax).map { l =>
      val members = lvl.filter(col("level") >= l).select("vec_id", "embedding")
      val mmax = if (l == 0) 2 * m else m
      assert(members.count() <= 4096L, "fixture layer must take the exact path")
      val knn = Similarity.knnGraph(members, mmax)
      val undirected = knn.select(col("vec_id"), col("neighbor_id"), col("sim"))
        .unionByName(knn.select(col("neighbor_id").as("vec_id"),
          col("vec_id").as("neighbor_id"), col("sim")))
        .groupBy("vec_id", "neighbor_id").agg(max("sim").as("sim"))
      val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("neighbor_id"))
      undirected.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= mmax)
        .select(lit(l).as("level"), col("vec_id"), col("neighbor_id"), col("sim"))
    }.reduce(_ unionByName _)
    val fusedAdj = fused.select("level", "vec_id", "neighbor_id", "sim")
    assert(fusedAdj.exceptAll(reference).isEmpty &&
      reference.exceptAll(fusedAdj).isEmpty,
      "fused exact-layer build must equal the per-layer knnGraph loop")
  }

  test("hnswRecallReport: recall + coverage floors hold; search sims never beat exact") {
    val e = Tables.embeddings(spark, sfDir)
    val report = Similarity.hnswRecallReport(e, 20, 5).collect()
    assert(report.length == 1)
    val r = report.head
    assert(r.getString(0) == "hnsw" && r.getLong(1) == 20 && r.getLong(2) == 5)
    assert(r.getAs[Boolean]("recall_ok"), "hnsw recall below the declared floor")
    assert(r.getAs[Boolean]("full_k_ok"), "some query returned fewer than k results")
    // the graph search returns candidates with EXACT sims, so no result
    // can ever beat the brute-force answer at the same rank
    val exact1 = Similarity.cosineTopK(e, 20, 5).filter(col("rn") === 1)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(2)).toMap
    val graph = Similarity.hnswGraph(e)
    val got1 = Similarity.hnswTopK(e, graph, 20, 5).filter(col("rn") === 1)
      .collect().map(r0 => r0.getLong(0) -> r0.getDouble(2)).toMap
    got1.foreach { case (qid, s) =>
      assert(s <= exact1(qid) + 1e-9, s"query $qid: hnsw top-1 $s beats exact ${exact1(qid)}")
    }
  }

  test("dbscanClusters: core/border/noise semantics on hand graphs; chain merge; minPts=1 edge") {
    import spark.implicits._
    val emb = (1L to 6L).map(i => (i, Seq(1.0f))).toDF("vec_id", "embedding")
    def run(pairs: Seq[(Long, Long)], minPts: Int) =
      Similarity.dbscanClusters(emb, pairs.toDF("id_a", "id_b"), minPts)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    // path 1-2-3 at minPts=3: only 2 is core (deg 2); 1/3 border onto 2's
    // singleton-core cluster; the 4-5 pair and isolated 6 are noise
    val m3 = run(Seq((1L, 2L), (2L, 3L), (4L, 5L)), minPts = 3)
    assert(m3(2L) == ("core", 2L))
    assert(m3(1L) == ("border", 2L) && m3(3L) == ("border", 2L))
    assert(m3(4L) == ("noise", -1L) && m3(5L) == ("noise", -1L) &&
      m3(6L) == ("noise", -1L))
    // longer chain 1-2-3-4 at minPts=3: cores 2,3 share a component
    // labeled min(2,3)=2; 1/4 border to it
    val chain = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), minPts = 3)
    assert(chain(2L) == ("core", 2L) && chain(3L) == ("core", 2L))
    assert(chain(1L) == ("border", 2L) && chain(4L) == ("border", 2L))
    // minPts=2: every paired point is core, components label by min id
    val m2 = run(Seq((1L, 2L), (2L, 3L), (4L, 5L)), minPts = 2)
    assert(Seq(1L, 2L, 3L).forall(m2(_) == ("core", 1L)))
    assert(m2(4L) == ("core", 4L) && m2(5L) == ("core", 4L))
    assert(m2(6L) == ("noise", -1L))
    // minPts=1: every point is core — isolated points become their own
    // singleton clusters, nothing is noise
    val m1 = run(Seq((1L, 2L)), minPts = 1)
    assert(m1(1L) == ("core", 1L) && m1(2L) == ("core", 1L))
    assert(m1(6L) == ("core", 6L))
    // empty pair graph at minPts >= 2: everything is noise
    val m0 = run(Seq.empty, minPts = 2)
    assert((1L to 6L).forall(m0(_) == ("noise", -1L)))
  }

  test("dbscanClusters over LSH pairs on the fixture: pair endpoints co-cluster, labels are component minima") {
    val e = Tables.embeddings(spark, sfDir)
    val aug = Similarity.withSyntheticNearDups(e)
    val pairs = Similarity.cosinePairsLsh(aug, 0.9, sorted = false)
    val out = Similarity.dbscanClusters(aug, pairs, minPts = 2).collect()
    val lab = out.map(r => r.getLong(0) ->
      (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val roles = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    // every emitted pair's endpoints share a cluster and are core
    pairs.select("id_a", "id_b").collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(lab(a) == lab(b) && roles(a) == "core" && roles(b) == "core")
      assert(lab(a) <= math.min(a, b), "cluster label must be a component minimum")
    }
    // unpaired points are noise with null cluster
    val paired = pairs.select("id_a", "id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    out.filterNot(r => paired(r.getLong(0))).foreach { r =>
      assert(r.getString(1) == "noise" && r.isNullAt(2))
    }
  }

  test("hnswGraph: forced-LSH build path (exactCap=0) still yields a searchable graph") {
    val e = Tables.embeddings(spark, sfDir)
    val g = Similarity.hnswGraph(e, m = 8, exactCap = 0L)
    // the banded path may drop bucket-less nodes, but the graph must stay
    // searchable: every query surfaces results with exact sims
    val out = Similarity.hnswTopK(e, g, nQueries = 10, k = 3).collect()
    val perQ = out.groupBy(_.getLong(0))
    assert(perQ.nonEmpty && perQ.values.forall(_.length <= 3))
    assert(out.forall(r => r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9))
  }

  test("bounded-driver-read carve-outs: HNSW entry point collects ≤ 1 row; DBSCAN's probe is existence-only") {
    // The two r16 driver-side reads, pinned so the carve-out inventory
    // stays mechanically checkable (r16 VERDICT #5).
    // (a) hnswTopK's entry point (Similarity.scala, `limit(1).collect()`):
    // the collected frame is the argmax row of a groupBy — the limit
    // bounds it at ≤ 1 row by construction, for ANY graph size.
    val e = Tables.embeddings(spark, sfDir)
    val g = Similarity.hnswGraph(e, m = 8)
    val entryFrame = g.groupBy("vec_id")
      .agg(org.apache.spark.sql.functions.max("level").as("level"))
      .orderBy(col("level").desc, col("vec_id")).limit(1)
    assert(entryFrame.collect().length <= 1,
      "HNSW entry-point read must stay a bounded scalar probe")
    // (b) dbscanClusters' `ccEdges.isEmpty`: Dataset.isEmpty plans as a
    // limit-1 existence probe over the edge table — the driver never
    // materializes more than one row regardless of graph size.
    val probe = g.select(col("vec_id").as("id_a"), col("neighbor_id").as("id_b"))
    assert(probe.limit(1).queryExecution.optimizedPlan
      .collectFirst { case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => l }
      .nonEmpty, "isEmpty-style probes must plan through a global limit")
    assert(probe.limit(1).collect().length <= 1)
  }
}
