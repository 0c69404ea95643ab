package graft.ops

import graft.SparkSpec
import graft.core.Tables

class PipelinesSpec extends SparkSpec {

  test("curate: stages only remove rows, output is deterministic, packs respect budget") {
    val docs = Tables.documents(spark, sfDir)
    val rates = (10 to 19).map(i => s"src$i" -> 8).toMap
    val out = Pipelines.curate(docs, mixRates = rates)
    val rows = out.collect()
    val again = Pipelines.curate(docs, mixRates = rates).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    assert(rows.nonEmpty && rows.length < docs.count())
    // survivors must be a subset of the dedup keep-list of the gated corpus
    val gateIds = Text.qualityScore(docs)
      .filter(org.apache.spark.sql.functions.col("mean_tok_len").between(4.0, 9.0) &&
        org.apache.spark.sql.functions.col("type_token_ratio") >= 0.3)
      .select("doc_id")
    val keep = Dedup.dedupKeepList(docs.join(gateIds, "doc_id"), 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet.subsetOf(keep))
    // within each (source, pack), tokens after the first row stay under budget + one doc
    rows.groupBy(r => (r.getString(1), r.getLong(4))).foreach { case (_, rs) =>
      val total = rs.map(_.getLong(2)).sum
      val maxDoc = rs.map(_.getLong(2)).max
      assert(total <= 512 + maxDoc, s"pack overflow: $total")
    }
  }
}
