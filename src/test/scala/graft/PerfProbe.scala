package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway micro-probe (Test scope only, run by hand):
  * `Test/runMain graft.PerfProbe` — times alternative shingle builders at
  * the sf dir in SPARK_GRAFT_SF_DIR.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE $name%-12s run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }

    // current HOF formulation
    def hofShingles(documents: DataFrame): DataFrame = {
      val toks = col("_toks")
      documents
        .withColumn("_toks", regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .select(col("doc_id"),
          array_distinct(transform(filter(
            transform(toks, (_, i) => when(i <= size(toks) - 3,
              concat_ws(" ", (1 to 3).map(j => element_at(toks, i + j)): _*))),
            c => c.isNotNull), g => xxhash64(g))).as("sh"))
    }

    // typed row-local alternative
    def typedShingles(documents: DataFrame): DataFrame = {
      import spark.implicits._
      val tokenRe = "[a-z0-9]+".r
      documents.select(col("doc_id"), lower(col("text")).as("t")).as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val toks = tokenRe.findAllIn(text).toArray
            val seen = new java.util.LinkedHashSet[Long]()
            var i = 0
            while (i <= toks.length - 3) {
              val g = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
              seen.add(org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes2(
                g.getBytes("UTF-8"), org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                g.getBytes("UTF-8").length, 42).toLong)
              i += 1
            }
            (id, seen.toArray(new Array[java.lang.Long](seen.size)).map(_.longValue))
          }
        }.toDF("doc_id", "sh")
    }

    time("hof") { hofShingles(docs).select(sum(size(col("sh")))).collect()(0).getLong(0) }
    time("typed") { typedShingles(docs).select(sum(size(col("sh")))).collect()(0).getLong(0) }
    time("jp_df") { graft.ops.Dedup.jaccardPairs(docs, 0.5).count() }
    time("jp_hash") { graft.ops.Dedup.jaccardPairs(docs, 0.5, orderByDocFreq = false).count() }
    time("jp_nosort") { graft.ops.Dedup.jaccardPairs(docs, 0.5, sorted = false).count() }

    // alternative df-ordered prefix: one groupBy with row-local
    // sort_array+slice instead of window + sizes-join
    def jpAgg(documents: DataFrame, threshold: Double): Long = {
      val arrs = graft.ops.Dedup.shingleArrays(documents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sh = arrs.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val docFreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      val prefix = sh.join(docFreq, "shingle")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("shingle")))).as("ranked"))
        .select(col("doc_id"), size(col("ranked")).as("n_sh"),
          explode(slice(col("ranked"), lit(1),
            greatest(lit(0), (size(col("ranked")) -
              ceil(lit(threshold) * size(col("ranked"))) + 1).cast("int")))).as("r"))
        .select(col("doc_id"), col("r.shingle").as("shingle"), col("n_sh"))
      val cand = prefix.as("a")
        .join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
            col("b.n_sh") >= lit(threshold) * col("a.n_sh") &&
            col("a.n_sh") >= lit(threshold) * col("b.n_sh"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      val verified = cand
        .join(arrs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(arrs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .select(col("id_a"), col("id_b"),
          round(col("_inter").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("_inter")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      val n = verified.count()
      arrs.unpersist()
      n
    }
    time("jp_agg") { jpAgg(docs, 0.5) }
    time("bm25") { graft.ops.Search.bm25(docs, Seq("join", "vector", "dup", "spark"), 15).count() }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()
    time("ann_topk") { graft.ops.Similarity.annTopK(emb, 20, 5).count() }

    // production chunker + passage stats (the A/B against the old HOF
    // formulation lives in git history — chunkDocuments IS the typed form
    // now, so re-timing a copy here would be a self-comparison)
    time("chunk") { graft.ops.Text.chunkDocuments(docs, sorted = false).count() }
    time("dup_passages") { graft.ops.Text.duplicatePassageStats(docs).count() }
    spark.stop()
  }
}
