package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton) clustering keys and the
  * data-skipping statistics they buy — the lakehouse `OPTIMIZE ZORDER BY`
  * capability (Delta/Iceberg/Hudi all ship it) expressed as plain
  * engine-portable integer arithmetic.
  *
  * Why it matters at 100 TB: a table range-partitioned on ONE column skips
  * files only for predicates on that column; two-dimensional predicates
  * (the common case: `part BETWEEN … AND supp IN …`) scan everything. A
  * Z-order key interleaves the bits of both dimensions, so sorting by it
  * gives every file a small bounding box in BOTH dimensions at once —
  * min/max footer stats then prune files for either or both predicates.
  *
  * Everything here is INTEGER-exact (min-max normalization via
  * `(x - min) * (2^bits - 1) DIV (max - min)`, bit interleave via shifts
  * and masks) so the DuckDB oracle reproduces it bit-for-bit; the oracle
  * SQL is GENERATED beside the operator ([[zorderOracleSql]]) from the
  * same formula, the MinHash-oracle pattern — the two cannot drift.
  *
  * Plan shape: the normalization bounds are ONE 1-row aggregate
  * (broadcast); key computation is per-row codegen'd bit arithmetic
  * (shiftleft / bitwise or — stays inside WholeStageCodegen); the stats
  * roll-up is one partial+final hash aggregate. No window, no global sort
  * anywhere — at scale the key feeds `repartitionByRange(zkey)` +
  * `sortWithinPartitions` at write time.
  */
object Layout {

  /** Morton-interleave two already-normalized non-negative ints of `bits`
    * bits each: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Built-ins only → codegen'd.
    */
  def zOrderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Per-Z-bucket data-skipping statistics for a two-column clustering:
    * bucket id (top `bucketBits` of the interleaved key), row count, and
    * the min/max bounding box of BOTH source columns — exactly the footer
    * stats a scan would prune on. The spec quantifies the payoff: total
    * bbox area under Z-bucketing beats single-column bucketing.
    */
  def zorderStats(df: DataFrame, colA: String, colB: String,
                  bits: Int = 8, bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      s"bucketBits must be in [1, ${2 * bits}], got $bucketBits")
    val bounds = df.agg(
      min(col(colA).cast("long")).as("_amin"), max(col(colA).cast("long")).as("_amax"),
      min(col(colB).cast("long")).as("_bmin"), max(col(colB).cast("long")).as("_bmax"))
    val top = (1 << bits) - 1
    // integer DIV keeps the quotient exact — a double divide could land an
    // epsilon under an integer boundary and truncate differently than the
    // oracle's integer floor division
    def norm(c: String, mn: String, mx: String): Column =
      expr(s"CASE WHEN $mx > $mn THEN (($c - $mn) * $top) DIV ($mx - $mn) ELSE 0 END")
    df.select(col(colA).cast("long").as("_a"), col(colB).cast("long").as("_b"))
      .crossJoin(broadcast(bounds)) // 1-row side
      .withColumn("_na", norm("_a", "_amin", "_amax"))
      .withColumn("_nb", norm("_b", "_bmin", "_bmax"))
      .withColumn("_z", zOrderKey(col("_na").cast("int"), col("_nb").cast("int"), bits))
      .withColumn("bucket", shiftright(col("_z"), 2 * bits - bucketBits).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("_a").as("min_a"), max("_a").as("max_a"),
        min("_b").as("min_b"), max("_b").as("max_b"))
      .orderBy("bucket")
  }

  /** Write-side of the Z-order story: lay `df` out as `nFiles` parquet
    * files range-partitioned and sorted by the interleaved key, so every
    * file carries a tight min/max footer range in BOTH clustering columns
    * — the layout `zorderStats` measures, actually materialized. This is
    * `OPTIMIZE ZORDER BY` for plain parquet: `repartitionByRange` over the
    * key (a sampled range exchange — no global single-task sort) +
    * `sortWithinPartitions` (files are also internally ordered, helping
    * row-group pruning) + one write job.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
                    nFiles: Int = 16, bits: Int = 8): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val bounds = df.agg(
      min(col(colA).cast("long")).as("_amin"), max(col(colA).cast("long")).as("_amax"),
      min(col(colB).cast("long")).as("_bmin"), max(col(colB).cast("long")).as("_bmax"))
    val top = (1 << bits) - 1
    def norm(c: String, mn: String, mx: String): Column =
      expr(s"CASE WHEN $mx > $mn THEN ((CAST($c AS BIGINT) - $mn) * $top) DIV ($mx - $mn) ELSE 0 END")
    df.crossJoin(broadcast(bounds))
      .withColumn("_zkey", zOrderKey(
        norm(colA, "_amin", "_amax").cast("int"),
        norm(colB, "_bmin", "_bmax").cast("int"), bits))
      .drop("_amin", "_amax", "_bmin", "_bmax")
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** The DuckDB restatement of [[zorderStats]], generated from the same
    * constants so operator and oracle cannot drift. `table` must expose
    * `colA`/`colB`.
    */
  def zorderOracleSql(table: String, colA: String, colB: String,
                      bits: Int = 8, bucketBits: Int = 6): String = {
    val top = (1 << bits) - 1
    val interleave = (0 until bits).map { i =>
      s"(((na >> $i) & 1) << ${2 * i}) | (((nb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")
    s"""WITH bounds AS (SELECT CAST(MIN($colA) AS BIGINT) AS amin, CAST(MAX($colA) AS BIGINT) AS amax,
               CAST(MIN($colB) AS BIGINT) AS bmin, CAST(MAX($colB) AS BIGINT) AS bmax FROM $table),
       nrm AS (SELECT CAST($colA AS BIGINT) AS a, CAST($colB AS BIGINT) AS b,
               CASE WHEN amax > amin THEN ((CAST($colA AS BIGINT) - amin) * $top) // (amax - amin) ELSE 0 END AS na,
               CASE WHEN bmax > bmin THEN ((CAST($colB AS BIGINT) - bmin) * $top) // (bmax - bmin) ELSE 0 END AS nb
               FROM $table, bounds),
       z AS (SELECT a, b, ($interleave) >> ${2 * bits - bucketBits} AS bucket FROM nrm)
       SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
              MIN(a) AS min_a, MAX(a) AS max_a, MIN(b) AS min_b, MAX(b) AS max_b
       FROM z GROUP BY bucket ORDER BY bucket"""
  }
}
