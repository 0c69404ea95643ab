package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table identity + source resolution.
  *
  * Reference analog: `BigQueryTable(project_id, dataset, table)`
  * (reference bqfetch/bqfetch.py:20-41) — a pure path triple. `TableRef`
  * keeps that API shape; [[Sources.resolve]] turns it into a DataFrame.
  */
final case class TableRef(project: String, dataset: String, table: String) {
  /** Fully-qualified name, the reference's `str(BigQueryTable)` analog. */
  def fqn: String = s"$project.$dataset.$table"
}

object Sources {

  /** Resolve a table reference to a DataFrame.
    *
    * Offline (this environment) every dataset maps to a directory of
    * parquet files, so resolution is `spark.read.parquet`. In production
    * the same call site is the BigQuery DSv2 connector —
    * `spark.read.format("bigquery").option("table", ref.fqn)` — which
    * opens Storage-API Arrow streams natively (one `InputPartition` per
    * stream, vs. the reference's single-stream read at
    * bqfetch/bqfetch.py:496-500) and supports filter/column pushdown, so
    * everything downstream of this function is source-agnostic.
    */
  def resolve(spark: SparkSession, ref: TableRef, rootDir: String): DataFrame =
    Tables.load(spark, rootDir, ref.table)

  /** Format-generic readers: the engine is not parquet-bound; any Spark
    * batch source with a schema round-trips through the same operators.
    */
  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).option("header", "true").csv(path)

  def readJson(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)
}
