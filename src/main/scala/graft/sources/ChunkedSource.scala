package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSourceV2 connector with the architecture of the reference's
  * chunked Storage-API read path (reference bqfetch/bqfetch.py:457-502),
  * expressed the Spark-native way:
  *
  *  - one `InputPartition` per CHUNK (the reference opens one Arrow stream
  *    per process; a production BigQuery connector opens one InputPartition
  *    per read-session stream),
  *  - `SupportsPushDownFilters`: id-range/equality predicates evaluate
  *    inside the partition reader — the `row_restriction` analog
  *    (bqfetch/bqfetch.py:483-484) — so filtered rows never reach Spark,
  *  - `SupportsPushDownRequiredColumns`: column pruning at the source, the
  *    projection pushdown the reference never does (it always SELECT *,
  *    bqfetch/bqfetch.py:176-178).
  *
  * The row stream itself is synthetic and deterministic (this environment
  * has no network); swapping the generator loop for an Arrow stream reader
  * is the only change a real remote connector needs.
  *
  * Usage: spark.read.format("graft.sources.ChunkedSource")
  *   .option("numRows", n).option("numChunks", c).load()
  * Schema: (id bigint, chunk int, payload string).
  */
class ChunkedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkedSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ChunkedTable(
      properties.getOrDefault("numRows", "1000").toLong,
      properties.getOrDefault("numChunks", "4").toInt)
}

object ChunkedSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("chunk", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

private class ChunkedTable(numRows: Long, numChunks: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_chunked($numRows rows, $numChunks chunks)"
  override def schema(): StructType = ChunkedSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChunkedScanBuilder(numRows, numChunks)
}

private class ChunkedScanBuilder(numRows: Long, numChunks: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = ChunkedSource.schema

  /** Accept id-range/equality filters (evaluated in the reader); everything
    * else stays in Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("id", _) | GreaterThan("id", _) | GreaterThanOrEqual("id", _) |
           LessThan("id", _) | LessThanOrEqual("id", _) => true
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ChunkedScan(numRows, numChunks, pushed, required)
}

private class ChunkedScan(numRows: Long, numChunks: Int,
                          filters: Array[Filter], required: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_chunked pushed=[${filters.mkString(",")}] columns=[${required.fieldNames.mkString(",")}]"

  /** One InputPartition per chunk — contiguous id ranges, the analog of
    * the reference's per-chunk temp table + stream.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, math.ceil(numRows.toDouble / numChunks).toLong)
    (0 until numChunks).map { c =>
      ChunkPartition(c, c * per, math.min(numRows, (c + 1) * per)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChunkedReaderFactory(filters, required)
}

private case class ChunkPartition(chunk: Int, startId: Long, endId: Long) extends InputPartition

private class ChunkedReaderFactory(filters: Array[Filter], required: StructType)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChunkPartition]
    // fold pushed id predicates into the range bounds — server-side
    // filtering: rejected ids are never generated, let alone returned
    var lo = p.startId
    var hi = p.endId
    filters.foreach {
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1)
      case _ =>
    }
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var id = lo - 1
      override def next(): Boolean = { id += 1; id < hi }
      override def get(): InternalRow = {
        val values = fields.map {
          case "id"      => java.lang.Long.valueOf(id)
          case "chunk"   => java.lang.Integer.valueOf(p.chunk)
          case "payload" => UTF8String.fromString(s"row-$id-of-chunk-${p.chunk}")
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
