package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector: a deterministic synthetic ticker-quote
  * source (`spark.read.format("graft.sources.TicksSourceProvider")`),
  * demonstrating the connector surface end-to-end — TableProvider →
  * ScanBuilder with COLUMN PRUNING (`SupportsPushDownRequiredColumns`) and
  * FILTER PUSHDOWN (`SupportsPushDownFilters`, ticker equality evaluated
  * inside the reader) → partitioned `PartitionReader`s.
  *
  * Options: `rows` (total, default 100k), `partitions` (default 8),
  * `tickers` (distinct symbols, default 16). Values are a pure function of
  * the row index, so tests and benches are reproducible; the same layout
  * serves as the template for a real exchange-feed connector (each input
  * partition = one shard/offset-range).
  */
class TicksSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TicksTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TicksTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("partitions", "8").toInt,
      properties.getOrDefault("tickers", "16").toInt)
}

object TicksTable {
  val schema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("sequence", LongType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("size", DoubleType, nullable = false)))

  def tickerOf(i: Long, nTickers: Int): String = s"TCK${i % nTickers}-USDT"
  def priceOf(i: Long): Double = 0.5 + (i % 9000) / 10000.0
  def sizeOf(i: Long): Double = 1.0 + (i % 50)
}

class TicksTable(rows: Long, partitions: Int, tickers: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_ticks($rows)"
  override def schema(): StructType = TicksTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TicksScanBuilder(rows, partitions, tickers)
}

class TicksScanBuilder(rows: Long, partitions: Int, tickers: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = TicksTable.schema
  private var tickerEq: Option[String] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushed, rest) = filters.partition {
      case EqualTo("ticker", _: String) => true
      case _ => false
    }
    tickerEq = pushed.collectFirst { case EqualTo(_, v: String) => v }
    rest // everything else stays a post-scan filter
  }
  override def pushedFilters(): Array[Filter] =
    tickerEq.map(v => EqualTo("ticker", v): Filter).toArray

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val per = (rows + partitions - 1) / partitions
      (0 until partitions).map { p =>
        TicksPartition(p * per, math.min((p + 1) * per, rows)): InputPartition
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new TicksReaderFactory(required, tickers, tickerEq)
    // streaming half: the row-index space is the offset log — each
    // micro-batch reads one [start, end) slice, replayable by offset range,
    // so checkpoint recovery is exactly-once for free (the reference's
    // watcher+journal contract, as a connector)
    override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
      new TicksMicroBatchStream(rows, partitions, tickers, required, tickerEq,
        maxRowsPerBatch = 25000)
  }
}

class TicksMicroBatchStream(rows: Long, partitions: Int, tickers: Int,
    required: StructType, tickerEq: Option[String], maxRowsPerBatch: Long)
    extends streaming.MicroBatchStream with streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
  case class TicksOffset(idx: Long) extends Offset {
    override def json(): String = idx.toString
  }
  override def initialOffset(): Offset = TicksOffset(0L)
  // admission control: each micro-batch admits at most maxRowsPerBatch rows
  // (rate limiting belongs HERE — capping inside planInputPartitions would
  // silently skip the offset gap)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxRowsPerBatch)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    TicksOffset(math.min(rows, start.asInstanceOf[TicksOffset].idx + maxRowsPerBatch))
  override def reportLatestOffset(): Offset = TicksOffset(rows)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-control variant is used")
  override def deserializeOffset(json: String): Offset = TicksOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TicksOffset].idx
    val e = end.asInstanceOf[TicksOffset].idx
    if (e <= s) return Array.empty
    val per = (e - s + partitions - 1) / partitions
    (0 until partitions).flatMap { p =>
      val ps = s + p * per
      val pe = math.min(ps + per, e)
      if (pe > ps) Some(TicksPartition(ps, pe): InputPartition) else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TicksReaderFactory(required, tickers, tickerEq)
}

case class TicksPartition(start: Long, end: Long) extends InputPartition

class TicksReaderFactory(required: StructType, tickers: Int,
    tickerEq: Option[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val TicksPartition(start, end) = partition.asInstanceOf[TicksPartition]
    val cols = required.fieldNames
    new PartitionReader[InternalRow] {
      private var i = start - 1
      override def next(): Boolean = {
        i += 1
        // pushed ticker filter evaluated AT THE SOURCE: skip non-matching
        // indices so pruned rows are never materialized
        tickerEq match {
          case Some(t) =>
            while (i < end && TicksTable.tickerOf(i, tickers) != t) i += 1
          case None =>
        }
        i < end
      }
      override def get(): InternalRow = {
        val values = cols.map {
          case "ticker"   => UTF8String.fromString(TicksTable.tickerOf(i, tickers))
          case "sequence" => i
          case "price"    => TicksTable.priceOf(i)
          case "size"     => TicksTable.sizeOf(i)
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
