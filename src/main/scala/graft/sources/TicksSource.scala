package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
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
  *
  * `clusterByTicker=true` switches to a KEY-GROUPED layout (one partition
  * per ticker, `SupportsReportPartitioning` + `HasPartitionKey`): with
  * `spark.sql.sources.v2.bucketing.enabled`, grouped aggregations and
  * same-key joins over two such scans run with ZERO exchange — the
  * storage-partitioned join, i.e. what a sharded-by-symbol feed archive
  * gives a 100 TB deployment for free when the connector reports it.
  */
class TicksSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TicksTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TicksTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("partitions", "8").toInt,
      properties.getOrDefault("tickers", "16").toInt,
      properties.getOrDefault("clusterByTicker", "false").toBoolean)
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

class TicksTable(rows: Long, partitions: Int, tickers: Int,
    clusterByTicker: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_ticks($rows)"
  override def schema(): StructType = TicksTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TicksScanBuilder(rows, partitions, tickers, clusterByTicker)
}

class TicksScanBuilder(rows: Long, partitions: Int, tickers: Int,
    clusterByTicker: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  private var required: StructType = TicksTable.schema
  private var tickerEq: Option[String] = None
  private var limit: Option[Int] = None
  private var pushedAgg: Option[TicksAgg.Pushed] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // claim ONLY the first ticker equality; a second, conflicting equality
    // must stay a post-scan filter or `ticker = A AND ticker = B` would
    // return A's rows (Catalyst does not fold contradictory equalities)
    val first = filters.collectFirst { case f @ EqualTo("ticker", _: String) => f }
    tickerEq = first.collect { case EqualTo(_, v: String) => v }
    filters.filter(f => !first.contains(f)) // all others stay post-scan
  }
  override def pushedFilters(): Array[Filter] =
    tickerEq.map(v => EqualTo("ticker", v): Filter).toArray

  // LIMIT pushdown: the index space is deterministic, so the scan can stop
  // at exactly the index that yields the limit-th (filter-surviving) row —
  // a LIMIT 5 over a trillion-row table touches ≤ 5×tickers indices.
  // NOT accepted on top of a pushed aggregate: the aggregate branch emits
  // every group, so claiming the limit (which isPartiallyPushed=false would
  // delete from the plan) would return all groups instead of n.
  override def pushLimit(n: Int): Boolean =
    if (pushedAgg.isDefined) false else { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = false // scan emits EXACTLY n rows

  // Aggregate pushdown: COUNT(*/col) / MIN / MAX, globally or grouped by
  // ticker, are closed-form over the arithmetic progression of matching
  // indices (values are pure functions of `i`), so the "scan" answers them
  // in O(value-cycle) — no per-row work at any scale. This is the DSv2
  // analogue of a source-side statistics/index lookup.
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    TicksAgg.translate(aggregation, TicksTable.schema).isDefined
  override def pushAggregation(aggregation: Aggregation): Boolean =
    TicksAgg.translate(aggregation, TicksTable.schema) match {
      case some @ Some(_) => pushedAgg = some; true
      case None => false
    }

  override def build(): Scan = new Scan with Batch with SupportsReportPartitioning {
    override def readSchema(): StructType =
      pushedAgg.map(_.schema).getOrElse(required)
    override def toBatch: Batch = this

    // Key-grouped (storage-partitioned) layout applies only on the plain
    // row-scan branch: one partition per ticker, each announcing its
    // partition key, so grouped reads satisfy ClusteredDistribution(ticker)
    // with NO exchange (the storage-partitioned join/agg path,
    // spark.sql.sources.v2.bucketing.enabled). Pushed-agg and pushed-limit
    // scans use other partition shapes, so they report unknown.
    private def keyGrouped: Boolean =
      clusterByTicker && pushedAgg.isEmpty && limit.isEmpty
    private def clusteredTickers: Seq[Int] = {
      val all = 0 until math.min(tickers.toLong, rows).toInt
      tickerEq match {
        case Some(t) => all.filter(TicksTable.tickerOf(_, tickers) == t)
        case None    => all
      }
    }
    override def outputPartitioning(): Partitioning =
      if (keyGrouped)
        new KeyGroupedPartitioning(
          Array[Expression](Expressions.identity("ticker")), clusteredTickers.size)
      else new UnknownPartitioning(partitions)

    override def planInputPartitions(): Array[InputPartition] = pushedAgg match {
      case Some(agg) => // driver computes the closed-form rows; one tiny partition
        Array(AggResultPartition(TicksAgg.evaluate(agg, rows, tickers, tickerEq)))
      case None if keyGrouped =>
        clusteredTickers
          .map(t => TickerSlicePartition(t, tickers, rows): InputPartition).toArray
      case None =>
        val end = limit match {
          case Some(n) => TicksAgg.indexBoundForLimit(n, rows, tickers, tickerEq)
          case None    => rows
        }
        val parts = if (limit.isDefined) 1 else partitions
        val per = (end + parts - 1) / parts
        (0 until parts).flatMap { p =>
          val s = p * per; val e = math.min((p + 1) * per, end)
          if (e > s) Some(TicksPartition(s, e): InputPartition) else None
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

/** One ticker's complete row slice (indices t, t+tickers, t+2·tickers …):
  * the key-grouped storage partition. `partitionKey()` binds the partition
  * to its ticker value so the planner can line partitions up by key —
  * the DSv2 analogue of a bucketed file layout.
  */
case class TickerSlicePartition(t: Int, tickers: Int, rows: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(UTF8String.fromString(TicksTable.tickerOf(t.toLong, tickers)))
}

/** Pre-computed (on the driver, closed-form) aggregate result rows; values
  * are plain JVM types (String/Long/Double/null), converted to Catalyst
  * form by the reader.
  */
case class AggResultPartition(rowValues: Seq[Seq[Any]]) extends InputPartition

/** Closed-form aggregate evaluation over the deterministic index space.
  *
  * The matching indices of a scan (optionally ticker-filtered) form an
  * arithmetic progression `start + j*step, j < count`; every column value is
  * a periodic pure function of the index, so COUNT is the progression
  * length and MIN/MAX need only one period-cycle of residues — O(period),
  * independent of `rows`.
  */
object TicksAgg {
  sealed trait Func
  case object CountStarF extends Func
  final case class CountColF(col: String) extends Func // all cols non-null ⇒ = COUNT(*)
  final case class MinF(col: String) extends Func
  final case class MaxF(col: String) extends Func

  /** groupByTicker=false → one global row; true → one row per present ticker. */
  final case class Pushed(groupByTicker: Boolean, funcs: Seq[Func], schema: StructType)

  private def fieldOf(e: Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
    case _ => None
  }

  /** Accept COUNT(*) / COUNT(col) / MIN(col) / MAX(col), optionally grouped
    * by ticker; anything else stays un-pushed (Spark falls back to a normal
    * scan + aggregate).
    */
  def translate(agg: Aggregation, table: StructType): Option[Pushed] = {
    val groupBy = agg.groupByExpressions()
    val grouped = groupBy.length match {
      case 0 => false
      case 1 if fieldOf(groupBy(0)).contains("ticker") => true
      case _ => return None
    }
    val funcs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => CountStarF
      case c: Count if !c.isDistinct =>
        fieldOf(c.column).filter(table.fieldNames.contains) match {
          case Some(f) => CountColF(f)
          case None => return None
        }
      case m: Min =>
        fieldOf(m.column).filter(table.fieldNames.contains) match {
          case Some(f) => MinF(f)
          case None => return None
        }
      case m: Max =>
        fieldOf(m.column).filter(table.fieldNames.contains) match {
          case Some(f) => MaxF(f)
          case None => return None
        }
      case _: AggregateFunc => return None
    }
    val groupFields =
      if (grouped) Seq(StructField("ticker", StringType, nullable = false)) else Nil
    val aggFields = funcs.map {
      case CountStarF | CountColF(_) => StructField("count", LongType, nullable = false)
      case MinF(c) => StructField(s"min_$c", table(c).dataType, nullable = true)
      case MaxF(c) => StructField(s"max_$c", table(c).dataType, nullable = true)
    }
    Some(Pushed(grouped, funcs, StructType(groupFields ++ aggFields)))
  }

  /** Matching indices as a progression: all rows, or one ticker's stripe. */
  private final case class Prog(start: Long, step: Long, count: Long)

  private def tickerIdx(t: String, tickers: Int): Option[Int] =
    (0 until tickers).find(k => TicksTable.tickerOf(k, tickers) == t)

  private def progFor(rows: Long, tickers: Int, k: Option[Int]): Prog = k match {
    case Some(kk) =>
      if (kk >= rows) Prog(kk, tickers, 0L)
      else Prog(kk, tickers, (rows - 1 - kk) / tickers + 1)
    case None => Prog(0L, 1L, rows)
  }

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** One value-cycle of `(start + j*step) % period` — ≤ period elements. */
  private def residues(p: Prog, period: Long): Iterator[Long] = {
    val cycle = period / gcd(p.step % period, period)
    (0L until math.min(p.count, cycle)).iterator
      .map(j => (p.start + j * p.step) % period)
  }

  private def minMaxOf(col: String, p: Prog, tickers: Int): (Any, Any) = {
    if (p.count == 0) return (null, null)
    col match {
      case "sequence" => (p.start, p.start + (p.count - 1) * p.step)
      case "price" => // TicksTable.priceOf: monotonic in i % 9000
        val rs = residues(p, 9000L)
        val (lo, hi) = rs.foldLeft((Long.MaxValue, Long.MinValue)) {
          case ((l, h), r) => (math.min(l, r), math.max(h, r)) }
        (TicksTable.priceOf(lo), TicksTable.priceOf(hi))
      case "size" => // monotonic in i % 50
        val rs = residues(p, 50L)
        val (lo, hi) = rs.foldLeft((Long.MaxValue, Long.MinValue)) {
          case ((l, h), r) => (math.min(l, r), math.max(h, r)) }
        (TicksTable.sizeOf(lo), TicksTable.sizeOf(hi))
      case "ticker" => // lexicographic over the present symbol names
        val names = residues(p, tickers.toLong).map(TicksTable.tickerOf(_, tickers))
        val seq = names.toSeq
        (seq.min, seq.max)
    }
  }

  def evaluate(agg: Pushed, rows: Long, tickers: Int,
      tickerEq: Option[String]): Seq[Seq[Any]] = {
    val filterK = tickerEq.map(t => tickerIdx(t, tickers))
    def funcsRow(p: Prog): Seq[Any] = agg.funcs.map {
      case CountStarF | CountColF(_) => p.count
      case MinF(c) => minMaxOf(c, p, tickers)._1
      case MaxF(c) => minMaxOf(c, p, tickers)._2
    }
    if (!agg.groupByTicker) {
      val p = filterK match {
        case Some(None)    => Prog(0L, 1L, 0L) // filter matches no symbol
        case Some(Some(k)) => progFor(rows, tickers, Some(k))
        case None          => progFor(rows, tickers, None)
      }
      Seq(funcsRow(p))
    } else {
      val ks = filterK match {
        case Some(None)    => Seq.empty[Int]
        // A symbol whose first index k lies beyond the table has zero rows; a
        // grouped aggregate must emit no group for it (unlike the global case).
        case Some(Some(k)) => Seq(k).filter(_ < rows)
        case None          => (0 until tickers).filter(_ < rows)
      }
      ks.map { k =>
        TicksTable.tickerOf(k, tickers) +:
          funcsRow(progFor(rows, tickers, Some(k)))
      }
    }
  }

  /** Smallest index bound such that [0, bound) contains exactly
    * min(n, available) filter-surviving rows.
    */
  def indexBoundForLimit(n: Int, rows: Long, tickers: Int,
      tickerEq: Option[String]): Long = tickerEq match {
    case None => math.min(rows, n.toLong)
    case Some(t) => tickerIdx(t, tickers) match {
      case Some(k) if k < rows => math.min(rows, k + (n.toLong - 1) * tickers + 1)
      case _ => 0L
    }
  }
}

class TicksReaderFactory(required: StructType, tickers: Int,
    tickerEq: Option[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = partition match {
    case AggResultPartition(rowValues) =>
      new PartitionReader[InternalRow] {
        private val it = rowValues.iterator
        private var cur: Seq[Any] = _
        override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
        override def get(): InternalRow = InternalRow.fromSeq(cur.map {
          case s: String => UTF8String.fromString(s)
          case v => v
        }.toIndexedSeq)
        override def close(): Unit = ()
      }
    case tp: TicksPartition => createRowReader(tp)
    case ts: TickerSlicePartition => createSliceReader(ts)
  }

  private def createSliceReader(p: TickerSlicePartition): PartitionReader[InternalRow] = {
    val cols = required.fieldNames
    new PartitionReader[InternalRow] {
      private var i = p.t.toLong - p.tickers
      override def next(): Boolean = { i += p.tickers; i < p.rows }
      override def get(): InternalRow = {
        val values = cols.map {
          case "ticker"   => UTF8String.fromString(TicksTable.tickerOf(i, p.tickers))
          case "sequence" => i
          case "price"    => TicksTable.priceOf(i)
          case "size"     => TicksTable.sizeOf(i)
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }

  private def createRowReader(partition: TicksPartition): PartitionReader[InternalRow] = {
    val TicksPartition(start, end) = partition
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
