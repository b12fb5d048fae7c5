package graft.sources

import java.time.LocalDate
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a first-class connector: a DataSourceV2 `TableProvider` for a
  * deterministic synthetic quote feed — the engine-side stand-in for
  * the reference's HTTP quote fetcher (full_stock_pipeline.py:60-129),
  * showing where a real REST/Kafka connector plugs into Catalyst.
  *
  * What makes it more than a toy:
  *  - SupportsPushDownRequiredColumns: projection reaches the reader —
  *    unread columns are never generated (ReadSchema pruning).
  *  - SupportsPushDownFilters: symbol equality and trade_date range
  *    predicates restrict GENERATION (the "server-side" filter a real
  *    API connector would translate to request parameters).
  *  - One InputPartition per symbol — embarrassingly parallel, scales
  *    with the symbol universe like the real fetcher's per-symbol calls.
  *
  * Usage:
  *   spark.read.format("graft.sources.QuoteSourceV2")
  *     .option("symbols", "500").option("days", "30")
  *     .option("start", "2024-01-01").load()
  */
class QuoteSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QuoteSourceV2.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new QuoteTable(new CaseInsensitiveStringMap(properties))
}

object QuoteSourceV2 {
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("trade_date", DateType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false)))

  def symbolName(i: Int): String = s"SYM${"%04d".format(i)}"

  /** Deterministic quote for (symbol index, epoch day): a seeded
    * hash-walk, so every partition/retry regenerates identical rows. */
  def quote(symIdx: Int, epochDay: Int): (Double, Double, Double, Double, Long) = {
    // finalizer-mixed seed: java.util.Random's first draw is strongly
    // correlated across sequential seeds, which froze `open` day-to-day
    var z = symIdx.toLong * 0x9E3779B97F4A7C15L ^ (epochDay.toLong * 0xC2B2AE3D27D4EB4FL)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    val rng = new scala.util.Random(z ^ (z >>> 31))
    val base = 20.0 + (symIdx % 97) * 3.17
    val open = math.rint((base * (0.9 + 0.2 * rng.nextDouble())) * 100) / 100
    val close = math.rint((base * (0.9 + 0.2 * rng.nextDouble())) * 100) / 100
    val high = math.max(open, close) + math.rint(rng.nextDouble() * 200) / 100
    val low = math.max(0.01, math.min(open, close) - math.rint(rng.nextDouble() * 200) / 100)
    val volume = 1000L + rng.nextInt(1000000)
    (open, math.rint(high * 100) / 100, math.rint(low * 100) / 100, close, volume)
  }
}

private class QuoteTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_quotes"
  override def schema(): StructType = QuoteSourceV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new QuoteScanBuilder(
      nSymbols = opts.getInt("symbols", options.getInt("symbols", 100)),
      days = opts.getInt("days", options.getInt("days", 30)),
      start = LocalDate.parse(Option(opts.get("start"))
        .orElse(Option(options.get("start"))).getOrElse("2024-01-01")))
}

private class QuoteScanBuilder(nSymbols: Int, days: Int, start: LocalDate)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = QuoteSourceV2.schema
  private var pushed: Array[Filter] = Array.empty
  private var symbolEq: Option[String] = None
  // two EqualTo(symbol, a) AND EqualTo(symbol, b) with a != b: the
  // conjunction is unsatisfiable — claiming both is only correct if we
  // actually produce the empty intersection
  private var symbolContradiction: Boolean = false
  private var minDay: Int = start.toEpochDay.toInt
  private var maxDay: Int = start.toEpochDay.toInt + days - 1

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("symbol", _: String) => true
      case GreaterThan("trade_date", _: java.sql.Date) => true
      case GreaterThanOrEqual("trade_date", _: java.sql.Date) => true
      case LessThan("trade_date", _: java.sql.Date) => true
      case LessThanOrEqual("trade_date", _: java.sql.Date) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("symbol", v: String) =>
        if (symbolEq.exists(_ != v)) symbolContradiction = true
        else symbolEq = Some(v)
      case GreaterThan("trade_date", d: java.sql.Date) =>
        minDay = math.max(minDay, d.toLocalDate.toEpochDay.toInt + 1)
      case GreaterThanOrEqual("trade_date", d: java.sql.Date) =>
        minDay = math.max(minDay, d.toLocalDate.toEpochDay.toInt)
      case LessThan("trade_date", d: java.sql.Date) =>
        maxDay = math.min(maxDay, d.toLocalDate.toEpochDay.toInt - 1)
      case LessThanOrEqual("trade_date", d: java.sql.Date) =>
        maxDay = math.min(maxDay, d.toLocalDate.toEpochDay.toInt)
      case _ => ()
    }
    pushed = accepted
    rejected // Spark re-applies anything we don't handle
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = requiredSchema
    override def toBatch: Batch = this
    override def toMicroBatchStream(checkpointLocation: String):
        org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new QuoteMicroBatchStream(nSymbols, minDay, maxDay, requiredSchema,
        symbolEq, symbolContradiction)
    override def description(): String =
      s"graft_quotes pushed=[${pushed.mkString(",")}] cols=[${requiredSchema.fieldNames.mkString(",")}]"
    override def planInputPartitions(): Array[InputPartition] = {
      val symIdxs =
        if (symbolContradiction) Seq.empty
        else symbolEq match {
          case Some(s) =>
            (0 until nSymbols).filter(i => QuoteSourceV2.symbolName(i) == s)
          case None => 0 until nSymbols
        }
      symIdxs.map(i => QuotePartition(i, minDay, maxDay): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new QuoteReaderFactory(requiredSchema)
  }
}

private case class QuotePartition(symIdx: Int, minDay: Int, maxDay: Int)
    extends InputPartition

private class QuoteReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[QuotePartition]
    new PartitionReader[InternalRow] {
      private var day = p.minDay - 1
      override def next(): Boolean = { day += 1; day <= p.maxDay }
      override def get(): InternalRow = {
        val (open, high, low, close, volume) = QuoteSourceV2.quote(p.symIdx, day)
        InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case "symbol" => UTF8String.fromString(QuoteSourceV2.symbolName(p.symIdx))
          case "trade_date" => day
          case "open" => open
          case "high" => high
          case "low" => low
          case "close" => close
          case "volume" => volume
        })
      }
      override def close(): Unit = ()
    }
  }
}

/** Streaming form of the daily poll (S1): each micro-batch delivers the
  * next unconsumed span of trading days; offsets are epoch-day
  * watermarks checkpointed by the engine, so a restart resumes exactly
  * after the last committed day — the semantics the reference
  * approximates with cron + idempotent upserts.
  */
private class QuoteMicroBatchStream(nSymbols: Int, minDay: Int, maxDay: Int,
                                    required: StructType,
                                    symbolEq: Option[String] = None,
                                    symbolContradiction: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class DayOffset(day: Int) extends Offset {
    override def json(): String = day.toString
  }

  // "the feed has data through maxDay"; initial = day before start
  override def latestOffset(): Offset = DayOffset(maxDay)
  override def initialOffset(): Offset = DayOffset(minDay - 1)
  override def deserializeOffset(json: String): Offset = DayOffset(json.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DayOffset].day + 1
    val e = end.asInstanceOf[DayOffset].day
    val symIdxs =
      if (symbolContradiction) Seq.empty
      else symbolEq match {
        case Some(sym) =>
          (0 until nSymbols).filter(i => QuoteSourceV2.symbolName(i) == sym)
        case None => 0 until nSymbols
      }
    if (s > e) Array.empty
    else symIdxs.map(i => QuotePartition(i, s, e): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new QuoteReaderFactory(required)
}
