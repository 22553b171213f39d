package graft.sources

import java.time.LocalDate
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DateType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableProvider` for the reference's work-unit
  * generator (SURVEY.md S4/J5: every store × every date in the window,
  * load_sales_data.py:155-164) — the engine's demonstration of the
  * custom-source extension tier. The reference enumerates work units
  * in a driver-side Python nested loop and pays one HTTP round trip
  * per unit; here the same enumeration is a first-class batch source
  * whose `planInputPartitions` splits the store range across
  * executors, so work-unit generation itself is partition-parallel
  * and the driver never materializes the list (the property that
  * matters when "stores × days" is billions of units at 100 TB).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.WorklistSource")
  *     .option("stores", "100")           // store ids [0, stores)
  *     .option("lo", "1995-01-01").option("hi", "1995-01-07")
  *     .option("numPartitions", "8")
  *     .load()                            // → (store_id LONG, d DATE)
  * }}}
  */
class WorklistSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WorklistSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WorklistTable(new CaseInsensitiveStringMap(properties))
}

object WorklistSource {
  val schema: StructType = new StructType()
    .add("store_id", LongType, nullable = false)
    .add("d", DateType, nullable = false)
}

private[sources] class WorklistTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_worklist"
  override def schema(): StructType = WorklistSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val stores = opts.getLong("stores", 10L)
    // name the missing option instead of an unexplained NPE from
    // LocalDate.parse(null)
    require(opts.get("lo") != null && opts.get("hi") != null,
      "options 'lo' and 'hi' (ISO dates) are required")
    val lo = LocalDate.parse(opts.get("lo"))
    val hi = LocalDate.parse(opts.get("hi"))
    require(!lo.isAfter(hi), s"lo $lo must be <= hi $hi")
    val parts = opts.getInt("numPartitions", 4)
    new WorklistScan(stores, lo, hi, parts)
  }
}

/** One object plays ScanBuilder/Scan/Batch — the source is simple
  * enough that the three planning stages carry the same values.
  *
  * Filter pushdown: range predicates on `store_id` and `d` NARROW the
  * generation ranges before partition planning (a `store_id < 10`
  * filter over a million-store worklist plans 10 stores, not 1M — and
  * shrinks the partition count observably). All filters are also
  * returned as residuals, so Spark re-applies them post-scan: the
  * pushdown is a strict optimization, never a correctness dependency —
  * the same contract parquet scans follow.
  */
private[sources] class WorklistScan(stores: Long, lo: LocalDate, hi: LocalDate,
                                    parts: Int)
    extends ScanBuilder with SupportsPushDownFilters with Scan with Batch
    with Serializable {
  private var storeLo = 0L
  private var storeHi = stores
  private var dayLo = lo.toEpochDay.toInt
  private var dayHi = hi.toEpochDay.toInt
  private var pushed: Array[Filter] = Array.empty

  private def toDay(v: Any): Option[Int] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case d: LocalDate => Some(d.toEpochDay.toInt)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("store_id", v: Long) =>
        storeLo = math.max(storeLo, v); storeHi = math.min(storeHi, v + 1); true
      case GreaterThanOrEqual("store_id", v: Long) =>
        storeLo = math.max(storeLo, v); true
      case GreaterThan("store_id", v: Long) =>
        storeLo = math.max(storeLo, v + 1); true
      case LessThan("store_id", v: Long) =>
        storeHi = math.min(storeHi, v); true
      case LessThanOrEqual("store_id", v: Long) =>
        storeHi = math.min(storeHi, v + 1); true
      case EqualTo("d", v) => toDay(v).exists { x =>
        dayLo = math.max(dayLo, x); dayHi = math.min(dayHi, x); true }
      case GreaterThanOrEqual("d", v) => toDay(v).exists { x =>
        dayLo = math.max(dayLo, x); true }
      case GreaterThan("d", v) => toDay(v).exists { x =>
        dayLo = math.max(dayLo, x + 1); true }
      case LessThan("d", v) => toDay(v).exists { x =>
        dayHi = math.min(dayHi, x - 1); true }
      case LessThanOrEqual("d", v) => toDay(v).exists { x =>
        dayHi = math.min(dayHi, x); true }
      case _ => false
    }
    filters // all residual: Spark re-applies, pushdown is optimization-only
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = this
  override def readSchema(): StructType = WorklistSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_worklist stores=[$storeLo,$storeHi) days=[$dayLo,$dayHi]"

  /** Split the STORE range, not the date range: stores is the large
    * axis (the reference loops stores outer, dates inner) and an even
    * store split keeps partitions balanced for any window length.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0L, storeHi - storeLo)
    if (span == 0L || dayLo > dayHi) return Array.empty
    val n = math.max(1, math.min(parts.toLong, span)).toInt
    (0 until n).map { i =>
      val start = storeLo + span * i / n
      val end = storeLo + span * (i + 1) / n
      WorklistPartition(start, end, dayLo, dayHi).asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WorklistReaderFactory
}

private[sources] case class WorklistPartition(storeStart: Long, storeEnd: Long,
                                              loDay: Int, hiDay: Int)
    extends InputPartition

private[sources] class WorklistReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WorklistPartition]
    new PartitionReader[InternalRow] {
      private var store = p.storeStart
      private var day = p.loDay - 1

      override def next(): Boolean = {
        if (store >= p.storeEnd) false
        else if (day < p.hiDay) { day += 1; true }
        else { store += 1; day = p.loDay; store < p.storeEnd }
      }

      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](store, day))

      override def close(): Unit = ()
    }
  }
}
