package graft.sources

import java.time.LocalDate
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
    val lo = LocalDate.parse(opts.get("lo"))
    val hi = LocalDate.parse(opts.get("hi"))
    require(!lo.isAfter(hi), s"lo $lo must be <= hi $hi")
    val parts = opts.getInt("numPartitions", 4)
    new WorklistScan(stores, lo, hi, parts)
  }
}

/** One object plays ScanBuilder/Scan/Batch — the source is simple
  * enough that the three planning stages carry the same four values.
  */
private[sources] class WorklistScan(stores: Long, lo: LocalDate, hi: LocalDate,
                                    parts: Int)
    extends ScanBuilder with Scan with Batch with Serializable {
  override def build(): Scan = this
  override def readSchema(): StructType = WorklistSource.schema
  override def toBatch: Batch = this

  /** Split the STORE range, not the date range: stores is the large
    * axis (the reference loops stores outer, dates inner) and an even
    * store split keeps partitions balanced for any window length.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, math.min(parts.toLong, stores)).toInt
    (0 until n).map { i =>
      val start = stores * i / n
      val end = stores * (i + 1) / n
      WorklistPartition(start, end, lo.toEpochDay.toInt, hi.toEpochDay.toInt)
        .asInstanceOf[InputPartition]
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
