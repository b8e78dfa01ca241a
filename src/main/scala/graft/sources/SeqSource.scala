package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.PortableHash

/** A native DataSourceV2 batch source: the reference's event GENERATOR
  * (its Pub/Sub publisher side — `/root/reference/README.md` streaming
  * mode; SURVEY §2.1 S10, scoped out as "generator side" until now)
  * re-expressed as a Spark `TableProvider` that synthesizes the event
  * stream deterministically instead of replaying a recorded file.
  *
  * Every column derives from the portable two-round mixer over the row
  * id, so the WHOLE TABLE is engine-replayable: the s11 oracle
  * recomputes the identical rows in DuckDB from `range()` — the same
  * portability contract the minhash/simhash signatures carry, applied
  * to a data source.
  *
  * V2 integration is real, not decorative:
  *  - `SupportsPushDownFilters`: event_id range predicates narrow the
  *    generated [lo, hi) window — the source-side analog of parquet
  *    row-group pruning. Accepted filters are CONSUMED (returned as
  *    non-residual), so the plan's post-scan Filter disappears.
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only
  *    requested fields — a projection over a generator costs nothing,
  *    but the plumbing is the same one a columnar store needs.
  *  - `planInputPartitions` slices the id grid into `slices` splits
  *    and DROPS splits outside the pushed bounds: partition pruning,
  *    observable as the scan RDD's partition count (SeqSourceSpec).
  *
  * 100 TB note: a generator source scales embarrassingly — splits
  * share nothing — which is exactly why the load-test corpora the
  * reference's publisher produces should be a source, not a file:
  * no 100 TB write precedes the benchmark that reads it. */
object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private val M = PortableHash.MixMod
  /** 2024-01-01T00:00:00Z, the corpus epoch (TESTDATA.md). */
  private val epochSec = 1704067200L
  private val spanSec = 30L * 24 * 3600

  private def mixOf(i: Long, a: Long, b: Long): Long =
    PortableHash.mix((i * a + b) % M)

  def tsMicros(i: Long): Long =
    (epochSec + mixOf(i, 11, 4) % spanSec) * 1000000L
  def userId(i: Long): Long = mixOf(i, 3, 1) % 150L
  def eventType(i: Long): String = {
    val roll = mixOf(i, 5, 2) % 100L
    if (roll < 40) "view" else if (roll < 65) "click"
    else if (roll < 80) "purchase" else if (roll < 95) "signup"
    else "error"
  }
  def value(i: Long): Double = (mixOf(i, 7, 3) % 10000L) / 100.0
}

class SeqSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("batchRows", "1000").toLong)
}

class SeqTable(n: Long, slices: Int, batchRows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_seq($n)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, slices, batchRows)
}

class SeqScanBuilder(n: Long, slices: Int, batchRows: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = n
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema

  private def longOf(v: Any): Option[Long] = v match {
    case x: Number => Some(x.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case GreaterThanOrEqual("event_id", v) => longOf(v) match {
        case Some(x) => lo = math.max(lo, x); false
        case None => true
      }
      case GreaterThan("event_id", v) => longOf(v) match {
        case Some(x) => lo = math.max(lo, x + 1); false
        case None => true
      }
      case LessThan("event_id", v) => longOf(v) match {
        case Some(x) => hi = math.min(hi, x); false
        case None => true
      }
      case LessThanOrEqual("event_id", v) => longOf(v) match {
        case Some(x) => hi = math.min(hi, x + 1); false
        case None => true
      }
      case EqualTo("event_id", v) => longOf(v) match {
        case Some(x) => lo = math.max(lo, x); hi = math.min(hi, x + 1); false
        case None => true
      }
      case _ => true
    }
    accepted = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SeqScan(n, lo, hi, slices, batchRows, required)
}

class SeqScan(n: Long, lo: Long, hi: Long, slices: Int, batchRows: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** The STREAMING face: the same generated grid delivered as
    * micro-batches of `batchRows` ids per trigger — the continuous
    * event-publisher mode the reference runs against Pub/Sub, minus
    * the broker. Offsets are plain row positions within the pushed
    * [lo, hi) window, so a restart from checkpoint resumes mid-grid
    * exactly (offset JSON is the position), and batch ≡ streaming
    * equality is structural: the union of micro-batch id ranges IS
    * the batch scan's range (SeqSourceSpec pins it). */
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new SeqMicroBatchStream(lo, hi, batchRows, required)
  override def description(): String =
    s"graft_seq n=$n bounds=[$lo, $hi) slices=$slices"

  override def planInputPartitions(): Array[InputPartition] = {
    // fixed-width splits over the FULL grid, then prune by the pushed
    // bounds — mirroring how a file source prunes whole files rather
    // than re-balancing what survives
    val width = math.max(1L, (n + slices - 1) / slices)
    (0 until slices).iterator
      .map { s =>
        val a = math.max(s * width, lo)
        val b = math.min(math.min((s + 1) * width, n), hi)
        SeqPartition(a, b)
      }
      .filter(p => p.start < p.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
}

case class SeqPartition(start: Long, end: Long) extends InputPartition

case class SeqOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class SeqMicroBatchStream(lo: Long, hi: Long, batchRows: Long,
    required: StructType) extends MicroBatchStream {
  // how much of the grid has been "published" — advanced by one
  // batchRows quantum per trigger, the generator's rate limit
  private var available = lo

  override def initialOffset(): Offset = SeqOffset(lo)
  override def latestOffset(): Offset = {
    available = math.min(hi, available + math.max(1L, batchRows))
    SeqOffset(available)
  }
  override def deserializeOffset(json: String): Offset =
    SeqOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val a = start.asInstanceOf[SeqOffset].pos
    val b = end.asInstanceOf[SeqOffset].pos
    if (a < b) Array(SeqPartition(a, b)) else Array.empty
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class SeqReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var i = sp.start - 1
      private val gens: Array[Long => Any] = fields.map {
        case "event_id" => (i: Long) => i
        case "ts" => (i: Long) => SeqSource.tsMicros(i)
        case "user_id" => (i: Long) => SeqSource.userId(i)
        case "event_type" =>
          (i: Long) => UTF8String.fromString(SeqSource.eventType(i))
        case "value" => (i: Long) => SeqSource.value(i)
        case other => throw new IllegalArgumentException(
          s"unknown column: $other")
      }
      override def next(): Boolean = { i += 1; i < sp.end }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(i)).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
