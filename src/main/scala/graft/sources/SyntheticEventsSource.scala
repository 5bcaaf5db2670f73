package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full DataSource V2 connector — the Spark analog of the reference's
  * ForeignScan slot (SURVEY.md §2.2 "other sources"): a deterministic
  * synthetic events generator, `spark.read.format("graft-events")`.
  *
  * Options: `rows` (id range size), `users`, `items`, `seed`,
  * `numPartitions`.
  *
  * Scale-bearing connector features, all real:
  *   - **Filter pushdown** (`SupportsPushDownFilters`): comparisons on
  *     `event_id` narrow the generated id range — pushed filters cost ZERO
  *     generation work, they never materialize a row to discard. Other
  *     predicates are left to Spark (returned as residuals).
  *   - **Column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *     computes only requested columns.
  *   - **Partition planning**: the id range splits into `numPartitions`
  *     contiguous slices — embarrassingly parallel, no driver state.
  *   - **Determinism**: every column is a pure splitmix64 function of
  *     (event_id, seed), so results are identical under any partitioning,
  *     retry, or speculative re-execution — the property that makes a
  *     generated source usable in tests and benchmarks at any scale.
  */
class SyntheticEventsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-events"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEvents.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SyntheticEventsTable(SyntheticEvents.Config.from(properties))
}

object SyntheticEvents {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("item_id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  final case class Config(rows: Long, users: Long, items: Long, seed: Long,
      numPartitions: Int)
  object Config {
    def from(m: JMap[String, String]): Config = {
      def get(k: String, d: Long): Long =
        Option(m.get(k)).map(_.toLong).getOrElse(d)
      Config(get("rows", 1000L), get("users", 100L), get("items", 50L),
        get("seed", 42L), get("numpartitions", 4L).toInt)
    }
  }

  /** splitmix64 finalizer — the standard statistically-solid 64-bit mixer. */
  def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def userOf(id: Long, c: Config): Long = Math.floorMod(mix(id ^ c.seed), c.users)
  def itemOf(id: Long, c: Config): Long =
    Math.floorMod(mix(id * 31 + c.seed), c.items)
  def valueOf(id: Long, c: Config): Double =
    Math.floorMod(mix(id + c.seed * 7), 500L) / 100.0
}

class SyntheticEventsTable(config: SyntheticEvents.Config)
    extends Table with SupportsRead {
  import scala.jdk.CollectionConverters._
  override def name(): String = s"graft_events(rows=${config.rows})"
  override def schema(): StructType = SyntheticEvents.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticEventsScanBuilder(config)
}

/** Pushdown state: [lo, hi) over event_id, narrowed by accepted filters. */
class SyntheticEventsScanBuilder(config: SyntheticEvents.Config)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = config.rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SyntheticEvents.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case EqualTo("event_id", _: Long) => true
      case GreaterThan("event_id", _: Long) => true
      case GreaterThanOrEqual("event_id", _: Long) => true
      case LessThan("event_id", _: Long) => true
      case LessThanOrEqual("event_id", _: Long) => true
      case _ => false
    }
    ok.foreach {
      case EqualTo(_, v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan(_, v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(_, v: Long) => lo = math.max(lo, v)
      case LessThan(_, v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: Long) => hi = math.min(hi, v + 1)
      case _ =>
    }
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SyntheticEventsScan(config, math.max(lo, 0L), math.max(hi, lo), required)
}

class SyntheticEventsScan(config: SyntheticEvents.Config, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-events range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, config.numPartitions)
    val span = math.max(0L, hi - lo)
    val step = math.max(1L, (span + n - 1) / n)
    (0 until n).iterator
      .map(i => (lo + i * step, math.min(hi, lo + (i + 1) * step)))
      .filter { case (a, b) => a < b }
      .map { case (a, b) =>
        SyntheticEventsPartition(a, b): InputPartition
      }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticEventsReaderFactory(config, required.fieldNames)
}

final case class SyntheticEventsPartition(lo: Long, hi: Long)
    extends InputPartition

class SyntheticEventsReaderFactory(config: SyntheticEvents.Config,
    cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SyntheticEventsPartition]
    new PartitionReader[InternalRow] {
      private var id = part.lo - 1
      override def next(): Boolean = { id += 1; id < part.hi }
      override def get(): InternalRow = {
        val vals: Array[Any] = cols.map {
          case "event_id" => id
          case "user_id" => SyntheticEvents.userOf(id, config)
          case "item_id" => SyntheticEvents.itemOf(id, config)
          case "value" => SyntheticEvents.valueOf(id, config)
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
