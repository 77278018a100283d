package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownLimit}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{Encoder, Encoders}

/** DataSource V2 connector for the deterministic NEXMark generator — the
  * engine's analog of the reference implementing its own sources
  * (/root/reference/flock/src/datasource/nexmark/): `spark.read
  * .format("graft.sources.NexmarkSource").option("entity", "bid")
  * .option("n", ...).option("eps", ...).load()`.
  *
  * The id space [0, n) splits into `partitions` ranges planned on the
  * driver as metadata only; every executor regenerates its own events
  * from the per-id splitmix64 seed (Nexmark.gen*), so the source ships
  * ZERO data from the driver and scales to any n on any cluster — the
  * property the reference gets from regenerating events inside each
  * Lambda (nexmark/source.rs), expressed as a first-class Spark source
  * instead of a MemoryStream/`spark.range` workaround.
  */
class NexmarkSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-nexmark"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NexmarkSource.schemaFor(options.getOrDefault("entity", "bid"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NexmarkTable(new CaseInsensitiveStringMap(properties))
}

object NexmarkSource {
  def encoderFor(entity: String): Encoder[_] = entity match {
    case "bid" => Encoders.product[Nexmark.Bid]
    case "auction" => Encoders.product[Nexmark.Auction]
    case "person" => Encoders.product[Nexmark.Person]
    case other => throw new IllegalArgumentException(s"unknown entity: $other")
  }
  def schemaFor(entity: String): StructType = encoderFor(entity).schema
  val kindFor: Map[String, Int] = Map("person" -> 0, "auction" -> 1, "bid" -> 2)

  /** Event-id offset for the streaming read path. */
  case class IdOffset(id: Long) extends Offset {
    override def json(): String = id.toString
  }
}

class NexmarkTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val entity = options.getOrDefault("entity", "bid")
  override def name(): String = s"nexmark_$entity"
  override def schema(): StructType = NexmarkSource.schemaFor(entity)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownLimit {
      // limit pushdown: a pushed LIMIT caps the generated id space
      // instead of generating-then-discarding. The 1:3:46 mix means up
      // to denominator/proportion ids per kept row; over-approximate so
      // the cap never starves the reader.
      private var lim: Long = Long.MaxValue
      override def pushLimit(limit: Int): Boolean = {
        lim = limit.toLong * Nexmark.ProportionDenominator
        false // inexact: Spark still applies its own Limit on top
      }
      override def build(): Scan = new NexmarkScan(
        entity,
        math.min(options.getLong("n", 50000L), lim),
        options.getLong("eps", 1000L),
        options.getInt("partitions", 8))
    }

}

case class NexmarkRange(entity: String, start: Long, end: Long, eps: Long)
  extends InputPartition

class NexmarkScan(entity: String, n: Long, eps: Long, partitions: Int)
    extends Scan with Batch {
  import NexmarkSource.IdOffset

  /** Streaming form: the same executor-side regeneration planned as
    * micro-batches over the event-id line. Offsets are plain event ids
    * (`IdOffset`) checkpointed as JSON — replaying [start, end) after a
    * failure regenerates the identical rows, which is exactly-once
    * replay for free (the reference needs its Arena/bitmap machinery for
    * the same guarantee). `n` bounds the stream so AvailableNow-style
    * drains terminate; a production feed would leave it unbounded and
    * pace `rowsPerBatch` off the trigger interval.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      private val rowsPerBatch =
        math.max(1L, n / math.max(1, partitions) / 4)
      override def initialOffset(): Offset = IdOffset(0L)
      override def latestOffset(): Offset = IdOffset(n)
      override def deserializeOffset(json: String): Offset =
        IdOffset(json.toLong)
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val s0 = start.asInstanceOf[IdOffset].id
        val e0 = end.asInstanceOf[IdOffset].id
        val step = math.max(1L, math.min(rowsPerBatch, (e0 - s0 + partitions - 1) / math.max(1, partitions)))
        (s0 until e0 by step)
          .map(b => NexmarkRange(entity, b, math.min(e0, b + step), eps))
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new NexmarkReaderFactory
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }

  override def readSchema(): StructType = NexmarkSource.schemaFor(entity)
  override def description(): String =
    "NexmarkScan(entity=" + entity + ", n=" + n + ", partitions=" + partitions + ")"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val step = math.max(1L, (n + partitions - 1) / partitions)
    (0L until n by step)
      .map(s => NexmarkRange(entity, s, math.min(n, s + step), eps))
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new NexmarkReaderFactory
}

class NexmarkReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[NexmarkRange]
    val kind = NexmarkSource.kindFor(r.entity)
    // serializer is created executor-side per partition (not serialized)
    val toRow: Any => InternalRow = r.entity match {
      case "bid" =>
        val s = ExpressionEncoder[Nexmark.Bid]().createSerializer()
        v => s(v.asInstanceOf[Nexmark.Bid]).copy()
      case "auction" =>
        val s = ExpressionEncoder[Nexmark.Auction]().createSerializer()
        v => s(v.asInstanceOf[Nexmark.Auction]).copy()
      case _ =>
        val s = ExpressionEncoder[Nexmark.Person]().createSerializer()
        v => s(v.asInstanceOf[Nexmark.Person]).copy()
    }
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      override def next(): Boolean = {
        id += 1
        while (id < r.end && Nexmark.kindOf(id) != kind) id += 1
        id < r.end
      }
      override def get(): InternalRow = {
        val v: Any = kind match {
          case 2 => Nexmark.genBid(id, r.eps)
          case 1 => Nexmark.genAuction(id, r.eps)
          case _ => Nexmark.genPerson(id, r.eps)
        }
        toRow(v)
      }
      override def close(): Unit = ()
    }
  }
}
