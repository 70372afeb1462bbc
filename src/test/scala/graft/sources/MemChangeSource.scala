package graft.sources

import scala.collection.concurrent.TrieMap

import graft.model.ChangeRecord
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Second, minimal `TableProvider` implementing the ChangeRecord row
  * contract — the test double behind `CdcStreamEngine.startSource`'s
  * "a Kafka source slots in behind the same row schema" claim. Rows
  * live in a driver-side channel buffer (this is a contract spec, not
  * a broker); the stream offset is the count of fed batches, exactly
  * the monotone-log shape a Kafka (topic, partition) offset map
  * reduces to. No spool files, no listing, no pushdown: if the engine
  * runs end-to-end on THIS, it depends only on the row shape.
  */
object MemChangeSource {
  /** One change record: timestamps are epoch micros (TimestampType's
    * internal representation). */
  final case class Rec(insertTsMicros: Long, database: String, lsn: Long,
      xid: Long, payload: String, xidTsMicros: Long, slot: String)

  private val channels = TrieMap.empty[String, Vector[Vector[Rec]]]

  /** Append one batch of records to a channel (≈ one producer flush). */
  def feed(channel: String, recs: Seq[Rec]): Unit = {
    channels.updateWith(channel) {
      case Some(batches) => Some(batches :+ recs.toVector)
      case None => Some(Vector(recs.toVector))
    }
    ()
  }

  def clear(channel: String): Unit = { channels.remove(channel); () }

  private[sources] def batches(channel: String): Vector[Vector[Rec]] =
    channels.getOrElse(channel, Vector.empty)

  val FORMAT: String = classOf[MemChangeDataSource].getName
}

class MemChangeDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeRecord.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new MemChangeTable(new CaseInsensitiveStringMap(properties))
  override def supportsExternalMetadata(): Boolean = false
}

final class MemChangeTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val channel = Option(options.get("channel")).getOrElse(
    throw new IllegalArgumentException("mem source requires a 'channel' option"))
  override def name(): String = s"graft-mem($channel)"
  override def schema(): StructType = ChangeRecord.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ChangeRecord.schema
      override def toMicroBatchStream(ckpt: String): MicroBatchStream =
        new MemChangeStream(channel)
    }
}

/** Batch-count offset over the channel's append-only batch log. */
final case class MemOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}

final class MemChangeStream(channel: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private var availableNowEnd: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(MemChangeSource.batches(channel).size)
  private def visibleEnd: Int = {
    val n = MemChangeSource.batches(channel).size
    availableNowEnd.fold(n)(math.min(n, _))
  }
  override def initialOffset(): Offset = MemOffset(0)
  override def latestOffset(): Offset = MemOffset(visibleEnd)
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    MemOffset(visibleEnd)
  override def deserializeOffset(json: String): Offset = MemOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[MemOffset].n, end.asInstanceOf[MemOffset].n)
    // rows ride inside the partition: self-contained and serializable,
    // so the contract holds even off a shared-JVM local master
    MemChangeSource.batches(channel).slice(s, e)
      .map(b => MemChangePartition(b): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MemChangeReaderFactory
}

final case class MemChangePartition(recs: Vector[MemChangeSource.Rec])
    extends InputPartition

final class MemChangeReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val it = partition.asInstanceOf[MemChangePartition].recs.iterator
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val r = it.next()
        row = new GenericInternalRow(Array[Any](
          r.insertTsMicros, UTF8String.fromString(r.database), r.lsn, r.xid,
          UTF8String.fromString(r.payload), r.xidTsMicros,
          UTF8String.fromString(r.slot)))
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
