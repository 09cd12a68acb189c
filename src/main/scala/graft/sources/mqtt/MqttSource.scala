package graft.sources.mqtt

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 micro-batch MQTT source (SURVEY.md §2.1 S1–S4):
  *
  * {{{
  * spark.readStream.format("mqtt")
  *   .option("clientId", "engine-1")
  *   .option("topics", "/+/+/out/sensors/#,/alerts/#")
  *   .load()  // topic STRING, payload STRING, receivedAt TIMESTAMP
  * }}}
  *
  * - Offsets are the broker-session sequence number → exactly-once replay
  *   within a session from the checkpoint (the reference loses its channel
  *   backlog on crash — message.go:17; deviation §4.3 by design).
  * - `MqttSource.reconfigure(clientId, topics)` swaps the subscription set;
  *   the swap takes effect between micro-batches (reference drops messages
  *   during its unsubscribe/subscribe window, main.go:104-107 — here the
  *   boundary is atomic).
  * - One input partition per micro-batch: an MQTT connection is a single
  *   ordered feed (the reference's single channel, message.go:17).
  *   Parallelism begins immediately downstream at the parse/route stages,
  *   which repartition by tableName; for 100 TB-scale fan-in you run many
  *   sources (one per broker shard) and union the streams.
  */
class MqttDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "mqtt"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MqttSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MqttTable(new CaseInsensitiveStringMap(properties))
}

object MqttSource {
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("payload", StringType),
    StructField("receivedAt", TimestampType)))

  /** S2/S3 — dynamic reconfiguration entry point (what the reference's
    * Consul watcher calls on a topic-map change, main.go:97-108). */
  def reconfigure(clientId: String, topicFilters: Seq[String]): Unit =
    InMemoryBroker.setSubscriptions(clientId, topicFilters)
}

final class MqttTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"mqtt(${options.get("clientId")})"
  override def schema(): StructType = MqttSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = MqttSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
        val clientId = Option(opts.get("clientId")).getOrElse("default")
        val topics = Option(opts.get("topics"))
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        val connector = MqttConnectors.resolve(k => Option(opts.get(k)))
        // Apply the option set only on FIRST connect: a query restart
        // re-runs this with the original (possibly stale) option string,
        // which must not revert a later dynamic reconfigure() — including
        // an explicit unsubscribe-all (hence "configured", not "nonEmpty").
        if (!connector.isConfigured(clientId))
          connector.setSubscriptions(clientId, topics)
        new MqttMicroBatchStream(connector, clientId)
      }
    }
}

final case class MqttOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

final class MqttMicroBatchStream(connector: MqttConnector, clientId: String)
    extends MicroBatchStream {
  override def initialOffset(): Offset = MqttOffset(0L)
  override def latestOffset(): Offset =
    MqttOffset(connector.latestSeq(clientId))
  override def deserializeOffset(json: String): Offset =
    MqttOffset(json.trim.toLong)
  override def commit(end: Offset): Unit =
    // committed prefix is never re-read (the checkpoint owns replay from
    // here) — drop it so the broker buffer stays bounded
    connector.truncate(clientId, end.asInstanceOf[MqttOffset].seq)
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val msgs = connector.fetch(clientId,
      start.asInstanceOf[MqttOffset].seq, end.asInstanceOf[MqttOffset].seq)
    if (msgs.isEmpty) Array.empty
    else Array(MqttInputPartition(msgs.toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new MqttPartitionReader(p.asInstanceOf[MqttInputPartition].msgs)
    }
}

final case class MqttInputPartition(msgs: Array[InMemoryBroker.Msg])
    extends InputPartition

final class MqttPartitionReader(msgs: Array[InMemoryBroker.Msg])
    extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < msgs.length }
  override def get(): InternalRow = {
    val m = msgs(i)
    InternalRow(UTF8String.fromString(m.topic),
      UTF8String.fromString(m.payload), m.tsMicros)
  }
  override def close(): Unit = ()
}
