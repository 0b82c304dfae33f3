package graft.sources.rest

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Streaming form of the two-phase incremental scan: the reference's
  * date-window pull (S6, revtron/salesforce/main.py:110-128 — "give me
  * records modified between start_date and end_date") becomes a
  * MicroBatchStream whose OFFSET IS THE DATE CURSOR. Each micro-batch
  * covers (startOffset, endOffset] on the modification timestamp; the
  * id scan + chunking + executor-parallel fetch are identical to the
  * batch path. Exactly the CDC idiom SURVEY §1.1 maps to Structured
  * Streaming.
  */
class RestMicroBatchStream(schema: StructType, options: Map[String, String],
    obj: String, checkpointLocation: String) extends MicroBatchStream {

  private def transport = RestTable.transportFor(options)
  private val dateField = options.getOrElse("datefield", "LastModifiedDate")
  private val pageSize = options.getOrElse("pagesize", "200").toInt
  private val batchSize = options.getOrElse("batchsize", "100").toInt
  private val includeDeleted = options.getOrElse("includedeleted", "true").toBoolean
  private val policy = RetryPolicy.fromOptions(options)

  override def initialOffset(): Offset = RestOffset(0L)

  override def latestOffset(): Offset =
    RestOffset(RestRetry.withRetry(policy)(
      transport.latestModified(obj, dateField)))

  override def deserializeOffset(json: String): Offset =
    RestOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[RestOffset].micros
    val hi = end.asInstanceOf[RestOffset].micros
    if (hi <= lo) return Array.empty
    // (lo, hi] window on the modification timestamp — the reference's
    // start_date/end_date predicate, pushed remotely
    val preds = Seq(RPred.Gt(dateField, lo), RPred.Le(dateField, hi))
    val ids = RestRetry.retryingIterator(policy)(
      transport.queryIds(obj, preds, includeDeleted, None, pageSize))
      .flatten.toArray
    ids.grouped(batchSize).map(c => RestInputPartition(c): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(schema, options, obj)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class RestOffset(micros: Long) extends Offset {
  override def json(): String = micros.toString
}
