package graft.sources.rest

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-facing convenience surface over the connector, mirroring the
  * reference's non-scan API (SURVEY §2.2). */
object RestOps {

  def read(spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.read.format("graft-rest").options(options).load()

  /** S3: catalog listing. */
  def listObjects(options: Map[String, String]): Seq[String] =
    RestRetry.withRetry(RetryPolicy.fromOptions(lc(options)))(
      RestTable.transportFor(options).listObjects())

  /** S5: remaining API quota (reference: salesforce/main.py:102-104). */
  def limits(options: Map[String, String]): Map[String, Long] =
    RestRetry.withRetry(RetryPolicy.fromOptions(lc(options)))(
      RestTable.transportFor(options).limits())

  /** S7: one-shot remote stats probe (COUNT pushed to the API, no scan
    * — reference: revtron/salesforce/main.py:185-228). */
  def sobjectSize(options: Map[String, String], obj: String,
      preds: Seq[RPred] = Nil, includeDeleted: Boolean = true): Long =
    RestRetry.withRetry(RetryPolicy.fromOptions(lc(options)))(
      RestTable.transportFor(options).count(obj, preds, includeDeleted))

  private def lc(options: Map[String, String]): Map[String, String] =
    options.map { case (k, v) => k.toLowerCase -> v }

  private val StatusSchema = StructType(Seq(
    StructField("record_id", StringType),
    StructField("success", BooleanType),
    StructField("error", StringType)))

  /** S8/S9 write-then-report: per-record upsert with the reference's
    * never-throw error envelope (salesforce/main.py:242-249) surfaced
    * as a STATUS DataFrame — the distributed analogue of the
    * 100-thread `_bulk_upsert` returning per-record results
    * (main.py:251-265). Each input partition writes sequentially;
    * overall concurrency = number of partitions. */
  def upsertWithStatus(df: DataFrame, obj: String,
      options: Map[String, String]): DataFrame = {
    val schema = df.schema
    val policy = RetryPolicy.fromOptions(lc(options))
    df.mapPartitions { rows =>
      val t = RestTable.transportFor(options) // per-partition client init
      rows.map { r =>
        val rec = schema.fields.zipWithIndex.flatMap { case (f, i) =>
          if (r.isNullAt(i)) None
          else Some(f.name -> (f.dataType match {
            case TimestampType =>
              r.getAs[java.sql.Timestamp](i).getTime * 1000L
            case _ => r.get(i)
          }))
        }.toMap
        // mutation retry class: 5xx only for keyed (idempotent) records
        val keyed = rec.get("Id") match {
          case Some(s: String) => s.nonEmpty
          case _ => false
        }
        // NEVER throws (r15 advice): an escaping RestHttpError would
        // fail the task and task retry would replay the partition's
        // already-committed unkeyed creates — mutationToEnvelope
        // converts it to a record-level error row instead
        RestRetry.mutationToEnvelope(policy, keyed)(t.upsert(obj, rec)) match {
          case Right(id) => Row(id, true, null)
          case Left(e)   => Row(rec.get("Id").map(String.valueOf).orNull, false, e)
        }
      }
    }(Encoders.row(StatusSchema))
  }
}
