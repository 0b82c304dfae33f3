package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators (north-star extension; the reference's
  * closest idiom is incremental date-window batch extraction, reference:
  * revtron/salesforce/main.py:110-128,189-202 — the CDC pattern these
  * streaming transforms generalize).
  *
  * Every transform here takes a Dataset and returns a Dataset, so the
  * SAME function runs in batch mode (unit/oracle tests) and under
  * `readStream`/`writeStream` (watermark semantics only engage when the
  * input is streaming). State is bounded by watermarks — the 100 TB
  * rule for streams (SURVEY §7.5).
  */
object Streams {

  /** Tumbling-window counts+sums per event_type. Watermark bounds state
    * and drops late data beyond `lateness`. */
  def tumblingAgg(events: DataFrame, tsCol: String, windowDur: String,
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window average value. */
  def slidingAvg(events: DataFrame, tsCol: String, windowDur: String,
      slide: String, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDur, slide))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .select(col("window.start").as("window_start"), col("n"), col("avg_value"))

  /** Session windows by user with an inactivity gap. */
  def sessionAgg(events: DataFrame, tsCol: String, gap: String,
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"), col("sum_value"))

  /** Streaming dedup: first occurrence per key wins; state expires with
    * the watermark (exactly-once within the lateness horizon). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, keys: Seq[String],
      lateness: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicates(keys :+ tsCol)

  /** Per-user running state via mapGroupsWithState: event count + last
    * seen timestamp + running value sum. Demonstrates custom keyed state
    * with processing-time timeout (state GC). */
  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserState(user_id: Long, n: Long, sum_value: Double,
      last_ts: java.sql.Timestamp)

  def runningUserState(events: Dataset[UserEvent]): Dataset[UserState] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(userId, 0L, 0.0, null))
          val next = rows.foldLeft(prev) { (s, e) =>
            val newer = s.last_ts == null || e.ts.after(s.last_ts)
            UserState(userId, s.n + 1, s.sum_value + e.value,
              if (newer) e.ts else s.last_ts)
          }
          state.update(next)
          next
      }
  }

  /** Streaming incremental pull — the Structured-Streaming twin of the
    * reference's date-window batch extraction (S6, reference:
    * revtron/salesforce/main.py:189-202): a parquet file stream over
    * the events table; new files under `dir` arrive as micro-batches,
    * with the watermark as the continuously-advancing date cursor.
    * Handles the fixture's TIMESTAMP(NANOS) the same way as the batch
    * reader (nanos-as-long + exact integer division to micros). */
  def eventsFileStream(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Latest-value-per-key changelog — the STREAMING form of the
    * reference's upsert merge rule (D8, revtron/database/main.py:109-112,
    * "newest write wins per PK"): keyed state holds the current latest
    * event; a batch emits a row only when its key's latest actually
    * advances (late/duplicate events are absorbed silently). Downstream
    * sinks receive an upsert changelog, exactly what a CDC-materialized
    * table consumes. */
  def latestPerKey(events: Dataset[UserEvent]): Dataset[UserEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserEvent, UserEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserEvent]) =>
          val prev = state.getOption
          val candidates = rows ++ prev.iterator
          val newest = candidates.maxBy(_.ts.getTime)
          if (prev.forall(p => newest.ts.after(p.ts))) {
            state.update(newest)
            Iterator.single(newest)
          } else Iterator.empty
      }
  }

  /** Batch-mode sessionization (gaps-and-islands): a new session starts
    * after `gapMinutes` of inactivity; pure window functions so it is
    * oracle-checkable in SQL — the batch twin of [[sessionAgg]]. */
  def sessionizeBatch(events: DataFrame, tsCol: String, userCol: String,
      gapMinutes: Int, tieBreak: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = col(tsCol) +: tieBreak.map(col).toSeq
    val byUser = Window.partitionBy(col(userCol)).orderBy(ord: _*)
    val flagged = events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col(tsCol).cast("long") - col("__prev").cast("long") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
