package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-history building: collapse a change stream into SCD
  * TYPE-2 validity intervals — the warehouse-side complement of the
  * CDC epoch-apply in [[graft.streaming.Streams]] (that one answers
  * "what is the current state", this one "what was true when").
  *
  * Scale shape: two windows over the SAME (key, ts) partitioning —
  * one exchange, each user's history sorts independently; no global
  * sort, no driver state. The event stream is the input; the output
  * is one row per (key, run of equal values).
  */
object History {

  /** Build SCD2 intervals from an event stream: for each `keyCol`,
    * order by (`tsCol`, `tieCol`) and keep only CHANGE rows (value
    * differs from the previous row's, or first row); each kept row
    * becomes an interval [valid_from, valid_to) where valid_to is the
    * next change's timestamp — NULL for the currently-open interval.
    *
    * Equal-timestamp changes are ordered by `tieCol` (a unique id), so
    * the history is deterministic; a zero-length interval (two changes
    * at one timestamp) is retained — it was true "for an instant" and
    * dropping it would hide the intermediate value from audits.
    *
    * Returns (keyCol, valueCol, valid_from, valid_to). */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val changes = df
      .withColumn("__prev", lag(col(valueCol), 1).over(order))
      .withColumn("__first", row_number().over(order) === 1)
      // null-safe inequality: a null value following a non-null (or
      // vice versa) IS a change; null-to-null is not
      .filter(col("__first") || !(col(valueCol) <=> col("__prev")))
    val next = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(next))
      .select(col(keyCol), col(valueCol),
        col(tsCol).as("valid_from"), col("valid_to"))
  }

  /** Point-in-time lookup against an SCD2 frame: the value of each key
    * at `asOf` — the interval containing the instant (valid_from ≤
    * asOf < valid_to, open intervals unbounded). A plain filter, no
    * window: the SCD2 frame is already one row per interval. */
  def asOf(scd2Frame: DataFrame, asOfTs: org.apache.spark.sql.Column): DataFrame =
    scd2Frame.filter(col("valid_from") <= asOfTs &&
      (col("valid_to").isNull || col("valid_to") > asOfTs))
}
