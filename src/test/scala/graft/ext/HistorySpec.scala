package graft.ext

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val stream = Seq(
    // user 1: A -> A (no change) -> B -> B -> A again
    (1L, ts("2024-01-01 00:00:00"), 10L, "A"),
    (1L, ts("2024-01-01 01:00:00"), 11L, "A"),
    (1L, ts("2024-01-01 02:00:00"), 12L, "B"),
    (1L, ts("2024-01-01 03:00:00"), 13L, "B"),
    (1L, ts("2024-01-01 04:00:00"), 14L, "A"),
    // user 2: single event, open interval
    (2L, ts("2024-01-02 00:00:00"), 20L, "X")
  ).toDF("user_id", "ts", "event_id", "event_type")

  test("scd2: runs collapse to intervals, last interval open, re-emergence is a new interval") {
    val out = History.scd2(stream, "user_id", "ts", "event_type", "event_id")
      .orderBy($"user_id", $"valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    assert(out == Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 02:00:00"))),
      (1L, "B", ts("2024-01-01 02:00:00"), Some(ts("2024-01-01 04:00:00"))),
      (1L, "A", ts("2024-01-01 04:00:00"), None),
      (2L, "X", ts("2024-01-02 00:00:00"), None)))
  }

  test("scd2: equal-timestamp changes keep a zero-length interval, ordered by tie column") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "B"),
      (1L, ts("2024-01-01 01:00:00"), 3L, "C")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = History.scd2(df, "user_id", "ts", "event_type", "event_id")
      .orderBy($"valid_from", $"event_type")
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    assert(out == Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 01:00:00"))),
      (1L, "B", ts("2024-01-01 01:00:00"), Some(ts("2024-01-01 01:00:00"))),
      (1L, "C", ts("2024-01-01 01:00:00"), None)))
  }

  test("scd2: null-safe change detection (null->value and value->null are changes)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Option.empty[String]),
      (1L, ts("2024-01-01 01:00:00"), 2L, Option.empty[String]),
      (1L, ts("2024-01-01 02:00:00"), 3L, Some("A")),
      (1L, ts("2024-01-01 03:00:00"), 4L, Option.empty[String])
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = History.scd2(df, "user_id", "ts", "event_type", "event_id")
      .orderBy($"valid_from")
      .as[(Long, Option[String], Timestamp, Option[Timestamp])].collect().toSeq
    assert(out == Seq(
      (1L, None, ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 02:00:00"))),
      (1L, Some("A"), ts("2024-01-01 02:00:00"), Some(ts("2024-01-01 03:00:00"))),
      (1L, None, ts("2024-01-01 03:00:00"), None)))
  }

  test("asOf: point-in-time lookup picks the containing interval; open interval matches the future") {
    val frame = History.scd2(stream, "user_id", "ts", "event_type", "event_id")
    val at = History.asOf(frame, lit("2024-01-01 02:30:00").cast("timestamp"))
      .select($"user_id", $"event_type").as[(Long, String)].collect().toSet
    assert(at == Set((1L, "B"))) // user 2 not yet born at that instant
    val late = History.asOf(frame, lit("2030-01-01 00:00:00").cast("timestamp"))
      .select($"user_id", $"event_type").as[(Long, String)].collect().toSet
    assert(late == Set((1L, "A"), (2L, "X")))
    // boundary: an interval is closed at valid_from, open at valid_to
    val boundary = History.asOf(frame, lit("2024-01-01 02:00:00").cast("timestamp"))
      .filter($"user_id" === 1L)
      .select($"event_type").as[String].collect().toSeq
    assert(boundary == Seq("B"))
  }
}
