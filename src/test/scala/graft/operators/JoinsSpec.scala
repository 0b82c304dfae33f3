package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of backward: greatest right ts <= left ts per key, inclusive at equality") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "t1"),
      (1L, ts("2024-01-01 10:05:00"), "t2"),
      (1L, ts("2024-01-01 09:00:00"), "t0"),   // before any quote
      (2L, ts("2024-01-01 10:00:00"), "t3")    // key with no quotes
    ).toDF("sym", "tts", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100.0),
      (1L, ts("2024-01-01 10:00:00"), 101.0),  // equal ts -> must match t1
      (1L, ts("2024-01-01 10:04:00"), 102.0)
    ).toDF("qsym", "qts", "price")

    val out = AsOfJoin.backward(trades, "sym", "tts", quotes, "qsym", "qts")
      .select("trade", "price").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out("t0") == null)       // nothing at or before 09:00
    assert(out("t1") == 101.0)      // inclusive equality
    assert(out("t2") == 102.0)      // latest before 10:05
    assert(out("t3") == null)       // no right rows for key 2
  }

  test("as-of forward: smallest right ts >= left ts, inclusive") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "t1"),
      (1L, ts("2024-01-01 11:00:00"), "t2")).toDF("sym", "tts", "trade")
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:30:00"), 101.0)).toDF("qsym", "qts", "price")
    val out = AsOfJoin.forward(l, "sym", "tts", r, "qsym", "qts")
      .select("trade", "price").collect().map(x => x.getString(0) -> x.get(1)).toMap
    assert(out("t1") == 100.0)  // inclusive equality
    assert(out("t2") == null)   // no future quote
  }

  test("as-of: null keys and null timestamps never match") {
    val l = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), "ok"),
      (None: Option[Long], Some(ts("2024-01-01 10:00:00")), "null-key"),
      (Some(1L), None: Option[java.sql.Timestamp], "null-ts")
    ).toDF("sym", "tts", "trade")
    val r = Seq(
      (Some(1L), Some(ts("2024-01-01 09:00:00")), 100.0),
      (None: Option[Long], Some(ts("2024-01-01 09:00:00")), 666.0),  // null right key
      (Some(1L), None: Option[java.sql.Timestamp], 777.0)            // null right ts
    ).toDF("qsym", "qts", "price")
    val bw = AsOfJoin.backward(l, "sym", "tts", r, "qsym", "qts")
      .select("trade", "price").collect().map(x => x.getString(0) -> x.get(1)).toMap
    assert(bw("ok") == 100.0)       // the only legitimate match
    assert(bw("null-key") == null)  // null keys don't equi-match
    assert(bw("null-ts") == null)   // null ts has no "before"
    val fw = AsOfJoin.forward(l, "sym", "tts", r, "qsym", "qts")
      .select("trade", "price").collect().map(x => x.getString(0) -> x.get(1)).toMap
    assert(fw("ok") == null && fw("null-key") == null && fw("null-ts") == null)
  }

  test("as-of rejects ambiguous column names") {
    val l = Seq((1L, 1L)).toDF("k", "ts")
    intercept[IllegalArgumentException](AsOfJoin.backward(l, "k", "ts", l, "k", "ts"))
  }

  test("binned range join == naive theta join (point in [lo, hi))") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 27L), (4L, 100L)).toDF("pid", "p")
    val ivals = Seq((10L, 0L, 11L), (20L, 9L, 28L), (30L, 90L, 95L)).toDF("iid", "lo", "hi")
    val binned = RangeJoin.binned(points, "p", ivals, "lo", "hi", binWidth = 8)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivals, $"p" >= $"lo" && $"p" < $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L)))
  }

  test("keyed range join applies equi + range predicates") {
    val l = Seq((1L, 5L), (1L, 50L), (2L, 5L)).toDF("k", "v")
    val r = Seq((1L, 0L, 10L)).toDF("rk", "lo", "hi")
    val out = RangeJoin.keyed(l, r, $"k" === $"rk", $"v".between($"lo", $"hi"))
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 5L)))
  }
}
