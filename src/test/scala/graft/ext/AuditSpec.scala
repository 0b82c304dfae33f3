package graft.ext

import java.sql.{Date, Timestamp}

import graft.SparkSpec

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("columnProfile: one row per column, exact nulls, HLL distincts near truth") {
    val df = Seq(
      (1L, Some("a"), Some("x")),
      (2L, Some("a"), None),
      (3L, Some("b"), Some("y")),
      (4L, None, Some("y"))
    ).toDF("id", "s1", "s2")
    val out = Audit.columnProfile(df, Seq("id", "s1", "s2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set("id", "s1", "s2"))
    assert(out("id") == ((4L, 0L, 4L)))    // HLL linear-counting: exact at tiny n
    assert(out("s1")._2 == 1L && out("s2")._2 == 1L)
    assert(out("s1")._3 == 2L && out("s2")._3 == 2L)
  }

  test("fkOrphans: counts broken references only, NULL keys are not orphans") {
    val child = Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None), (4L, Some(10L)))
      .toDF("id", "pid")
    val parent = Seq((10L, "p")).toDF("pk", "name")
    val out = Audit.fkOrphans(Seq(("child.pid", child, "pid", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("child.pid", 1L))) // only pid=99 is broken
  }

  test("fillDailyGaps: interior missing days appear as zeros, bounds come from the data") {
    val daily = Seq(
      (Date.valueOf("2024-01-01"), 5L),
      (Date.valueOf("2024-01-04"), 2L)
    ).toDF("day", "n")
    val out = Audit.fillDailyGaps(daily, "day", Seq("n"))
      .orderBy($"day")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(out == Seq(
      ("2024-01-01", 5L), ("2024-01-02", 0L),
      ("2024-01-03", 0L), ("2024-01-04", 2L)))
  }
}
