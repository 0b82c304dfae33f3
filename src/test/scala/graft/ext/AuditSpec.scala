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

  test("exactCorrelation: recovers known perfect/zero correlations; listwise null drop") {
    val rows = (1 to 40).map { i =>
      val x = i.toDouble
      // y = 2x + 3 (corr 1); z alternates independent of x (corr ~0)
      (x, 2.0 * x + 3.0, if (i % 2 == 0) 1.0 else -1.0)
    }
    val df = rows.toDF("x", "y", "z")
    val out = Audit.exactCorrelation(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(out(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(out(("x", "z"))) < 0.05)
    // constant column -> zero variance -> NULL, not NaN/error
    val const = Audit.exactCorrelation(
      rows.map { case (x, y, _) => (x, y, 7.0) }.toDF("x", "y", "z"), Seq("x", "z"))
      .collect().head
    assert(const.isNullAt(3))
  }

  test("associationRules: support/confidence/lift floor arithmetic on a known basket set") {
    // baskets: {A,B}, {A,B}, {A,C}, {B} -> 4 baskets; A:3 B:3 C:1
    val df = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B"), (4L, "B") // dup item collapses
    ).toDF("basket", "item")
    val out = graft.ext.Behavior.associationRules(df, "basket", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // A->B: n_ab 2, support 2/4, conf 2/3, lift (2/3)/(3/4)
    assert(out(("A", "B")) == ((2L, 500000L, 666666L, 888L)))
    assert(out(("B", "A")) == ((2L, 500000L, 666666L, 888L)))
    // A->C: conf 1/3, lift (1/3)/(1/4) = 1.333
    assert(out(("A", "C")) == ((1L, 250000L, 333333L, 1333L)))
    assert(!out.contains(("B", "C")) && !out.contains(("C", "B")))
  }

  test("groupedTrend: recovers a planted slope/intercept; constant-x reads NULL") {
    // y = 7x + 100 exactly
    val rows = (0L to 20L).map(x => ("g", x, 7L * x + 100L)) ++
      Seq(("c", 5L, 1L), ("c", 5L, 9L)) // constant x -> undefined slope
    val out = Audit.groupedTrend(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    val (n, slope, icpt) = out("g")
    assert(n == 21L)
    assert(math.abs(slope.get.asInstanceOf[Double] - 7.0) < 1e-12)
    assert(math.abs(icpt.get.asInstanceOf[Double] - 100.0) < 1e-9)
    assert(out("c")._2.isEmpty && out("c")._3.isEmpty)
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
