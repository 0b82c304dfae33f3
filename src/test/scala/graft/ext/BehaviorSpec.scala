package graft.ext

import java.sql.Timestamp

import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("retentionCohorts: first-event date defines the cohort; one count per active day") {
    val ev = Seq(
      // user 1: cohort Jan 1, active days 0, 1 (twice), 3
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 23:00:00")),
      (1L, ts("2024-01-04 08:00:00")),
      // user 2: cohort Jan 2, active day 0 only
      (2L, ts("2024-01-02 12:00:00")),
      // user 3: cohort Jan 1, active days 0 and 1
      (3L, ts("2024-01-01 01:00:00")),
      (3L, ts("2024-01-02 01:00:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.retentionCohorts(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, // users 1 and 3 on their day 0
      ("2024-01-01", 1L) -> 2L, // both active next day (dup events collapse)
      ("2024-01-01", 3L) -> 1L, // only user 1
      ("2024-01-02", 0L) -> 1L)) // user 2's cohort
  }

  test("funnel: ordered stages only; out-of-order and stalled users drop at the right stage") {
    val ev = Seq(
      // A: full ordered funnel
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // B: click BEFORE first view, none after -> stalls at view
      (2L, ts("2024-01-01 00:00:00"), "click"),
      (2L, ts("2024-01-01 01:00:00"), "view"),
      // C: view then click, purchase BEFORE the click -> stalls at click
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:30:00"), "purchase"),
      (3L, ts("2024-01-01 01:00:00"), "click"),
      // D: never views -> counts nowhere
      (4L, ts("2024-01-01 00:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(out == Seq((1L, "view", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("abSplit: stable hash assignment, distinct-user conversion, floor ppm rates") {
    val ev = (1L to 100L).flatMap { u =>
      // even users purchase (twice — must count once); all users click
      val base = Seq((u, ts("2024-01-01 00:00:00"), "click"))
      if (u % 2 == 0) base ++ Seq(
        (u, ts("2024-01-01 01:00:00"), "purchase"),
        (u, ts("2024-01-01 02:00:00"), "purchase"))
      else base
    }.toDF("user_id", "ts", "event_type")
    val out = Behavior.abSplit(ev, "user_id", "event_type", "purchase")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out.values.map(_._1).sum == 100L)
    out.foreach { case (_, (n, c, ppm)) =>
      assert(c <= n && ppm == c * 1000000L / n)
    }
    // assignment is a pure function of (seed, user): re-run identical
    val again = Behavior.abSplit(ev.repartition(5), "user_id", "event_type", "purchase")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == out)
  }

  test("transitionMatrix: adjacent pairs only, per-row ppm sums to ~1e6") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "click"),
      (1L, ts("2024-01-01 02:00:00"), 3L, "view"),
      (2L, ts("2024-01-01 00:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 01:00:00"), 5L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Behavior.transitionMatrix(ev, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // user 1: view->click, click->view; user 2: view->view
    assert(out == Map(
      ("view", "click") -> (1L, 500000L),
      ("view", "view") -> (1L, 500000L),
      ("click", "view") -> (1L, 1000000L)))
  }

  test("cusumChangepoint: peaks at a planted level shift; flat series scores low") {
    // "shift": 1 event/day for 10 days then 5/day for 10 days — the
    // cusum extreme lands at the last low day; "flat": 3/day
    val ev = (0 until 10).flatMap(d => Seq(("shift", d, 1))) ++
      (10 until 20).flatMap(d => Seq(("shift", d, 5))) ++
      (0 until 20).flatMap(d => Seq(("flat", d, 3)))
    val rows = ev.flatMap { case (g, d, n) =>
      (0 until n).map(i => (g, ts(f"2024-01-${d + 1}%02d 0$i:00:00")))
    }
    val out = Behavior.cusumChangepoint(rows.toDF("g", "ts"), "g", "ts")
      .collect().map(r => r.getString(0) -> (r.getDate(1).toString, r.getLong(2))).toMap
    assert(out("shift")._1 == "2024-01-10", s"shift at ${out("shift")}")
    assert(out("flat")._2 == 0L, s"flat series must score 0: ${out("flat")}")
    assert(out("shift")._2 > 0L)
  }

  test("windowed funnel: stages past the gap do not count; inside the gap they do") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:30:00"), "click"),   // inside 1h -> counts
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 02:00:00"), "click")    // past 1h -> stalls
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click"), maxGap = Some("1 HOUR"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("view" -> 2L, "click" -> 1L))
    // unbounded funnel still counts both
    val open = Behavior.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(open == Map("view" -> 2L, "click" -> 2L))
  }

  test("rateAnomalies: a burst inside the window flags; spaced events do not") {
    val ev = (
      // bursty user: 6 events in 2 minutes
      (1 to 6).map(i => (1L, ts(f"2024-01-01 10:0${i % 10}:00"))) ++
      // steady user: 6 events one hour apart
      (1 to 6).map(i => (2L, ts(f"2024-01-01 ${9 + i}%02d:00:00")))
    ).toDF("user_id", "ts")
    val out = Behavior.rateAnomalies(ev, "user_id", "ts",
        windowSeconds = 600L, threshold = 5L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((6L, 1L)), s"burst ${out(1L)}")
    assert(out(2L)._1 == 1L && out(2L)._2 == 0L, s"steady ${out(2L)}")
  }

  test("funnel: equal timestamps do NOT advance (strictly-after semantics)") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type", Seq("view", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("view" -> 1L, "click" -> 0L))
  }

  test("linearAttribution: each conversion's credit sums to exactly 1e6, remainder to the earliest") {
    val ev = Seq(
      // user 1: two touches before the purchase, one after (ignored)
      (1L, ts("2024-01-01 00:00:00"), "view", 1L),
      (1L, ts("2024-01-01 00:30:00"), "click", 2L),
      (1L, ts("2024-01-01 01:00:00"), "purchase", 3L),
      (1L, ts("2024-01-01 02:00:00"), "view", 4L),
      // user 2: three touches -> 333334 + 333333 + 333333
      (2L, ts("2024-01-01 00:00:00"), "view", 5L),
      (2L, ts("2024-01-01 00:10:00"), "view", 6L),
      (2L, ts("2024-01-01 00:20:00"), "click", 7L),
      (2L, ts("2024-01-01 00:30:00"), "purchase", 8L),
      // a SECOND purchase must not re-credit
      (2L, ts("2024-01-01 00:40:00"), "purchase", 9L),
      // user 3: never converts -> no credit at all
      (3L, ts("2024-01-01 00:00:00"), "view", 10L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Behavior.linearAttribution(ev, "user_id", "ts", "event_type",
        convType = "purchase", tieCol = "event_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // user 1: view 500000, click 500000; user 2: views 333334+333333, click 333333
    assert(out("view") == ((3L, 500000L + 333334L + 333333L)), s"view ${out("view")}")
    assert(out("click") == ((2L, 500000L + 333333L)), s"click ${out("click")}")
    // conservation: total credit == 1e6 per converting user with touches
    assert(out.values.map(_._2).sum == 2000000L)
  }

  test("cuped: a perfectly predictive covariate collapses both arm means to the same adjusted value") {
    // users 1..4: x pre-split events, y = 2x post-split events.
    // theta = 2000 milli exactly; every adjusted value = 5000 milli.
    val rows = (1L to 4L).flatMap { u =>
      val x = u; val y = 2 * u
      (1L to x).map(i => (u, ts(f"2024-01-10 00:$i%02d:00"), "view")) ++
        (1L to y).map(i => (u, ts(f"2024-01-20 00:$i%02d:00"), "view"))
    }
    val out = Behavior.cuped(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", splitTs = "2024-01-15 00:00:00")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.values.map(_._1).sum == 4L, s"all users assigned: $out")
    out.values.foreach { case (_, _, meanAdj, theta) =>
      assert(theta == 2000L, s"theta $theta")
      assert(meanAdj == 5000L, s"meanAdj $meanAdj")
    }
  }

  test("cuped: zero-variance pre-period reads theta = 0 (adjusted == raw), not NULL") {
    // splitTs before every event: all covariates are 0 -> the theta
    // denominator is 0; without the guard every arm's adjusted mean
    // read NULL
    val rows = (1L to 4L).flatMap { u =>
      (1L to u).map(i => (u, ts(f"2024-01-20 00:$i%02d:00"), "view")) }
    val out = Behavior.cuped(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", splitTs = "2024-01-01 00:00:00")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out.values.foreach { case (meanRaw, meanAdj, theta) =>
      assert(theta == 0L, s"theta $theta")
      assert(meanAdj == meanRaw, s"adjusted $meanAdj must equal raw $meanRaw")
    }
  }

  test("funnel: an empty event stream reads 0 at every stage, never NULL") {
    val ev = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    val out = Behavior.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 0L, "click" -> 0L))
  }

  test("coveredTime: overlapping windows merge, disjoint ones add; partial overlap never double-counts") {
    val ev = Seq(
      // user 1: 00:00 and 00:03 overlap (5-min windows) -> one island
      // [00:00, 00:08) = 480 s; 01:00 is its own island (300 s)
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:03:00")),
      (1L, ts("2024-01-01 01:00:00")),
      // user 2: exact-touch boundary (00:05:00 starts exactly when the
      // first window ends) -> still ONE island (s > pe is strict)
      (2L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:05:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.coveredTime(ev, "user_id", "ts", windowSeconds = 300L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 780L)), s"user1 ${out(1L)}")
    assert(out(2L) == ((1L, 600L)), s"user2 ${out(2L)}")
  }

  test("activeStreaks: consecutive days chain, gaps split; multiple events per day collapse") {
    val ev = Seq(
      // user 1: Jan 1,2,3 (3-streak, with a dup on day 2), Jan 6,7 (2-streak)
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-02 23:00:00")), (1L, ts("2024-01-03 01:00:00")),
      (1L, ts("2024-01-06 08:00:00")), (1L, ts("2024-01-07 08:00:00")),
      // user 2: one day only
      (2L, ts("2024-01-05 12:00:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.activeStreaks(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((5L, 2L, 3L)), s"user1 ${out(1L)}")
    assert(out(2L) == ((1L, 1L, 1L)), s"user2 ${out(2L)}")
  }

  test("debounce: only island heads survive a burst chain; exact-gap events stay suppressed") {
    val ev = Seq(
      // chain: 0s, 30s, 55s (each <= 60s after the PREVIOUS raw event)
      // -> only the head survives, even though 55s is ~1 min after 0s
      (1L, ts("2024-01-01 00:00:00"), "click", 1L),
      (1L, ts("2024-01-01 00:00:30"), "click", 2L),
      (1L, ts("2024-01-01 00:00:55"), "click", 3L),
      // exactly 60s after the last chain event: still suppressed (strict >)
      (1L, ts("2024-01-01 00:01:55"), "click", 4L),
      // 61s after that: a new head
      (1L, ts("2024-01-01 00:02:56"), "click", 5L),
      // different type: independent chain
      (1L, ts("2024-01-01 00:00:10"), "view", 6L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val kept = Behavior.debounce(ev, Seq("user_id", "event_type"), "ts",
        minGapSeconds = 60L, tieCol = "event_id")
      .select($"event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L, 6L), s"kept $kept")
  }

  test("rfmSegments: clean rank order maps customer k to tile 6-k on all three axes") {
    // customer k (1..5): k orders, latest at Jan k, each priced 100*k
    val orders = (1L to 5L).flatMap { k =>
      (1L to k).map(i => (k, ts(f"2024-01-$k%02d 00:00:00"), 100.0 * k))
    }.toDF("cust", "ots", "amount")
    val out = Behavior.rfmSegments(orders, "cust", "ots", "amount", tiles = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))).toMap
    (1L to 5L).foreach { k =>
      val t = 6L - k
      assert(out(k) == ((t, t, t, s"$t$t$t")), s"cust $k -> ${out(k)}")
    }
  }


  test("interArrival: a constant cadence reads CV2 = 0 and dispersion 0") {
    import spark.implicits._
    val rows = (1 to 5).map(i =>
      (1L, i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:0$i%d:00"), "click"))
    val out = Behavior.interArrival(
      rows.toDF("u", "id", "ts", "et"), "u", "ts", "id", "et")
      .collect().head
    assert(out.getAs[Long]("n_gaps") == 4L)
    assert(out.getAs[Long]("mean_gap_ms") == 60000L)
    assert(out.getAs[Long]("cv2_ppm") == 0L)
    assert(out.getAs[Long]("dispersion_milli") == 0L)
  }

  test("interArrival: gaps never cross users; bursty gaps read CV2 > 0") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, 1L, t("2024-01-01 00:00:00"), "click"),
      (1L, 2L, t("2024-01-01 00:00:01"), "click"),   // gap 1s
      (1L, 3L, t("2024-01-01 00:00:11"), "click"),   // gap 10s
      (2L, 4L, t("2024-01-05 00:00:00"), "click"))   // no gap (first for u2)
    val out = Behavior.interArrival(
      rows.toDF("u", "id", "ts", "et"), "u", "ts", "id", "et")
      .collect().head
    assert(out.getAs[Long]("n_gaps") == 2L)           // u2 contributes none
    // gaps 1000, 10000 ms: S=11000, Sq=101000000
    // varNum = 2*101000000 - 121000000 = 81000000
    assert(out.getAs[Long]("mean_gap_ms") == 5500L)
    assert(out.getAs[Long]("cv2_ppm") ==
      81000000L * 1000000L / (11000L * 11000L))
    assert(out.getAs[Long]("dispersion_milli") ==
      81000000L * 1000L / (2L * 11000L))
  }

  test("eventTrigrams: counts every consecutive triple per user, in order") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: a b a b -> (a,b,a), (b,a,b); u2: a b a -> (a,b,a)
    val rows = Seq(
      (1L, 1L, t("2024-01-01 00:00:01"), "a"),
      (1L, 2L, t("2024-01-01 00:00:02"), "b"),
      (1L, 3L, t("2024-01-01 00:00:03"), "a"),
      (1L, 4L, t("2024-01-01 00:00:04"), "b"),
      (2L, 5L, t("2024-01-01 00:00:01"), "a"),
      (2L, 6L, t("2024-01-01 00:00:02"), "b"),
      (2L, 7L, t("2024-01-01 00:00:03"), "a"))
    val out = Behavior.eventTrigrams(
      rows.toDF("u", "id", "ts", "et"), "u", "ts", "id", "et", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getAs[Long]("n")).toMap
    assert(out == Map(("a", "b", "a") -> 2L, ("b", "a", "b") -> 1L))
  }


  test("cohortRevenue: cohort by first day, exact cents and cumulative") {
    import spark.implicits._
    // u1 first day 1 (ages 0, 2); u2 first day 1 (age 0); u3 first day 3
    val rows = Seq(
      (1L, 1L, 100L), (1L, 3L, 50L),
      (2L, 1L, 10L), (2L, 1L, 5L),
      (3L, 3L, 7L))
    val out = Behavior.cohortRevenue(rows.toDF("u", "day", "c"), "u", "day", "c")
      .collect().map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("age")) -> r).toMap
    val c10 = out((1L, 0L))
    assert(c10.getAs[Long]("n_users") == 2L && c10.getAs[Long]("cents") == 115L)
    assert(c10.getAs[Long]("cum_cents") == 115L)
    val c12 = out((1L, 2L))
    assert(c12.getAs[Long]("n_users") == 1L && c12.getAs[Long]("cents") == 50L)
    assert(c12.getAs[Long]("cum_cents") == 165L)
    assert(out((3L, 0L)).getAs[Long]("cents") == 7L)
  }

  test("churnByTenure: hazard = ended / at-risk over the reverse cumulative") {
    import spark.implicits._
    // tenures: u1 -> 0, u2 -> 0, u3 -> 2, u4 -> 5
    val rows = Seq((1L, 4L), (2L, 9L), (3L, 1L), (3L, 3L), (4L, 2L), (4L, 7L))
    val out = Behavior.churnByTenure(rows.toDF("u", "day"), "u", "day")
      .collect().map(r => r.getAs[Long]("tenure") -> r).toMap
    assert(out(0L).getAs[Long]("n_ended") == 2L)
    assert(out(0L).getAs[Long]("n_at_risk") == 4L)
    assert(out(0L).getAs[Long]("hazard_ppm") == 500000L)
    assert(out(2L).getAs[Long]("n_at_risk") == 2L)
    assert(out(2L).getAs[Long]("hazard_ppm") == 500000L)
    assert(out(5L).getAs[Long]("n_at_risk") == 1L)
    assert(out(5L).getAs[Long]("hazard_ppm") == 1000000L)
  }

  test("newVsReturning: first day is new, later days returning; dups collapse") {
    import spark.implicits._
    val rows = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L))
    val out = Behavior.newVsReturning(rows.toDF("u", "d"), "u", "d")
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    assert(out(1L).getAs[Long]("n_active") == 1L &&
      out(1L).getAs[Long]("n_new") == 1L)
    assert(out(2L).getAs[Long]("n_active") == 2L)
    assert(out(2L).getAs[Long]("n_new") == 1L)       // u2 new, u1 returning
    assert(out(2L).getAs[Long]("new_ppm") == 500000L)
    assert(out(3L).getAs[Long]("n_new") == 1L)       // u3 new, u2 returning
    assert(out(3L).getAs[Long]("n_returning") == 1L)
  }

  test("kaplanMeier: per-step floored product-limit curve replays the known case") {
    import spark.implicits._
    // tenures: u1=0, u2=1, u3=u4=2 -> hist (0:1, 1:1, 2:2),
    // at-risk (4, 3, 2); S = 3/4, then *2/3, then *0/2 with ppm floors
    val rows = Seq(
      (1L, 1L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L),
      (4L, 1L), (4L, 3L))
    val out = Behavior.kaplanMeier(rows.toDF("u", "day"), "u", "day")
      .collect().map(r => r.getAs[Long]("tenure") ->
        (r.getAs[Long]("n_ended"), r.getAs[Long]("n_at_risk"),
          r.getAs[Long]("survival_ppm"))).toMap
    assert(out(0L) == ((1L, 4L, 750000L)))
    assert(out(1L) == ((1L, 3L, 500000L)))
    assert(out(2L) == ((2L, 2L, 0L)))
    // survival is non-increasing in tenure by construction
    val curve = out.toSeq.sortBy(_._1).map(_._2._3)
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a })
    // histogram longer than maxSteps refuses loudly with the fix named
    val err = intercept[Exception] {
      Behavior.kaplanMeier(rows.toDF("u", "day"), "u", "day",
        maxSteps = 2).collect()
    }
    assert(err.getMessage.contains("maxSteps=2"), err.getMessage)
  }

}
