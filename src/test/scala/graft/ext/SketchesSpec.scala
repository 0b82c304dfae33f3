package graft.ext

import graft.SparkSpec
import graft.core.Fx
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV distinct-count: within 15% of exact at k=256; exact below k") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    val est = Sketches.kmvDistinctCount(li, "l_returnflag", "l_orderkey", k = 256)
      .as[(String, Double)].collect().toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (g, e) =>
      val n = exact(g).toDouble
      if (n < 256) assert(e == n, s"$g: groups below k must be exact ($e vs $n)")
      else assert(math.abs(e - n) / n < 0.15, s"$g: est $e vs exact $n")
    }
  }

  test("KMV is deterministic across recomputation") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val a = Sketches.kmvDistinctCount(li, "l_returnflag", "l_orderkey")
      .as[(String, Double)].collect().toMap
    val b = Sketches.kmvDistinctCount(li, "l_returnflag", "l_orderkey")
      .as[(String, Double)].collect().toMap
    assert(a == b)
  }

  test("portable HLL: within 3σ (≈40%) of exact; duplicate-insensitive; deterministic") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    val est = Sketches.hllDistinctCount(li, "l_returnflag", "l_orderkey")
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (g, e) =>
      val n = exact(g).toDouble
      // m=64 ⇒ σ ≈ 13%; 3σ band (the point is exact replayability,
      // not tightness — q91's oracle checks bit-equality separately)
      assert(math.abs(e - n) / n < 0.4, s"$g: est $e vs exact $n")
    }
    // duplicates must not move a register (max() absorbs them)
    val doubled = li.union(li)
    val est2 = Sketches.hllDistinctCount(doubled, "l_returnflag", "l_orderkey")
      .as[(String, Long)].collect().toMap
    assert(est2 == est, "HLL must be insensitive to duplication")
  }

  test("portable HLL small-range correction: near-exact for tiny groups") {
    // 40 distinct values in one group ⇒ raw estimate ≤ 2.5m with empty
    // registers ⇒ the linear-counting branch must engage and land close
    val df = (1L to 40L).map(i => ("g", i)).toDF("g", "v")
    val est = Sketches.hllDistinctCount(df, "g", "v")
      .as[(String, Long)].collect().toMap
    assert(math.abs(est("g") - 40L) <= 10, s"linear counting off: ${est("g")}")
  }

  test("count-min: never underestimates, exact at generous width, tighter with depth") {
    val data = ((1 to 300).map(_ => "hot") ++ (1 to 60).map(i => s"mid${i % 3}") ++
      (1 to 40).map(i => s"tail$i")).toDF("v")
    val exact = data.groupBy($"v").count().as[(String, Long)].collect().toMap
    // narrow sketch: estimates may inflate but NEVER deflate
    val narrow = Sketches.countMinFrequency(data, "v", depth = 4, width = 16)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (v, n) =>
      assert(narrow(v) >= n, s"$v: est ${narrow(v)} < exact $n — CMS must overestimate")
    }
    // generous sketch: 43 distinct values across 4x4096 counters — the
    // fixed seed gives collision-free rows for every value (regression-
    // locked; a collision would only show as a benign overestimate)
    val wide = Sketches.countMinFrequency(data, "v", depth = 4, width = 4096)
      .as[(String, Long)].collect().toMap
    assert(wide == exact, "wide sketch should be collision-free here")
    // the heavy hitter cannot be ranked out: its estimate stays >= 300
    // while true-tail values can only inflate, never deflate below hot
    assert(narrow("hot") >= 300L)
  }

  test("sampled discrete median: close to the exact median, is an actual value") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val exact = li.groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .as[(String, Double)].collect().toMap
    val est = Sketches.sampledQuantile(li, "l_returnflag", "l_extendedprice",
      "l_orderkey", q = 0.5, fraction = 0.25)
      .as[(String, Double)].collect().toMap
    val values = li.select($"l_extendedprice").as[Double].collect().toSet
    est.foreach { case (g, e) =>
      assert(values.contains(e), s"$g: $e is not a data value")
      // medians of heavy-tailed price data: generous relative band
      assert(math.abs(e - exact(g)) / exact(g) < 0.25, s"$g: $e vs ${exact(g)}")
    }
  }

  test("HLL merge law: sharded registers merge to the direct union sketch exactly") {
    val li = Fx.t(spark, sfDir, "lineitem")
    def regsOf(p: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(p, "l_returnflag", "l_orderkey")
    val ra = regsOf(li.filter($"l_orderkey" % 2 === 0))
    val rb = regsOf(li.filter($"l_orderkey" % 2 =!= 0))
    val merged = Sketches.hllMergeRegisters("l_returnflag", ra, rb)
      .as[(String, Long, Int)].collect().toSet
    val direct = regsOf(li).as[(String, Long, Int)].collect().toSet
    assert(merged == direct, "merge must be register-identical to direct")
    // idempotent: merging a sketch with itself changes nothing
    val self = Sketches.hllMergeRegisters("l_returnflag", ra, ra)
      .as[(String, Long, Int)].collect().toSet
    assert(self == ra.as[(String, Long, Int)].collect().toSet)
    // and the estimates agree end to end
    val estM = Sketches.hllFromRegisters(
        Sketches.hllMergeRegisters("l_returnflag", ra, rb), "l_returnflag")
      .as[(String, Long)].collect().toMap
    val estD = Sketches.hllDistinctCount(li, "l_returnflag", "l_orderkey")
      .as[(String, Long)].collect().toMap
    assert(estM == estD)
  }

  test("KMV merge law: merged shard min-sets estimate like the direct sketch") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val sa = Sketches.kmvMinSets(li.filter($"l_orderkey" % 2 === 0),
      "l_returnflag", "l_orderkey", k = 64)
    val sb = Sketches.kmvMinSets(li.filter($"l_orderkey" % 2 =!= 0),
      "l_returnflag", "l_orderkey", k = 64)
    val estM = Sketches.kmvEstimateFromSets(
        Sketches.kmvMergeSets("l_returnflag", 64, sa, sb), "l_returnflag", 64)
      .as[(String, Double)].collect().toMap
    val estD = Sketches.kmvDistinctCount(li, "l_returnflag", "l_orderkey", 64)
      .as[(String, Double)].collect().toMap
    assert(estM == estD, s"merged $estM vs direct $estD")
    // merging a shard with itself is a no-op (sets are idempotent)
    val self = Sketches.kmvEstimateFromSets(
        Sketches.kmvMergeSets("l_returnflag", 64, sa, sa), "l_returnflag", 64)
      .as[(String, Double)].collect().toMap
    val solo = Sketches.kmvEstimateFromSets(sa, "l_returnflag", 64)
      .as[(String, Double)].collect().toMap
    assert(self == solo)
  }

  test("count-min merge law: shard counters sum to the direct matrix exactly") {
    val ev = Fx.t(spark, sfDir, "events")
      .select($"event_id", $"user_id".cast("string").as("val"))
    val ca = Sketches.cmCounters(ev.filter($"event_id" % 2 === 0), "val")
    val cb = Sketches.cmCounters(ev.filter($"event_id" % 2 =!= 0), "val")
    val merged = Sketches.cmMergeCounters(ca, cb)
      .as[(Int, Long, Long)].collect().toSet
    val direct = Sketches.cmCounters(ev, "val")
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == direct, "counter matrices must sum to the direct sketch")
    val estM = Sketches.cmEstimate(ev, Sketches.cmMergeCounters(ca, cb), "val")
      .as[(String, Long)].collect().toMap
    val estD = Sketches.countMinFrequency(ev, "val")
      .as[(String, Long)].collect().toMap
    assert(estM == estD)
  }

  test("histogram merge law: shard states sum to direct; quantile within one bin width") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val (lo, hi, bins) = (0.0, 131072.0, 1024)
    def st(p: org.apache.spark.sql.DataFrame) =
      Sketches.histState(p, "l_returnflag", "l_extendedprice", lo, hi, bins)
    val ha = st(li.filter($"l_orderkey" % 2 === 0))
    val hb = st(li.filter($"l_orderkey" % 2 =!= 0))
    val merged = Sketches.histMerge("l_returnflag", ha, hb)
      .as[(String, Long, Long)].collect().toSet
    val direct = st(li).as[(String, Long, Long)].collect().toSet
    assert(merged == direct, "histogram states must sum to the direct state")
    // state stays tiny: at most `bins` rows per group
    assert(direct.groupBy(_._1).values.forall(_.size <= bins))
    // median from merged state within one bin width (128) of exact
    val est = Sketches.histQuantile(
        Sketches.histMerge("l_returnflag", ha, hb), "l_returnflag",
        0.5, lo, hi, bins)
      .select($"l_returnflag", $"q_est").as[(String, Double)].collect().toMap
    val exact = li.groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .as[(String, Double)].collect().toMap
    est.foreach { case (g, e) =>
      assert(e >= exact(g) - 128 && e <= exact(g) + 128,
        s"$g: hist median $e vs exact ${exact(g)}")
    }
    // out-of-range values clamp into edge bins, never throw or vanish
    val oob = Sketches.histState(
      Seq(("g", -5.0), ("g", 1e9)).toDF("g", "v"), "g", "v", lo, hi, bins)
      .as[(String, Long, Long)].collect().toSet
    assert(oob == Set(("g", 0L, 1L), ("g", 1023L, 1L)))
  }

  test("histMedianMad: median/MAD within a bin width, Hampel rule flags the planted outliers") {
    // 100 values ~ 500 +- 10, plus 3 wild outliers; bin width 4
    val base = (1 to 100).map(i => ("g", 490.0 + (i % 21)))
    val wild = Seq(("g", 2000.0), ("g", 1900.0), ("g", 5.0))
    val df = (base ++ wild).toDF("g", "v")
    val out = Sketches.histMedianMad(df, "g", "v", 0.0, 2048.0, 512)
      .as[(String, Long, Double, Double, Long)].collect().head
    val (_, n, med, mad, nOut) = out
    assert(n == 103L)
    assert(math.abs(med - 500.0) <= 4.0, s"median est $med")
    // true MAD of the base block is ~5; one bin width of slack
    assert(mad >= 4.0 && mad <= 12.0, s"mad est $mad")
    assert(nOut == 3L, s"outliers $nOut")
  }

  test("hllRollingDistinct: trailing-window merge == direct sketch of the window's union") {
    val ev = Fx.t(spark, sfDir, "events")
      .withColumn("day", to_date($"ts"))
    val rolling = Sketches.hllRollingDistinct(ev, "day", "user_id", window = 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // direct check on a few target days: sketch the unioned 7-day
    // slice in one pass — the merge law says estimates must be EQUAL
    val days = rolling.keys.toSeq.sorted
    days.take(2) ++ days.takeRight(2) foreach { d =>
      val direct = Sketches.hllDistinctCount(
          ev.filter(datediff(lit(d).cast("date"), $"day").between(0, 6))
            .withColumn("g", lit(d)),
          "g", "user_id")
        .collect().head.getLong(1)
      assert(rolling(d) == direct, s"day $d: rolling ${rolling(d)} vs direct $direct")
    }
    // windows only look BACKWARD: first day's window is itself alone
    val firstDirect = Sketches.hllDistinctCount(
        ev.filter($"day" === lit(days.head).cast("date")).withColumn("g", lit(1)),
        "g", "user_id").collect().head.getLong(1)
    assert(rolling(days.head) == firstDirect)
  }

  test("cmJoinSizeEstimate: never underestimates; exact at generous width") {
    val a = ((1 to 50).map(_ => 1L) ++ (1L to 30L)).toDF("k") // key 1 hot (51x)
    val b = ((1 to 10).map(_ => 1L) ++ (20L to 40L)).toDF("k")
    val exact = a.join(b, "k").count()
    // generous width: collision-free -> inner product IS the join size
    val wide = Sketches.cmJoinSizeEstimate(a, "k", b, "k", depth = 4, width = 4096)
      .as[Long].collect().head
    assert(wide == exact, s"wide $wide vs exact $exact")
    // narrow width: collisions can only inflate
    val narrow = Sketches.cmJoinSizeEstimate(a, "k", b, "k", depth = 4, width = 8)
      .as[Long].collect().head
    assert(narrow >= exact, s"narrow $narrow must be >= exact $exact")
  }

  test("cmEstimate: a never-inserted probe value reads 0, not missing/inflated") {
    val counters = Sketches.cmCounters(
      (1L to 40L).map(_.toString).toDF("val"), "val")
    val probes = Seq("1", "7", "never-inserted-xyz").toDF("val")
    val est = Sketches.cmEstimate(probes, counters, "val")
      .as[(String, Long)].collect().toMap
    assert(est.keySet == Set("1", "7", "never-inserted-xyz"),
      "every probed value must appear in the estimate")
    assert(est("1") >= 1L && est("7") >= 1L)
    assert(est("never-inserted-xyz") == 0L,
      "absent buckets are zero counters — the sketch min must be 0")
  }

  test("cmJoinSizeEstimate: disjoint sides estimate 0, empty side estimates 0") {
    val a = (1L to 30L).toDF("k")
    val b = (1000L to 1030L).toDF("k")
    // wide sketch: no collisions, so some depth row has zero overlap
    // and its inner product (0) must win the min — not vanish from it
    val disjoint = Sketches.cmJoinSizeEstimate(a, "k", b, "k",
      depth = 4, width = 4096).as[Long].collect().head
    assert(disjoint == 0L, s"disjoint keys must estimate 0, got $disjoint")
    val empty = Sketches.cmJoinSizeEstimate(a, "k",
      Seq.empty[Long].toDF("k"), "k").as[Long].collect().head
    assert(empty == 0L, s"empty side must estimate 0, got $empty")
  }

  test("winsorize: an all-NULL group keeps its rows (NULL wins), not silently dropped") {
    val df = Seq(("g", 1L, Some(10.0)), ("g", 2L, Some(20.0)),
      ("h", 3L, Option.empty[Double]), ("h", 4L, Option.empty[Double]))
      .toDF("g", "id", "v")
    val out = Sketches.winsorize(df, "g", "v", 0.0, 1024.0, 256)
    assert(out.count() == 4L, "no row may vanish on an all-NULL group")
    val h = out.filter($"g" === "h").collect()
    assert(h.length == 2 && h.forall(_.isNullAt(3)))
  }

  test("histDriftTV: identical groups read ~0, a shifted group reads large; bounded by 1e6") {
    // three groups: a and b share one distribution, c is shifted far away
    val rows = (1 to 200).flatMap { i =>
      Seq(("a", 100.0 + (i % 10)), ("b", 100.0 + (i % 10)), ("c", 900.0 + (i % 10)))
    }
    val out = Sketches.histDriftTV(rows.toDF("g", "v"), "g", "v", 0.0, 1024.0, 256)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set("a", "b", "c"))
    out.values.foreach { case (n, tv) => assert(n == 200L && tv >= 0 && tv <= 1000000L) }
    // a vs rest(b identical + c shifted): moderate; c vs rest: maximal
    assert(out("c")._2 > 990000L, s"shifted group should read ~1e6: ${out("c")._2}")
    assert(out("a")._2 < 600000L && out("a")._2 > 300000L, s"half-overlap: ${out("a")._2}")
    // single-group corpus: drift undefined -> NULL, not an error
    val solo = Sketches.histDriftTV(
      Seq(("only", 5.0), ("only", 7.0)).toDF("g", "v"), "g", "v", 0.0, 1024.0, 256)
      .collect().head
    assert(solo.isNullAt(2))
  }

  test("winsorize: clamps tails to histogram p05/p95, leaves the body and NULLs alone") {
    val vals = (1 to 100).map(i => ("g", i.toLong, Some(500.0 + i))) ++
      Seq(("g", 900L, Some(5.0)), ("g", 901L, Some(2000.0)), ("g", 902L, Option.empty[Double]))
    val df = vals.toDF("g", "id", "v")
    val out = Sketches.winsorize(df, "g", "v", 0.0, 2048.0, 512)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(2)).map(_.toString.toDouble), Option(r.get(3)).map(_.toString.toDouble))).toMap
    // body rows unchanged (bounds land within one 4-wide bin of the tails)
    assert(out(50L)._2.get == out(50L)._1.get)
    // tails clamp inward, monotonically
    assert(out(900L)._2.get > 5.0 && out(900L)._2.get <= 520.0)
    assert(out(901L)._2.get < 2000.0 && out(901L)._2.get >= 580.0)
    // NULL passes through as NULL, never clamps to the lower bound
    assert(out(902L)._2.isEmpty)
  }

  test("bloom: no false negatives; OR-merge is bit-identical to direct; bounded FP rate") {
    val ev = Fx.t(spark, sfDir, "events")
      .select($"event_id", $"user_id".cast("string").as("val"))
    val ba = Sketches.bloomPositions(ev.filter($"event_id" % 2 === 0), "val",
      mBits = 1024, k = 4)
    val bb = Sketches.bloomPositions(ev.filter($"event_id" % 2 =!= 0), "val",
      mBits = 1024, k = 4)
    val merged = Sketches.bloomMerge(ba, bb).as[Long].collect().toSet
    val direct = Sketches.bloomPositions(ev, "val", mBits = 1024, k = 4)
      .as[Long].collect().toSet
    assert(merged == direct, "OR-merge must be bit-identical to the direct filter")
    assert(direct.size <= 1024 && direct.forall(p => p >= 0 && p < 1024))

    // every inserted value must probe 1 (no false negatives)
    val inserted = Sketches.bloomContains(ev, Sketches.bloomMerge(ba, bb),
        "val", mBits = 1024, k = 4)
      .as[(String, Long)].collect().toMap
    assert(inserted.values.forall(_ == 1L), "bloom can never miss an inserted key")

    // absent keys mostly probe 0; the FP rate stays under a loose
    // 4x of the fill^k bound (fill computed from the actual bit set)
    val probes = (100000L to 101000L).map(i => s"absent$i").toDF("val")
    val fp = Sketches.bloomContains(probes, Sketches.bloomMerge(ba, bb),
        "val", mBits = 1024, k = 4)
      .as[(String, Long)].collect().count(_._2 == 1L)
    val fill = direct.size.toDouble / 1024
    assert(fp <= math.max(4, 4 * 1001 * math.pow(fill, 4)),
      s"$fp false positives at fill $fill")
  }

  test("kmvIntersectEstimate: below k the sketch IS the set — exact Jaccard") {
    import spark.implicits._
    val df = ((1 to 10).map(("A", _)) ++ (6 to 15).map(("B", _)))
      .toDF("g", "v")
    val out = Sketches.kmvIntersectEstimate(df, "g", "A", "B", "v", k = 64)
      .collect().head
    assert(out.getAs[Long]("n_a_set") == 10L && out.getAs[Long]("n_b_set") == 10L)
    assert(out.getAs[Long]("n_union_set") == 15L)
    assert(out.getAs[Long]("n_both") == 5L)
    assert(out.getAs[Long]("jaccard_ppm") == 333333L)
    assert(out.getAs[Double]("est_union") == 15.0)
    assert(out.getAs[Double]("est_intersection") == 5.0)
  }

  test("kmvIntersectEstimate: estimator branch lands near truth and is symmetric") {
    import spark.implicits._
    val df = ((1 to 300).map(("A", _)) ++ (151 to 450).map(("B", _))).toDF("g", "v")
    val out = Sketches.kmvIntersectEstimate(df, "g", "A", "B", "v", k = 64)
      .collect().head
    assert(out.getAs[Long]("n_union_set") == 64L)
    val eu = out.getAs[Double]("est_union")        // truth 450
    val ei = out.getAs[Double]("est_intersection") // truth 150
    assert(eu > 250 && eu < 800, s"est_union $eu")
    assert(ei > 40 && ei < 400, s"est_intersection $ei")
    val sym = Sketches.kmvIntersectEstimate(df, "g", "B", "A", "v", k = 64)
      .collect().head
    assert(sym.getAs[Long]("n_both") == out.getAs[Long]("n_both"))
    assert(sym.getAs[Double]("est_union") == eu)
    assert(sym.getAs[Long]("jaccard_ppm") == out.getAs[Long]("jaccard_ppm"))
  }

  test("kmvIntersectEstimate: disjoint sets read zero overlap") {
    import spark.implicits._
    val df = ((1 to 200).map(("A", _)) ++ (1001 to 1200).map(("B", _))).toDF("g", "v")
    val out = Sketches.kmvIntersectEstimate(df, "g", "A", "B", "v", k = 32)
      .collect().head
    assert(out.getAs[Long]("n_both") == 0L)
    assert(out.getAs[Long]("jaccard_ppm") == 0L)
    assert(out.getAs[Double]("est_intersection") == 0.0)
  }

  test("kmvIntersectEstimate: an absent group reads as the empty set, one row") {
    import spark.implicits._
    val df = (1 to 50).map(("A", _)).toDF("g", "v")
    val out = Sketches.kmvIntersectEstimate(df, "g", "A", "MISSING", "v", k = 16)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_a_set") == 16L)
    assert(r.getAs[Long]("n_b_set") == 0L)
    assert(r.getAs[Long]("n_both") == 0L)
    // both groups absent: zero union set must read NULL, not divide
    val none = Sketches.kmvIntersectEstimate(df, "g", "X", "Y", "v", k = 16)
      .collect().head
    assert(none.getAs[Long]("n_union_set") == 0L)
    assert(none.isNullAt(none.fieldIndex("jaccard_ppm")))
    assert(none.isNullAt(none.fieldIndex("est_intersection")))
  }

  test("kmvPairwiseIntersect: every pair matches the two-group estimator") {
    import spark.implicits._
    val df = ((1 to 10).map(("A", _)) ++ (6 to 15).map(("B", _)) ++
      (11 to 20).map(("C", _))).toDF("g", "v")
    val pw = Sketches.kmvPairwiseIntersect(df, "g", "v", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_both"), r.getAs[Long]("jaccard_ppm"),
          r.getAs[Double]("est_intersection"))).toMap
    assert(pw.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    for (((a, b), got) <- pw) {
      val one = Sketches.kmvIntersectEstimate(df, "g", a, b, "v", k = 64)
        .collect().head
      assert(got == ((one.getAs[Long]("n_both"), one.getAs[Long]("jaccard_ppm"),
        one.getAs[Double]("est_intersection"))), s"pair ($a,$b)")
    }
    assert(pw(("A", "B"))._1 == 5L && pw(("A", "C"))._1 == 0L)
  }
}
