package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def twoGroups(a: Seq[Long], b: Seq[Long]) =
    (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")

  test("rankSumTest: identical distributions give AUC exactly 1/2") {
    val vs = Seq(1L, 2L, 2L, 5L, 9L)
    val out = Stats.rankSumTest(twoGroups(vs, vs), "g", "A", "B", "v")
      .collect().head
    assert(out.getAs[Long]("n_a") == 5L && out.getAs[Long]("n_b") == 5L)
    // u2 = 2·U = 2·(n²/2) = n² when the samples tie pair-for-pair
    assert(out.getAs[Long]("u2") == 25L)
    assert(out.getAs[Long]("auc_ppm") == 500000L)
  }

  test("rankSumTest: strict separation gives AUC 1 (and 0 reversed)") {
    val hi = Stats.rankSumTest(
      twoGroups(Seq(10L, 11L, 12L), Seq(1L, 2L)), "g", "A", "B", "v")
      .collect().head
    assert(hi.getAs[Long]("u2") == 12L)       // 2·(3·2)
    assert(hi.getAs[Long]("auc_ppm") == 1000000L)
    val lo = Stats.rankSumTest(
      twoGroups(Seq(1L, 2L), Seq(10L, 11L, 12L)), "g", "A", "B", "v")
      .collect().head
    assert(lo.getAs[Long]("u2") == 0L && lo.getAs[Long]("auc_ppm") == 0L)
  }

  test("rankSumTest: matches the brute-force pair count, ties half-credited") {
    val a = Seq(3L, 7L, 7L, 1L, 9L, 4L)
    val b = Seq(2L, 7L, 5L, 5L, 8L)
    val u2Ref = (for (x <- a; y <- b) yield {
      if (x > y) 2L else if (x == y) 1L else 0L
    }).sum
    val out = Stats.rankSumTest(twoGroups(a, b), "g", "A", "B", "v")
      .collect().head
    assert(out.getAs[Long]("u2") == u2Ref)
    assert(out.getAs[Long]("auc_ppm") ==
      u2Ref * 1000000L / (2L * a.size * b.size))
  }

  test("ksTest: identical distributions give D = 0; disjoint give D = 1") {
    val same = Stats.ksTest(
      twoGroups(Seq(1L, 5L, 9L), Seq(1L, 5L, 9L)), "g", "A", "B", "v")
      .collect().head
    assert(same.getAs[Long]("d_ppm") == 0L)
    val disj = Stats.ksTest(
      twoGroups(Seq(1L, 2L, 3L), Seq(10L, 11L)), "g", "A", "B", "v")
      .collect().head
    assert(disj.getAs[Long]("d_ppm") == 1000000L)
    assert(disj.getAs[Long]("at_value") == 3L) // gap first maximal at A's top
  }

  test("ksTest: matches the serial max-CDF-gap reference, low-value ties") {
    val a = Seq(1L, 2L, 2L, 6L, 9L, 9L)
    val b = Seq(2L, 3L, 5L, 9L)
    val support = (a ++ b).distinct.sorted
    val gaps = support.map { v =>
      val ga = a.count(_ <= v).toLong * b.size
      val gb = b.count(_ <= v).toLong * a.size
      v -> math.abs(ga - gb)
    }
    val maxGap = gaps.map(_._2).max
    val atRef = gaps.filter(_._2 == maxGap).map(_._1).min
    val out = Stats.ksTest(twoGroups(a, b), "g", "A", "B", "v").collect().head
    assert(out.getAs[Long]("d_ppm") ==
      maxGap * 1000000L / (a.size.toLong * b.size))
    assert(out.getAs[Long]("at_value") == atRef)
  }

  test("chiSquare: exact independence gives 0; perfect dependence gives N·(k−1)") {
    // perfectly balanced 2×2: every cell = r·c/N exactly -> chi2 = 0
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .flatMap(Seq.fill(5)(_)).toDF("u", "v")
    val zero = Stats.chiSquare(indep, "u", "v").collect().head
    assert(zero.getAs[Long]("chi2_ppm") == 0L)
    assert(zero.getAs[Long]("n") == 20L && zero.getAs[Long]("dof") == 1L)
    // perfect dependence (v determined by u): chi2 = N·(min(R,C)−1) =
    // 24·10⁶ ppm, minus the per-cell floor losses (9 cells, ≤ 9 ppm)
    val dep = Seq(("a", "x"), ("b", "y"), ("c", "z"))
      .flatMap(Seq.fill(4)(_)).toDF("u", "v")
    val full = Stats.chiSquare(dep, "u", "v").collect().head
    assert(full.getAs[Long]("chi2_ppm") == 23999997L)
    assert(full.getAs[Long]("dof") == 4L)
  }

  test("chiSquare: matches the serial per-cell floor-ppm reference over the FULL grid") {
    val rows = (1 to 83).map(i => ("u" + (i % 3), "v" + (i * i % 4)))
    val obs = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    // keys.toSeq: a for-yield over Sets would DEDUPE equal cell values
    val ref = (for (a <- rt.keys.toSeq; b <- ct.keys.toSeq) yield {
      val o = obs.getOrElse((a, b), 0L) // zero cells contribute r·c/N
      val d = BigInt(o * n - rt(a) * ct(b))
      (d * d * 1000000 / (BigInt(rt(a)) * ct(b) * n)).toLong
    }).sum
    val out = Stats.chiSquare(rows.toDF("u", "v"), "u", "v").collect().head
    assert(out.getAs[Long]("chi2_ppm") == ref)
  }

  test("spearman: monotone nonlinear -> 1, reversed -> -1, ties match the midrank reference") {
    val mono = (1 to 40).map(i => (i.toLong, i.toLong * i * i)) // nonlinear but monotone
    val up = Stats.spearman(mono.toDF("x", "y"), "x", "y").collect().head
    assert(up.getAs[Long]("n") == 40L &&
      math.abs(up.getAs[Double]("spearman") - 1.0) < 1e-12)
    val down = Stats.spearman(
      mono.map { case (x, y) => (x, -y) }.toDF("x", "y"), "x", "y")
      .collect().head
    assert(math.abs(down.getAs[Double]("spearman") + 1.0) < 1e-12)
    // tie handling: midrank Pearson reference computed serially
    val xs = Seq(1L, 2L, 2L, 3L, 4L, 4L, 4L, 7L)
    val ys = Seq(3L, 1L, 4L, 4L, 9L, 2L, 9L, 8L)
    def ranks(v: Seq[Long]): Seq[Double] =
      v.map(x => v.count(_ < x) + (v.count(_ == x) + 1) / 2.0)
    val (ra, rb) = (ranks(xs), ranks(ys))
    val n = xs.size.toDouble
    val (sa, sb) = (ra.sum, rb.sum)
    val pab = ra.zip(rb).map { case (a, b) => a * b }.sum
    val paa = ra.map(a => a * a).sum
    val pbb = rb.map(b => b * b).sum
    val ref = (n * pab - sa * sb) /
      (math.sqrt(n * paa - sa * sa) * math.sqrt(n * pbb - sb * sb))
    val out = Stats.spearman(xs.zip(ys).toDF("x", "y"), "x", "y")
      .collect().head.getAs[Double]("spearman")
    assert(math.abs(out - ref) < 1e-12, s"got $out, reference $ref")
  }

  test("cohensKappa: perfect agreement 1e6, label swap negative, serial reference") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
      .toDF("x", "y")
    assert(Stats.cohensKappa(perfect, "x", "y").collect().head
      .getAs[Long]("kappa_ppm") == 1000000L)
    // systematic disagreement (labels swapped) reads worse than chance
    val swapped = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "a"))
      .toDF("x", "y")
    assert(Stats.cohensKappa(swapped, "x", "y").collect().head
      .getAs[Long]("kappa_ppm") < 0L)
    // serial reference incl. floor on a negative numerator
    val rows = (1 to 61).map(i => ("l" + (i % 3), "l" + ((i * 2) % 3)))
    val n = rows.size.toLong
    val dAgree = rows.count { case (a, b) => a == b }.toLong
    val rt = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val s = rt.keys.toSeq.map(k => rt(k) * ct.getOrElse(k, 0L)).sum
    val ref = BigDecimal((n * dAgree - s) * 1000000L) / (n * n - s)
    val refFloor = ref.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    val out = Stats.cohensKappa(rows.toDF("x", "y"), "x", "y").collect().head
    assert(out.getAs[Long]("n") == n && out.getAs[Long]("agree") == dAgree)
    assert(out.getAs[Long]("kappa_ppm") == refFloor)
  }

  test("exactQuantilesByKey: one pass equals exactQuantileByKey per quantile") {
    val rows = (1 to 83).map(i => ("k" + (i % 2), i.toLong, (i * 53 % 101).toDouble))
    val df = rows.toDF("k", "id", "score")
    val qs = Seq(250L, 500L, 900L, 990L)
    val multi = Sampling.exactQuantilesByKey(df, "k", "score", "id", qs)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("q_permille")) -> r.getAs[Double]("q_value"))
      .toMap
    for (q <- qs) {
      val single = Sampling.exactQuantileByKey(df, "k", "score", "id", q)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("q_value")).toMap
      for ((k, v) <- single)
        assert(multi((k, q)) == v, s"q=$q k=$k: ${multi((k, q))} != $v")
    }
    assert(multi.size == 2 * qs.size, s"one row per (key, q): ${multi.size}")
  }

  test("signTest: exact mean compare per key, unpaired keys drop, z matches reference") {
    val df = Seq(
      ("u1", "A", 10L), ("u1", "A", 20L), ("u1", "B", 40L),  // mean up
      ("u2", "A", 50L), ("u2", "B", 10L), ("u2", "B", 20L),  // mean down
      ("u3", "A", 30L), ("u3", "B", 30L),                    // tie
      ("u4", "A", 7L),  ("u4", "B", 8L),                     // up
      ("u5", "A", 99L)                                       // unpaired: drops
    ).toDF("k", "cond", "v")
    val out = Stats.signTest(df, "k", "cond", "A", "B", "v").collect().head
    assert(out.getAs[Long]("n_pos") == 2L)
    assert(out.getAs[Long]("n_neg") == 1L)
    assert(out.getAs[Long]("n_tie") == 1L)
    val zRef = math.floor(1000.0 * (2 - 1) / math.sqrt(3.0)).toLong
    assert(out.getAs[Long]("z_milli") == zRef)
    // all-tie degenerate: z is NULL
    val ties = Seq(("u", "A", 5L), ("u", "B", 5L)).toDF("k", "cond", "v")
    assert(Stats.signTest(ties, "k", "cond", "A", "B", "v")
      .collect().head.isNullAt(3))
  }

  test("lDiversity: all-same sensitive is diversity 1 and at risk; nulls disclose nothing") {
    val df = Seq(
      ("n1", "s1", Some("x")), ("n1", "s1", Some("x")), // big group, 1 value
      ("n2", "s1", Some("x")), ("n2", "s1", Some("y")), // diverse
      ("n3", "s1", None), ("n3", "s1", Some("z"))       // null doesn't add
    ).toDF("nat", "seg", "sens")
    val out = Audit.lDiversity(df, Seq("nat", "seg"), "sens", l = 2L)
      .collect().map(r => r.getAs[Long]("diversity") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("n_rows"), r.getAs[Long]("at_risk")))
      .toMap
    assert(out(1L) == ((2L, 4L, 1L))) // n1 (one value) + n3 (null + z)
    assert(out(2L) == ((1L, 2L, 0L)))
  }

  test("fingerprint: order/partitioning-invariant, any row change shifts it") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, null: String)).toDF("id", "s")
    def fp(df: org.apache.spark.sql.DataFrame) =
      Audit.fingerprint(df, Seq(col("id"), col("s")))
        .collect().head.getAs[Long]("checksum")
    val ref = fp(base)
    assert(fp(base.orderBy(col("id").desc)) == ref)
    assert(fp(base.repartition(7)) == ref)
    assert(fp(Seq((1L, "a"), (2L, "b"), (3L, "")).toDF("id", "s")) != ref,
      "NULL and empty string must fingerprint differently")
    assert(fp(Seq((1L, "a"), (2L, "X"), (3L, null: String)).toDF("id", "s")) != ref)
  }

  test("weightedQuantileByKey: weight 1 degenerates to exactQuantileByKey") {
    val rows = (1 to 57).map(i => ("k" + (i % 3), i.toLong, (i * 37 % 100).toDouble))
    val df = rows.toDF("k", "id", "score").withColumn("one", lit(1L))
    for (q <- Seq(250L, 500L, 900L)) {
      val w = Sampling.weightedQuantileByKey(df, "k", "score", "one", "id", q)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("q_value")).toMap
      val e = Sampling.exactQuantileByKey(df, "k", "score", "id", q)
        .collect().map(r => r.getString(0) -> r.getAs[Double]("q_value")).toMap
      assert(w == e, s"q=$q: weighted-with-1s $w != exact $e")
    }
  }

  test("weightedQuantileByKey: heavy weight drags the median to its row") {
    val df = Seq(
      ("k", 1L, 1.0, 1L), ("k", 2L, 2.0, 1L),
      ("k", 3L, 3.0, 100L), // 100 of 104 total weight lives at score 3
      ("k", 4L, 4.0, 1L), ("k", 5L, 5.0, 1L)
    ).toDF("k", "id", "score", "w")
    val out = Sampling.weightedQuantileByKey(df, "k", "score", "w", "id", 500L)
      .collect().head
    assert(out.getAs[Long]("w_total") == 104L)
    assert(out.getAs[Double]("q_value") == 3.0)
  }

  test("welchT: identical samples give t = 0 and the textbook df") {
    val out = Stats.welchT(twoGroups(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      "g", "A", "B", "v").collect().head
    assert(out.getAs[Long]("t_milli") == 0L)
    // va = vb = 1, sea = seb = 1/3: df = (2/3)^2 / (2·(1/9)/2) = 4
    assert(out.getAs[Long]("df_milli") == 4000L)
    assert(out.getAs[Double]("mean_a") == 2.0 && out.getAs[Double]("mean_b") == 2.0)
  }

  test("welchT: matches the hand-evaluated formula; <2 rows gives NULL") {
    val a = Seq(10L, 12L, 19L, 25L, 31L)
    val b = Seq(8L, 9L, 11L, 12L)
    val out = Stats.welchT(twoGroups(a, b), "g", "A", "B", "v").collect().head
    def stats(x: Seq[Long]) = {
      val n = x.size.toDouble; val s = x.sum.toDouble
      val q = x.map(v => v.toDouble * v).sum
      (n, s, (n * q - s * s) / (n * (n - 1.0)))
    }
    val (na, sa, va) = stats(a); val (nb, sb, vb) = stats(b)
    val (sea, seb) = (va / na, vb / nb)
    val t = (sa / na - sb / nb) / math.sqrt(sea + seb)
    val dfw = ((sea + seb) * (sea + seb)) /
      (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))
    assert(out.getAs[Long]("t_milli") == math.floor(1000.0 * t).toLong)
    assert(out.getAs[Long]("df_milli") == math.floor(1000.0 * dfw).toLong)
    val tiny = Stats.welchT(twoGroups(Seq(5L), Seq(1L, 2L)), "g", "A", "B", "v")
      .collect().head
    assert(tiny.isNullAt(tiny.fieldIndex("t_milli")))
    assert(tiny.isNullAt(tiny.fieldIndex("df_milli")))
  }

  private def series(k: String, pts: (Long, Long)*) =
    pts.map { case (x, y) => (k, x, y) }.toDF("k", "x", "y")

  test("theilSen: exact line recovers its slope; falling line floors negative") {
    val up = Stats.theilSen(series("k", 1L -> 1L, 2L -> 3L, 3L -> 5L),
      "k", "x", "y").collect().head
    assert(up.getAs[Long]("n_pairs") == 3L)
    assert(up.getAs[Long]("slope_ppm") == 2000000L)
    val dn = Stats.theilSen(series("k", 1L -> 5L, 2L -> 3L, 3L -> 1L),
      "k", "x", "y").collect().head
    assert(dn.getAs[Long]("slope_ppm") == -2000000L)
    // fractional slope floors: (1 − 0)/(3 − 1) = 0.5 → 500000
    val half = Stats.theilSen(series("k", 1L -> 0L, 3L -> 1L), "k", "x", "y")
      .collect().head
    assert(half.getAs[Long]("n_pairs") == 1L)
    assert(half.getAs[Long]("slope_ppm") == 500000L)
  }

  test("theilSen: one outlier does not drag the median slope") {
    // y = x except y(5) = 1000: 6 of 10 pairwise slopes stay 1
    val out = Stats.theilSen(
      series("k", 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 1000L),
      "k", "x", "y").collect().head
    assert(out.getAs[Long]("n_pairs") == 10L)
    assert(out.getAs[Long]("slope_ppm") == 1000000L)
  }

  test("autocorr: a linear series is perfectly lag-correlated") {
    val df = series("k", (1L to 6L).map(t => t -> t): _*)
    val out = Stats.autocorr(df, "k", "x", "y", maxLag = 2)
      .collect().map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n"), r.getAs[Double]("acf"))).toMap
    assert(out(1L)._1 == 5L && math.abs(out(1L)._2 - 1.0) < 1e-12)
    assert(out(2L)._1 == 4L && math.abs(out(2L)._2 - 1.0) < 1e-12)
  }

  test("autocorr: constant series and single-pair lags give NULL acf") {
    val flat = Stats.autocorr(series("k", 1L -> 7L, 2L -> 7L, 3L -> 7L),
      "k", "x", "y", maxLag = 1).collect().head
    assert(flat.isNullAt(flat.fieldIndex("acf")))
    // 2-point series at lag 1: one pair, zero variance margins
    val single = Stats.autocorr(series("k", 1L -> 1L, 2L -> 2L),
      "k", "x", "y", maxLag = 1).collect().head
    assert(single.getAs[Long]("n") == 1L)
    assert(single.isNullAt(single.fieldIndex("acf")))
  }

  test("autocorr: alternating series anti-correlates at lag 1, correlates at 2") {
    val df = series("k", 1L -> 0L, 2L -> 10L, 3L -> 0L, 4L -> 10L, 5L -> 0L, 6L -> 10L)
    val out = Stats.autocorr(df, "k", "x", "y", maxLag = 2)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    assert(out(1L) < -0.9 && out(2L) > 0.99)
  }

  test("runsTest: monotone series collapses to 2 runs; median row drops") {
    // values 1..10: low median 5 drops; signs 0000 11111 → 2 runs
    val df = series("k", (1L to 10L).map(t => t -> t): _*)
    val out = Stats.runsTest(df, "k", "x", "y").collect().head
    assert(out.getAs[Long]("n_above") == 5L)
    assert(out.getAs[Long]("n_below") == 4L)
    assert(out.getAs[Long]("runs") == 2L)
    val (n1, n2) = (5.0, 4.0); val n = n1 + n2; val p2 = 2.0 * n1 * n2
    val e = 1.0 + p2 / n
    val vr = (p2 * (p2 - n)) / (n * n * (n - 1.0))
    val z = math.floor(1000.0 * (2.0 - e) / math.sqrt(vr)).toLong
    assert(out.getAs[Long]("z_milli") == z && z < -2000)
  }

  test("runsTest: perfect alternation maximizes runs with positive z") {
    val vals = Seq(1L, 10L, 2L, 11L, 3L, 12L, 4L, 13L) // low median 4 drops
    val df = series("k", vals.zipWithIndex.map { case (v, i) => (i + 1).toLong -> v }: _*)
    val out = Stats.runsTest(df, "k", "x", "y").collect().head
    assert(out.getAs[Long]("n_above") == 4L && out.getAs[Long]("n_below") == 3L)
    // median row (4) drops mid-sequence: 1,10,2,11,3,12,13 → 6 runs
    assert(out.getAs[Long]("runs") == 6L)
    assert(out.getAs[Long]("z_milli") > 1000L)
  }

  test("mannKendall: monotone series maxes S; constant series has no variance") {
    val up = Stats.mannKendall(series("k", (1L to 10L).map(t => t -> (t * 7L)): _*),
      "k", "x", "y").collect().head
    assert(up.getAs[Long]("n_obs") == 10L)
    assert(up.getAs[Long]("s") == 45L) // n(n-1)/2, every pair concordant
    val vr = (10.0 * 9 * 25) / 18.0    // no ties
    assert(up.getAs[Long]("z_milli") ==
      math.floor(1000.0 * (45.0 - 1.0) / math.sqrt(vr)).toLong)
    val flat = Stats.mannKendall(series("k", 1L -> 5L, 2L -> 5L, 3L -> 5L),
      "k", "x", "y").collect().head
    assert(flat.getAs[Long]("s") == 0L)
    assert(flat.isNullAt(flat.fieldIndex("z_milli")))
  }

  test("mannKendall: S counts concordant minus discordant; S=±1 zeroes z") {
    // values 1,3,2: pairs +1,+1,-1 → S = 1 → continuity-corrected z = 0
    val out = Stats.mannKendall(series("k", 1L -> 1L, 2L -> 3L, 3L -> 2L),
      "k", "x", "y").collect().head
    assert(out.getAs[Long]("s") == 1L)
    assert(out.getAs[Long]("z_milli") == 0L)
    // falling series: S negative, z negative
    val dn = Stats.mannKendall(series("k", (1L to 8L).map(t => t -> (100L - t)): _*),
      "k", "x", "y").collect().head
    assert(dn.getAs[Long]("s") == -28L)
    assert(dn.getAs[Long]("z_milli") < -2000L)
  }

  test("seasonalDecompose: zero-sum weekly pattern recovers trend and seasonal exactly") {
    import spark.implicits._
    // v(t) = 100 + pattern(t mod 7), pattern sums to 0 over any 7-run
    val pattern = Seq(3L, -1L, 4L, -2L, 0L, -5L, 1L)
    val rows = (1 to 28).map { t =>
      ("k", t.toLong, (t % 7).toLong, 100L + pattern(t % 7)) }
    val out = Stats.seasonalDecompose(rows.toDF("k", "t", "dow", "v"),
      "k", "t", "dow", "v")
      .collect().map(r => r.getAs[Long]("t") -> r).toMap
    // interior rows (4..25): trend exactly 100, resid exactly 0
    (4L to 25L).foreach { t =>
      assert(out(t).getAs[Long]("trend") == 100L, s"t=$t")
      assert(out(t).getAs[Long]("seasonal") == pattern((t % 7).toInt), s"t=$t")
      assert(out(t).getAs[Long]("resid") == 0L, s"t=$t")
    }
    // the 3 edge rows each side carry NULL trend/resid
    Seq(1L, 2L, 3L, 26L, 27L, 28L).foreach { t =>
      assert(out(t).isNullAt(out(t).fieldIndex("trend")), s"t=$t")
      assert(out(t).isNullAt(out(t).fieldIndex("resid")), s"t=$t")
    }
  }

  test("seasonalDecompose: negative detrended means floor toward -inf") {
    import spark.implicits._
    // constant 0 except one -7 spike: some dow means are negative
    val rows = (1 to 21).map { t =>
      ("k", t.toLong, (t % 7).toLong, if (t == 11) -7L else 0L) }
    val out = Stats.seasonalDecompose(rows.toDF("k", "t", "dow", "v"),
      "k", "t", "dow", "v").collect()
    // every seasonal value must be replayable as floor(sum/cnt): just
    // assert closure — v = trend + seasonal + resid wherever defined
    out.filter(r => !r.isNullAt(r.fieldIndex("resid"))).foreach { r =>
      assert(r.getAs[Long]("v") ==
        r.getAs[Long]("trend") + r.getAs[Long]("seasonal") + r.getAs[Long]("resid"))
    }
  }

  test("ewmaExact: matches the exact-rational recursion, floors toward -inf") {
    import spark.implicits._
    val vals = Seq(0L, 0L, 800L, 800L, -100L, 40L, 0L, 1000L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", (i + 1).toLong, v) }
      .toDF("k", "t", "v")
    val out = Stats.ewmaExact(df, "k", "t", "v", maxLen = 31)
      .collect().map(r => r.getAs[Long]("t") -> r.getAs[Long]("ewma")).toMap
    // exact recursion over BigInt fractions: E_t = n_t / 8^(t-1),
    // n_1 = v_1, n_t = 7*n_(t-1) + v_t*8^(t-2)
    var n = BigInt(vals.head); var den = BigInt(1)
    assert(out(1L) == vals.head)
    for (t <- 2 to vals.size) {
      n = 7 * n + BigInt(vals(t - 1)) * den // den = 8^(t-2) entering round t
      den *= 8
      val e = out(t.toLong)
      val fl = (n - (((n % den) + den) % den)) / den
      assert(BigInt(e) == fl, s"t=$t")
    }
    // constant series is a fixed point
    val flat = Stats.ewmaExact(
      (1L to 5L).map(t => ("k", t, 700L)).toDF("k", "t", "v"), "k", "t", "v")
      .collect()
    assert(flat.forall(_.getAs[Long]("ewma") == 700L))
  }

  test("twoProportionZ: equal rates read z = 0; degenerate pools read NULL") {
    import spark.implicits._
    val eq = Stats.twoProportionZ(
      Seq((100L, 20L, 50L, 10L)).toDF("na", "xa", "nb", "xb"),
      "na", "xa", "nb", "xb").collect().head
    assert(eq.getAs[Long]("rate_a_ppm") == 200000L)
    assert(eq.getAs[Long]("rate_b_ppm") == 200000L)
    assert(eq.getAs[Long]("z_milli") == 0L)
    val skew = Stats.twoProportionZ(
      Seq((200L, 60L, 200L, 40L)).toDF("na", "xa", "nb", "xb"),
      "na", "xa", "nb", "xb").collect().head
    val p = 100.0 / 400.0
    val z = (0.3 - 0.2) / math.sqrt(p * (1.0 - p) * (1.0 / 200.0 + 1.0 / 200.0))
    assert(skew.getAs[Long]("z_milli") == math.floor(1000.0 * z).toLong)
    val allWin = Stats.twoProportionZ(
      Seq((10L, 10L, 10L, 10L)).toDF("na", "xa", "nb", "xb"),
      "na", "xa", "nb", "xb").collect().head
    assert(allWin.isNullAt(allWin.fieldIndex("z_milli")))
  }

  test("ewmaExact: a series longer than maxLen raises a named error") {
    import spark.implicits._
    val df = (1L to 6L).map(t => ("k", t, 1L)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      Stats.ewmaExact(df, "k", "t", "v", maxLen = 5).collect()
    }
    assert(e.getMessage.contains("maxLen") ||
      Option(e.getCause).exists(_.getMessage.contains("maxLen")))
  }


  test("calibrationBins: perfectly calibrated bins read gap 0 and ECE 0") {
    import spark.implicits._
    // bin 2 (scores 250000): 1 of 4 positive = 250000 acc; bin 7
    // (scores 750000): 3 of 4 positive
    val rows =
      Seq.fill(3)((250000L, 0L)) ++ Seq((250000L, 1L)) ++
      Seq.fill(3)((750000L, 1L)) ++ Seq((750000L, 0L))
    val out = Stats.calibrationBins(rows.toDF("s", "l"), "s", "l", 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(out.keySet == Set(2L, 7L))
    assert(out(2L).getAs[Long]("conf_ppm") == 250000L)
    assert(out(2L).getAs[Long]("acc_ppm") == 250000L)
    assert(out(2L).getAs[Long]("gap_ppm") == 0L)
    assert(out(7L).getAs[Long]("gap_ppm") == 0L)
    assert(out.values.forall(_.getAs[Long]("ece_ppm") == 0L))
  }

  test("calibrationBins: ECE is the n-weighted mean gap; edges clamp") {
    import spark.implicits._
    // bin 0: 2 rows, conf 50000, acc 1000000 -> gap 950000
    // bin 9: 6 rows, conf 999999, acc 0 -> gap 999999
    val rows = Seq.fill(2)((50000L, 1L)) ++ Seq.fill(6)((999999L, 0L))
    val out = Stats.calibrationBins(rows.toDF("s", "l"), "s", "l", 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(out(0L).getAs[Long]("gap_ppm") == 950000L)
    assert(out(9L).getAs[Long]("gap_ppm") == 999999L)
    // ece = floor((2*950000 + 6*999999) / 8)
    val ece = (2L * 950000L + 6L * 999999L) / 8L
    assert(out.values.forall(_.getAs[Long]("ece_ppm") == ece))
    // the top edge: score exactly 10^6 lands in the last bin
    val top = Stats.calibrationBins(
      Seq((1000000L, 1L)).toDF("s", "l"), "s", "l", 10).collect().head
    assert(top.getAs[Long]("bin") == 9L)
  }

  test("cramersV: an independent grid reads V = 0; a diagonal reads 1000") {
    import spark.implicits._
    // independence: every (x, y) cell has the same count
    val indep = for { x <- Seq("a", "b"); y <- Seq("p", "q"); _ <- 1 to 5 }
      yield (x, y)
    val vi = Stats.cramersV(indep.toDF("x", "y"), "x", "y").collect().head
    assert(vi.getAs[Long]("chi2_micro") == 0L)
    assert(vi.getAs[Long]("v_milli") == 0L)
    // perfect association: x determines y — true V = 1, and the
    // per-cell micro floors shave at most 1 milli off the readout
    val diag = for { x <- Seq("a", "b", "c"); _ <- 1 to 4 } yield (x, "y" + x)
    val vd = Stats.cramersV(diag.toDF("x", "y"), "x", "y").collect().head
    assert(vd.getAs[Long]("r_levels") == 3L && vd.getAs[Long]("c_levels") == 3L)
    // replay the per-cell floor arithmetic: 3 diagonal + 6 absent cells
    val n = 12.0
    val chi2Micro = 3L * math.floor(1e6 * 32.0 * 32.0 / (12.0 * 4.0 * 4.0)).toLong +
      6L * math.floor(1e6 * 16.0 * 16.0 / (12.0 * 4.0 * 4.0)).toLong
    assert(vd.getAs[Long]("chi2_micro") == chi2Micro)
    val expV = math.floor(1000.0 *
      math.sqrt((chi2Micro.toDouble / 1e6) / (n * 2.0))).toLong
    assert(vd.getAs[Long]("v_milli") == expV && expV >= 999L)
  }

  test("cramersV: degenerate single-level side reads NULL V") {
    import spark.implicits._
    val one = Stats.cramersV(
      Seq(("a", "p"), ("b", "p"), ("a", "p")).toDF("x", "y"), "x", "y")
      .collect().head
    assert(one.getAs[Long]("c_levels") == 1L)
    assert(one.isNullAt(one.fieldIndex("v_milli")))
  }


  test("standardizedMeanDiff: identical arms read 0; known case replays") {
    import spark.implicits._
    val same = Stats.standardizedMeanDiff(
      (Seq(10L, 20L, 30L).map(("a", _)) ++ Seq(10L, 20L, 30L).map(("b", _)))
        .toDF("g", "v"), "g", "a", "b", "v").collect().head
    assert(same.getAs[Long]("smd_milli") == 0L)
    // a = {0, 10}, b = {0, 0}: means 5, 0; va = 50, vb = 0
    // smd = 5 / sqrt(25) = 1.0
    val known = Stats.standardizedMeanDiff(
      Seq(("a", 0L), ("a", 10L), ("b", 0L), ("b", 0L)).toDF("g", "v"),
      "g", "a", "b", "v").collect().head
    assert(known.getAs[Long]("mean_a_milli") == 5000L)
    assert(known.getAs[Long]("mean_b_milli") == 0L)
    assert(known.getAs[Long]("smd_milli") == 1000L)
    // both arms constant: no variance -> NULL
    val const = Stats.standardizedMeanDiff(
      Seq(("a", 5L), ("a", 5L), ("b", 3L), ("b", 3L)).toDF("g", "v"),
      "g", "a", "b", "v").collect().head
    assert(const.isNullAt(const.fieldIndex("smd_milli")))
  }

  test("standardizedMeanDiff: |v| past the int64 square root does not overflow") {
    import spark.implicits._
    // v = 4e9: v*v = 1.6e19 > Long.MaxValue — the sum-of-squares must
    // ride DECIMAL(38,0) BEFORE squaring (ANSI Spark throws
    // ARITHMETIC_OVERFLOW on the long multiply; non-ANSI silently
    // wraps). The decimal sums (counts, Σv, means) stay EXACT at this
    // magnitude; smd itself is a documented one-IEEE-expression value
    // (cancellation-dominated out here), so assert the exact decimal
    // outputs and that the query runs, not a double identity.
    val big = 4000000000L
    val r = Stats.standardizedMeanDiff(
      Seq(("a", big), ("a", big + 2L), ("b", big - 2L), ("b", big))
        .toDF("g", "v"), "g", "a", "b", "v").collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("mean_a_milli") == (big + 1L) * 1000L)
    assert(r.getAs[Long]("mean_b_milli") == (big - 1L) * 1000L)
  }

  test("diffInDiff: parallel trends read 0; known case exact; empty cell NULL") {
    import spark.implicits._
    // parallel: both arms gain exactly +5
    val par = Seq(
      ("a", 0L, 10L), ("a", 1L, 15L), ("a", 0L, 20L), ("a", 1L, 25L),
      ("b", 0L, 1L), ("b", 1L, 6L))
    val p = Stats.diffInDiff(par.toDF("g", "p", "v"), "g", "a", "b", "p", "v")
      .collect().head
    assert(p.getAs[Long]("did_milli") == 0L)
    // treated gains +10, control +4 -> DiD = 6
    val kn = Seq(
      ("a", 0L, 10L), ("a", 1L, 20L),
      ("b", 0L, 10L), ("b", 1L, 14L))
    val k = Stats.diffInDiff(kn.toDF("g", "p", "v"), "g", "a", "b", "p", "v")
      .collect().head
    assert(k.getAs[Long]("did_milli") == 6000L)
    assert(k.getAs[Long]("mean_a_post_milli") == 20000L)
    // missing control-post cell -> NULL
    val miss = Stats.diffInDiff(
      Seq(("a", 0L, 1L), ("a", 1L, 2L), ("b", 0L, 1L))
        .toDF("g", "p", "v"), "g", "a", "b", "p", "v").collect().head
    assert(miss.isNullAt(miss.fieldIndex("did_milli")))
  }

  test("minDetectableEffect: replay of the closed form; degenerate pools NULL") {
    import spark.implicits._
    val out = Stats.minDetectableEffect(
      Seq((200L, 60L, 200L, 40L)).toDF("na", "xa", "nb", "xb"),
      "na", "xa", "nb", "xb").collect().head
    val p = 100.0 / 400.0
    val mde = (1.959963984540054 + 0.8416212335729143) *
      math.sqrt(p * (1.0 - p) * (1.0 / 200.0 + 1.0 / 200.0))
    assert(out.getAs[Long]("pooled_rate_ppm") == 250000L)
    assert(out.getAs[Long]("mde_ppm") == math.floor(1000000.0 * mde).toLong)
    val allWin = Stats.minDetectableEffect(
      Seq((10L, 10L, 10L, 10L)).toDF("na", "xa", "nb", "xb"),
      "na", "xa", "nb", "xb").collect().head
    assert(allWin.isNullAt(allWin.fieldIndex("mde_ppm")))
  }


  test("cvmTest: exact ECDF-integral statistic; zero on identical samples; ties weighted") {
    import spark.implicits._
    // A={1,2}, B={3,4}: D = (2,4,2,0), sum mult*D^2 = 24,
    // T = 24/(2*2*16) = 0.375
    val sep = Stats.cvmTest(
      Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v"),
      "g", "a", "b", "v").collect().head
    assert(sep.getAs[Long]("n_a") == 2L && sep.getAs[Long]("n_b") == 2L)
    assert(sep.getAs[Long]("t_ppm") == 375000L)
    // identical samples: every gap is zero
    val same = Stats.cvmTest(
      Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "v"),
      "g", "a", "b", "v").collect().head
    assert(same.getAs[Long]("t_ppm") == 0L)
    // ties weighted by multiplicity: A={1,1}, B={1,2} -> 12/64
    val tied = Stats.cvmTest(
      Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L)).toDF("g", "v"),
      "g", "a", "b", "v").collect().head
    assert(tied.getAs[Long]("t_ppm") == 187500L)
    // one empty arm reads NULL (the guard-class law)
    val one = Stats.cvmTest(
      Seq(("a", 1L)).toDF("g", "v"), "g", "a", "b", "v").collect().head
    assert(one.isNullAt(one.fieldIndex("t_ppm")))
  }

  test("conformalQuantile: the (n+1)(1-alpha) rank rule, ties by id, k > n reads NULL") {
    import spark.implicits._
    // n = 10, alpha = 0.2: k = ceil(11 * 0.8) = 9 -> 9th smallest
    val df = (1L to 10L).map(i => ("a", i, i)).toDF("g", "s", "id")
    val out = Stats.conformalQuantile(df, "g", "s", "id", 200000L)
      .collect().head
    assert(out.getAs[Long]("n") == 10L)
    assert(out.getAs[Long]("k_rank") == 9L)
    assert(out.getAs[Long]("qhat") == 9L)
    // alpha = 10% over n = 3: k = ceil(4 * 0.9) = 4 > 3 -> NULL qhat,
    // the key still present (the honest infinite interval)
    val small = Stats.conformalQuantile(
      (1L to 3L).map(i => ("b", i, i)).toDF("g", "s", "id"),
      "g", "s", "id", 100000L).collect().head
    assert(small.getAs[Long]("k_rank") == 4L)
    assert(small.isNullAt(small.fieldIndex("qhat")))
    // ties break by ascending id: scores all equal -> k-th row's score
    val tied = Stats.conformalQuantile(
      Seq(("c", 5L, 1L), ("c", 5L, 2L), ("c", 5L, 3L)).toDF("g", "s", "id"),
      "g", "s", "id", 500000L).collect().head
    assert(tied.getAs[Long]("k_rank") == 2L && tied.getAs[Long]("qhat") == 5L)
    intercept[IllegalArgumentException] {
      Stats.conformalQuantile(df, "g", "s", "id", 0L)
    }
  }

  test("degenerate inputs read NULL, never a division error") {
    import spark.implicits._
    // SMD with an empty arm: means/smd NULL
    val oneArm = Stats.standardizedMeanDiff(
      Seq(("a", 1L), ("a", 2L)).toDF("g", "v"), "g", "a", "b", "v")
      .collect().head
    assert(oneArm.getAs[Long]("n_b") == 0L)
    assert(oneArm.isNullAt(oneArm.fieldIndex("mean_b_milli")))
    assert(oneArm.isNullAt(oneArm.fieldIndex("smd_milli")))
    // two-proportion with an empty side: rates/z NULL on that side
    val z = Stats.twoProportionZ(
      Seq((0L, 0L, 10L, 5L)).toDF("na", "xa", "nb", "xb"),
      "na", "xa", "nb", "xb").collect().head
    assert(z.isNullAt(z.fieldIndex("rate_a_ppm")))
    assert(z.getAs[Long]("rate_b_ppm") == 500000L)
    // MDE over an empty experiment: everything NULL
    val m = Stats.minDetectableEffect(
      Seq((0L, 0L, 0L, 0L)).toDF("na", "xa", "nb", "xb"),
      "na", "xa", "nb", "xb").collect().head
    assert(m.isNullAt(m.fieldIndex("pooled_rate_ppm")))
    assert(m.isNullAt(m.fieldIndex("mde_ppm")))
  }

}
