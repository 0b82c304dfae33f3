package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Fx.t(spark, sfDir, "documents")

  test("deterministic sample: same (seed, key) -> identical set, every run") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sample must not depend on partition layout")
    val n = a.size.toDouble / docs.count()
    assert(n > 0.2 && n < 0.4, s"fraction way off: $n")
    // a different seed draws a different sample
    val c = Sampling.deterministicSample(docs, "doc_id", 0.3, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(a != c)
    // nested property: a 0.1 sample with the same seed is a subset of 0.3
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("stratified sample applies per-stratum fractions") {
    val s = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), default = 0.0)
    val langs = s.select("lang").distinct().as[String].collect().toSet
    val enTotal = docs.filter($"lang" === "en").count()
    if (enTotal > 0) {
      assert(langs == Set("en"))
      assert(s.count() == enTotal) // fraction 1.0 keeps every en row
    } else assert(s.count() == 0)
  }

  test("domain mix: hits target slots, caps at domain size, drops unweighted domains") {
    // 400 a's, 50 b's, 100 c's; budget 200 at (a 0.5, b 0.5):
    // a keeps ~100 (rate 0.25), b keeps ALL 50 (slot 100 > size —
    // never up-samples), c drops (no weight)
    val df = (
      (0 until 400).map(i => (i.toLong, "a")) ++
      (400 until 450).map(i => (i.toLong, "b")) ++
      (450 until 550).map(i => (i.toLong, "c"))).toDF("id", "dom")
    val kept = Sampling.mixToProportions(df, "id", "dom",
      weights = Map("a" -> 0.5, "b" -> 0.5), budget = 200)
    val byDom = kept.groupBy($"dom").count()
      .as[(String, Long)].collect().toMap
    assert(byDom.getOrElse("c", 0L) == 0L, "unweighted domain must drop")
    assert(byDom("b") == 50L, "under-filled slot keeps the whole domain")
    val a = byDom("a")
    assert(a > 60 && a < 140, s"a kept $a of a ~100-row slot")
    // deterministic: the same call keeps the same rows
    val again = Sampling.mixToProportions(df, "id", "dom",
      weights = Map("a" -> 0.5, "b" -> 0.5), budget = 200)
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("leakage-safe split: near-dup clusters never straddle train/holdout") {
    val ids = (1L to 200L).toDF("doc_id")
    // clusters {1,2,3} (chained) and {10,11}; everyone else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val split = Sampling.leakageSafeSplit(ids, "doc_id", pairs, "a", "b",
      trainFraction = 0.5)
      .select("doc_id", "cluster_id", "split")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.size == 200)
    // cluster members share BOTH the label and the split
    assert(Set(split(1L), split(2L), split(3L)).size == 1)
    assert(Set(split(10L), split(11L)).size == 1)
    // realized fraction near the target over 197 clusters
    val trainFrac = split.values.count(_._2 == "train").toDouble / 200
    assert(trainFrac > 0.35 && trainFrac < 0.65, s"train fraction off: $trainFrac")
    // deterministic: identical assignment on re-run, portable twin agrees
    // with itself across layouts
    val again = Sampling.leakageSafeSplit(ids.repartition(7), "doc_id",
      pairs, "a", "b", trainFraction = 0.5)
      .select("doc_id", "cluster_id", "split")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again == split)
    // no cache entries left behind (CC labels released inside)
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    Sampling.leakageSafeSplit(ids, "doc_id", pairs, "a", "b", 0.5).count()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1, // the assignment localCheckpoint, GC-reclaimed
      s"split must not accumulate caches: $before -> $after")
  }

  test("sequence packing: bins fill in order; no bin starts past maxTokens") {
    val packed = Sampling.packSequences(
      docs.select($"doc_id", graft.ext.TextOps.tokenCountWs($"text").as("tok")),
      "tok", "doc_id", maxTokens = 512L)
    val rows = packed.orderBy("doc_id")
      .select("tok", "bin_id").as[(Long, Long)].collect()
    // bin ids are non-decreasing in fill order and start at 0
    assert(rows.head._2 == 0L)
    assert(rows.sliding(2).forall { case Array((_, b1), (_, b2)) => b2 >= b1; case _ => true })
    // each bin's exclusive prefix (all but its last, straddling doc) <= max
    val byBin = rows.zipWithIndex.groupBy(_._1._2)
    byBin.values.foreach { rs =>
      val toks = rs.map(_._1._1)
      assert(toks.dropRight(1).sum <= 512L)
    }
  }

  test("global packing (distributed two-phase) is bit-identical to a single global window") {
    import org.apache.spark.sql.expressions.Window
    val t = docs.select($"doc_id", graft.ext.TextOps.tokenCountWs($"text").as("tok"))
    val twoPhase = Sampling.packSequences(t, "tok", "doc_id", maxTokens = 512L,
        globalBuckets = 8)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    // the naive reference: one unpartitioned running-sum window
    val w = Window.orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = t.withColumn("__cum", sum($"tok").over(w))
      .select($"doc_id",
        floor(($"__cum" - $"tok").cast("double") / 512).cast("long").as("bin_id"))
      .as[(Long, Long)].collect().toMap
    assert(twoPhase == naive,
      s"two-phase global packing diverged on ${twoPhase.toSet.diff(naive.toSet).take(5)}")
    // degenerate bucketing (1 bucket) must agree too
    val oneBucket = Sampling.packSequences(t, "tok", "doc_id", maxTokens = 512L,
        globalBuckets = 1)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    assert(oneBucket == naive)
  }

  test("global packing refuses a non-numeric order column") {
    intercept[IllegalArgumentException] {
      Sampling.packSequences(docs.select($"doc_id", $"lang",
        lit(1L).as("tok")), "tok", "lang", maxTokens = 512L)
    }
  }

  test("capPerKey: at most n per key, small groups intact, stable across partitionings") {
    val df = (1L to 120L).map(i => (i, s"k${i % 3}")).toDF("id", "k")
      .union(Seq((200L, "rare")).toDF("id", "k"))
    val a = Sampling.capPerKey(df, "k", "id", n = 10)
      .select("id", "k").as[(Long, String)].collect().toSet
    val b = Sampling.capPerKey(df.repartition(7), "k", "id", n = 10)
      .select("id", "k").as[(Long, String)].collect().toSet
    assert(a == b, "kept set must be a pure function of (seed, ids)")
    val byKey = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byKey("k0") == 10 && byKey("k1") == 10 && byKey("k2") == 10)
    assert(byKey("rare") == 1, "groups under the cap keep everything")
  }

  test("selectByTokenBudget: best-first with id tiebreak; last kept doc may straddle; two-phase == global window") {
    val small = Seq(
      (1L, 100L, 0.9), (2L, 100L, 0.5), (3L, 100L, 0.7),
      (4L, 100L, 0.5), (5L, 100L, 0.1))
      .toDF("id", "tok", "q")
    // rank: 1(.9), 3(.7), 2(.5, id<4), 4(.5), 5(.1); with budget 350
    // doc 4 STARTS at 300 < 350 (kept, straddles to 400), doc 5
    // starts at 400 (dropped)
    val kept = Sampling.selectByTokenBudget(small, "tok", "q", "id", budget = 350L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L))
    // the distributed two-phase prefix sum is bit-identical to the
    // single global window it replaces (the packSequences law)
    val big = (1L to 300L).map(i => (i, (i % 37) + 1L, ((i * 2654435761L) % 1000) / 1000.0))
      .toDF("id", "tok", "q")
    val twoPhase = Sampling.selectByTokenBudget(big, "tok", "q", "id", budget = 1500L)
      .select("id").as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.orderBy($"q".desc, $"id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ref = big.withColumn("c", sum($"tok").over(w))
      .filter($"c" - $"tok" < 1500L).select("id").as[Long].collect().toSet
    assert(twoPhase == ref)
  }

  test("shuffleIntoShards: stable across partition layouts, contiguous pos per shard, no row lost") {
    val df = (1L to 200L).map(i => (i, s"d$i")).toDF("id", "v")
    val a = Sampling.shuffleIntoShards(df, "id", shards = 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    val b = Sampling.shuffleIntoShards(df.repartition(7), "id", shards = 4)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    // the order is a pure function of (seed, key): repartitioning the
    // input must not move a single row (rand() would)
    assert(a == b)
    assert(a.map(_._1).size == 200, "every row exactly once")
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1L to rows.size).toSeq,
        s"shard $s pos must be contiguous 1..n") }
    // a different seed defines a different permutation
    val c = Sampling.shuffleIntoShards(df, "id", shards = 4, seed = 7L)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSet
    assert(c != a)
  }

  test("ntileByKey == SQL NTILE over every key, including n < tiles") {
    import org.apache.spark.sql.expressions.Window
    // skewed key sizes: 1, 2, 3, 50, 101 rows — exercises remainder
    // tiles, base-0 keys, and multi-bucket ranks
    val rows = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 50), ("e", 101))
      .flatMap { case (k, n) => (1 to n).map(i => (k, i.toLong * 31 % 97, k.hashCode.toLong * 1000 + i)) }
    val df = rows.toDF("k", "score", "id")
    val got = Sampling.ntileByKey(df, "k", "score", "id", tiles = 3,
        globalBuckets = 8)
      .select("k", "id", "tile").as[(String, Long, Int)].collect().toSet
    val ref = df.withColumn("tile", ntile(3).over(
        Window.partitionBy($"k").orderBy($"score".desc, $"id")))
      .select("k", "id", "tile").as[(String, Long, Int)].collect().toSet
    assert(got == ref)
    // partition layout must not matter
    val got7 = Sampling.ntileByKey(df.repartition(7), "k", "score", "id", 3)
      .select("k", "id", "tile").as[(String, Long, Int)].collect().toSet
    assert(got7 == ref)
  }

  test("temperatureMix: exact budget, sqrt flattening, largest remainder") {
    val df = (Seq.fill(900)("big") ++ Seq.fill(90)("mid") ++ Seq.fill(10)("sml"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "id")
    val out = Sampling.temperatureMix(df, "k", budget = 100L)
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq("big", "mid", "sml"))
    assert(out.map(_._2).toSeq == Seq(900L, 90L, 10L))
    // target sums EXACTLY to the budget (largest-remainder apportionment)
    assert(out.map(_._4).sum == 100L)
    // alpha=1/2 flattening: allocation ratio ~ sqrt of the count ratio
    val shares = out.map(_._3)
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    val wantBig = math.sqrt(900.0) / (math.sqrt(900.0) + math.sqrt(90.0) + math.sqrt(10.0))
    assert(math.abs(shares(0) - wantBig) < 1e-4)
    // the tail key gets far MORE than proportional (10/1000 -> 1 doc)
    assert(out(2)._4 >= 6, s"sml under-allocated: ${out(2)._4}")
    // determinism across layouts
    val again = Sampling.temperatureMix(df.repartition(5), "k", budget = 100L)
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(again.toSeq == out.toSeq)
  }

  test("ppsSample: exact n, weight-proportional inclusion, deterministic, excludes undefined weights") {
    val rows = (1L to 2000L).map(i => (i, if (i <= 1000) 1.0 else 9.0)) ++
      Seq((9001L, 0.0), (9002L, -3.0))
    val df = rows.toDF("id", "w")
    val got = Sampling.ppsSample(df, "id", "w", n = 300)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.size == 300)
    assert(!got.exists(t => t._1 == 9001L || t._1 == 9002L),
      "zero/negative weights have no defined draw")
    // inclusion ~ proportional to weight: 9x-weighted rows should
    // dominate the sample well beyond their row share
    val heavy = got.count(_._2 == 9.0)
    assert(heavy > 200, s"PPS should favor heavy rows 9:1, got $heavy/300")
    // determinism across partition layouts; seed changes the draw
    val again = Sampling.ppsSample(df.repartition(7), "id", "w", n = 300)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(again.toSet == got.toSet)
    val other = Sampling.ppsSample(df, "id", "w", n = 300, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(other.toSet != got.toSet)
    // a row whose weight dwarfs everything is (near-)surely included
    val whale = df.union(Seq((5000L, 1e12)).toDF("id", "w"))
    val withWhale = Sampling.ppsSample(whale, "id", "w", n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(withWhale.contains(5000L))
  }

  test("percentileNormalize: exact serial ranks, endpoints 0 and 1e6, null drop") {
    import org.apache.spark.sql.functions.col
    val rows = (1 to 77).map(i => (i.toLong, ((i * 31) % 19).toDouble))
    val df = rows.toDF("id", "score")
      .union(Seq((999L, null.asInstanceOf[java.lang.Double]))
        .toDF("id", "score"))
    val out = Sampling.percentileNormalize(df, "score", "id")
      .collect().map(r => r.getLong(0) -> ((r.getAs[Long]("rank"), r.getAs[Long]("pct_ppm"))))
      .toMap
    assert(!out.contains(999L))
    val serial = rows.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(rows.forall { case (id, _) => out(id)._1 == serial(id) })
    val n = rows.size.toLong
    assert(rows.forall { case (id, _) =>
      out(id)._2 == (serial(id) - 1) * 1000000L / (n - 1) })
    assert(out.values.map(_._2).min == 0L && out.values.map(_._2).max == 1000000L)
  }

  test("poissonBootstrapMean: weights average 1, CI brackets the mean, deterministic") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 97).toLong * 10L)).toDF("id", "v")
    val out = Sampling.poissonBootstrapMean(df, "id", "v", b = 50).collect().head
    assert(out.getAs[Long]("n_rows") == 500L)
    val mean = out.getAs[Double]("mean")
    assert(math.abs(mean - df.agg(avg(col("v"))).head.getDouble(0)) < 1e-9)
    assert(out.getAs[Long]("b") == 50L)
    val (lo, hi) = (out.getAs[Double]("ci_lo"), out.getAs[Double]("ci_hi"))
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] should bracket $mean")
    // ±2.5%-tail order statistics of a 500-row mean stay within a few
    // percent of the point estimate
    assert(hi - lo < mean * 0.25)
    val again = Sampling.poissonBootstrapMean(df, "id", "v", b = 50).collect().head
    assert(again == out, "bootstrap must be bit-deterministic")
  }

  test("poissonBootstrapMean: wide tails degenerate to min/max replicate means") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    // tailPermille 250 at b=4: lo rank 1, hi rank 4 — the extremes
    val out = Sampling.poissonBootstrapMean(df, "id", "v", b = 4,
      tailPermille = 250).collect().head
    assert(out.getAs[Long]("b") == 4L)
    assert(out.getAs[Double]("ci_lo") <= out.getAs[Double]("ci_hi"))
  }

  test("cumulativeShare: exact running share in (value desc, key asc) order") {
    import spark.implicits._
    val rows = Seq(("a", 50L), ("b", 30L), ("c", 15L), ("d", 5L), ("e", 30L))
    val out = Sampling.cumulativeShare(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    // order: a(50) b(30) e(30) c(15) d(5); total 130
    assert(out("a").getAs[Long]("cum_value") == 50L)
    assert(out("a").getAs[Long]("cum_share_ppm") == 50L * 1000000L / 130L)
    assert(out("b").getAs[Long]("cum_value") == 80L)
    assert(out("e").getAs[Long]("cum_value") == 110L)   // tie after b by key
    assert(out("c").getAs[Long]("cum_value") == 125L)
    assert(out("d").getAs[Long]("cum_value") == 130L)
    assert(out("d").getAs[Long]("cum_share_ppm") == 1000000L)
  }


  test("cumulativeShare: an all-zero measure reads NULL shares, not an error") {
    import spark.implicits._
    val out = Sampling.cumulativeShare(
      Seq(("a", 0L), ("b", 0L)).toDF("k", "v"), "k", "v").collect()
    assert(out.length == 2)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("cum_share_ppm"))))
  }

  test("prioritySample: DLT estimates = max(w, tau); full population keeps exact weights") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, i * 10L)).toDF("id", "w")
    // n >= population: everything kept, tau = 0, est == w exactly
    val full = Sampling.prioritySample(df, "id", "w", n = 40)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getDecimal(r.fieldIndex("priority")),
          r.getDecimal(r.fieldIndex("est_weight")))).toMap
    assert(full.size == 40)
    assert(full.forall { case (id, (_, est)) => est.longValueExact == id * 10L })
    // n < population: kept = the n largest priorities from the full
    // ranking; tau = the (n+1)-th; every estimate = max(w, tau)
    val ranking = full.toSeq.sortWith { case ((id1, (p1, _)), (id2, (p2, _))) =>
      val c = p1.compareTo(p2)
      c > 0 || (c == 0 && id1 < id2)
    }
    val expectKept = ranking.take(10).map(_._1).toSet
    val tau = ranking(10)._2._1
    val got = Sampling.prioritySample(df, "id", "w", n = 10)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getDecimal(r.fieldIndex("est_weight"))).toMap
    assert(got.keySet == expectKept)
    got.foreach { case (id, est) =>
      val w = java.math.BigDecimal.valueOf(id * 10L)
      assert(est.compareTo(w.max(tau)) == 0, s"id $id est $est tau $tau")
    }
    // non-positive and NULL weights have no defined draw
    val drop = Sampling.prioritySample(
      Seq((1L, Some(5L)), (2L, Some(0L)), (3L, Option.empty[Long]))
        .toDF("id", "w"), "id", "w", n = 5).collect()
    assert(drop.map(_.getAs[Long]("id")).toSeq == Seq(1L))
  }

}
