package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible sampling + sequence packing for training-data curation
  * (north-star extensions; no counterpart in the reference).
  *
  * Sampling here is HASH-based, not `rand()`-based: membership depends
  * only on (seed, key), so a sample is stable across retries, partition
  * layouts, and cluster sizes — the property a 100 TB pipeline needs
  * for resumable, auditable runs (`rand()` re-rolls on every recompute
  * of a lost partition).
  */
object Sampling {

  /** Full-width seeded hash (raw xxhash64, 64 bits, signed). Use this —
    * never a mod-1e6 bucket — wherever the hash defines an ORDER: a
    * bucket has only 1e6 distinct values, so past ~1e6 rows collisions
    * dominate and tie-breaking by key degenerates the "pseudo-random"
    * order into long ascending-key runs. */
  def fullHash(key: Column, seed: Long): Column =
    xxhash64(lit(seed), key)

  /** THE range-bucketing step every two-phase prefix-sum operator here
    * (and in [[Stats]]) shares: approxQuantile bounds over `qCol`
    * (NaN-stripped, deduped) folded into a monotone bucket-id
    * expression. Any monotone bucketing yields bit-identical results
    * downstream — the quantile estimate needs NO determinism — so the
    * only contract is monotonicity, which the strict `>` fold
    * guarantees. Callers pair this with their own per-bucket window +
    * broadcast bucket-offset join (the offset shapes differ: global,
    * per-key, weighted). */
  private[ext] def rangeBucketExpr(df: DataFrame, qCol: Column,
      buckets: Int): Column = {
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else Option(df.select(qCol.cast("double").as("__rbq"))
          // 0.01 relative error (r17, was 0.001): bounds only need
          // MONOTONICITY — any estimate yields bit-identical results
          // downstream (the contract above) — and the GK sketch is
          // ~10x smaller per partition, so the eager probe pass
          // merges less state; bucket balance at 32 buckets moves
          // ±1% of rank at worst
          .stat.approxQuantile("__rbq", probes, 0.01))
        .getOrElse(Array.empty[Double]).filterNot(_.isNaN).distinct.sorted
    bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(qCol.cast("double") > lit(b), 1).otherwise(0)
    }
  }

  /** Hash bucket in [0, 1e6): fast in-engine form (xxhash64). For
    * MEMBERSHIP thresholds only (sampling rates); ordering wants
    * [[fullHash]]. */
  def hashBucket(key: Column, seed: Long): Column =
    pmod(fullHash(key, seed), lit(1000000L))

  /** Engine-PORTABLE full-width hash: all 56 bits of the md5 prefix.
    * md5 hex is identical in Spark, DuckDB, and Postgres, so anything
    * defined over this hash can be reproduced (and audited) outside
    * Spark — xxhash64 cannot. 14 hex chars = 56 bits, non-negative. */
  def portableHash(key: Column, seed: Long): Column =
    PortableHash.first56(key, seed)

  /** Engine-PORTABLE hash bucket in [0, 1e6): [[portableHash]] mod 1e6.
    * 2^56 mod 1e6 ≈ 1e-11 modulo bias — negligible (a 24-bit hash
    * would bias the rate by up to ~1.3%). Membership thresholds only;
    * ordering wants the full 56 bits. */
  def portableBucket(key: Column, seed: Long): Column =
    portableHash(key, seed) % 1000000L

  /** Deterministic Bernoulli sample: keep rows where
    * hash(seed, key) mod 1e6 < fraction·1e6. `portable = true` switches
    * to the md5 bucket (cross-engine reproducible, ~2× slower/row). */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    val bucket = if (portable) portableBucket(col(keyCol), seed)
      else hashBucket(col(keyCol), seed)
    // math.round, NOT truncation — stratifiedSample rounds its
    // per-stratum thresholds, and the decomposition law (stratified ==
    // per-stratum Bernoulli) requires both APIs to map a fraction to
    // the SAME integer threshold (0.3·1e6 truncates to 299999 but
    // rounds to 300000)
    df.filter(bucket < lit(math.round(fraction * 1000000L)))
  }

  /** WEIGHTED fixed-size sampling — sequential Poisson / order
    * sampling (Ohlsson 1998): each row gets the order variable
    * q = u / w (u = the portable 56-bit hash of its key as a uniform
    * integer, w = its weight) and the n smallest q win, giving
    * inclusion probability ≈ proportional to weight (PPS). The
    * "sample 10k documents proportional to token count" primitive —
    * a Bernoulli rate can't hit an exact n, and true PPS-without-
    * replacement needs sequential draws a cluster can't do.
    *
    * Deterministic and engine-portable like every sampler here: u is
    * an integer hash of (seed, key), w an input column; q is the IEEE
    * double u/w (correctly rounded in any engine), ties broken by key.
    * Rows with NULL or non-positive weight are excluded (they have no
    * defined draw). Shape: per-partition top-n + driver merge
    * (TakeOrdered) — never a global sort.
    *
    * Output: the input columns plus `pps` (the order variable, kept
    * for audit — re-running anywhere reproduces it bit for bit). */
  def ppsSample(df: DataFrame, keyCol: String, weightCol: String, n: Int,
      seed: Long = 42L): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__pps", portableHash(col(keyCol), seed).cast("double") /
        col(weightCol).cast("double"))
      .orderBy(col("__pps"), col(keyCol))
      .limit(n)
      .withColumnRenamed("__pps", "pps")
  }

  /** PRIORITY SAMPLING with the Duffield–Lund–Thorup ESTIMATOR —
    * [[ppsSample]]'s missing other half: not just WHICH n rows a
    * weighted sample keeps, but the per-row `est_weight` that makes
    * subset sums UNBIASED (Duffield, Lund & Thorup, JACM 2007:
    * Σ est over any subset of the sample estimates that subset's true
    * weight total — "how many tokens does domain X hold?" answered
    * from a fixed-size sample). Priority q_i = w_i/u_i with u_i =
    * h_i/2⁵⁶ (the portable 56-bit hash as a uniform), kept = the n
    * largest priorities, τ = the (n+1)-th, est_i = max(w_i, τ).
    *
    * EXACT arithmetic throughout — the blocker that kept this out
    * earlier was u^(1/w)-style pow (not correctly rounded
    * cross-engine); the DLT form needs only ⌊w·2⁵⁶/h⌋, one
    * DECIMAL(38,0) floor division ([[PortableDiv.floorDecWide]])
    * both engines replay bit for bit (priorities and estimates stay
    * DECIMAL(38,0): a tiny hash makes q exceed int64 legitimately —
    * downstream hashes/serializers that coerce through int64 or
    * float must re-encode, e.g. split hi/lo at 10¹⁸ like the q313
    * contract does). Weight bound: Spark types the quotient
    * DECIMAL(38,6) (32 integral digits), so w·2⁵⁶ must stay below
    * 10³² ⇒ w < 1.38e15 — beyond that ANSI mode throws (loudly, not
    * wrongly). h clamps to ≥1 (a zero hash would
    * divide by zero at probability 2⁻⁵⁶). Rows with NULL/non-positive
    * weight drop (no defined draw); ties break by key. When the
    * population fits in n, τ = 0 and every estimate is the exact
    * weight. Returns the kept rows' (keyCol, weightCol) plus
    * `priority` and `est_weight`.
    *
    * Scale shape: one narrow projection + TakeOrdered(n+1) (per-
    * partition heaps + driver merge — never a global sort), then a
    * row_number window over the ≤n+1 survivors (bounded — the
    * zipfProfile rule) and a broadcast scalar τ. */
  def prioritySample(df: DataFrame, keyCol: String, weightCol: String,
      n: Int, seed: Long = 42L): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val Dec = "decimal(38,0)"
    val two56 = lit("72057594037927936").cast(Dec) // 2^56
    val base = df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(keyCol), col(weightCol))
    val h = greatest(portableHash(col(keyCol), seed), lit(1L)).cast(Dec)
    val num = col(weightCol).cast("long").cast(Dec) * two56
    val ranked = base
      .withColumn("__p", PortableDiv.floorDecWide(num, h).cast(Dec))
      .orderBy(col("__p").desc, col(keyCol))
      .limit(n + 1)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__p").desc, col(keyCol))
    val rn = ranked.withColumn("__rn", row_number().over(w))
    val tau = rn.agg(
      max(when(col("__rn") === n + 1, col("__p"))).as("__tau"))
    rn.filter(col("__rn") <= n)
      .crossJoin(broadcast(tau))
      .select(col(keyCol), col(weightCol), col("__p").as("priority"),
        greatest(col(weightCol).cast("long").cast(Dec),
          coalesce(col("__tau"), lit(0L).cast(Dec))).as("est_weight"))
  }

  /** Per-stratum deterministic sampling: different fraction per value
    * of `strataCol` (e.g. downsample web text, keep all code) — the
    * mixture-targeting knob of a training-data pipeline. Thresholds are
    * computed as exact integers driver-side (`(f·1e6).round`), so the
    * kept set is bit-stable across engines and re-runs; `portable`
    * switches to the md5 bucket (cross-engine auditable, like
    * [[deterministicSample]]). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 0.0,
      seed: Long = 42L, portable: Boolean = false): DataFrame = {
    (fractions.values ++ Seq(default)).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction $f outside [0,1]"))
    val threshold = fractions.foldLeft(lit(math.round(default * 1000000L))) {
      case (acc, (value, f)) =>
        when(col(strataCol) === value, lit(math.round(f * 1000000L))).otherwise(acc)
    }
    val bucket = if (portable) portableBucket(col(keyCol), seed)
      else hashBucket(col(keyCol), seed)
    df.filter(bucket < threshold)
  }

  /** Domain MIXING under a row budget — the data-mixing step of a
    * training pipeline (DoReMi-style target weights applied as
    * deterministic subsampling): domain d keeps
    * `rate_d = min(1, w_d · budget / n_d)` of its rows, so the kept
    * set approximates `budget` rows at the target proportions. Never
    * up-samples: a domain too small to fill its slot keeps everything
    * (and the realized mix shifts accordingly — re-run with rebalanced
    * weights if that matters). `weights` are ABSOLUTE target fractions
    * of the budget (no hidden normalization — normalization order
    * would be engine-specific double arithmetic, which breaks exact
    * replay); domains missing from `weights` drop entirely.
    *
    * Determinism/auditability: rates resolve to exact integer
    * thresholds `floor(rate · 1e6)` over the same per-row hash bucket
    * as [[deterministicSample]], and the rate arithmetic is plain IEEE
    * double mult/div/min — an external engine replaying the same
    * formula over the same counts keeps the same rows (the q111
    * oracle does exactly that). The domain-count aggregate collects
    * driver-side — domains are few by construction (sources/languages,
    * not keys). */
  def mixToProportions(df: DataFrame, keyCol: String, domainCol: String,
      weights: Map[String, Double], budget: Long, seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(weights.nonEmpty, "mixToProportions requires target weights")
    weights.foreach { case (d, w) =>
      require(w >= 0 && w <= 1, s"weight $w for domain '$d' outside [0,1]") }
    require(budget >= 0, s"budget $budget must be >= 0")
    // NULL domains always drop (weights cannot name null, and the
    // threshold CASE never matches a null row anyway) — filtering them
    // here keeps a null domain from colliding with a domain literally
    // named "null" in the counts map
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val thresholds: Map[String, Long] = counts.map { case (d, n) =>
      val w = weights.getOrElse(d, 0.0)
      d -> math.floor(math.min(1.0, w * budget / n) * 1000000.0).toLong
    }
    val thr = thresholds.foldLeft(lit(0L)) { case (acc, (d, t)) =>
      when(col(domainCol) === d, lit(t)).otherwise(acc)
    }
    val bucket = if (portable) portableBucket(col(keyCol), seed)
      else hashBucket(col(keyCol), seed)
    df.filter(bucket < thr)
  }

  /** Leakage-safe train/holdout split: near-duplicate documents must
    * land in the SAME split — a near-dup of a training doc in the
    * held-out set leaks training content into eval (the reason dedup
    * papers decontaminate BEFORE splitting). Clusters the pair
    * evidence (near-dup pairs from MinHash/SimHash/winnowing — any
    * [[Dedup]] candidate generator) with connectedComponents, then
    * assigns each CLUSTER, not each doc, by deterministic hash of the
    * cluster id: every member inherits the cluster's split, and the
    * assignment is stable across retries/engines (`portable` = the md5
    * bucket). Singleton docs are their own cluster, so the realized
    * train fraction converges to `trainFraction` as clusters stay
    * small (dedup graphs; a corpus-sized cluster means dedup should
    * have run first).
    *
    * Scale: one CC over the edge-induced subgraph (isolated docs never
    * enter the loop) + one hash-join of docs to the checkpointed
    * assignment — no extra caches left behind (the CC labels are
    * released here, the assignment is eagerly checkpointed ids+labels,
    * never text). */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      trainFraction: Double, seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(trainFraction >= 0 && trainFraction <= 1,
      s"trainFraction $trainFraction outside [0,1]")
    val cc = graft.ext.Dedup.connectedComponents(
      docs.select(col(idCol)), idCol, pairs, aCol, bCol)
    val bucket = if (portable) portableBucket(col("cluster_id"), seed)
      else hashBucket(col("cluster_id"), seed)
    val assign = cc.withColumn("split",
        when(bucket < lit(math.round(trainFraction * 1000000L)), lit("train"))
          .otherwise(lit("holdout")))
      .localCheckpoint(true)
    cc.unpersist()
    docs.join(assign, Seq(idCol))
  }

  /** Deterministic global training-data shuffle into shards: an epoch-0
    * data loader wants the corpus in a reproducible pseudo-random order,
    * materialized as `shards` roughly-equal pieces. The order is defined
    * by hash(seed, key) — stable across retries, partition layouts, and
    * engines (`portable` = the md5 bucket, auditable outside Spark) —
    * never by `rand()`, which re-rolls on every recompute of a lost
    * partition. Returns the input plus `shard` (= mod-1e6 bucket mod
    * shards) and `pos` (the row's 1-based rank within its shard,
    * FULL-WIDTH hash order — 64 raw xxhash64 bits, or all 56 md5
    * prefix bits in portable mode — hash ties broken by the key itself
    * so the order is total without trusting hash injectivity). The
    * full-width order matters at corpus scale: a mod-1e6 bucket
    * collides heavily past ~1e6 rows, and key-tie-breaking inside
    * collision runs would degrade the order toward ascending-key — a
    * biased epoch-0 curriculum. `write.partitionBy("shard")` with a
    * sort on `pos` materializes the shuffle.
    *
    * Scale: ONE hash exchange on shard + a per-shard sort — exactly the
    * shuffle a distributed sharded writer performs anyway. The global
    * cross-shard order is defined (interleave shards round-robin by
    * pos) but never materialized in one place; no single-partition
    * global sort exists in the plan. */
  def shuffleIntoShards(df: DataFrame, keyCol: String, shards: Int,
      seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val h = if (portable) portableHash(col(keyCol), seed)
      else fullHash(col(keyCol), seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(pmod(col("__h"), lit(1000000L)), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Deterministic per-key cap — "at most `n` docs per domain/host"
    * (C4's host-level cap; the guard that keeps one prolific source
    * from dominating the mix). Rows rank within each key by the seeded
    * FULL-WIDTH hash of their id ([[fullHash]] / [[portableHash]] —
    * not the mod-1e6 bucket, whose collisions past ~1e6 rows/key would
    * bias the kept subset toward ascending ids) — a reproducible
    * pseudo-random order, so the kept subset is unbiased AND stable
    * across retries/engines (hash ties broken by the id) — and the
    * first `n` survive. ONE exchange on the key, per-key sorts bounded
    * by group size; never a global sort or a rand(). */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, n: Int,
      seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(n >= 0, s"cap $n must be >= 0")
    val h = if (portable) portableHash(col(idCol), seed)
      else fullHash(col(idCol), seed)
    val w = Window.partitionBy(col(keyCol)).orderBy(h, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Quality-ranked corpus selection under a TOKEN budget — "take the
    * best N tokens", the final selection step of a curation pipeline
    * (quality-classifier or perplexity scores in, a fixed token budget
    * out). Docs are ranked by (`scoreCol` DESC, `idCol` ASC — a total
    * order, so the kept set is exact and engine-replayable), and a doc
    * is kept iff it STARTS within the budget (cum − tok < budget, the
    * [[packSequences]] boundary rule: the last kept doc may straddle).
    *
    * Distributed like global [[packSequences]]: range-bucket on the
    * NEGATED score (any monotone bucketing is correct; ties never
    * split across buckets), per-bucket prefix sums in parallel, and a
    * tiny bucket-offset aggregate broadcast back — no global sort, no
    * single-partition window. Same eager-scan caveat as packSequences:
    * approxQuantile scans the input at construction time — AND the
    * input must be DETERMINISTIC across scans (persist() a
    * non-deterministic upstream first), or the quantile bounds could
    * disagree with the later cumulative pass.
    *
    * NULL handling is EXPLICIT: rows with a NULL score or NULL token
    * count are excluded up front (an unscored doc has no rank and a
    * doc with unknown cost can't be budgeted; previously they fell out
    * of null-propagating comparisons, which was the same outcome but
    * invisible). Pre-fill with `na.fill` if nulls should participate. */
  def selectByTokenBudget(df: DataFrame, tokenCol: String, scoreCol: String,
      idCol: String, budget: Long, globalBuckets: Int = 32): DataFrame = {
    require(budget >= 0, s"budget $budget must be >= 0")
    val withNeg = df
      .filter(col(scoreCol).isNotNull && col(tokenCol).isNotNull)
      .withColumn("__negq", -col(scoreCol).cast("double"))
    val probes = (1 until globalBuckets).map(_.toDouble / globalBuckets).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else Option(withNeg.stat.approxQuantile("__negq", probes, 0.01)) // monotone-only bounds (r17): see rangeBucketExpr
        .getOrElse(Array.empty[Double]).filterNot(_.isNaN).distinct.sorted
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__negq") > lit(b), 1).otherwise(0)
    }
    val withB = withNeg.withColumn("__bkt", bucket)
    val wIn = Window.partitionBy(col("__bkt"))
      .orderBy(col("__negq"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withB.withColumn("__cum", sum(col(tokenCol)).over(wIn))
    val tot = withB.groupBy(col("__bkt")).agg(sum(col(tokenCol)).as("__tot"))
    val offsets = tot.as("a")
      .join(broadcast(tot.as("b")), col("b.__bkt") < col("a.__bkt"), "left")
      .groupBy(col("a.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
    cum.join(broadcast(offsets), Seq("__bkt"))
      .filter(col("__off") + col("__cum") - col(tokenCol) < budget)
      .drop("__negq", "__bkt", "__cum", "__off")
  }

  /** Sequence packing: assign documents to training bins of at most
    * `maxTokens` tokens (last doc of a bin may straddle the boundary —
    * the standard streaming-fill approximation; exact bin packing is
    * NP-hard and needless here). Deterministic: docs are filled in
    * `orderCol` order; bin_id = floor(exclusive-prefix-sum / maxTokens).
    * `orderCol` should be a total order (e.g. a unique id) — ties make
    * the fill order, and thus boundary bins, ambiguous in ANY engine.
    *
    * With `partitionCols`, each partition packs independently (the
    * per-source/per-day form). WITHOUT them, the global prefix sum is
    * computed as a distributed two-phase scan — NOT a single-partition
    * window: rows are range-bucketed by `orderCol` (any monotone
    * bucketing yields bit-identical bin_ids, so the quantile estimate
    * needs no determinism), each bucket prefix-sums in parallel, and a
    * tiny per-bucket offset aggregate (`globalBuckets` rows) is
    * broadcast back. Same exact semantics, no serialized sort.
    *
    * NOTE (global form only): the range-bucket boundaries come from
    * `df.stat.approxQuantile` — an EAGER Spark action that scans the
    * input at DataFrame-CONSTRUCTION time, and the input is scanned
    * again (twice: per-bucket sums + offsets) at execution. Callers
    * with an expensive upstream plan should `persist()` the input
    * before calling, or the upstream recomputes per scan; the
    * `partitionCols` form stays fully lazy. */
  def packSequences(df: DataFrame, tokenCol: String, orderCol: String,
      maxTokens: Long, partitionCols: Seq[String] = Nil,
      globalBuckets: Int = 32): DataFrame = {
    val binId = (cum: Column, tok: Column) =>
      floor((cum - tok).cast("double") / maxTokens).cast("long")
    if (partitionCols.nonEmpty) {
      val w = Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("__cum", sum(col(tokenCol)).over(w))
        .withColumn("bin_id", binId(col("__cum"), col(tokenCol)))
        .drop("__cum")
    } else {
      // Phase 0: monotone range-bucketing of orderCol. approxQuantile
      // (Greenwald-Khanna) is one narrow pass; bucket(x) is
      // order-preserving and puts tied values in the SAME bucket
      // (strict `>` against each boundary), so per-bucket prefix sums +
      // bucket offsets reproduce the global prefix sum exactly,
      // whatever boundaries the estimate picked.
      require(df.schema(orderCol).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"global packSequences range-buckets on '$orderCol', which must be " +
          "numeric; for a non-numeric order supply partitionCols (the " +
          "per-key form) or pre-map the order to a numeric rank")
      val probes = (1 until globalBuckets).map(_.toDouble / globalBuckets).toArray
      val bounds =
        if (probes.isEmpty) Array.empty[Double]
        else Option(df.stat.approxQuantile(orderCol, probes, 0.01)) // monotone-only bounds (r17): see rangeBucketExpr
          .getOrElse(Array.empty[Double]).filterNot(_.isNaN).distinct.sorted
      val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(orderCol).cast("double") > lit(b), 1).otherwise(0)
      }
      val withB = df.withColumn("__bkt", bucket)
      // Phase 1: per-bucket prefix sums — globalBuckets parallel sorts
      val wIn = Window.partitionBy(col("__bkt")).orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = withB.withColumn("__cum", sum(col(tokenCol)).over(wIn))
      // Phase 2: exclusive running offset per bucket. The frame is
      // `globalBuckets` rows, so the prefix sum is a broadcast
      // triangular self-join (Σ __tot over strictly-smaller buckets) —
      // O(B²) pairs over ~32 rows, zero windows: an unpartitioned
      // running-sum window here would be correct but would emit the
      // "WindowExec: No Partition Defined" warning on every run of a
      // provably-tiny stage, and a foldable partition key gets
      // optimized away (the warning came back).
      val tot = withB.groupBy(col("__bkt"))
        .agg(sum(col(tokenCol)).as("__tot"))
      val offsets = tot.as("a")
        .join(broadcast(tot.as("b")), col("b.__bkt") < col("a.__bkt"), "left")
        .groupBy(col("a.__bkt").as("__bkt"))
        .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
      cum.join(broadcast(offsets), Seq("__bkt"))
        .withColumn("bin_id",
          binId(col("__off") + col("__cum"), col(tokenCol)))
        .drop("__bkt", "__cum", "__off")
    }
  }

  /** Distributed per-key NTILE — CCNet's head/middle/tail perplexity
    * bucketing (Wenzek et al. 2020) without the trap a naive
    * `ntile(t) OVER (PARTITION BY key ORDER BY …)` hides: one window
    * partition per key means one TASK sorts an entire language's worth
    * of a 100 TB corpus. Here the per-key rank is computed the
    * [[packSequences]] way — a global approxQuantile range-bucketing
    * of the score (monotone, so per-(key, bucket) `row_number`s plus
    * per-key bucket-offset sums reproduce the exact per-key rank; the
    * offset table is keys × buckets rows, broadcast) — then the rank
    * is folded through NTILE's exact fill rule (first `n mod t` tiles
    * get the extra row). Rows rank by (`scoreCol` DESC, `idCol` ASC):
    * ties are totally ordered, so tile assignment is engine-exact and
    * the DuckDB `ntile` replays it verbatim.
    *
    * Returns the input plus an integer `tile` ∈ [1, tiles]. Keys with
    * fewer than `tiles` rows behave like SQL NTILE (row r → tile r).
    * NULL scores are excluded (an unscored row has no rank); pre-fill
    * if they should participate. */
  /** EXACT per-key order statistic (the exact-median/p-quantile the
    * approximate sketches can't give when an audit demands the true
    * value): for each key, the value at ascending (score, id) rank
    * ⌈q‰·n / 1000⌉ (min 1) — the standard lower-order-statistic
    * definition, deterministic under ties. Distributed exactly like
    * [[ntileByKey]]: range-bucketed per-key ranks + broadcast bucket
    * offsets, so no key ever becomes one window partition. NULL scores
    * drop. Returns (keyCol, n, q_value double). */
  def exactQuantileByKey(df: DataFrame, keyCol: String, scoreCol: String,
      idCol: String, qPermille: Long, globalBuckets: Int = 32): DataFrame =
    // the exact special case of the multi-quantile pass — one shared
    // implementation, one set of rank semantics to maintain
    exactQuantilesByKey(df, keyCol, scoreCol, idCol, Seq(qPermille),
        globalBuckets)
      .select(col(keyCol), col("n"), col("q_value"))

  /** EXACT multi-quantile per key in ONE rank pass — the p50/p90/p99
    * latency-band readout: [[exactQuantileByKey]] recomputes the
    * distributed rank once per quantile, this shares it across all of
    * them (the rank is the expensive part; each extra quantile is one
    * more integer comparison). Same machinery — range-bucketed
    * per-key ranks + broadcast offsets, rank ⌈q‰·n/1000⌉ (min 1) under
    * ascending (score, id) — one output row per (key, quantile) even
    * when one row serves several quantiles. NULL scores drop.
    * Returns (keyCol, q_permille, n, q_value). */
  def exactQuantilesByKey(df: DataFrame, keyCol: String, scoreCol: String,
      idCol: String, qPermilles: Seq[Long],
      globalBuckets: Int = 32): DataFrame = {
    require(qPermilles.nonEmpty, "exactQuantilesByKey needs quantiles")
    qPermilles.foreach(q => require(q >= 1 && q <= 1000,
      s"qPermille must be in [1, 1000], got $q"))
    val clean = df.filter(col(scoreCol).isNotNull)
      .withColumn("__q", col(scoreCol).cast("double"))
    val withB = clean.withColumn("__bkt",
      rangeBucketExpr(clean, col("__q"), globalBuckets))
    val wIn = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col("__q"), col(idCol))
    val rn = withB.withColumn("__rn", row_number().over(wIn).cast("long"))
    val tot = withB.groupBy(col(keyCol), col("__bkt"))
      .agg(count(lit(1)).as("__tot"))
    val offsets = tot.as("a")
      .join(broadcast(tot.as("b")),
        col("a." + keyCol) === col("b." + keyCol) &&
          col("b.__bkt") < col("a.__bkt"), "left")
      .groupBy(col("a." + keyCol).as(keyCol), col("a.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
    // per-key n derives from the (key, bucket) cells — exact long sums
    // of the same counts (the cramersV margins-from-cells rule), one
    // fewer row-sized pass
    val nPerKey = tot.groupBy(col(keyCol))
      .agg(coalesce(sum(col("__tot")), lit(0L)).as("__n"))
    val qArr = array(qPermilles.distinct.sorted.map(lit(_)): _*)
    rn.join(broadcast(offsets), Seq(keyCol, "__bkt"))
      .join(broadcast(nPerKey), Seq(keyCol))
      .withColumn("__rank", col("__off") + col("__rn"))
      .withColumn("q_permille", explode(qArr))
      .filter(col("__rank") ===
        greatest(lit(1L), expr("(q_permille * __n + 999) div 1000")))
      .select(col(keyCol), col("q_permille"), col("__n").as("n"),
        col("__q").as("q_value"))
  }

  /** EXACT per-key WEIGHTED order statistic — the token-weighted twin
    * of [[exactQuantileByKey]]: a corpus median that weights each doc
    * by its token count answers "what quality does the median TOKEN
    * see?", which row-median misses when long docs skew low. For each
    * key, rows sort ascending (score, id) and the kept row is the
    * FIRST whose cumulative weight reaches ⌈q‰·W / 1000⌉ (W = the
    * key's total weight) — the standard weighted lower quantile, which
    * degenerates to [[exactQuantileByKey]] at weight ≡ 1. Weights are
    * caller-quantized POSITIVE integers (token counts, cents); rows
    * with NULL score or NULL/non-positive weight drop. Distributed the
    * same way: range-bucketed per-key cumulative weights + broadcast
    * bucket offsets — no key ever becomes one window partition.
    * Returns (keyCol, w_total, q_value). */
  def weightedQuantileByKey(df: DataFrame, keyCol: String, scoreCol: String,
      weightCol: String, idCol: String, qPermille: Long,
      globalBuckets: Int = 32): DataFrame = {
    require(qPermille >= 1 && qPermille <= 1000,
      s"qPermille must be in [1, 1000], got $qPermille")
    val clean = df
      .filter(col(scoreCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__q", col(scoreCol).cast("double"))
      .withColumn("__w", col(weightCol).cast("long"))
    val withB = clean.withColumn("__bkt",
      rangeBucketExpr(clean, col("__q"), globalBuckets))
    val wIn = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col("__q"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withB.withColumn("__cum", sum(col("__w")).over(wIn))
    val tot = withB.groupBy(col(keyCol), col("__bkt"))
      .agg(sum(col("__w")).as("__tot"))
    val offsets = tot.as("a")
      .join(broadcast(tot.as("b")),
        col("a." + keyCol) === col("b." + keyCol) &&
          col("b.__bkt") < col("a.__bkt"), "left")
      .groupBy(col("a." + keyCol).as(keyCol), col("a.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
    // per-key weight derives from the (key, bucket) cells — exact long
    // sums of the same weights, one fewer row-sized pass
    val wPerKey = tot.groupBy(col(keyCol))
      .agg(coalesce(sum(col("__tot")), lit(0L)).as("__wt"))
    cum.join(broadcast(offsets), Seq(keyCol, "__bkt"))
      .join(broadcast(wPerKey), Seq(keyCol))
      .withColumn("__cw", col("__off") + col("__cum"))
      .withColumn("__target",
        greatest(lit(1L), expr(s"($qPermille * __wt + 999) div 1000")))
      // first crossing: cumW reaches the target, previous cum did not
      .filter(col("__cw") >= col("__target") &&
        col("__cw") - col("__w") < col("__target"))
      .select(col(keyCol), col("__wt").as("w_total"), col("__q").as("q_value"))
  }

  /** Rank-to-uniform PERCENTILE normalization — the score-fusion
    * primitive: classifiers and perplexity filters emit incomparable
    * scales, but their PERCENTILES combine directly (rank averaging,
    * the q189 RRF cousin at row level). Every row gets its exact
    * global rank under ascending (score, id) — the [[packSequences]]
    * range-bucket machinery, per-bucket `row_number`s + broadcast
    * bucket offsets, never one global window — and
    * `pct_ppm` = ⌊10⁶·(rank−1)/(n−1)⌋ ∈ [0, 10⁶] (n = 1 → 0), an
    * integer both engines floor identically. NULL scores drop.
    * Returns (idCol, scoreCol, rank, pct_ppm). */
  def percentileNormalize(df: DataFrame, scoreCol: String, idCol: String,
      globalBuckets: Int = 32): DataFrame = {
    val clean = df.filter(col(scoreCol).isNotNull)
      .withColumn("__q", col(scoreCol).cast("double"))
    val withB = clean.withColumn("__bkt",
      rangeBucketExpr(clean, col("__q"), globalBuckets))
    val wIn = Window.partitionBy(col("__bkt"))
      .orderBy(col("__q"), col(idCol))
    val rn = withB.withColumn("__rn", row_number().over(wIn).cast("long"))
    val tot = withB.groupBy(col("__bkt")).agg(count(lit(1)).as("__tot"))
    val offsets = tot.as("a")
      .join(broadcast(tot.as("b")), col("b.__bkt") < col("a.__bkt"), "left")
      .groupBy(col("a.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
    // the grand total derives from the bucket cells — one fewer pass
    // (empty input: sum-over-empty reads NULL where count read 0, but
    // rn is empty then, so the crossJoined readout is empty either way)
    val n = tot.agg(coalesce(sum(col("__tot")), lit(0L)).as("__n"))
    rn.join(broadcast(offsets), Seq("__bkt"))
      .crossJoin(broadcast(n))
      .withColumn("rank", col("__off") + col("__rn"))
      .withColumn("pct_ppm",
        when(col("__n") <= 1L, 0L)
          .otherwise(expr("((rank - 1) * 1000000L) div (__n - 1)")))
      .select(col(idCol), col(scoreCol), col("rank"), col("pct_ppm"))
  }

  def ntileByKey(df: DataFrame, keyCol: String, scoreCol: String,
      idCol: String, tiles: Int, globalBuckets: Int = 32): DataFrame = {
    require(tiles > 0, s"tiles must be positive, got $tiles")
    val withNeg = df.filter(col(scoreCol).isNotNull)
      .withColumn("__negq", -col(scoreCol).cast("double"))
    val probes = (1 until globalBuckets).map(_.toDouble / globalBuckets).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else Option(withNeg.stat.approxQuantile("__negq", probes, 0.01)) // monotone-only bounds (r17): see rangeBucketExpr
        .getOrElse(Array.empty[Double]).filterNot(_.isNaN).distinct.sorted
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__negq") > lit(b), 1).otherwise(0)
    }
    val withB = withNeg.withColumn("__bkt", bucket)
    val wIn = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col("__negq"), col(idCol))
    val rn = withB.withColumn("__rn", row_number().over(wIn).cast("long"))
    val tot = withB.groupBy(col(keyCol), col("__bkt"))
      .agg(count(lit(1)).as("__tot"))
    val offsets = tot.as("a")
      .join(broadcast(tot.as("b")),
        col("a." + keyCol) === col("b." + keyCol) &&
          col("b.__bkt") < col("a.__bkt"), "left")
      .groupBy(col("a." + keyCol).as(keyCol), col("a.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
    // per-key n derives from the (key, bucket) cells — exact long sums
    // of the same counts, one fewer row-sized pass
    val nPerKey = tot.groupBy(col(keyCol))
      .agg(coalesce(sum(col("__tot")), lit(0L)).as("__n"))
    // NTILE fill rule: with n rows and t tiles, the first (n mod t)
    // tiles hold ceil(n/t) rows, the rest floor(n/t). All-INTEGER
    // arithmetic (`div`, never `/` — Spark's `/` is double division).
    rn.join(broadcast(offsets), Seq(keyCol, "__bkt"))
      .join(broadcast(nPerKey), Seq(keyCol))
      .withColumn("__rank", col("__off") + col("__rn"))
      .withColumn("__base", expr(s"__n div $tiles"))
      .withColumn("__rem", col("__n") % tiles)
      .withColumn("tile",
        when(col("__rank") <= (col("__base") + 1L) * col("__rem"),
            expr("(__rank + __base) div (__base + 1)")) // ceil(r/(b+1))
          .otherwise(col("__rem") + expr(
            // base = 0 only when n < tiles, where the first branch
            // always fires (thr = n); the greatest(1) guard just keeps
            // the dead branch from dividing by zero
            "(__rank - (__base + 1) * __rem + __base - 1) div greatest(__base, 1)"))
          .cast("int"))
      .drop("__negq", "__bkt", "__rn", "__off", "__n", "__rank", "__base", "__rem")
  }

  /** Temperature-based mixture allocation — the multilingual/domain
    * rebalancing rule (Conneau & Lample 2019; "alpha sampling"): a
    * key's share of the training budget is nᵏ^α / Σ nⱼ^α, flattening
    * the head and boosting the tail (α = 1 is proportional, α → 0
    * uniform). Returns per key: count, share, and an integer
    * `target_docs` allocation of `budget` by largest-remainder
    * apportionment, so Σ target_docs == min(budget-ish, exact) —
    * deterministic and engine-exact: nᵏ^α is quantized to round(1e6 ·
    * sqrt(n)) (α is fixed at ½, the common practice value, where pow
    * IS sqrt — correctly rounded in every IEEE engine, unlike pow);
    * from there everything is int64 arithmetic, ONE double division
    * for `share`. All aggregates are key-level (rows ≈ #keys); the
    * apportionment window sorts that tiny aggregate, not the corpus. */
  def temperatureMix(df: DataFrame, keyCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget $budget must be >= 0")
    // sqrt quantized to 1e3 (≈0.1% share precision at n=1, finer as n
    // grows) keeps budget·__s inside int64: __s ≤ 1e3·√n ≤ ~1e9 at a
    // trillion docs/key, so budgets up to ~1e9 multiply safely.
    // One keyed aggregate reduces the corpus to #keys rows; everything
    // after runs on a SINGLE packed array row with higher-order
    // functions — no self-joins (whose duplicated lineage Spark 4's
    // DeduplicateRelations turns into AMBIGUOUS_REFERENCE minefields),
    // no windows. The mixture table must fit one row: fine for its
    // domain (languages/sources/hosts — thousands, not billions).
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_docs"))
      .select(struct(
        col(keyCol).as("k"),
        col("n_docs").as("n"),
        round(lit(1e3) * sqrt(col("n_docs").cast("double"))).cast("long")
          .as("s")).as("kv"))
    val packed = counts.agg(collect_list(col("kv")).as("ks"))
      .select(col("ks"),
        aggregate(col("ks"), lit(0L), (acc, x) => acc + x.getField("s"))
          .as("tot"))
    // floor division in EXACT arithmetic: (p − p mod S) is divisible
    // by S, and decimal(38,0) division keeps the integer quotient
    // exact past 2^53 (Spark's long `/` is lossy double division, and
    // there is no integer-div Column op).
    val alloc = packed.select(col("tot"),
      transform(col("ks"), { x =>
        val prod = lit(budget) * x.getField("s")
        val rmd = pmod(prod, col("tot"))
        struct(x.getField("k").as("k"), x.getField("n").as("n"),
          x.getField("s").as("s"),
          ((prod - rmd).cast("decimal(38,0)") /
            col("tot").cast("decimal(38,0)")).cast("long").as("fl"),
          rmd.as("rmd"))
      }).as("ks"))
    // largest-remainder apportionment: sort by (remainder DESC, key),
    // the first `spare` entries get one extra seat — all-integer,
    // deterministic, engine-exact
    val ranked = alloc.select(col("tot"),
      (lit(budget) - aggregate(col("ks"), lit(0L),
        (acc, x) => acc + x.getField("fl"))).as("spare"),
      array_sort(col("ks"), { (l, r) =>
        when(l.getField("rmd") > r.getField("rmd"), -1)
          .when(l.getField("rmd") < r.getField("rmd"), 1)
          .when(l.getField("k") < r.getField("k"), -1)
          .when(l.getField("k") > r.getField("k"), 1)
          .otherwise(0)
      }).as("ks"))
    ranked.select(col("tot"), col("spare"),
        posexplode(col("ks")).as(Seq("pos", "kv")))
      .select(col("kv").getField("k").as(keyCol),
        col("kv").getField("n").as("n_docs"),
        (col("kv").getField("s").cast("double") / col("tot").cast("double"))
          .as("share"),
        (col("kv").getField("fl") +
          when(col("pos") < col("spare"), 1L).otherwise(0L))
          .as("target_docs"))
  }

  /** Poisson(1) CDF thresholds on the 2⁵⁶ hash scale —
    * floor(2⁵⁶·CDF(w)) for w = 0..7, precomputed to 60 decimal digits
    * so both engines compare against the SAME integers. A draw's
    * weight is the count of thresholds at or below its hash (inverse
    * CDF); truncation at 8 loses ~1e-5 of the tail mass, identically
    * on every engine. */
  val PoissonThresholds: Seq[Long] = Seq(
    26508507426831583L, 53017014853663166L, 66271268567078957L,
    70689353138217554L, 71793874281002204L, 72014778509559134L,
    72051595880985289L, 72056855505474739L)

  /** POISSON BOOTSTRAP confidence interval for a mean — the bootstrap
    * that works at 100 TB (Chamandy, Muralidharan, Najmi & Naidu 2012,
    * "Estimating Uncertainty for Massive Data Streams"): classical
    * resampling needs n draws from n rows per replicate (a per-
    * replicate shuffle of the corpus); the Poisson approximation gives
    * every row an INDEPENDENT Poisson(1) multiplicity per replicate,
    * so one streaming pass computes all B replicates with map-side
    * partial aggregation and a B-row shuffle.
    *
    * Deterministic and engine-replayable: ONE md5 per row
    * ([[PortableHash.pair56]] on `idCol`) seeds the 2-universal family
    * h_r = (a + r·b) mod 2⁵⁶ — B hashes from one digest, not B
    * digests — and each h_r inverts the Poisson(1) CDF through
    * [[PoissonThresholds]] (weight = #thresholds ≤ h_r, truncated at
    * 8). Replicate means are Σw·v / Σw with exact DECIMAL(38,0)
    * numerators; the CI bounds are ORDER STATISTICS of the replicate
    * means (ranks max(1,⌊B'·p/1000⌋) and B'+1−that over the B'
    * replicates with nonzero weight), not interpolated percentiles —
    * exact and replayable. Caller quantizes `valueCol` to integers.
    *
    * Returns ONE row: (n_rows, mean, b, ci_lo, ci_hi) — `b` the
    * effective replicate count, `mean` the plain Σv/n.
    *
    * Scale shape: scan ×B row amplification in the explode, but the
    * per-(replicate) hash aggregate combines map-side, so the shuffle
    * carries B rows per partition; the rank pass runs over ≤B rows.
    * B and the decimal pmod dominate cost — size B to the precision
    * the decision needs (B = 200 gives ~±7% CI-endpoint noise). */
  def poissonBootstrapMean(df: DataFrame, idCol: String, valueCol: String,
      b: Int = 200, tailPermille: Int = 25, seed: Long = 42L): DataFrame = {
    require(b >= 4, s"b must be >= 4, got $b")
    require(tailPermille >= 1 && tailPermille < 500,
      s"tailPermille must be in [1, 500), got $tailPermille")
    val Dec = "decimal(38,0)"
    val (ha, hb) = PortableHash.pair56(col(idCol), seed)
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("__v"),
        ha.as("__ha"), hb.as("__hb"))
    val M = lit(72057594037927936L) // 2^56
    // (a + r·b) mod 2^56 in pure LONG arithmetic — a decimal pmod here
    // cost 8× wall-clock at sf0.1. Split b at bit 38 (b = hi·2^38+lo):
    //   r·b ≡ ((r·hi mod 2^18)·2^38 + r·lo)  (mod 2^56)
    // every intermediate stays under 2^58 for B ≤ 2^17, and the value
    // is IDENTICAL to the wide product, so the oracle replays the
    // plain (a + r·b) % 2^56 in its 128-bit integers.
    require(b <= (1 << 17), s"b must be <= ${1 << 17}, got $b")
    val rep = base
      .select(col("__v"), col("__ha"),
        shiftright(col("__hb"), 38).as("__bhi"),
        col("__hb").bitwiseAND(lit(274877906943L)).as("__blo"), // 2^38-1
        explode(sequence(lit(0), lit(b - 1))).as("__r"))
      .withColumn("__h", pmod(
        col("__ha") +
          pmod(col("__r").cast("long") * col("__bhi"), lit(262144L)) * // 2^18
            lit(274877906944L) +
          col("__r").cast("long") * col("__blo"), M))
    val w = PoissonThresholds
      .map(t => when(col("__h") >= lit(t), 1).otherwise(0))
      .reduce(_ + _)
    val perRep = rep.withColumn("__w", w)
      .groupBy(col("__r"))
      .agg(sum(col("__w").cast("long")).as("__sw"),
        // w·v multiplies in LONG (w ≤ 8, exact for |v| < 2^59) with ONE
        // decimal cast per row — a decimal multiply here doubles the
        // per-row decimal work in the hot aggregate
        sum((col("__w") * col("__v")).cast(Dec)).cast(Dec).as("__swv"))
      .filter(col("__sw") > 0L)
      .select(col("__r"),
        (col("__swv").cast("double") / col("__sw").cast("double")).as("__m"))
    // ≤ B rows from here: the single-partition window is bounded
    val ranked = perRep
      .withColumn("__rk", row_number().over(Window.orderBy(col("__m"), col("__r"))))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy()))
    val lo = greatest(lit(1L),
      floor(col("__bn") * lit(tailPermille) / lit(1000.0)).cast("long"))
    val hi = col("__bn") + lit(1L) - lo
    val ci = ranked.filter(col("__rk") === lo || col("__rk") === hi)
      .agg(min(when(col("__rk") === lo, col("__m"))).as("ci_lo"),
        min(when(col("__rk") === hi, col("__m"))).as("ci_hi"),
        min(col("__bn")).as("__be"))
    base.agg(count(lit(1)).as("n_rows"),
        (sum(col("__v").cast(Dec)).cast("double") /
          count(lit(1)).cast("double")).as("mean"))
      .crossJoin(broadcast(ci))
      .select(col("n_rows"), col("mean"), col("__be").as("b"),
        col("ci_lo"), col("ci_hi"))
  }

  /** CUMULATIVE SHARE by descending value — the Pareto/ABC readout
    * ("which keys carry 80 % of the revenue?"): per key, its exact
    * long value, the running total in (value DESC, key ASC) order,
    * and the cumulative share as exact floor ppm. Distributed like
    * [[ntileByKey]]: range-bucketed per-bucket prefix sums (bucketed
    * on the NEGATED value so ascending buckets read descending
    * values) + broadcast bucket offsets and the broadcast grand
    * total — no global window even at millions of keys. The caller
    * supplies a NONNEGATIVE measure (the concentration rule — shares
    * of a signed measure are meaningless). The
    * rangeBucketExpr note applies: bucket bounds come from an EAGER
    * approxQuantile, so the input aggregate persists here for the
    * duration of the call (domain-sized — one row per key). NULL
    * values drop. Returns (keyCol, valueCol, cum_value,
    * cum_share_ppm).
    *
    * Scale shape: one key-domain frame in, two bounded exchanges
    * (per-bucket window + offsets), map-side partials on the total. */
  def cumulativeShare(df: DataFrame, keyCol: String, valueCol: String,
      globalBuckets: Int = 32): DataFrame = {
    val Dec = "decimal(38,0)"
    val clean = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(valueCol).cast("long").as("__v"))
      .withColumn("__nv", (-col("__v")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withB = clean.withColumn("__bkt",
      rangeBucketExpr(clean, col("__nv"), globalBuckets))
    val wIn = Window.partitionBy(col("__bkt"))
      .orderBy(col("__nv"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withB.withColumn("__cum",
      sum(col("__v").cast(Dec)).over(wIn).cast(Dec))
    val tot = withB.groupBy(col("__bkt"))
      .agg(sum(col("__v").cast(Dec)).cast(Dec).as("__t"))
    val offsets = tot.as("a")
      .join(broadcast(tot.as("b")), col("b.__bkt") < col("a.__bkt"), "left")
      .groupBy(col("a.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("b.__t")), lit(0L).cast(Dec)).cast(Dec).as("__off"))
    val grand = withB.agg(sum(col("__v").cast(Dec)).cast(Dec).as("__total"))
    cum.join(broadcast(offsets), Seq("__bkt"))
      .crossJoin(broadcast(grand))
      .select(col(keyCol), col("__v").as(valueCol),
        (col("__off") + col("__cum")).cast(Dec).cast("long").as("cum_value"),
        // an all-zero measure has no shares — NULL, not a div-by-zero
        when(col("__total") > 0L,
          PortableDiv.nonNeg((col("__off") + col("__cum")).cast(Dec) * lit(1000000L),
            col("__total")))
          .otherwise(lit(null).cast("long")).as("cum_share_ppm"))
  }

}
