package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, ENGINE-PORTABLE approximate aggregates — the
  * replayable complement to Spark's native sketches (HyperLogLog++
  * `approx_count_distinct`, GK `percentile_approx`), whose internal
  * state is implementation-defined and therefore un-oracle-able.
  *
  * Both estimators here are pure functions of (seed, data), built on
  * the md5-derived portable hash, so an external engine (DuckDB,
  * Postgres) reproduces them bit for bit — the property an auditable
  * 100 TB pipeline wants from its approximations: re-running the
  * estimate anywhere gives the same number, and the estimate itself is
  * testable against an oracle, not just against an error bound.
  */
object Sketches {

  /** KMV (k-minimum-values) distinct-count estimate per group
    * (Bar-Yossef et al. 2002): hash each distinct value to a uniform
    * fraction in [0,1); if the k-th smallest hash is f, the estimate is
    * (k−1)/f. Groups with < k distinct values return their EXACT count
    * (the min-k set is the whole set).
    *
    * Runs as a BOUNDED-BUFFER sketch ([[graft.functions.KmvSketch]], a
    * `TypedImperativeAggregate` with O(k) state): one pass, map-side
    * partial aggregation, no distinct pre-pass and no per-group sort —
    * duplicates and non-minimal hashes drop at the mapper. The
    * estimator is a pure function of (seed, data) via the md5-derived
    * 56-bit hash, so an external engine replays it exactly.
    *
    * Returns (groupCols*, est_distinct double). */
  // 56-bit hash → uniform fraction in [0,1)
  private def kmvFrac(valueCol: String, seed: Long): org.apache.spark.sql.Column =
    // first56 casts the digit string through LONG; long→double and
    // string→double both round the same exact integer to the nearest
    // double, so the fraction is bit-identical to the old direct parse
    PortableHash.first56(col(valueCol), seed).cast("double") /
      lit(72057594037927936.0) // 2^56

  def kmvDistinctCount(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256, seed: Long = 42L): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(col(groupCol))
      .agg(graft.functions.KmvSketch.estimate(
        kmvFrac(valueCol, seed), col(valueCol).cast("string"), k)
        .as("est_distinct"))
  }

  /** The KMV sketch STATE per group: the k-minimum (frac, value) set
    * as `kmv_set array<struct<frac,value>>` — the third mergeable-
    * summary class after HLL (max-merge, q152) and count-min
    * (sum-merge, q155): BOUNDED-SET merge. The global k-min distinct
    * set is contained in the union of per-shard k-min sets, so
    * [[kmvMergeSets]] + [[kmvEstimateFromSets]] reproduce the direct
    * estimate exactly (q157). */
  def kmvMinSets(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256, seed: Long = 42L): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(col(groupCol))
      .agg(graft.functions.KmvSketch.minSet(
        kmvFrac(valueCol, seed), col(valueCol).cast("string"), k)
        .as("kmv_set"))
  }

  /** Merge per-shard min-set frames: concatenate, dedup by (frac,
    * value), keep the k smallest — plain array functions over frames
    * whose rows are already ≤ k entries each. */
  def kmvMergeSets(groupCol: String, k: Int,
      frames: DataFrame*): DataFrame = {
    require(frames.nonEmpty, "kmvMergeSets needs at least one frame")
    frames.reduce(_ unionByName _)
      .groupBy(col(groupCol))
      .agg(slice(array_sort(array_distinct(flatten(
        collect_list(col("kmv_set"))))), 1, k).as("kmv_set"))
  }

  /** Estimate from a min-set column — the [[kmvDistinctCount]]
    * estimator over exposed state: exact count below k, else
    * (k−1)/f(k-th). */
  def kmvEstimateFromSets(sets: DataFrame, groupCol: String,
      k: Int): DataFrame =
    sets.select(col(groupCol),
      when(size(col("kmv_set")) < k, size(col("kmv_set")).cast("double"))
        .otherwise(lit((k - 1).toDouble) /
          element_at(col("kmv_set"), k).getField("frac"))
        .as("est_distinct"))

  /** KMV SET-OPERATION estimates — the capability union-only merge
    * ([[kmvMergeSets]], q157) stops short of: |A∩B| and Jaccard from
    * two k-min sketches, WITHOUT touching the raw sets again (Beyer
    * et al., SIGMOD 2007 §5; the min-wise coincidence argument is
    * Broder 1997). The k smallest hashes of A∪B are a uniform sample
    * of the union, so the fraction of them present in BOTH sketches
    * estimates Jaccard, and intersection = Jaccard · |A∪B|-estimate.
    * Everything derives from the portable 56-bit md5 fraction, so an
    * external engine replays every output bit.
    *
    * Returns ONE row:
    *   - `n_a_set`, `n_b_set` — sketch sizes (= min(k, distinct));
    *   - `n_union_set` — |k-min of A∪B| (= min(k, |A∪B|));
    *   - `n_both` — union-sample members present in both sketches;
    *   - `jaccard_ppm` — floor(10⁶·n_both/n_union_set); EXACT Jaccard
    *     when both sets fit under k (the sketches are then the sets);
    *   - `est_union` — the [[kmvEstimateFromSets]] estimator on the
    *     merged sketch;
    *   - `est_intersection` — (n_both/n_union_set)·est_union, one
    *     IEEE double product.
    * Relative error ~1/√k on each factor; raise k off-contract for
    * tighter bounds. Scale shape: two bounded-set aggregates (the
    * kmv map-side-combine shape), then a 1×1 broadcast join — the
    * arrays never exceed k entries. */
  def kmvIntersectEstimate(df: DataFrame, groupCol: String, groupA: String,
      groupB: String, valueCol: String, k: Int = 256,
      seed: Long = 42L): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val sets = kmvMinSets(
      df.filter(col(groupCol).isin(groupA, groupB)), groupCol, valueCol, k, seed)
    // collapse to ONE row in the same pass: a groupA/groupB filter
    // split would execute the scan+sketch aggregate subtree twice (the
    // spearman persist rule, solved here without a cache), and an
    // absent group would crossJoin to ZERO rows instead of the
    // documented one (its sketch reads as the empty set)
    val emptySet = array().cast("array<struct<frac:double,value:string>>")
    val one = sets.agg(
        min(when(col(groupCol) === groupA, col("kmv_set"))).as("__sa0"),
        min(when(col(groupCol) === groupB, col("kmv_set"))).as("__sb0"))
      .select(coalesce(col("__sa0"), emptySet).as("__sa"),
        coalesce(col("__sb0"), emptySet).as("__sb"))
    intersectEstimates(one, k, keep = Seq.empty)
  }

  /** The shared min-set intersection arithmetic: given a frame with
    * `__sa`/`__sb` sketch columns, compute the k-min-of-union
    * coincidence estimates. `keep` columns pass through (pair keys). */
  private def intersectEstimates(df: DataFrame, k: Int,
      keep: Seq[String]): DataFrame = {
    val estU = when(col("__nu") < k, col("__nu").cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        element_at(col("__u"), k).getField("frac"))
    df
      .withColumn("__u",
        slice(array_sort(array_distinct(concat(col("__sa"), col("__sb")))), 1, k))
      .withColumn("__nu", size(col("__u")).cast("long"))
      .withColumn("__both", size(filter(col("__u"),
        x => array_contains(col("__sa"), x) && array_contains(col("__sb"), x)))
        .cast("long"))
      .select(keep.map(col) ++ Seq(
        size(col("__sa")).cast("long").as("n_a_set"),
        size(col("__sb")).cast("long").as("n_b_set"),
        col("__nu").as("n_union_set"),
        col("__both").as("n_both"),
        when(col("__nu") === 0L, lit(null).cast("long"))
          .otherwise(PortableDiv.nonNeg(col("__both") * lit(1000000L),
            col("__nu"))).as("jaccard_ppm"),
        estU.as("est_union"),
        when(col("__nu") === 0L, lit(null).cast("double"))
          .otherwise((col("__both").cast("double") / col("__nu").cast("double"))
            * estU).as("est_intersection")): _*)
  }

  /** PAIRWISE intersection estimates over EVERY group pair — the
    * sketch RETENTION MATRIX: per-day user sketches once, then all
    * day×day overlap/Jaccard estimates from ≤k-entry array arithmetic
    * alone (the production shape for "how many of day-a's users were
    * back on day b" across a whole month at 100 TB: the corpus is
    * touched once, the |groups|² work never sees a raw row — compare
    * the exact q168 retention, which joins the event log against
    * itself). Same estimator as [[kmvIntersectEstimate]] per pair.
    * Returns (groupCol_a, groupCol_b, n_a_set, n_b_set, n_union_set,
    * n_both, jaccard_ppm, est_union, est_intersection) for every
    * group_a < group_b.
    *
    * Scale shape: one O(k)-state sketch aggregate over the data, then
    * a groups² broadcast-nested-loop pair join over the SETS frame
    * (|groups| rows — bounded by contract: days, cohorts, sources). */
  def kmvPairwiseIntersect(df: DataFrame, groupCol: String,
      valueCol: String, k: Int = 256, seed: Long = 42L): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val sets = kmvMinSets(df, groupCol, valueCol, k, seed)
    val pairs = sets.as("a")
      .join(sets.as("b"), col(s"a.$groupCol") < col(s"b.$groupCol"))
      .select(col(s"a.$groupCol").as(s"${groupCol}_a"),
        col(s"b.$groupCol").as(s"${groupCol}_b"),
        col("a.kmv_set").as("__sa"), col("b.kmv_set").as("__sb"))
    intersectEstimates(pairs, k,
      keep = Seq(s"${groupCol}_a", s"${groupCol}_b"))
  }

  /** Engine-PORTABLE HyperLogLog distinct-count estimate per group —
    * the replayable answer to `approx_count_distinct`'s opaque HLL++
    * state (Flajolet et al. 2007, plain HLL). Everything is integer
    * arithmetic over the md5-derived hash, so an external engine
    * reproduces the estimate BIT FOR BIT:
    *
    *  - 56-bit hash; bucket = low 6 bits (m = 64 registers), ρ =
    *    leading-zero rank of the remaining 50 bits, clamped at 30
    *    (exact for register ranks below 2^30 — far past any per-
    *    register load this sketch should see).
    *  - registers: `max(ρ)` per (group, bucket) — a hash aggregate
    *    with map-side partials; absent buckets are rank-0 registers,
    *    accounted arithmetically (no 64-way grid join).
    *  - harmonic sum scaled by 2^30 so every 2^-ρ term is an exact
    *    integer; raw estimate = α₆₄·m²/S as one integer division
    *    (α₆₄ = 709/1000, the standard constant).
    *  - small-range correction (raw ≤ 2.5m, empty registers exist):
    *    linear counting m·ln(m/zeros) via a 64-entry precomputed
    *    integer table — identical constants on both engines, so even
    *    the corrected branch hash-matches.
    *
    * Shape: two hash aggregates, no window, no sort, no distinct
    * pre-pass (max() absorbs duplicates at the mapper) — the sketch
    * shape that scales to 100 TB and merges across partitions for
    * free. Standard error ≈ 1.04/√64 ≈ 13 %; the VALUE is exact
    * reproducibility, not tightness (raise m off-contract if needed).
    *
    * Returns (groupCol, est_distinct long). */
  def hllDistinctCount(df: DataFrame, groupCol: String, valueCol: String,
      seed: Long = 42L): DataFrame =
    hllFromRegisters(hllRegisters(df, groupCol, valueCol, seed), groupCol)

  /** The HLL register frame itself: (groupCol, __b bucket, __r rank) —
    * the sketch STATE, exposed so shards can sketch independently and
    * [[hllMergeRegisters]] combine them (mergeable summaries are THE
    * distributed-aggregation primitive: per-partition/per-day/per-shard
    * sketches union into the global estimate with no re-scan). */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
      seed: Long = 42L): DataFrame = {
    val h = PortableHash.first56(col(valueCol), seed)
    val bucket = h.bitwiseAND(lit(63L))
    val rem = shiftright(h, 6) // 50-bit remainder
    // ρ = (# leading zeros of rem in 50 bits) + 1 = 51 - bitlength;
    // bin() drops leading zeros in both engines, so bitlength =
    // length(bin(rem)); rem = 0 clamps like everything ≥ 30
    val rho = when(rem === 0, lit(HllClamp))
      .otherwise(least(lit(HllClamp), lit(51) - length(bin(rem))))
    df.groupBy(col(groupCol), bucket.as("__b"))
      .agg(max(rho).as("__r"))
  }

  /** ROLLING distinct counts from merged per-period sketches — the
    * production use of the HLL merge law: sketch each calendar period
    * ONCE, then every length-`window` trailing window's estimate comes
    * from merging ≤ `window` register frames (the rolling-WAU/MAU
    * query, with no re-scan of any day's data and no
    * `approx_count_distinct` over exploded window membership).
    *
    * `periodCol` must be a DATE column; windows are
    * [target − window + 1, target] over the DISTINCT periods present.
    * The register frame is |periods|·64 rows whatever the corpus size
    * — the range join runs over sketches, never data. Returns
    * (periodCol, est_distinct long). */
  def hllRollingDistinct(df: DataFrame, periodCol: String, valueCol: String,
      window: Int, seed: Long = 42L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val regs = hllRegisters(df, periodCol, valueCol, seed)
    val targets = regs.select(col(periodCol).as("__target")).distinct()
    val merged = regs.join(broadcast(targets),
        datediff(col("__target"), col(periodCol)).between(0, window - 1))
      .groupBy(col("__target"), col("__b")).agg(max(col("__r")).as("__r"))
      .withColumnRenamed("__target", periodCol)
    hllFromRegisters(merged, periodCol)
  }

  /** Merge register frames: per (group, bucket) the max rank — the HLL
    * merge law. Lossless: merge(sketch(A), sketch(B)) is EXACTLY
    * sketch(A ∪ B) register for register (max is associative,
    * commutative, idempotent), which the q152 contract pins
    * end-to-end against a direct sketch of the union. */
  def hllMergeRegisters(groupCol: String, frames: DataFrame*): DataFrame = {
    require(frames.nonEmpty, "hllMergeRegisters needs at least one frame")
    frames.reduce(_ unionByName _)
      .groupBy(col(groupCol), col("__b")).agg(max(col("__r")).as("__r"))
  }

  /** Estimate from a register frame (the finisher of
    * [[hllDistinctCount]], split out so merged registers estimate the
    * same way). Integer arithmetic end to end — see the recipe above. */
  def hllFromRegisters(regs: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr => e}
    val sums = regs.groupBy(col(groupCol)).agg(
      sum(e(s"shiftright(${1L << HllClamp}, __r)")).as("__s"),
      count(lit(1)).as("__present"))
    val zeros = lit(64L) - col("__present")
    val ssc = col("__s") + zeros * lit(1L << HllClamp) // rank-0 registers
    val raw = e(s"${709L * 4096L * (1L << HllClamp)} div (1000 * __ssc)")
    val lcTable = array(HllLinearCounting.map(lit): _*)
    sums.withColumn("__ssc", ssc)
      .withColumn("__raw", raw)
      .withColumn("est_distinct",
        when(col("__raw") <= 160 && zeros > 0, // 2.5·m small-range gate
          element_at(lcTable, zeros.cast("int")).cast("long"))
          .otherwise(col("__raw")))
      .select(col(groupCol), col("est_distinct"))
  }

  /** ρ clamp: register ranks saturate at 30 (keeps 2^(clamp-ρ) exact
    * in a long and is unreachable below ~2^30 distinct per register). */
  val HllClamp = 30

  /** round(64·ln(64/z)) for z = 1..64 — the linear-counting estimates
    * for every possible empty-register count, precomputed so the
    * correction branch is integer-exact on every engine. */
  val HllLinearCounting: Seq[Long] = Seq(
    266L, 222L, 196L, 177L, 163L, 151L, 142L, 133L, 126L, 119L, 113L,
    107L, 102L, 97L, 93L, 89L, 85L, 81L, 78L, 74L, 71L, 68L, 65L, 63L,
    60L, 58L, 55L, 53L, 51L, 48L, 46L, 44L, 42L, 40L, 39L, 37L, 35L,
    33L, 32L, 30L, 28L, 27L, 25L, 24L, 23L, 21L, 20L, 18L, 17L, 16L,
    15L, 13L, 12L, 11L, 10L, 9L, 7L, 6L, 5L, 4L, 3L, 2L, 1L, 0L)

  /** DISCRETE quantile over a deterministic hash-sample: sample rows
    * with the portable md5 bucket, sort the sample per group, and pick
    * the element at rank ⌈q·n⌉ (no interpolation arithmetic — an
    * actual data value, so the result is bit-identical in any engine).
    * The approximation lives entirely in WHICH rows are sampled (a
    * pure function of seed + key); error shrinks as 1/√(fraction·N). */
  def sampledQuantile(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: String, q: Double, fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile $q outside [0,1]")
    val s = Sampling.deterministicSample(df, keyCol, fraction, seed, portable = true)
    val byGroup = Window.partitionBy(col(groupCol))
    s.select(col(groupCol), col(valueCol),
        row_number().over(byGroup.orderBy(col(valueCol))).as("__rk"),
        count(lit(1)).over(byGroup).as("__n"))
      .filter(col("__rk") ===
        greatest(lit(1L), ceil(lit(q) * col("__n")).cast("long")))
      .select(col(groupCol), col(valueCol).as("q_est"))
  }

  /** Count-min sketch frequency estimation (Cormode & Muthukrishnan
    * 2005): `depth` hash rows × `width` counters; a value's estimate is
    * the MINIMUM of its `depth` counters, which can only OVERestimate
    * (by ≤ e·N/width with probability ≥ 1 − e^−depth). The heavy-hitter
    * primitive: rank values by estimate, and the true heavy hitters
    * cannot be ranked out by collisions (their counters only grow).
    *
    * Portable like the other sketches here: the `depth` bucket indices
    * are 2-universal h_i = (a + i·b) mod width over the two 56-bit
    * halves of one md5 per value, so an external engine rebuilds the
    * identical counter matrix and estimates.
    *
    * Shape at scale: ONE pass over the data exploded ×depth into a
    * hash aggregate of at most depth·width rows (map-side partials
    * absorb the explosion — the counter matrix, not the data, crosses
    * the wire), then a BROADCAST join of that tiny matrix back to the
    * distinct values. No sort, no window, no driver-side loop.
    *
    * Returns (valueCol, est_count long). */
  def countMinFrequency(df: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 256, seed: Long = 42L): DataFrame =
    cmEstimate(df, cmCounters(df, valueCol, depth, width, seed),
      valueCol, depth, width, seed)

  private def cmGuards(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 8, s"depth $depth outside [1, 8]")
    require(width >= 2, s"width $width must be >= 2")
    // the counter matrix is broadcast back to the values — keep it
    // inside a broadcast budget (4M counters ≈ 64 MB of rows) instead
    // of letting a huge width OOM the driver with no diagnostic
    require(depth.toLong * width <= (1L << 22),
      s"depth×width = ${depth.toLong * width} exceeds 2^22 counters — " +
        "narrow the sketch (its point is sublinear size)")
  }

  // one md5 per row; h_i derived arithmetically (a, b < 2^56 and
  // i ≤ 7, so a + i·b < 2^59 — no overflow)
  private def cmBuckets(valueCol: String, depth: Int, width: Int,
      seed: Long): org.apache.spark.sql.Column = {
    val (a, b) = PortableHash.pair56(col(valueCol), seed)
    array((0 until depth).map(i =>
      pmod(a + lit(i.toLong) * b, lit(width.toLong))): _*)
  }

  /** The count-min counter matrix itself: (__row, __bucket, __cnt) —
    * the sketch STATE, exposed so shards/days/partitions sketch
    * independently and [[cmMergeCounters]] roll them up (counter
    * matrices merge by ELEMENTWISE SUM — the additive twin of the HLL
    * max-merge; both laws make sketches the distributed-aggregation
    * primitive). At most depth×width rows whatever the input. */
  def cmCounters(df: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 256, seed: Long = 42L): DataFrame = {
    cmGuards(depth, width)
    df.select(posexplode(cmBuckets(valueCol, depth, width, seed))
        .as(Seq("__row", "__bucket")))
      .groupBy(col("__row"), col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Merge counter matrices: per (row, bucket) the SUM — count-min's
    * merge law (counts are additive over disjoint streams; q155 pins
    * merged-shard estimates == direct whole-stream estimates). */
  def cmMergeCounters(frames: DataFrame*): DataFrame = {
    require(frames.nonEmpty, "cmMergeCounters needs at least one frame")
    frames.reduce(_ unionByName _)
      .groupBy(col("__row"), col("__bucket"))
      .agg(sum(col("__cnt")).as("__cnt"))
  }

  /** Estimate per distinct value of `df` from a counter frame (the
    * probe half of [[countMinFrequency]], split out so merged
    * counters estimate the same way): min over the depth rows. */
  def cmEstimate(df: DataFrame, counters: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 256, seed: Long = 42L): DataFrame = {
    cmGuards(depth, width)
    // LEFT join + coalesce-0: a probed value never inserted hashes to
    // buckets ABSENT from the counter frame — an inner join would
    // silently drop it (or overestimate from the buckets that happen
    // to collide), where the sketch's true answer is min(..., 0) = 0.
    // For inserted values every bucket exists, so this is exactly the
    // old result (the bloomContains rule at the membership probe).
    df.select(col(valueCol)).distinct()
      .select(col(valueCol),
        posexplode(cmBuckets(valueCol, depth, width, seed))
          .as(Seq("__row", "__bucket")))
      .join(broadcast(counters), Seq("__row", "__bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("__cnt"), lit(0L))).as("est_count"))
  }

  /** JOIN-SIZE estimation from count-min sketches (Cormode &
    * Muthukrishnan 2005 §4.2): |A ⋈ B| on an equi-key equals the
    * inner product of the two frequency vectors, which the sketches
    * bound from above by min over rows of Σ_b cA[r,b]·cB[r,b]. The
    * pre-flight that prices a join from two counter matrices (≤
    * depth×width rows EACH, mergeable, buildable per-shard) without
    * ever co-scanning the inputs — at 100 TB the sides may not even
    * be co-located. Can only OVERestimate (collisions add). Returns
    * one row: (est_join_rows long). */
  def cmJoinSizeEstimate(a: DataFrame, aCol: String, b: DataFrame,
      bCol: String, depth: Int = 4, width: Int = 256,
      seed: Long = 42L): DataFrame = {
    // hash-spread each side before sketching: the md5-per-row bucket
    // derivation is the dominant cost and a single-split input would
    // run it in one task (the SCALE.md local-fixture rule)
    val ca = cmCounters(a.select(col(aCol).cast("string").as("__v"))
      .repartition(col("__v")), "__v", depth, width, seed)
    val cb = cmCounters(b.select(col(bCol).cast("string").as("__v"))
      .repartition(col("__v")), "__v", depth, width, seed)
      .withColumnRenamed("__cnt", "__cntB")
    // per-row inner products: buckets present on only one side add 0
    // to the SUM, so the inner join is right for the Σ — but a depth
    // row with ZERO bucket overlap vanishes from it entirely, and its
    // inner product (0, the best possible bound) must still win the
    // min. Re-seat the row sums on the full 0..depth-1 spine with
    // coalesce-0 so disjoint (or empty) sides estimate 0, not NULL.
    val rowSpine = a.sparkSession.range(depth)
      .select(col("id").cast("int").as("__row"))
    val ip = ca.join(cb, Seq("__row", "__bucket"))
      .groupBy(col("__row"))
      .agg(sum(col("__cnt") * col("__cntB")).as("__ip"))
    rowSpine.join(broadcast(ip), Seq("__row"), "left")
      .agg(min(coalesce(col("__ip"), lit(0L))).as("est_join_rows"))
  }

  // ------------------------------------------------------------ bloom

  private def bloomGuards(mBits: Int, k: Int): Unit = {
    require(k >= 1 && k <= 8, s"k $k outside [1, 8]")
    require(mBits >= 8, s"mBits $mBits must be >= 8")
    // the set-bit frame is broadcast back to the probes — same budget
    // rationale as the count-min counter matrix
    require(mBits <= (1 << 22),
      s"mBits = $mBits exceeds 2^22 — widen k or shard the filter")
  }

  // k bit positions per value: h_i = (a + i·b) mod m over the two
  // 56-bit md5 halves — the count-min bucket family at a different m
  private def bloomBits(valueCol: String, mBits: Int, k: Int,
      seed: Long): org.apache.spark.sql.Column = {
    val (a, b) = PortableHash.pair56(col(valueCol), seed)
    array((0 until k).map(i =>
      pmod(a + lit(i.toLong) * b, lit(mBits.toLong))): _*)
  }

  /** Portable BLOOM filter as its set-bit frame: (__pos) — one row per
    * SET bit, at most mBits rows whatever the input (Bloom 1970). The
    * FOURTH mergeable-summary class after HLL (max-merge, q152),
    * count-min (sum-merge, q155), and KMV (bounded-set merge, q157):
    * bloom filters merge by bitwise OR, which over the set-bit frame
    * is plain SET UNION ([[bloomMerge]]) — merge(bloom(A), bloom(B))
    * is EXACTLY bloom(A ∪ B) bit for bit, so per-shard membership
    * filters roll up losslessly (q158 pins merged == direct).
    *
    * Membership ([[bloomContains]]) has NO false negatives (every
    * inserted value probes true) and a bounded false-positive rate
    * (≈ fill^k); like the other sketches here it is a pure function of
    * (seed, data) via the md5-derived hash, so an external engine
    * rebuilds the identical bit set and the identical probe answers —
    * false positives included. */
  def bloomPositions(df: DataFrame, valueCol: String,
      mBits: Int = 1024, k: Int = 4, seed: Long = 42L): DataFrame = {
    bloomGuards(mBits, k)
    df.select(explode(bloomBits(valueCol, mBits, k, seed)).as("__pos"))
      .distinct()
  }

  /** Merge set-bit frames: set union — bloom's bitwise-OR merge law
    * over the sparse representation. */
  def bloomMerge(frames: DataFrame*): DataFrame = {
    require(frames.nonEmpty, "bloomMerge needs at least one frame")
    frames.reduce(_ unionByName _).distinct()
  }

  // ------------------------------------------------------- histogram

  private def histGuards(lo: Double, hi: Double, bins: Int): Unit = {
    require(hi > lo, s"hi $hi must exceed lo $lo")
    require(bins >= 2 && bins <= (1 << 20),
      s"bins $bins outside [2, 2^20] — the state must stay tiny")
  }

  /** Equi-width HISTOGRAM state per group: (groupCol, __bin, __cnt) —
    * the FIFTH mergeable-summary class: histograms over a shared bin
    * grid merge by per-bin ADDITION ([[histMerge]]), so per-shard
    * histograms roll up losslessly and quantiles come from the merged
    * state with no sort of the data (q162 pins merged == direct).
    *
    * bin = clamp(⌊(v − lo)/(hi − lo)·bins⌋, 0, bins−1): IEEE double
    * arithmetic composed identically in any engine, so the state is
    * bit-reproducible. Out-of-range values clamp into the edge bins
    * (the estimate degrades, the contract does not). At most `bins`
    * rows per group whatever the input; null values are ignored. */
  def histState(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    histGuards(lo, hi, bins)
    val v = col(valueCol).cast("double")
    val raw = floor((v - lit(lo)) / lit(hi - lo) * lit(bins)).cast("long")
    val bin = least(lit(bins - 1L), greatest(lit(0L), raw))
    df.filter(v.isNotNull)
      .groupBy(col(groupCol), bin.as("__bin"))
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Merge histogram states: per (group, bin) the SUM — counts are
    * additive over disjoint shards, exactly like count-min rows. */
  def histMerge(groupCol: String, frames: DataFrame*): DataFrame = {
    require(frames.nonEmpty, "histMerge needs at least one frame")
    frames.reduce(_ unionByName _)
      .groupBy(col(groupCol), col("__bin"))
      .agg(sum(col("__cnt")).as("__cnt"))
  }

  /** Quantile from a histogram state: the UPPER EDGE of the first bin
    * whose cumulative count reaches ⌈q·n⌉ — a conservative "≥ q of
    * the data is ≤ this value" bound with error ≤ one bin width. The
    * window runs over ≤ `bins` state rows per group, never the data.
    * Returns (groupCol, n long, q_est double). */
  def histQuantile(state: DataFrame, groupCol: String, q: Double,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    histGuards(lo, hi, bins)
    require(q > 0 && q <= 1, s"quantile $q outside (0,1]")
    val byGroup = Window.partitionBy(col(groupCol))
    val cum = Window.partitionBy(col(groupCol)).orderBy(col("__bin"))
    state
      .withColumn("__n", sum(col("__cnt")).over(byGroup))
      .withColumn("__cum", sum(col("__cnt")).over(cum))
      .withColumn("__rank", ceil(lit(q) * col("__n")).cast("long"))
      .filter(col("__cum") >= col("__rank"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"),
        (lit(lo) + (min(col("__bin")) + lit(1L)).cast("double") *
          lit(hi - lo) / lit(bins)).as("q_est"))
  }

  /** Distribution DRIFT per group: total-variation distance (ppm,
    * integer-exact) between each group's value histogram and the
    * REST-of-corpus histogram on a shared grid — the drift auditor
    * that flags a source/shard/day whose length (or score, or
    * perplexity) profile diverged from the corpus (retrain/review
    * trigger; TV is ½·Σ|p_i − q_i|, the standard bounded [0,1]
    * distance, here in ppm with floor division so any engine
    * reproduces it bit for bit).
    *
    * Work is STATE-sized end to end: one [[histState]] pass over the
    * data, then |groups|·bins tiny rows (the global histogram derives
    * from the per-group one; absent bins read as zero via the
    * grid join). Returns (groupCol, n long, tv_ppm long). */
  def histDriftTV(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    val st = histState(df, groupCol, valueCol, lo, hi, bins)
    val global = st.groupBy(col("__bin")).agg(sum(col("__cnt")).as("__gc"))
    val totals = st.groupBy(col(groupCol)).agg(sum(col("__cnt")).as("__n"))
    val grandTotal = global.agg(sum(col("__gc")).as("__gn"))
    // every (group, occupied-bin) cell, absent per-group bins as zero
    val grid = totals.crossJoin(broadcast(global))
      .join(st, Seq(groupCol, "__bin"), "left")
      .na.fill(0L, Seq("__cnt"))
      .crossJoin(broadcast(grandTotal))
    grid
      .select(col(groupCol), col("__n"),
        expr("(__cnt * 1000000L) div __n").as("__pa"),
        // a group that IS the whole corpus has no "rest" — drift is
        // undefined, surfaced as NULL rather than a division error
        when(col("__gn") > col("__n"),
          expr("((__gc - __cnt) * 1000000L) div (__gn - __n)"))
          .as("__pr"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"),
        sum(abs(col("__pa") - col("__pr"))).as("__s"))
      .select(col(groupCol), col("n"), expr("__s div 2").as("tv_ppm"))
  }

  /** WINSORIZE a column per group using histogram-estimated percentile
    * bounds: values clamp into [p_lo, p_hi] as read from ONE shared
    * [[histState]] (each bound is a bin upper edge — within one bin
    * width of the exact percentile). The outlier-taming transform for
    * heavy-tailed features before training, with no per-group sort:
    * two state readouts broadcast back over the data. Appends
    * `<valueCol>_wins` (double); NULL values pass through NULL. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo > 0 && pHi <= 1 && pLo < pHi,
      s"need 0 < pLo < pHi <= 1, got ($pLo, $pHi)")
    val st = histState(df, groupCol, valueCol, lo, hi, bins)
    val bLo = histQuantile(st, groupCol, pLo, lo, hi, bins)
      .select(col(groupCol), col("q_est").as("__wlo"))
    val bHi = histQuantile(st, groupCol, pHi, lo, hi, bins)
      .select(col(groupCol), col("q_est").as("__whi"))
    // LEFT joins: a group whose values are ALL NULL has no histogram,
    // hence no bounds row — an inner join would silently DELETE the
    // group's rows instead of passing their NULLs through. A non-null
    // value always has bounds (its group histogrammed it), so the
    // clamp arm never sees a null bound.
    df.join(broadcast(bLo), Seq(groupCol), "left")
      .join(broadcast(bHi), Seq(groupCol), "left")
      .withColumn(s"${valueCol}_wins",
        // explicit NULL guard: least/greatest IGNORE nulls (a null
        // value would silently clamp to the lower bound)
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col(valueCol).cast("double"),
            col("__wlo")), col("__whi"))))
      .drop("__wlo", "__whi")
  }

  /** Robust location/scale per group with NO per-group sort anywhere:
    * median and MAD (median absolute deviation) estimated via TWO
    * histogram passes — the [[histState]]/[[histQuantile]] sketch
    * composed with itself. Pass 1 estimates the median from the value
    * histogram; pass 2 histograms |v − median_est| on the same-width
    * grid and reads ITS median — the MAD. Each estimate carries ≤ one
    * bin width of error; outliers are rows with |v − med| > k·MAD
    * (Hampel's rule at k = 3).
    *
    * The classic per-key `median`/`percentile` needs a sort of every
    * group; this shape is three scans + hash aggregates and a
    * broadcast of the ≤|groups| medians frame — the robust-statistics
    * recipe that survives a 100 TB group. Returns
    * (groupCol, n, med_est, mad_est, n_outliers). */
  def histMedianMad(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int, k: Double = 3.0): DataFrame = {
    histGuards(lo, hi, bins)
    require(k > 0, s"k must be positive, got $k")
    val med = histQuantile(
        histState(df, groupCol, valueCol, lo, hi, bins),
        groupCol, 0.5, lo, hi, bins)
      .select(col(groupCol), col("n"), col("q_est").as("med_est"))
    val dev = df.filter(col(valueCol).isNotNull)
      .join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("med_est")))
    val mad = histQuantile(
        histState(dev, groupCol, "__dev", 0.0, hi - lo, bins),
        groupCol, 0.5, 0.0, hi - lo, bins)
      .select(col(groupCol), col("q_est").as("mad_est"))
    val outliers = dev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(sum(when(col("__dev") > lit(k) * col("mad_est"), 1L)
        .otherwise(0L)).as("n_outliers"))
    med.join(mad, Seq(groupCol)).join(outliers, Seq(groupCol))
      .select(col(groupCol), col("n"), col("med_est"), col("mad_est"),
        col("n_outliers"))
  }

  /** Probe per distinct value of `probes`: maybe_present = 1 iff all
    * k of the value's bit positions are set (counted per hash index,
    * so a within-value position collision still demands k hits). The
    * set-bit frame (≤ mBits rows) broadcasts to the probes — the probe
    * side never shuffles. Returns (valueCol, maybe_present long). */
  def bloomContains(probes: DataFrame, positions: DataFrame,
      valueCol: String, mBits: Int = 1024, k: Int = 4,
      seed: Long = 42L): DataFrame = {
    bloomGuards(mBits, k)
    probes.select(col(valueCol)).distinct()
      .select(col(valueCol),
        explode(bloomBits(valueCol, mBits, k, seed)).as("__pos"))
      .join(broadcast(positions.withColumn("__hit", lit(1L))),
        Seq("__pos"), "left")
      .groupBy(col(valueCol))
      .agg(when(sum(coalesce(col("__hit"), lit(0L))) === k, lit(1L))
        .otherwise(lit(0L)).as("maybe_present"))
  }
}
