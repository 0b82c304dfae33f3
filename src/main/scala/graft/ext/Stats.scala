package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample distribution comparison — the statistical tests a data
  * pipeline runs when a distribution MIGHT have shifted and a binned
  * drift score ([[Sketches.histDriftTV]], q174) isn't evidence enough:
  * nonparametric, bin-free, exact.
  *
  *  - [[rankSumTest]]: Mann–Whitney U / rank-sum — "are A's values
  *    stochastically larger than B's?", reported as the exact U
  *    statistic and its AUC normalization (U / (nA·nB), the
  *    probability a random A value exceeds a random B value).
  *  - [[ksTest]]: Kolmogorov–Smirnov D — the maximum gap between the
  *    two empirical CDFs, and the value where it is attained.
  *
  * Both are EXACT and engine-replayable: values are caller-quantized
  * integers (cents/milli-scores — the repo-wide exactness recipe), all
  * sufficient statistics are integer sums carried as DECIMAL(38,0)
  * (cross products reach n² ≈ 10²⁴ at 10¹² rows, past int64), and the
  * single ppm normalization uses the exact floor-division identity
  * (a − a mod b)/b, so a DuckDB oracle replays every output bit.
  *
  * Scale shape: ONE aggregate collapses the corpus to its distinct
  * quantized values (bounded by the value domain, not the row count),
  * then the cumulative counts come from the same range-bucketed
  * two-phase prefix sum as [[Sampling.exactQuantileByKey]] — per-bucket
  * windows plus a broadcast bucket-offset table, never one global
  * window partition, even if the value domain is large.
  */
object Stats {

  /** Distinct-value cumulative counts for two groups: collapses `df`
    * to one row per distinct `valueCol` with per-group counts
    * (`ca`/`cb`) and INCLUSIVE cumulative counts (`cum_a`/`cum_b`) in
    * ascending value order. The prefix sum is two-phase range-bucketed
    * (approxQuantile bounds → per-bucket window → broadcast offsets). */
  private def cumCountsByValue(df: DataFrame, groupCol: String,
      groupA: String, groupB: String, valueCol: String,
      globalBuckets: Int): DataFrame = {
    // persisted (the spearman barrier, 1c6a465): rangeBucketExpr runs
    // an EAGER approxQuantile over this aggregate, and the aggregate
    // then feeds both the in-bucket window and the bucket-total branch
    // — unpersisted, the base scan + groupBy would replay ~3× per
    // test call. Domain-sized (one row per distinct value), so the
    // cached footprint is bounded; session cache lifecycle owns it.
    val agg = df
      .filter(col(valueCol).isNotNull && col(groupCol).isin(groupA, groupB))
      .groupBy(col(valueCol).cast("long").as("__v"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withB = agg.withColumn("__bkt",
      Sampling.rangeBucketExpr(agg, col("__v"), globalBuckets))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withB
      .withColumn("__cuma", sum(col("ca")).over(wIn))
      .withColumn("__cumb", sum(col("cb")).over(wIn))
    val tot = withB.groupBy(col("__bkt"))
      .agg(sum(col("ca")).as("__ta"), sum(col("cb")).as("__tb"))
    val offsets = tot.as("a")
      .join(broadcast(tot.as("b")), col("b.__bkt") < col("a.__bkt"), "left")
      .groupBy(col("a.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("b.__ta")), lit(0L)).as("__offa"),
        coalesce(sum(col("b.__tb")), lit(0L)).as("__offb"))
    cum.join(broadcast(offsets), Seq("__bkt"))
      .select(col("__v"), col("ca"), col("cb"),
        (col("__offa") + col("__cuma")).as("cum_a"),
        (col("__offb") + col("__cumb")).as("cum_b"))
  }

  /** Exact floor division on DECIMAL(38,0) operands — the shared
    * [[PortableDiv.floorDec]] identity ([[cohensKappa]]'s
    * worse-than-chance κ relies on the toward-−∞ floor; DuckDB
    * oracles shim their truncating `//` to match). */
  private def floorDiv(a: Column, b: Column): Column =
    PortableDiv.floorDec(a, b)

  private val Dec = "decimal(38,0)"

  /** Mann–Whitney U (rank-sum) test between `groupA` and `groupB` of
    * `groupCol`, over a caller-QUANTIZED integral `valueCol` (cents /
    * milli-score — quantize first; the test is rank-based, so any
    * monotone quantization only merges ties). Returns ONE row:
    *   - `n_a`, `n_b` — group sizes;
    *   - `u2` — 2·U_A, the DOUBLED U statistic of group A (doubling
    *     keeps the half-credit for ties integral: each tied A–B pair
    *     contributes 1, each B-below-A pair 2). u2 is computed in
    *     DECIMAL(38,0) but REPORTED as int64, so the u2 COLUMN (alone)
    *     saturates to NULL once 2·U_A exceeds 2⁶³ — n_a·n_b ≳ 4.6·10¹⁸,
    *     i.e. ~2·10⁹ rows per group. `auc_ppm` divides the decimal
    *     BEFORE any narrowing and stays exact to the module's 10¹²-row
    *     envelope; read effect size from auc_ppm at that scale;
    *   - `auc_ppm` — floor(10⁶ · U_A / (n_a·n_b)), the common-language
    *     effect size (= ROC AUC of "value predicts membership in A"):
    *     500000 ⇒ no shift, 1000000 ⇒ A strictly above B.
    * NULL values drop; rows in neither group are ignored.
    *
    * Cache note (the marginMine rule): each call persists its
    * domain-sized distinct-value aggregate (it feeds an eager
    * approxQuantile plus two downstream branches); the blocks are
    * session-owned — a long-lived session sweeping many metrics
    * should materialize each result and `spark.catalog.clearCache()`
    * between sweeps. Same applies to [[ksTest]]. */
  def rankSumTest(df: DataFrame, groupCol: String, groupA: String,
      groupB: String, valueCol: String,
      globalBuckets: Int = 32): DataFrame = {
    val c = cumCountsByValue(df, groupCol, groupA, groupB, valueCol, globalBuckets)
    // per distinct value v: A-rows there beat every B strictly below
    // (2·(cum_b − cb)) and half-beat the cb ties (+cb), all ×ca
    c.agg(
        sum(col("ca")).as("n_a"),
        sum(col("cb")).as("n_b"),
        // cast to DECIMAL BEFORE multiplying: ca·cum reaches 2n² — a
        // long product would silently wrap past nA·nB ≈ 4.6·10¹⁸
        sum((col("ca").cast(Dec) *
            (lit(2L) * (col("cum_b") - col("cb")) + col("cb")))
          .cast(Dec)).as("__u2"))
      .select(col("n_a"), col("n_b"),
        col("__u2").cast("long").as("u2"),
        // guard the degenerate denominator (the 428abfd class): one
        // empty arm must read NULL, not REMAINDER_BY_ZERO under ANSI
        when(col("n_a") > 0L && col("n_b") > 0L,
          floorDiv(col("__u2") * lit(1000000L),
            col("n_a").cast(Dec) * col("n_b") * lit(2L)))
          .otherwise(lit(null).cast("long")).as("auc_ppm"))
  }

  /** Chi-square test of INDEPENDENCE between two categorical columns
    * ("does event mix depend on weekday?" — the contingency audit).
    * Returns ONE row: `n`, `a_levels`, `b_levels`, `dof`
    * (= (a−1)(b−1)), and `chi2_ppm` — the χ² statistic in parts per
    * million, summed from per-cell floor(10⁶·(o·N − r·c)²/(r·c·N))
    * (each cell floored independently: the one form both engines can
    * replay EXACTLY; the total under-counts true χ² by < #cells ppm,
    * noise at any realistic scale). All products ride DECIMAL(38,0);
    * the per-cell (o·N − r·c)²·10⁶ term bounds exactness to N < ~10⁸
    * observations (|d| ≤ N² and d²·10⁶ must stay under 10³⁸) — past
    * that, pre-aggregate or sample before testing (the statistic
    * saturates far earlier anyway). NULL categories drop.
    *
    * Scale shape: one (a, b) aggregate collapses the data to its
    * contingency cells; margins and N are cell-level aggregates
    * broadcast back onto the cells. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // persisted (r17): the contingency aggregate feeds FIVE consumers
    // (row/col margins, total, the grid join, the dims aggregate) —
    // unpersisted, the upstream scan (often an expensive classifier
    // column, e.g. q256's langId) replays once per consumer. The
    // cached frame is cell-count-sized.
    val obs = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rt = obs.groupBy(col("__a")).agg(sum(col("__o")).as("__r"))
    val ct = obs.groupBy(col("__b")).agg(sum(col("__o")).as("__c"))
    val tot = obs.agg(sum(col("__o")).as("__n"))
    // the FULL margin grid, not just observed cells: an unobserved
    // (a, b) combination contributes r·c/N to χ² (its expected count,
    // squared over itself) — dropping zero cells understates exactly
    // the dependence signal. R·C is margin-sized, never data-sized.
    val cells = rt.crossJoin(ct)
      .join(obs, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
      .crossJoin(broadcast(tot))
    // decimal BEFORE the products: o·N and r·c wrap int64 past ~3·10⁹
    val d = col("__o").cast(Dec) * col("__n") -
      col("__r").cast(Dec) * col("__c")
    val cellPpm = floorDiv(d * d * lit(1000000L),
      col("__r").cast(Dec) * col("__c") * col("__n"))
    val chi = cells.agg(sum(cellPpm).as("chi2_ppm"),
      max(col("__n")).as("n"))
    val dims = obs.agg(
      countDistinct(col("__a")).as("a_levels"),
      countDistinct(col("__b")).as("b_levels"))
    chi.crossJoin(broadcast(dims))
      .select(col("n"), col("a_levels"), col("b_levels"),
        ((col("a_levels") - 1L) * (col("b_levels") - 1L)).as("dof"),
        col("chi2_ppm"))
  }

  /** SPEARMAN rank correlation between two integral columns — the
    * monotone-association readout Pearson (q180) misses when the
    * relationship is nonlinear or outlier-skewed: Pearson over
    * MIDRANKS (the tie-correct definition). Ranks are exact integers
    * carried DOUBLED (2·midrank = 2·#below + #equal + 1, so ties never
    * leave the integers); the doubling cancels in r. Each column ranks
    * through one distinct-value aggregate + ordered prefix (value
    * domain-sized, a window over the AGGREGATE, not the data) joined
    * back on the value; sufficient statistics follow the
    * [[Audit.exactCorrelation]] recipe — DECIMAL(38,0) sums (rank
    * products reach 4n² ≈ 10²⁵ past int64), ONE double conversion,
    * fixed operation order, so DuckDB replays the double bit for bit.
    * NULLs drop listwise. Returns (n, spearman). */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // persisted: the narrow (x, y) projection feeds both rank passes
    // (each with an eager approxQuantile scan) plus the final join —
    // without the barrier the upstream scan re-runs ~6 times
    val clean = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def ranks2(c: String): DataFrame = {
      // distinct-value aggregate + the range-bucketed two-phase prefix
      // sum (the cumCountsByValue shape) — a large value domain never
      // becomes one window partition; 2·midrank = 2·(cum − cnt) + cnt + 1
      // persisted (r17, the cumCountsByValue rule): the domain-sized
      // aggregate feeds an EAGER approxQuantile plus the in-bucket
      // window and the bucket-total branch — three evaluations
      val agg = clean.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val withB = agg.withColumn("__bkt",
        Sampling.rangeBucketExpr(agg, col("__v"), 32))
      val w = Window.partitionBy(col("__bkt")).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = withB.withColumn("__cumIn", sum(col("__cnt")).over(w))
      val tot = withB.groupBy(col("__bkt")).agg(sum(col("__cnt")).as("__tot"))
      val offsets = tot.as("a")
        .join(broadcast(tot.as("b")), col("b.__bkt") < col("a.__bkt"), "left")
        .groupBy(col("a.__bkt").as("__bkt"))
        .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
      cum.join(broadcast(offsets), Seq("__bkt"))
        .select(col("__v"),
          (lit(2L) * (col("__off") + col("__cumIn") - col("__cnt")) +
            col("__cnt") + 1L).as("__r2"))
    }
    val joined = clean
      .join(ranks2("__x").withColumnRenamed("__v", "__x")
        .withColumnRenamed("__r2", "__a"), Seq("__x"))
      .join(ranks2("__y").withColumnRenamed("__v", "__y")
        .withColumnRenamed("__r2", "__b"), Seq("__y"))
    val t = joined.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("__a").cast(Dec)).cast("double").as("__sa"),
      sum(col("__b").cast(Dec)).cast("double").as("__sb"),
      sum((col("__a").cast(Dec) * col("__b")).cast(Dec)).cast("double").as("__pab"),
      sum((col("__a").cast(Dec) * col("__a")).cast(Dec)).cast("double").as("__paa"),
      sum((col("__b").cast(Dec) * col("__b")).cast(Dec)).cast("double").as("__pbb"))
    val num = col("__n") * col("__pab") - col("__sa") * col("__sb")
    val da = sqrt(col("__n") * col("__paa") - col("__sa") * col("__sa"))
    val db = sqrt(col("__n") * col("__pbb") - col("__sb") * col("__sb"))
    t.select(col("__n").cast("long").as("n"),
      when(da * db === 0, lit(null).cast("double"))
        .otherwise(num / (da * db)).as("spearman"))
  }

  /** COHEN'S KAPPA — chance-corrected agreement between two
    * categorical columns (two classifiers, or a classifier against
    * labels): raw accuracy flatters any pair that both guess the
    * majority class; κ subtracts the agreement their marginals would
    * produce by chance. All-integer form: with N rows, D agreeing rows
    * and S = Σ_k rowTotal(k)·colTotal(k),
    * `kappa_ppm = ⌊10⁶·(N·D − S) / (N² − S)⌋` — no floating point
    * anywhere, so the oracle replay is exact (including negative κ —
    * worse-than-chance agreement — where floor division toward −∞
    * matches on both engines). N² rides DECIMAL(38,0). Degenerate
    * marginals (N² = S, chance agreement 1) read NULL. NULLs drop
    * listwise. One contingency aggregate + margin-sized joins.
    * Returns (n, agree, kappa_ppm). */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // persisted (r17, the chiSquare rule): obs feeds the agreement
    // total and both margins — one classifier scan, not three
    val obs = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = obs.agg(sum(col("__o")).as("__n"),
      sum(when(col("__a") === col("__b"), col("__o")).otherwise(0L)).as("__d"))
    val rt = obs.groupBy(col("__a").as("__k")).agg(sum(col("__o")).as("__r"))
    val ct = obs.groupBy(col("__b").as("__k")).agg(sum(col("__o")).as("__c"))
    val s = rt.join(ct, Seq("__k")) // a label absent from one side adds 0
      .agg(coalesce(sum((col("__r").cast(Dec) * col("__c")).cast(Dec)),
        lit(0L).cast(Dec)).as("__s"))
    tot.crossJoin(broadcast(s))
      .select(col("__n").as("n"), col("__d").as("agree"),
        when(col("__n").cast(Dec) * col("__n") === col("__s"),
          lit(null).cast("long"))
          .otherwise(floorDiv(
            (col("__n").cast(Dec) * col("__d") - col("__s")) * lit(1000000L),
            col("__n").cast(Dec) * col("__n") - col("__s")))
          .as("kappa_ppm"))
  }

  /** Paired SIGN test — [[rankSumTest]]'s PAIRED sibling ("did each
    * user's values rise from period A to period B?"): unpaired tests
    * drown the within-key signal in between-key variance; the sign
    * test compares each key AGAINST ITSELF and counts directions.
    * Per key present in BOTH conditions, the mean comparison is the
    * exact integer cross-product sign(Σ_B·n_A − Σ_A·n_B) (never two
    * lossy divisions); keys in one condition only are excluded (no
    * pair). Returns ONE row: `n_pos` (B above A), `n_neg`, `n_tie`,
    * and `z_milli` = ⌊10³·(n_pos − n_neg)/√(n_pos + n_neg)⌋ — the
    * tie-dropping normal approximation, |z| ≳ 1.96 the usual bar;
    * sqrt and one division are correctly-rounded IEEE in any engine,
    * so the oracle replays the value bit for bit (NULL when every
    * pair ties). Caller quantizes `valueCol` to integers. */
  def signTest(df: DataFrame, keyCol: String, condCol: String,
      condA: String, condB: String, valueCol: String): DataFrame = {
    val per = df
      .filter(col(valueCol).isNotNull && col(condCol).isin(condA, condB))
      .groupBy(col(keyCol))
      .agg(
        sum(when(col(condCol) === condA, col(valueCol))).as("__sa"),
        count(when(col(condCol) === condA, 1L)).as("__na"),
        sum(when(col(condCol) === condB, col(valueCol))).as("__sb"),
        count(when(col(condCol) === condB, 1L)).as("__nb"))
      .filter(col("__na") > 0 && col("__nb") > 0)
    // mean_B vs mean_A exactly: sB·nA − sA·nB in DECIMAL(38,0)
    val d = col("__sb").cast(Dec) * col("__na") -
      col("__sa").cast(Dec) * col("__nb")
    val out = per.agg(
      sum(when(d > 0, 1L).otherwise(0L)).as("n_pos"),
      sum(when(d < 0, 1L).otherwise(0L)).as("n_neg"),
      sum(when(d === 0, 1L).otherwise(0L)).as("n_tie"))
    out.select(col("n_pos"), col("n_neg"), col("n_tie"),
      when(col("n_pos") + col("n_neg") === 0L, lit(null).cast("long"))
        .otherwise(floor(
          (lit(1000.0) * (col("n_pos") - col("n_neg")).cast("double")) /
            sqrt((col("n_pos") + col("n_neg")).cast("double"))).cast("long"))
        .as("z_milli"))
  }

  /** Kolmogorov–Smirnov distance between the empirical CDFs of
    * `groupA` and `groupB` over a caller-quantized integral
    * `valueCol`. Returns ONE row:
    *   - `n_a`, `n_b` — group sizes;
    *   - `d_ppm` — floor(10⁶ · max_v |F_A(v) − F_B(v)|), the KS D
    *     statistic (the max is over the merged support, where the
    *     maximum of the step functions' gap is attained);
    *   - `at_value` — the SMALLEST value attaining the max (ties on
    *     the gap are broken toward the low value, deterministically).
    * The gap is compared in exact integers (|cum_a·n_b − cum_b·n_a|,
    * DECIMAL(38,0)); the one ppm division happens after the argmax.
    * Cache note: persists its distinct-value aggregate per call —
    * see [[rankSumTest]]'s lifecycle note. */
  def ksTest(df: DataFrame, groupCol: String, groupA: String,
      groupB: String, valueCol: String,
      globalBuckets: Int = 32): DataFrame = {
    val c = cumCountsByValue(df, groupCol, groupA, groupB, valueCol, globalBuckets)
    val tot = c.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    // |cum_a·n_b − cum_b·n_a| as decimal; argmax via ONE
    // min(struct(-gap, v)) aggregate (max gap, then min value)
    val dev = c.crossJoin(broadcast(tot))
      .withColumn("__gap",
        abs(col("cum_a").cast(Dec) * col("n_b") -
          col("cum_b").cast(Dec) * col("n_a")))
    dev.groupBy(col("n_a"), col("n_b"))
      .agg(min(struct((-col("__gap")).as("ng"), col("__v").as("v"))).as("__am"))
      .select(col("n_a"), col("n_b"),
        // guard the degenerate denominator (the 428abfd class): one
        // empty arm must read NULL, not REMAINDER_BY_ZERO under ANSI
        when(col("n_a") > 0L && col("n_b") > 0L,
          floorDiv((-col("__am").getField("ng")) * lit(1000000L),
            col("n_a").cast(Dec) * col("n_b")))
          .otherwise(lit(null).cast("long")).as("d_ppm"),
        col("__am").getField("v").as("at_value"))
  }

  /** CRAMÉR–VON MISES two-sample test — the whole-distribution
    * companion to [[ksTest]] (KS reads the single WORST ECDF gap; CvM
    * integrates EVERY gap, so spread-out small departures that never
    * spike still register): in the ECDF form over the pooled sample,
    *   T = n·m/(n+m)² · Σ_pooled (F_A(x) − F_B(x))²
    * evaluated at every pooled observation (ties weighted by their
    * multiplicity — the natural discrete-data form of the Anderson
    * 1962 statistic). EXACT: with D(x) = cum_a(x)·m − cum_b(x)·n (the
    * q242 integer gap), T = Σ mult·D² / (n·m·(n+m)²) — one
    * DECIMAL(38,0) rational, reported floor ppm. D² ≤ (nm)² keeps the
    * numerator inside 38 digits to ~10⁶ rows per arm at 10⁶ distinct
    * values (past that, pre-bin values — the chiSquare envelope
    * note). NULL when either arm is empty. Returns ONE row:
    * (n_a, n_b, t_ppm).
    *
    * Scale shape: the shared [[cumCountsByValue]] machinery — one
    * value-domain aggregate + range-bucketed cumulatives (never one
    * global window) + one counting reduction. */
  def cvmTest(df: DataFrame, groupCol: String, groupA: String,
      groupB: String, valueCol: String,
      globalBuckets: Int = 32): DataFrame = {
    val c = cumCountsByValue(df, groupCol, groupA, groupB, valueCol,
      globalBuckets)
    val tot = c.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val d = col("cum_a").cast(Dec) * col("n_b") -
      col("cum_b").cast(Dec) * col("n_a")
    c.crossJoin(broadcast(tot))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(((col("ca") + col("cb")).cast(Dec) * d * d).cast(Dec))
        .cast(Dec).as("__num"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          floorDiv(col("__num") * lit(1000000L),
            col("n_a").cast(Dec) * col("n_b") *
              (col("n_a") + col("n_b")).cast(Dec) *
              (col("n_a") + col("n_b")).cast(Dec)))
          .otherwise(lit(null).cast("long")).as("t_ppm"))
  }

  /** Welch's unequal-variance t-test between `groupA` and `groupB` of
    * `groupCol`, over a caller-quantized integral `valueCol` — the
    * parametric companion to [[rankSumTest]] (means, not ranks) and
    * the inference step [[Behavior.abLift]]'s point estimates stop
    * short of. Returns ONE row:
    *   - `n_a`, `n_b`, `mean_a`, `mean_b` (doubles, sum/n);
    *   - `t_milli` — floor(1000·t), t = (m_a − m_b)/√(v_a/n_a + v_b/n_b);
    *   - `df_milli` — floor(1000·df), the Welch–Satterthwaite degrees
    *     of freedom (df ≥ min(n_a,n_b) − 1; |t| ≳ 1.96 at df ≳ 30 is
    *     the usual bar).
    * Sufficient statistics (n, Σx, Σx²) ride DECIMAL(38,0) — Σx²
    * reaches 10²⁶ at 10¹² cent-quantized rows, past int64 — and are
    * cast to double ONCE; every downstream step is IEEE-correctly-
    * rounded (+,−,×,/,√), so an oracle replaying the same expression
    * order reproduces both floors bit for bit. t/df are NULL when
    * either group has < 2 rows or both variances are 0.
    *
    * Scale shape: ONE hash aggregate over the filtered scan — no
    * window, no join; map-side partials collapse each partition to
    * six numbers. */
  def welchT(df: DataFrame, groupCol: String, groupA: String,
      groupB: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast(Dec)
    val agg = df
      .filter(col(valueCol).isNotNull && col(groupCol).isin(groupA, groupB))
      .agg(
        count(when(col(groupCol) === groupA, 1L)).as("n_a"),
        sum(when(col(groupCol) === groupA, v)).cast(Dec).as("__sa"),
        sum(when(col(groupCol) === groupA, v * v)).cast(Dec).as("__qa"),
        count(when(col(groupCol) === groupB, 1L)).as("n_b"),
        sum(when(col(groupCol) === groupB, v)).cast(Dec).as("__sb"),
        sum(when(col(groupCol) === groupB, v * v)).cast(Dec).as("__qb"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val (sa, sb) = (col("__sa").cast("double"), col("__sb").cast("double"))
    val (qa, qb) = (col("__qa").cast("double"), col("__qb").cast("double"))
    // sample variance via the n·Σx² − (Σx)² form, in doubles AFTER the
    // exact decimal sums (the one decimal→double rounding per stat)
    val va = (na * qa - sa * sa) / (na * (na - lit(1.0)))
    val vb = (nb * qb - sb * sb) / (nb * (nb - lit(1.0)))
    val (sea, seb) = (va / na, vb / nb)
    val t = (sa / na - sb / nb) / sqrt(sea + seb)
    val dfw = ((sea + seb) * (sea + seb)) /
      (sea * sea / (na - lit(1.0)) + seb * seb / (nb - lit(1.0)))
    val ok = col("n_a") > 1L && col("n_b") > 1L && (va + vb) > 0.0
    agg.select(col("n_a"), col("n_b"),
      (sa / na).as("mean_a"), (sb / nb).as("mean_b"),
      when(ok, floor(lit(1000.0) * t).cast("long"))
        .otherwise(lit(null).cast("long")).as("t_milli"),
      when(ok, floor(lit(1000.0) * dfw).cast("long"))
        .otherwise(lit(null).cast("long")).as("df_milli"))
  }

  /** Theil–Sen robust slope per key: the LOW MEDIAN of all pairwise
    * slopes (y_j − y_i)/(x_j − x_i), x_i < x_j, in floor ppm — the
    * trend estimate a 29%-outlier-contaminated series cannot drag
    * (Sen 1968), where [[Audit.groupedTrend]]'s least squares follows
    * every spike. Input contract: ONE integral y per (key, x) — the
    * caller pre-aggregates (e.g. daily totals), which is also what
    * bounds the pair explosion: pairs per key = C(|x-domain|, 2),
    * days², NOT rows². Each slope floors independently through the
    * exact decimal identity ([[floorDiv]], toward −∞ for falling
    * trends); the low median is the slope at rank ⌊(m+1)/2⌋ of the m
    * ascending slopes — an ORDER STATISTIC, exact and replayable, not
    * an interpolated midpoint. Returns (key, n_pairs,
    * slope_ppm) — slope in y-units-per-million-x-units.
    *
    * Scale shape: per-key self-join on the pre-aggregated series
    * (domain-sized both sides), per-key window over ≤ days² pair
    * rows. Keys partition independently — the 100 TB path is many
    * keys, never a big window. */
  def theilSen(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    // NULL x/y rows drop (the welchT rule) — engines disagree on NULL
    // sort order, so a NULL slope would shift the median rank
    // differently per engine
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val s1 = base.select(col(keyCol).as("__k"), col(xCol).cast("long").as("__x1"),
      col(yCol).cast("long").as("__y1"))
    val s2 = base.select(col(keyCol).as("__k"), col(xCol).cast("long").as("__x2"),
      col(yCol).cast("long").as("__y2"))
    val pairs = s1.join(s2, Seq("__k")).filter(col("__x2") > col("__x1"))
      .select(col("__k"),
        floorDiv((col("__y2").cast(Dec) - col("__y1")) * lit(1000000L),
          (col("__x2").cast(Dec) - col("__x1"))).as("__slope"),
        col("__x1"), col("__x2"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__slope"), col("__x1"), col("__x2"))
    pairs
      .withColumn("__rk", row_number().over(w))
      .withColumn("__m", count(lit(1)).over(Window.partitionBy(col("__k"))))
      // low-median rank ⌊(m+1)/2⌋ — floor() because Spark's `/` on
      // longs is DOUBLE division (odd m+1 would match no row)
      .filter(col("__rk") ===
        floor((col("__m") + lit(1L)) / lit(2L)).cast("long"))
      .select(col("__k").as(keyCol), col("__m").as("n_pairs"),
        col("__slope").as("slope_ppm"))
  }

  /** Lag-k autocorrelation (ACF) of a per-key integral series, lags
    * 1..maxLag — "does yesterday predict today?" for the daily-volume
    * audits [[Audit.groupedTrend]] and CUSUM read in level terms.
    * Input contract: ONE integral value per (key, t) with integer t
    * (day number / hour index), caller pre-aggregated. For each lag k
    * the (v_t, v_{t+k}) pairs feed the exact-sufficient-statistics
    * Pearson of [[spearman]]'s final step: six DECIMAL(38,0) sums,
    * then ONE double expression — so the oracle replays the double
    * bit for bit. Returns (key, lag, n, acf) with acf NULL when
    * either margin is constant (n ≤ 1 or zero variance).
    *
    * Note this is the CORRELATION form (per-lag margins), not the
    * autocovariance-over-variance form classical ACF tables use —
    * equal in the stationary limit, and exactly replayable, which the
    * classical form (global mean subtraction) also would be, but with
    * weaker small-n behavior at the series edges.
    *
    * Scale shape: the series is domain-sized (keys × time grain); the
    * lag grid is a broadcast ≤maxLag-row explode; one equi-join on
    * (key, t+k) and one (key, lag) hash aggregate. */
  def autocorr(df: DataFrame, keyCol: String, tCol: String,
      vCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    // NULL t/v rows drop: sum() would skip them while count() counted
    // them — inconsistent sufficient statistics
    val s = df.filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tCol).cast("long").as("__t"),
        col(vCol).cast("long").as("__v"))
    val agg = s.as("a")
      .select(col("a.__k"), col("a.__t"), col("a.__v").as("__x"))
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .join(s.as("b").select(col("b.__k").as("__k2"), col("b.__t").as("__t2"),
          col("b.__v").as("__y")),
        col("__k") === col("__k2") && col("__t2") === col("__t") + col("lag"))
      .groupBy(col("__k"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(Dec)).cast(Dec).as("__sx"),
        sum(col("__y").cast(Dec)).cast(Dec).as("__sy"),
        sum(col("__x").cast(Dec) * col("__y")).cast(Dec).as("__sxy"),
        sum(col("__x").cast(Dec) * col("__x")).cast(Dec).as("__sxx"),
        sum(col("__y").cast(Dec) * col("__y")).cast(Dec).as("__syy"))
    val (n, sx, sy) = (col("n").cast("double"),
      col("__sx").cast("double"), col("__sy").cast("double"))
    val (sxy, sxx, syy) = (col("__sxy").cast("double"),
      col("__sxx").cast("double"), col("__syy").cast("double"))
    // sign-checked guard (the welchT rule): a constant margin whose
    // exact sum exceeds 2^53 can round to a TINY nonzero n·Σx²−(Σx)²
    // on the decimal→double cast — `den === 0` would then pass NaN
    // (sqrt of a tiny negative) or a junk ratio through the NULL
    // contract. Require both variance terms strictly positive.
    val (dx, dy) = (n * sxx - sx * sx, n * syy - sy * sy)
    agg.select(col("__k").as(keyCol), col("lag").cast("long").as("lag"),
      col("n"),
      when(dx > 0.0 && dy > 0.0,
        (n * sxy - sx * sy) / (sqrt(dx) * sqrt(dy)))
        .otherwise(lit(null).cast("double")).as("acf"))
  }

  /** Wald–Wolfowitz RUNS test per key: is the sign sequence of a
    * series around its median random, or does it trend/oscillate?
    * (Too FEW runs ⇒ level shifts / trending — the q187 CUSUM
    * signal; too MANY ⇒ alternation.) Input contract: one integral
    * value per (key, t), caller pre-aggregated. Per key:
    *   - the LOW MEDIAN (order statistic at rank ⌊(n+1)/2⌋ — exact,
    *     the [[theilSen]] rule) of the values;
    *   - values EQUAL to the median drop (the standard tie rule);
    *     `n_above`/`n_below` count the survivors;
    *   - `runs` = 1 + #sign changes in t-order;
    *   - `z_milli` = floor(1000·(R − E)/√V) with E = 1 + 2n₁n₂/n and
    *     V = 2n₁n₂(2n₁n₂ − n)/(n²(n − 1)) — doubles from exact
    *     integers, IEEE-replayable; NULL when either side is empty or
    *     V = 0.
    * Scale shape: per-key windows over the DOMAIN-sized series (days
    * per key), never over raw rows; keys partition independently. */
  def runsTest(df: DataFrame, keyCol: String, tCol: String,
      vCol: String): DataFrame = {
    // NULL t/v rows drop BEFORE the median rank window — engines
    // disagree on NULL sort order (the theilSen rule)
    val s = df.filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tCol).cast("long").as("__t"),
        col(vCol).cast("long").as("__v"))
    val wRank = Window.partitionBy(col("__k")).orderBy(col("__v"), col("__t"))
    val wKey = Window.partitionBy(col("__k"))
    val med = s
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wKey))
      .filter(col("__rk") ===
        floor((col("__n") + lit(1L)) / lit(2L)).cast("long"))
      .select(col("__k"), col("__v").as("__med"))
    val wT = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val signs = s.join(med, Seq("__k")).filter(col("__v") =!= col("__med"))
      .withColumn("__up", (col("__v") > col("__med")).cast("int"))
      .withColumn("__chg",
        when(lag(col("__up"), 1).over(wT).isNull, 0)
          .when(lag(col("__up"), 1).over(wT) =!= col("__up"), 1)
          .otherwise(0))
    val agg = signs.groupBy(col("__k"))
      .agg(sum(col("__up")).as("n_above"),
        sum(lit(1) - col("__up")).as("n_below"),
        (sum(col("__chg")) + lit(1L)).as("runs"))
    val (n1, n2) = (col("n_above").cast("double"), col("n_below").cast("double"))
    val n = n1 + n2
    val p2 = lit(2.0) * n1 * n2
    val e = lit(1.0) + p2 / n
    val vr = (p2 * (p2 - n)) / (n * n * (n - lit(1.0)))
    val ok = col("n_above") > 0L && col("n_below") > 0L &&
      (col("n_above") + col("n_below")) > 2L && vr > 0.0
    agg.select(col("__k").as(keyCol), col("n_above"), col("n_below"),
      col("runs"),
      when(ok, floor(lit(1000.0) * (col("runs").cast("double") - e) / sqrt(vr))
        .cast("long")).otherwise(lit(null).cast("long")).as("z_milli"))
  }

  /** MANN–KENDALL trend test per key — the significance companion to
    * [[theilSen]]'s magnitude (Mann 1945, Kendall's S over time
    * order): S = Σ_{i<j} sign(y_j − y_i) counts concordant-minus-
    * discordant day pairs, so monotone drift pushes |S| toward
    * n(n−1)/2 regardless of the values' scale or outliers. Input
    * contract: one integral value per (key, t), caller pre-aggregated
    * (pairs = days², never rows² — the [[theilSen]] rule). Returns
    * (key, n_obs, s, z_milli):
    *   - `s` — the exact integer statistic;
    *   - `z_milli` — floor(1000·(S∓1)/√Var) with the standard
    *     continuity correction and the tie-corrected variance
    *     Var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 (t = tie-group
    *     sizes); doubles from exact integers, IEEE-replayable; NULL
    *     when Var = 0 (all values tied or n < 2). z = 0 when S = 0.
    * Scale shape: a per-key self-join on the domain-sized series plus
    * two key-level aggregates; keys partition independently. */
  def mannKendall(df: DataFrame, keyCol: String, tCol: String,
      vCol: String): DataFrame = {
    // NULL t/v rows drop: they carry no sign information but would
    // count into n_obs and the tie-corrected variance (the welchT rule)
    val base = df.filter(col(tCol).isNotNull && col(vCol).isNotNull)
    val s1 = base.select(col(keyCol).as("__k"), col(tCol).cast("long").as("__t1"),
      col(vCol).cast("long").as("__v1"))
    val s2 = base.select(col(keyCol).as("__k"), col(tCol).cast("long").as("__t2"),
      col(vCol).cast("long").as("__v2"))
    val sAgg = s1.join(s2, Seq("__k")).filter(col("__t2") > col("__t1"))
      .groupBy(col("__k"))
      .agg(sum(signum(col("__v2") - col("__v1")).cast("long")).as("s"))
    val ties = s1.groupBy(col("__k"), col("__v1"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("__groups"), sum(col("__t")).as("n_obs"),
        sum(col("__t") * (col("__t") - 1L) * (lit(2L) * col("__t") + 5L))
          .as("__tt"))
    val n = col("n_obs")
    val varNum = (n * (n - lit(1L)) * (lit(2L) * n + lit(5L)) - col("__tt"))
      .cast("double")
    val vr = varNum / lit(18.0)
    val z = when(col("s") > 0L, (col("s").cast("double") - lit(1.0)) / sqrt(vr))
      .when(col("s") < 0L, (col("s").cast("double") + lit(1.0)) / sqrt(vr))
      .otherwise(lit(0.0))
    sAgg.join(ties, Seq("__k"))
      .select(col("__k").as(keyCol), col("n_obs"), col("s"),
        when(vr > 0.0, floor(lit(1000.0) * z).cast("long"))
          .otherwise(lit(null).cast("long")).as("z_milli"))
  }

  /** SEASONAL DECOMPOSITION of a per-key daily series into
    * trend + day-of-week seasonal + residual — the classical-
    * decomposition baseline (Makridakis et al.; STL's moving-average
    * ancestor) that turns "traffic dropped Sunday" into "traffic
    * dropped 12% below its usual Sunday": 
    *   - `trend` — centered 7-day moving average, floor-divided
    *     (full windows only: the 3 edge days each side read NULL);
    *   - `seasonal` — per day-of-week floor-mean of the detrended
    *     values (Σ(v − trend) over that weekday / its count);
    *   - `resid` — v − trend − seasonal (NULL at the edges).
    * All integer arithmetic over the caller-quantized values with the
    * exact floor identity ([[floorDiv]], toward −∞ — negative
    * detrended means floor consistently), so a DuckDB oracle replays
    * every bit. `dowCol` is the caller's day-of-week key (0–6 or
    * 1–7, any convention — it is only a group key).
    * Input contract: one integral value per (key, t), t an integer
    * DAY index with consecutive days adjacent (gaps shrink the moving
    * window's membership and are the caller's contract to fill via
    * [[Audit.fillDailyGaps]]).
    *
    * Scale shape: rows-between windows over the per-key DAY series
    * (domain-sized, the [[theilSen]] rule) + one (key, dow) aggregate
    * broadcast back. Returns (key, t, dow, v, trend, seasonal,
    * resid). */
  def seasonalDecompose(df: DataFrame, keyCol: String, tCol: String,
      dowCol: String, vCol: String): DataFrame = {
    val s = df.filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tCol).cast("long").as("__t"),
        col(dowCol).cast("long").as("__dow"), col(vCol).cast("long").as("__v"))
    val w7 = Window.partitionBy(col("__k")).orderBy(col("__t"))
      .rowsBetween(-3, 3)
    val trended = s
      .withColumn("__n7", count(lit(1)).over(w7))
      .withColumn("__s7", sum(col("__v")).over(w7))
      .withColumn("trend",
        when(col("__n7") === 7L,
          floorDiv(col("__s7").cast(Dec), lit(7L).cast(Dec)))
          .otherwise(lit(null).cast("long")))
      .withColumn("__detr", col("__v") - col("trend"))
    val seas = trended.filter(col("__detr").isNotNull)
      .groupBy(col("__k"), col("__dow"))
      .agg(floorDiv(sum(col("__detr")).cast(Dec),
        count(lit(1)).cast(Dec)).as("seasonal"))
    trended.join(seas, Seq("__k", "__dow"), "left")
      .select(col("__k").as(keyCol), col("__t").as(tCol),
        col("__dow").as("dow"), col("__v").as(vCol),
        col("trend"), col("seasonal"),
        (col("__v") - col("trend") - col("seasonal")).as("resid"))
  }

  /** EXACT EWMA (exponentially weighted moving average) per key with
    * α = 1/8: E_t = v_t/8 + 7·E_{t-1}/8, E_1 = v_1 — the recursive
    * smoother every monitoring stack runs, made EXACT and engine-
    * replayable: the recursion unrolls to one PREFIX SUM by
    * prefactorizing each row's coefficient,
    *
    *   B_t = Σ_{j≤t} w_j·v_j,  w_1 = 7^{T-1}, w_j = 8^{j-2}·7^{T-j},
    *   E_t = B_t / (7^{T-t}·8^{t-1})   — an exact integer division,
    *
    * so "smooth this series" is a cumulative window over DECIMAL(38,0)
    * products, with one exact floor at readout (toward −∞ for
    * negative series). `maxLen` bounds the series length per key
    * (coefficients reach 8^{maxLen-2}·values — maxLen ≤ 32 keeps a
    * 10⁹-cent daily series inside DECIMAL(38,0); longer series chunk
    * by month and chain, or accept the classical double form).
    * Input contract: one integral value per (key, t) ([[theilSen]]
    * rules: pre-aggregated, NULLs dropped). Returns
    * (key, t, v, ewma) — ewma floored to the value's unit.
    *
    * Scale shape: row_number + one cumulative-sum window over the
    * DOMAIN-sized per-key series; keys partition independently. */
  def ewmaExact(df: DataFrame, keyCol: String, tCol: String,
      vCol: String, maxLen: Int = 31): DataFrame = {
    require(maxLen >= 1 && maxLen <= 32,
      s"maxLen must be in [1, 32], got $maxLen")
    val s = df.filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tCol).cast("long").as("__t"),
        col(vCol).cast("long").as("__v"))
    val wOrd = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val pow7 = (0 until maxLen).scanLeft(BigDecimal(1))((a, _) => a * 7)
    val pow8 = (0 until maxLen).scanLeft(BigDecimal(1))((a, _) => a * 8)
    def lit7(e: Column) = element_at(
      array(pow7.take(maxLen).map(p => lit(p.toBigInt.toString).cast(Dec)): _*),
      e.cast("int"))
    def lit8(e: Column) = element_at(
      array(pow8.take(maxLen).map(p => lit(p.toBigInt.toString).cast(Dec)): _*),
      e.cast("int"))
    val t = maxLen.toLong
    val withJ = s.withColumn("__j", row_number().over(wOrd).cast("long"))
    // a series longer than maxLen must fail LOUDLY with the fix named
    // — bare element_at would throw an obscure index-0 error (or read
    // powers from the wrong end); coalesce evaluates the guard first
    val guard = when(col("__j") > lit(t),
      raise_error(concat(
        lit(s"ewmaExact: series exceeds maxLen=$maxLen for key "),
        col("__k").cast("string"),
        lit(" - raise maxLen (<= 32) or chunk the series"))))
      .otherwise(lit(null)).cast(Dec)
    // w_j = 7^(T-j) · (j = 1 ? 7^(j-1)=1 scaled form : 8^(j-2));
    // element_at is 1-based: index i holds the (i-1)-th power
    val w = coalesce(guard,
      when(col("__j") === 1L, lit7(lit(t)))
        .otherwise(lit8(col("__j") - 1L) * lit7(lit(t) - col("__j") + 1L)))
    val b = withJ
      .withColumn("__w", w)
      .withColumn("__b", sum((col("__w") * col("__v")).cast(Dec))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(Dec))
    b.select(col("__k").as(keyCol), col("__t").as(tCol),
      col("__v").as(vCol),
      floorDiv(col("__b"),
        lit7(lit(t) - col("__j") + 1L) * lit8(col("__j"))).as("ewma"))
  }

  /** TWO-PROPORTION z-test: are two conversion rates different? —
    * the funnel-significance readout ([[Behavior.funnel]] gives the
    * counts; this gives the inference). Pooled-variance z from four
    * exact integers (x_a/n_a, x_b/n_b), every double op IEEE in a
    * fixed order, reported floor-milli with the exact floor-ppm rates
    * alongside. NULL when either n is 0 or the pooled rate is 0 or 1
    * (no variance). Returns ONE row:
    * (n_a, x_a, n_b, x_b, rate_a_ppm, rate_b_ppm, z_milli).
    *
    * Scale shape: callers aggregate the counts (one row in); this is
    * pure arithmetic — compose with any counting pipeline. */
  def twoProportionZ(counts: DataFrame, nACol: String, xACol: String,
      nBCol: String, xBCol: String): DataFrame = {
    val (na, xa) = (col(nACol).cast("long"), col(xACol).cast("long"))
    val (nb, xb) = (col(nBCol).cast("long"), col(xBCol).cast("long"))
    val (naD, xaD) = (na.cast("double"), xa.cast("double"))
    val (nbD, xbD) = (nb.cast("double"), xb.cast("double"))
    val p = (xaD + xbD) / (naD + nbD)
    val z = (xaD / naD - xbD / nbD) /
      sqrt(p * (lit(1.0) - p) * (lit(1.0) / naD + lit(1.0) / nbD))
    val ok = na > 0L && nb > 0L && (xa + xb) > 0L && (xa + xb) < (na + nb)
    counts.select(na.as("n_a"), xa.as("x_a"), nb.as("n_b"), xb.as("x_b"),
      when(na > 0L, floorDiv(xa.cast(Dec) * lit(1000000L), na.cast(Dec)))
        .otherwise(lit(null).cast("long")).as("rate_a_ppm"),
      when(nb > 0L, floorDiv(xb.cast(Dec) * lit(1000000L), nb.cast(Dec)))
        .otherwise(lit(null).cast("long")).as("rate_b_ppm"),
      when(ok, floor(lit(1000.0) * z).cast("long"))
        .otherwise(lit(null).cast("long")).as("z_milli"))
  }

  /** CALIBRATION audit — reliability diagram + expected calibration
    * error (the binned ECE of Naeini et al. 2015, the standard
    * readout): does a score of 0.8 WIN ~80 % of the time? Rows carry
    * a caller-quantized score in [0, 10⁶] ppm and a {0,1} label;
    * bin = min(⌊score·bins/10⁶⌋, bins−1) (the right edge closes the
    * top bin; out-of-range scores clamp). Per non-empty bin: n, mean
    * claimed confidence (exact DECIMAL(38,0) score sum, floor ppm),
    * observed accuracy (floor ppm), their absolute gap; `ece_ppm` =
    * ⌊Σ_b n_b·gap_b / N⌋ repeats on every row — computed by a
    * full-frame window over the ≤bins-row result (bounded, the
    * [[TextOps.zipfProfile]] rule). All arithmetic exact integer;
    * NULL scores/labels drop. Returns (bin, n, conf_ppm, acc_ppm,
    * gap_ppm, ece_ppm).
    *
    * Scale shape: ONE bin aggregate (≤bins groups, map-side
    * partials) is the only data-sized pass; the ECE reduction runs
    * over ≤bins rows. */
  def calibrationBins(df: DataFrame, scorePpmCol: String,
      labelCol: String, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val s = col(scorePpmCol).cast("long")
    val l = col(labelCol).cast("long")
    // s·bins ≤ 10⁶·bins ≪ 2⁵³: the double floor-divide is exact
    val rawBin = floor((s * lit(bins.toLong)).cast("double") /
      lit(1000000.0)).cast("long")
    val binned = df.filter(s.isNotNull && l.isNotNull)
      .select(greatest(least(rawBin, lit(bins - 1L)), lit(0L)).as("bin"),
        s.as("__s"), l.as("__l"))
    val perBin = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__s").cast(Dec)).cast(Dec).as("__ss"),
        sum(col("__l")).cast(Dec).as("__pos"))
      .select(col("bin"), col("n"),
        PortableDiv.nonNeg(col("__ss"), col("n").cast(Dec)).as("conf_ppm"),
        PortableDiv.nonNeg(col("__pos") * lit(1000000L),
          col("n").cast(Dec)).as("acc_ppm"))
      .withColumn("gap_ppm", abs(col("conf_ppm") - col("acc_ppm")))
    val wAll = Window.partitionBy()
    perBin.withColumn("ece_ppm",
      PortableDiv.nonNeg(
        sum((col("gap_ppm").cast(Dec) * col("n")).cast(Dec)).over(wAll).cast(Dec),
        sum(col("n")).over(wAll).cast(Dec)))
  }

  /** CRAMÉR'S V — association strength between two categoricals
    * ("does event mix depend on weekday?"), the effect size the
    * chi-square test (q248) omits: χ² says "dependent", V says "how
    * much" on [0, 1]. The contingency grid is margin-COMPLETE
    * (rows × cols with absent cells at o = 0 — dropping them would
    * understate χ²); per cell, (o·N − r·c)²/(N·r·c) — the (o−e)²/e
    * identity cleared of the e = r·c/N fraction — evaluates as ONE
    * IEEE double expression over exact DECIMAL(38,0) integers,
    * floors to micro units, and integer-sums (order-independent);
    * V = √(χ²/(N·min(R−1,C−1))) is one more double op, floor-milli.
    * NULL x/y rows drop; V is NULL when either side has < 2 levels.
    * Returns ONE row: (n, r_levels, c_levels, chi2_micro, v_milli).
    *
    * Scale shape: one (x, y) cell aggregate is the only data-sized
    * pass; margins and the completed grid are level-domain-sized
    * (the broadcast bounded-grid pattern — levels are a contract,
    * not a row count). */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("string").as("__x"),
        col(yCol).cast("string").as("__y"))
    // persisted + margins derived FROM the cells (r17): base fed four
    // independent aggregates (cells, both margins, the total), so the
    // input scanned four times; the margins are exact sums over the
    // cell counts, so one persisted cell-sized aggregate serves all
    val cells = base.groupBy(col("__x"), col("__y"))
      .agg(count(lit(1)).as("__o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowsM = cells.groupBy(col("__x")).agg(sum(col("__o")).as("__r"))
    val colsM = cells.groupBy(col("__y")).agg(sum(col("__o")).as("__c"))
    val nTot = cells.agg(sum(col("__o")).cast(Dec).as("__tot"))
    val grid = rowsM.crossJoin(broadcast(colsM)).crossJoin(broadcast(nTot))
      .join(cells, Seq("__x", "__y"), "left")
      .na.fill(0L, Seq("__o"))
    val d = (col("__o").cast(Dec) * col("__tot") -
      col("__r").cast(Dec) * col("__c")).cast(Dec).cast("double")
    val term = floor(lit(1000000.0) * d * d /
      (col("__tot").cast("double") * col("__r").cast("double") *
        col("__c").cast("double"))).cast("long")
    val agg = grid.select(term.as("__t"), col("__tot"),
        col("__x"), col("__y"))
      .agg(sum(col("__t")).as("chi2_micro"),
        countDistinct(col("__x")).as("r_levels"),
        countDistinct(col("__y")).as("c_levels"),
        min(col("__tot")).cast("long").as("n"))
    agg.select(col("n"), col("r_levels"), col("c_levels"),
      col("chi2_micro"),
      when(col("r_levels") >= 2 && col("c_levels") >= 2 && col("n") > 0,
        floor(lit(1000.0) * sqrt(
          (col("chi2_micro").cast("double") / lit(1000000.0)) /
          (col("n").cast("double") *
            least(col("r_levels") - 1L, col("c_levels") - 1L)
              .cast("double")))).cast("long"))
        .otherwise(lit(null).cast("long")).as("v_milli"))
  }

  /** STANDARDIZED MEAN DIFFERENCE (Cohen's d with pooled-arm SD) —
    * the covariate-balance check an A/B pipeline runs BEFORE trusting
    * the experiment ([[Behavior.cuped]]'s sanity precondition): were
    * the arms comparable on the pre-period metric? SMD = (x̄_a − x̄_b)
    * / √((s²_a + s²_b)/2) from six exact DECIMAL(38,0) sufficient
    * statistics (the welchT shape — ONE hash aggregate, map-side
    * partials), evaluated as one IEEE double expression, floor-milli.
    * |SMD| < 0.1 is the conventional balance bar. NULL when either
    * arm has < 2 rows or both variances are 0. Returns ONE row:
    * (n_a, n_b, mean_a_milli, mean_b_milli, smd_milli).
    *
    * Scale shape: one six-stat hash aggregate — the flattest shape;
    * pure arithmetic after. */
  def standardizedMeanDiff(df: DataFrame, groupCol: String,
      groupA: String, groupB: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    // square AFTER the decimal cast (the welchT shape) — v*v in
    // LongType overflows int64 at |v| >= ~3.04e9 and ANSI Spark throws
    val vd = v.cast(Dec)
    val isA = col(groupCol) === groupA
    val isB = col(groupCol) === groupB
    val agg = df.filter(v.isNotNull && (isA || isB)).agg(
      sum(when(isA, 1L).otherwise(0L)).as("n_a"),
      sum(when(isA, v).otherwise(0L).cast(Dec)).cast(Dec).as("__sa"),
      sum(when(isA, vd * vd).otherwise(lit(0L).cast(Dec))).cast(Dec).as("__sa2"),
      sum(when(isB, 1L).otherwise(0L)).as("n_b"),
      sum(when(isB, v).otherwise(0L).cast(Dec)).cast(Dec).as("__sb"),
      sum(when(isB, vd * vd).otherwise(lit(0L).cast(Dec))).cast(Dec).as("__sb2"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val (sa, sb) = (col("__sa").cast("double"), col("__sb").cast("double"))
    val (sa2, sb2) = (col("__sa2").cast("double"), col("__sb2").cast("double"))
    // unbiased per-arm variance, one fixed-order double expression
    val va = (sa2 - sa * sa / na) / (na - lit(1.0))
    val vb = (sb2 - sb * sb / nb) / (nb - lit(1.0))
    val smd = (sa / na - sb / nb) / sqrt((va + vb) / lit(2.0))
    val ok = col("n_a") >= 2L && col("n_b") >= 2L
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0L,
        floorDiv(col("__sa") * lit(1000L), col("n_a").cast(Dec)))
        .otherwise(lit(null).cast("long")).as("mean_a_milli"),
      when(col("n_b") > 0L,
        floorDiv(col("__sb") * lit(1000L), col("n_b").cast(Dec)))
        .otherwise(lit(null).cast("long")).as("mean_b_milli"),
      when(ok && (va + vb) > 0.0,
        floor(lit(1000.0) * smd).cast("long"))
        .otherwise(lit(null).cast("long")).as("smd_milli"))
  }

  /** DIFFERENCE-IN-DIFFERENCES — the quasi-experimental effect
    * estimate over a natural split: DiD = (ȳ_t,post − ȳ_t,pre) −
    * (ȳ_c,post − ȳ_c,pre) from four exact cell sums, evaluated over
    * the COMMON denominator as one exact DECIMAL(38,0) rational and
    * floored at milli units (floorDec, toward −∞ — the estimate is
    * signed). Cell means are reported floor-milli alongside. The
    * caller supplies rows (group ∈ {a=treated, b=control}, period ∈
    * {0=pre, 1=post}, value) — one row per observation unit,
    * INCLUDING zero rows for units inactive in a period (dropping
    * them changes the mean's denominator; the contract is the
    * caller's unit×period grid). did_milli is NULL when any cell is
    * empty; each mean is NULL when ITS cell is empty.
    * Returns ONE row: (n_a_pre, n_a_post, n_b_pre, n_b_post,
    * mean_a_pre_milli, mean_a_post_milli, mean_b_pre_milli,
    * mean_b_post_milli, did_milli).
    *
    * Scale shape: one four-cell hash aggregate with map-side
    * partials; pure arithmetic after. The four-count product in the
    * common denominator stays inside DECIMAL(38,0) to ~10⁸ units per
    * cell with cent values (documented envelope). */
  def diffInDiff(df: DataFrame, groupCol: String, groupA: String,
      groupB: String, periodCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    val p = col(periodCol).cast("long")
    val isA = col(groupCol) === groupA
    val isB = col(groupCol) === groupB
    def cnt(g: Column, pp: Long) =
      sum(when(g && p === pp, 1L).otherwise(0L))
    def sm(g: Column, pp: Long) =
      sum(when(g && p === pp, v).otherwise(0L).cast(Dec)).cast(Dec)
    val agg = df.filter(v.isNotNull && (isA || isB)).agg(
      cnt(isA, 0L).as("n_a_pre"), sm(isA, 0L).as("__sa0"),
      cnt(isA, 1L).as("n_a_post"), sm(isA, 1L).as("__sa1"),
      cnt(isB, 0L).as("n_b_pre"), sm(isB, 0L).as("__sb0"),
      cnt(isB, 1L).as("n_b_post"), sm(isB, 1L).as("__sb1"))
    def d(c: String) = col(c).cast(Dec)
    val num = ((col("__sa1") * d("n_a_pre") - col("__sa0") * d("n_a_post"))
        * d("n_b_pre") * d("n_b_post") -
      (col("__sb1") * d("n_b_pre") - col("__sb0") * d("n_b_post"))
        * d("n_a_pre") * d("n_a_post")).cast(Dec)
    val den = (d("n_a_pre") * d("n_a_post") * d("n_b_pre") * d("n_b_post"))
      .cast(Dec)
    val ok = col("n_a_pre") > 0L && col("n_a_post") > 0L &&
      col("n_b_pre") > 0L && col("n_b_post") > 0L
    def mean(s: String, n: String, as: String) =
      when(col(n) > 0L, floorDiv(col(s) * lit(1000L), d(n)))
        .otherwise(lit(null).cast("long")).as(as)
    agg.select(col("n_a_pre"), col("n_a_post"), col("n_b_pre"), col("n_b_post"),
      mean("__sa0", "n_a_pre", "mean_a_pre_milli"),
      mean("__sa1", "n_a_post", "mean_a_post_milli"),
      mean("__sb0", "n_b_pre", "mean_b_pre_milli"),
      mean("__sb1", "n_b_post", "mean_b_post_milli"),
      when(ok, floorDiv(num * lit(1000L), den))
        .otherwise(lit(null).cast("long")).as("did_milli"))
  }


  /** MINIMUM DETECTABLE EFFECT for the two-proportion test — the
    * power-analysis readout an experimentation pipeline publishes
    * NEXT TO every A/B result ([[twoProportionZ]] answers "did it
    * move?", this answers "how small a move could we even have
    * seen?"): MDE = (z_α/2 + z_β)·√(p̂(1−p̂)·(1/n_a + 1/n_b)) at
    * α = 5 % two-sided and 80 % power (the industry defaults,
    * embedded as exact double literals), with p̂ the pooled rate.
    * One IEEE double expression over four exact counts, floor ppm;
    * the exact floor-ppm pooled rate reported alongside. NULL when
    * either n is 0 or p̂ ∈ {0, 1}. Returns ONE row:
    * (n_a, n_b, pooled_rate_ppm, mde_ppm).
    *
    * Scale shape: pure arithmetic on one pre-aggregated counts row —
    * composes with any counting pipeline (the twoProportionZ rule). */
  def minDetectableEffect(counts: DataFrame, nACol: String, xACol: String,
      nBCol: String, xBCol: String): DataFrame = {
    val (na, xa) = (col(nACol).cast("long"), col(xACol).cast("long"))
    val (nb, xb) = (col(nBCol).cast("long"), col(xBCol).cast("long"))
    val (naD, nbD) = (na.cast("double"), nb.cast("double"))
    val p = (xa + xb).cast("double") / (na + nb).cast("double")
    // z_{0.975} and z_{0.80}: standard-normal quantiles as exact
    // double literals (both engines parse the identical bits)
    val z = lit(1.959963984540054) + lit(0.8416212335729143)
    val mde = z * sqrt(p * (lit(1.0) - p) *
      (lit(1.0) / naD + lit(1.0) / nbD))
    val ok = na > 0L && nb > 0L && (xa + xb) > 0L && (xa + xb) < (na + nb)
    counts.select(na.as("n_a"), nb.as("n_b"),
      when((na + nb) > 0L,
        PortableDiv.nonNeg((xa + xb).cast(Dec) * lit(1000000L),
          (na + nb).cast(Dec)))
        .otherwise(lit(null).cast("long")).as("pooled_rate_ppm"),
      when(ok, floor(lit(1000000.0) * mde).cast("long"))
        .otherwise(lit(null).cast("long")).as("mde_ppm"))
  }

  /** SPLIT-CONFORMAL calibration quantile (Vovk et al.; the Angelopoulos
    * & Bates 2021 recipe) — the distribution-free prediction-interval
    * radius a model-serving pipeline computes from a held-out
    * calibration set: with n nonconformity scores and miscoverage
    * α, q̂ = the k-th smallest score at k = ⌈(n+1)·(1−α)⌉, and
    * [pred − q̂, pred + q̂] covers with probability ≥ 1 − α. Scores
    * are caller-quantized INTEGERS (|residual| in cents/milli — the
    * repo's integer-first rule), α arrives in ppm, and the rank rule
    * is exact integer arithmetic: k = ⌈(n+1)·(10⁶ − α_ppm)/10⁶⌉.
    * k > n (α too small for the calibration size) reads qhat = NULL —
    * the honest "infinite interval", never a clamped max. Ties and
    * determinism: ascending (score, `idCol`), the
    * [[Sampling.exactQuantilesByKey]] rule. NULL scores drop.
    * Returns one row per key — INCLUDING keys whose k exceeds n —
    * (keyCol, n, k_rank, qhat).
    *
    * Scale shape: the range-bucketed distributed rank (per-(key,
    * bucket) row_number + broadcast bucket offsets — no key ever
    * becomes one window partition) + one broadcast per-key count
    * join; one output row per key. */
  def conformalQuantile(df: DataFrame, keyCol: String, scoreCol: String,
      idCol: String, alphaPpm: Long, globalBuckets: Int = 32): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 999999,
      s"alphaPpm must be in [1, 999999], got $alphaPpm")
    val clean = df.filter(col(scoreCol).isNotNull)
      .select(col(keyCol), col(scoreCol).cast("long").as("__s"),
        col(idCol).as("__id"))
      .withColumn("__q", col("__s").cast("double"))
    val withB = clean.withColumn("__bkt",
      Sampling.rangeBucketExpr(clean, col("__q"), globalBuckets))
    val wIn = Window.partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col("__s"), col("__id"))
    val rn = withB.withColumn("__rn", row_number().over(wIn).cast("long"))
    val tot = withB.groupBy(col(keyCol), col("__bkt"))
      .agg(count(lit(1)).as("__tot"))
    val offsets = tot.as("a")
      .join(broadcast(tot.as("b")),
        col("a." + keyCol) === col("b." + keyCol) &&
          col("b.__bkt") < col("a.__bkt"), "left")
      .groupBy(col("a." + keyCol).as(keyCol), col("a.__bkt").as("__bkt"))
      .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
    // k = ceil((n+1)·(1e6 − α)/1e6), exact integer ceil-div; per-key n
    // derives from the (key, bucket) cells — exact long sums of the
    // same counts, one fewer row-sized pass
    val nPerKey = tot.groupBy(col(keyCol))
      .agg(coalesce(sum(col("__tot")), lit(0L)).as("n"))
      .withColumn("k_rank",
        expr(s"((n + 1L) * ${1000000L - alphaPpm}L + 999999L) div 1000000L"))
    val hit = rn.join(broadcast(offsets), Seq(keyCol, "__bkt"))
      .join(broadcast(nPerKey), Seq(keyCol))
      .filter(col("__off") + col("__rn") === col("k_rank"))
      .select(col(keyCol), col("__s").as("qhat"))
    // keys with k > n keep their row with NULL qhat (infinite interval)
    nPerKey.join(hit, Seq(keyCol), "left")
      .select(col(keyCol), col("n"), col("k_rank"), col("qhat"))
  }
}
