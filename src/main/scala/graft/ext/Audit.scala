package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality auditing over arbitrary tables — the profiling pass a
  * pipeline runs on arrival (before trusting a new drop) and the
  * referential checks a warehouse runs after every load. Companions:
  * [[graft.operators.SkewJoin.keySkew]] (join-shape audit),
  * [[Sketches.histDriftTV]] (distribution drift),
  * [[graft.tools.DatasetCard]] (the curation-level summary).
  */
object Audit {

  /** Per-column cardinality/null PROFILE in ONE pass: every listed
    * column melts to (name, value-as-string) rows — one scan however
    * many columns — then a row/null aggregate and the portable HLL
    * distinct estimate (q91's machinery) per column. Strings keep the
    * engine-portable cast formats (ints, strings, dates, timestamps;
    * avoid raw doubles — their string forms are not portable).
    * Returns (col_name, n_rows, n_nulls, est_distinct). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    // row/null counts come from ONE narrow aggregate over the original
    // frame (no explode — rows and nulls don't need the melt); only
    // the HLL registers read the k-way exploded stream, once
    val statAggs = count(lit(1)).as("__n") +: cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"))
    val statRow = df.agg(statAggs.head, statAggs.tail: _*)
    val stats = statRow.select(explode(array(cols.map(c =>
        struct(lit(c).as("__col"), col("__n").as("n_rows"),
          col(s"__nn_$c").as("n_nulls"))): _*)).as("s"))
      .select(col("s.__col").as("__col"), col("s.n_rows"), col("s.n_nulls"))
    // hash-spread BEFORE the k-way melt: a single-file input is one
    // split, and the md5-per-value register pass would otherwise run
    // its map side in one task (the SCALE.md local-fixture rule; at
    // real scale the split count provides this for free)
    val pairs = df.repartition(cols.map(col): _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("__col"), col(c).cast("string").as("__v"))): _*)).as("p"))
      .select(col("p.__col").as("__col"), col("p.__v").as("__v"))
    val distincts = Sketches.hllDistinctCount(
      pairs.filter(col("__v").isNotNull), "__col", "__v")
    stats.join(distincts, Seq("__col"))
      .select(col("__col").as("col_name"), col("n_rows"), col("n_nulls"),
        col("est_distinct"))
  }

  /** Referential-integrity audit: child rows whose non-null foreign
    * key has no parent — per relationship, as one labeled count row.
    * A LEFT ANTI join per relationship (shuffle on the key, no row
    * amplification); NULL keys are not orphans (SQL semantics: an
    * absent reference, not a broken one). */
  def fkOrphans(relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "fkOrphans needs at least one relation")
    relations.map { case (name, child, childKey, parent, parentKey) =>
      child.filter(col(childKey).isNotNull)
        .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("fk"), col("n_orphans"))
    }.reduce(_ unionByName _)
  }

  /** Pairwise Pearson CORRELATION, engine-portable: the sufficient
    * statistics (n, Σx, Σx², Σxy) accumulate as EXACT decimals in one
    * aggregate pass, convert to double once, and compose into
    * r = (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) in a FIXED
    * operation order — so any engine reproduces the doubles bit for
    * bit (native `corr()` implementations use streaming updates whose
    * rounding is implementation-defined; this one is replayable).
    * Rows with a NULL in ANY listed column are dropped (listwise — a
    * shared n across pairs). Zero-variance pairs read NULL. Returns
    * (col_a, col_b, n, corr) for every pair col_a < col_b in the
    * given order. */
  def exactCorrelation(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "exactCorrelation needs at least two columns")
    val clean = df.na.drop(cols)
    // values scale to EXACT 10⁻⁴-precision integers (r is invariant
    // to positive linear scaling, so the readout is unchanged); the
    // per-row product stays inside int64 for |value| < ~9·10⁸, and
    // sums accumulate as decimal(38,0) — DuckDB's int64-backed
    // DECIMAL(18) overflows on a decimal×decimal product, integers
    // with hugeint/decimal(38) sums do not
    def d(c: String) = round(col(c) * lit(10000)).cast("long")
    val aggs = Seq(count(lit(1)).cast("double").as("__n")) ++
      cols.map(c => sum(d(c).cast("decimal(38,0)")).cast("double").as(s"__s_$c")) ++
      (for (i <- cols.indices; j <- i until cols.size) yield
        sum((d(cols(i)) * d(cols(j))).cast("decimal(38,0)"))
          .cast("double").as(s"__p_${i}_$j"))
    val row = clean.agg(aggs.head, aggs.tail: _*)
    val pairRows = for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val (a, b) = (cols(i), cols(j))
      val num = col("__n") * col(s"__p_${i}_$j") - col(s"__s_$a") * col(s"__s_$b")
      val da = sqrt(col("__n") * col(s"__p_${i}_$i") - col(s"__s_$a") * col(s"__s_$a"))
      val db = sqrt(col("__n") * col(s"__p_${j}_$j") - col(s"__s_$b") * col(s"__s_$b"))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").cast("long").as("n"),
        when(da * db === 0, lit(null).cast("double"))
          .otherwise(num / (da * db)).as("corr"))
    }
    row.select(explode(array(pairRows: _*)).as("r"))
      .select(col("r.col_a"), col("r.col_b"), col("r.n"), col("r.corr"))
  }

  /** Per-group LINEAR TREND (least-squares slope/intercept) from
    * integer-valued x/y columns, engine-portable like
    * [[exactCorrelation]]: int64 sufficient statistics (callers
    * pre-scale so per-row products fit — e.g. day index × milli
    * value), ONE double conversion, fixed operation order:
    * slope = (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²),
    * intercept = (Σy − slope·Σx)/n. The drift-over-time readout
    * ("is this source's quality sliding week over week"). Constant-x
    * groups read NULL slope. Returns
    * (groupCol, n, slope, intercept). */
  def groupedTrend(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val clean = df.na.drop(Seq(xCol, yCol))
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val sums = clean.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("double").as("__n"),
      sum(x.cast("decimal(38,0)")).cast("double").as("__sx"),
      sum(y.cast("decimal(38,0)")).cast("double").as("__sy"),
      sum((x * x).cast("decimal(38,0)")).cast("double").as("__sxx"),
      sum((x * y).cast("decimal(38,0)")).cast("double").as("__sxy"))
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val slope = (col("__n") * col("__sxy") - col("__sx") * col("__sy")) / den
    sums.select(col(groupCol), col("__n").cast("long").as("n"),
      when(den === 0, lit(null).cast("double")).otherwise(slope).as("slope"),
      when(den === 0, lit(null).cast("double"))
        .otherwise((col("__sy") - slope * col("__sx")) / col("__n"))
        .as("intercept"))
  }

  /** Gap-free DAILY spine over an aggregate: the contiguous calendar
    * between the data's min and max day, left-joined to the per-day
    * rollup with absent days zero-filled — the reporting-table shape
    * (a missing day must read 0, not vanish). The spine derives from
    * a 1-row bounds aggregate exploded driver-free via `sequence`. */
  def fillDailyGaps(daily: DataFrame, dateCol: String,
      fillCols: Seq[String]): DataFrame = {
    val bounds = daily.agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
    val spine = bounds.select(explode(
      sequence(col("__lo"), col("__hi"), expr("interval 1 day"))).as(dateCol))
    spine.join(daily, Seq(dateCol), "left")
      .na.fill(0L, fillCols)
  }

  /** A declarative data-quality CONSTRAINT (Deequ-style): `name`
    * labels the report row, `violated` is a boolean column that reads
    * true on a BAD row. Build with the [[Check]] combinators. */
  final case class Check(name: String, violated: Column)

  object Check {
    def notNull(c: String): Check =
      Check(s"not_null($c)", col(c).isNull)
    def inRange(c: String, lo: Double, hi: Double): Check =
      Check(s"in_range($c)", col(c).isNull || col(c) < lo || col(c) > hi)
    def inSet(c: String, values: Seq[String]): Check =
      Check(s"in_set($c)", col(c).isNull || !col(c).isin(values: _*))
    def matches(c: String, regex: String): Check =
      Check(s"matches($c)", col(c).isNull || !col(c).rlike(regex))
    def satisfies(name: String, predicate: Column): Check =
      Check(s"satisfies($name)", !coalesce(predicate, lit(false)))
  }

  /** Declarative data-CONTRACT validation (the Deequ/Great-Expectations
    * pass a warehouse runs on every load): all row-level [[Check]]s
    * evaluate in ONE scan — each is a conditional count inside a single
    * aggregate, so 20 constraints cost one pass, not 20 — plus one
    * key-group aggregate per `unique` key set (duplicates can't be a
    * row-local predicate). Returns one row per constraint:
    * (constraint, n_rows, n_violations, passed 0/1), in declaration
    * order via the constraint label. */
  def checkConstraints(df: DataFrame, checks: Seq[Check],
      unique: Seq[Seq[String]] = Nil): DataFrame = {
    require(checks.nonEmpty || unique.nonEmpty,
      "checkConstraints needs at least one constraint")
    val rowLevel: Option[DataFrame] =
      if (checks.isEmpty) None
      else {
        // count(when(..)) not sum(when(..)): count is 0 on an EMPTY
        // table where sum reads NULL — an empty drop still gets a
        // well-formed all-pass report
        val aggs = count(lit(1)).as("__n") +: checks.zipWithIndex.map {
          case (ck, i) => count(when(ck.violated, 1L)).as(s"__v_$i")
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        Some(row.select(explode(array(checks.zipWithIndex.map { case (ck, i) =>
            struct(lit(ck.name).as("constraint"), col("__n").as("n_rows"),
              col(s"__v_$i").as("n_violations"))
          }: _*)).as("r"))
          .select(col("r.constraint"), col("r.n_rows"), col("r.n_violations")))
      }
    val uniqueLevel: Seq[DataFrame] = unique.map { keys =>
      require(keys.nonEmpty, "unique constraint needs at least one column")
      // violations = rows beyond the first in any key group (NULL keys
      // participate: two all-NULL keys are duplicates for audit
      // purposes, unlike SQL UNIQUE — an audit wants them surfaced)
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c")), lit(0L)).as("__n"),
          coalesce(sum(col("__c") - 1L), lit(0L)).as("__d"))
        .select(lit(s"unique(${keys.mkString(",")})").as("constraint"),
          col("__n").as("n_rows"), col("__d").as("n_violations"))
    }
    (rowLevel.toSeq ++ uniqueLevel).reduce(_ unionByName _)
      .withColumn("passed",
        when(col("n_violations") === 0L, 1L).otherwise(0L))
  }

  /** Deterministic MODE (most frequent value) per group: the winner is
    * the highest count with ties broken to the SMALLEST value — one
    * (group, value) aggregate then one min(struct) per group, never a
    * rank window. NULL values are excluded (a mode of "missing" is a
    * [[columnProfile]] fact, not a mode). Returns
    * (groupCols…, mode_value, mode_count). */
  def modeOf(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "modeOf needs at least one group column")
    df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(struct((-col("__c")).as("nc"), col(valueCol).as("v"))).as("__best"))
      .select(groupCols.map(col) ++ Seq(
        col("__best.v").as("mode_value"),
        (-col("__best.nc")).as("mode_count")): _*)
  }

  /** FUNCTIONAL-DEPENDENCY audit (the profiling pass schema inference
    * and normalization both start from): for each candidate `lhs → rhs`
    * the determinant groups, how many map to MORE than one dependent
    * value, and the surplus mappings — `holds` = 1 iff no group
    * violates. One hash aggregate on the lhs key per dependency;
    * NULLs group like values (an audit wants NULL-keyed conflicts
    * surfaced, not skipped). Returns (dependency, n_groups,
    * n_violating, extra_mappings, holds). */
  def functionalDependencies(df: DataFrame,
      deps: Seq[(String, String)]): DataFrame = {
    require(deps.nonEmpty, "functionalDependencies needs at least one dependency")
    deps.map { case (lhs, rhs) =>
      df.groupBy(col(lhs))
        // struct() wrap: countDistinct skips bare NULLs, but a NULL
        // dependent is a real mapping for audit purposes
        .agg(countDistinct(struct(col(rhs))).as("__d"))
        .agg(count(lit(1)).as("n_groups"),
          count(when(col("__d") > 1L, 1L)).as("n_violating"),
          coalesce(sum(col("__d") - 1L), lit(0L)).as("extra_mappings"))
        .select(lit(s"$lhs->$rhs").as("dependency"),
          col("n_groups"), col("n_violating"), col("extra_mappings"),
          when(col("n_violating") === 0L, 1L).otherwise(0L).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** CANDIDATE-KEY discovery over declared column sets: each set's
    * distinct combination count against the row count — `is_key` = 1
    * iff the set identifies every row (the uniqueness half of key
    * discovery; minimality is the caller's reading of the report).
    * One distinct aggregate per set; NULL-containing combinations
    * count like values (audit semantics, as in [[checkConstraints]]
    * unique). Returns (key_cols, n_rows, n_distinct, is_key). */
  def candidateKeys(df: DataFrame, colSets: Seq[Seq[String]]): DataFrame = {
    require(colSets.nonEmpty, "candidateKeys needs at least one column set")
    colSets.map { cols =>
      require(cols.nonEmpty, "a candidate key needs at least one column")
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(struct(cols.map(col): _*)).as("n_distinct"))
        .select(lit(cols.mkString(",")).as("key_cols"),
          col("n_rows"), col("n_distinct"),
          when(col("n_rows") === col("n_distinct"), 1L).otherwise(0L)
            .as("is_key"))
    }.reduce(_ unionByName _)
  }

  /** Binary-classifier CONFUSION MATRIX swept over score thresholds
    * (the eval readout for the q113/q117 quality models): one narrow
    * |thresholds|-way explode + ONE hash aggregate gives tp/fp/fn/tn
    * per threshold, with precision/recall/F1 as floor-ppm integers —
    * F1 via its tp-form 2·tp·10⁶ div (2·tp + fp + fn), so the whole
    * report is engine-exact (no double division chains). Thresholds
    * are MILLI-units compared against `score·1000` (one IEEE multiply,
    * identical rounding everywhere). NULL scores/labels drop. */
  def binaryConfusion(df: DataFrame, scoreCol: String, labelCol: String,
      thresholdsMilli: Seq[Long]): DataFrame = {
    require(thresholdsMilli.nonEmpty, "binaryConfusion needs thresholds")
    val pred = col(scoreCol) * lit(1000.0) >= col("threshold_milli")
    val pos = col(labelCol) === 1L
    df.na.drop(Seq(scoreCol, labelCol))
      .select(explode(array(thresholdsMilli.map(lit(_)): _*))
        .as("threshold_milli"), col(scoreCol), col(labelCol))
      .groupBy(col("threshold_milli"))
      .agg(
        count(when(pred && pos, 1L)).as("tp"),
        count(when(pred && !pos, 1L)).as("fp"),
        count(when(!pred && pos, 1L)).as("fn"),
        count(when(!pred && !pos, 1L)).as("tn"))
      .select(col("threshold_milli"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") === 0L, 0L)
          .otherwise(expr("(tp * 1000000L) div (tp + fp)")).as("precision_ppm"),
        when(col("tp") + col("fn") === 0L, 0L)
          .otherwise(expr("(tp * 1000000L) div (tp + fn)")).as("recall_ppm"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") === 0L, 0L)
          .otherwise(expr("(2L * tp * 1000000L) div (2L * tp + fp + fn)")).as("f1_ppm"))
  }

  /** K-ANONYMITY audit over quasi-identifier columns (the privacy
    * check a training-data release runs before shipping anything
    * user-derived): rows whose quasi-identifier combination is shared
    * by fewer than `k` rows are re-identifiable. One aggregate on the
    * QI key builds the group sizes, a second collapses them to the
    * size histogram — (group_size, n_groups, n_rows, at_risk 0/1) —
    * and the caller reads risk exposure as Σ n_rows where at_risk.
    * NULL QI values form their own groups (they still identify).
    * State after the first aggregate is #distinct-QI rows, never the
    * data. */
  def kAnonymity(df: DataFrame, quasiIdentifiers: Seq[String],
      k: Long = 5L): DataFrame = {
    require(quasiIdentifiers.nonEmpty, "kAnonymity needs at least one QI column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiIdentifiers.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("group_size"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__sz")).as("n_rows"))
      .withColumn("at_risk",
        when(col("group_size") < k, 1L).otherwise(0L))
  }

  /** L-DIVERSITY audit — [[kAnonymity]]'s companion (Machanavajjhala
    * et al. 2007): a QI group can be large (k-anonymous) yet still
    * leak if everyone in it shares the SAME sensitive value, so the
    * unit of risk is the number of DISTINCT sensitive values per
    * group. One aggregate on the QI key computes per-group size and
    * sensitive-distinct count, a second collapses to the diversity
    * histogram — (diversity, n_groups, n_rows, at_risk 0/1 where
    * diversity < l). NULL sensitive values don't count as a distinct
    * value (an absent attribute discloses nothing); NULL QI values
    * form their own groups, as in [[kAnonymity]]. */
  def lDiversity(df: DataFrame, quasiIdentifiers: Seq[String],
      sensitiveCol: String, l: Long = 2L): DataFrame = {
    require(quasiIdentifiers.nonEmpty, "lDiversity needs at least one QI column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiIdentifiers.map(col): _*)
      .agg(count(lit(1)).as("__sz"),
        countDistinct(col(sensitiveCol)).as("__div"))
      .groupBy(col("__div").as("diversity"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("__sz")).as("n_rows"))
      .withColumn("at_risk",
        when(col("diversity") < l, 1L).otherwise(0L))
  }

  /** T-CLOSENESS audit — the third rung of the privacy ladder after
    * [[kAnonymity]] (group size) and [[lDiversity]] (distinct
    * sensitive values): a group can be large AND diverse yet still
    * leak by SKEW — 19 of 20 members sharing one salary band tells an
    * attacker plenty. Li, Li & Venkatasubramanian (ICDE 2007) bound
    * the distance between each QI group's sensitive-value
    * distribution and the global one; this implementation reports
    * that distance as TOTAL VARIATION in exact floor ppm (the
    * categorical form of [[Sketches.histDriftTV]]'s binned drift):
    *
    *   tv = ½ Σ_v |c_g(v)/n_g − c(v)/N|
    *      = Σ_v |c_g(v)·N − c(v)·n_g| / (2·n_g·N)   — one rational.
    *
    * The numerator sums in DECIMAL(38,0) over the values PRESENT in
    * the group; values the group misses contribute (N − Σ_matched
    * c(v))·n_g arithmetically — no group×value grid join. One ppm
    * floor division at the end ([[PortableDiv.nonNeg]]); a DuckDB
    * oracle replays every bit. Rows with NULL sensitive values drop
    * from BOTH distributions (an absent attribute discloses nothing
    * — the [[lDiversity]] rule); NULL QI values form their own
    * groups. Returns one row per QI group: (QI cols, n, tv_ppm).
    *
    * Scale shape: one (QI, value) cell aggregate collapses the data;
    * the global value table (value-domain-sized) and the scalar N
    * broadcast onto the cells; one QI-keyed aggregate finishes. */
  def tCloseness(df: DataFrame, quasiIdentifiers: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiIdentifiers.nonEmpty, "tCloseness needs at least one QI column")
    val Dec = "decimal(38,0)"
    val qi = quasiIdentifiers.map(col)
    val base = df.filter(col(sensitiveCol).isNotNull)
    val glob = base.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__gc"))
    // "__tot", not "__N": Spark resolves names case-INsensitively, so
    // a __N column would collide with the per-group __n
    val n = glob.agg(sum(col("__gc")).cast(Dec).as("__tot"))
    // group size via a QI-partitioned window over the CELL frame
    // (domain-sized), not a join — window partitioning groups NULL QI
    // values together, preserving the NULL-QI-is-its-own-group rule a
    // usingColumns equi-join would silently drop
    val wg = Window.partitionBy(qi: _*)
    val cells = base
      .groupBy(qi :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__n", sum(col("__c")).over(wg))
      .join(broadcast(glob), Seq("__v"))
      .crossJoin(broadcast(n))
    val perGroup = cells.groupBy(qi: _*)
      .agg(min(col("__n")).as("n"),
        min(col("__tot")).as("__tot"),
        sum(abs(col("__c").cast(Dec) * col("__tot") -
          col("__gc").cast(Dec) * col("__n"))).cast(Dec).as("__present"),
        sum(col("__gc")).cast(Dec).as("__gmatch"))
    // absent values contribute c(v)·n_g each: (N − Σ_matched c(v))·n_g
    val num = (col("__present") +
      (col("__tot") - col("__gmatch")) * col("n").cast(Dec)).cast(Dec)
    perGroup.select(qi ++ Seq(col("n"),
      PortableDiv.nonNeg(num * lit(1000000L),
        lit(2L).cast(Dec) * col("n") * col("__tot")).as("tv_ppm")): _*)
  }

  /** K-ANONYMITY GENERALIZATION LATTICE — the release-planning step
    * [[kAnonymity]]'s audit feeds (Samarati/Sweeney; the search space
    * of Incognito, LeFevre et al. 2005): given per-QI generalization
    * LADDERS (level 0 = the raw value; each further level a COARSER
    * deterministic function of it — zip prefixes, value bands, full
    * suppression), evaluate EVERY lattice node (one level choice per
    * QI) and report its anonymity profile, so the publisher picks the
    * least-general node that clears k. Returns one row per node:
    * (lvl_<qi>…, n_groups, min_group_size, n_at_risk_rows,
    * k_anonymous 0/1) — n_at_risk_rows = rows in groups smaller than
    * k, the re-identification exposure at that node.
    *
    * Contract: each level expression must be a deterministic function
    * of that QI's LEVEL-0 VALUE (the joint level-0 tuple at the
    * loosest) — not merely "of the same row": the cell pass below
    * groups by the level-0 values and carries every coarser level as
    * a per-cell constant, so a level that reads any NON-QI column
    * would silently misprofile the node. The contract is VALIDATED in
    * the same pass (per-cell min = max and constant null-ness per
    * generalized level; a violating ladder fails loudly at execution
    * instead of returning wrong n_groups). Levels of one
    * QI need not nest, but coarser levels only make sense if they do;
    * NULL raw values form their own groups (the [[kAnonymity]] rule —
    * NULL still identifies).
    *
    * Scale shape: ONE data-sized aggregate to the raw-QI cell frame
    * (every generalized value is constant per cell, so min() carries
    * it), then the ≤`maxNodes` lattice explodes the DOMAIN-sized cell
    * frame — cells × nodes rows, never data × nodes — into one
    * (node, values) aggregate and one node summary. The data is read
    * once no matter how many nodes the lattice has. */
  def kAnonymityLattice(df: DataFrame, specs: Seq[(String, Seq[Column])],
      k: Long = 5L, maxNodes: Int = 64): DataFrame = {
    latticeRequire(specs, k, maxNodes)
    val combos = specs.map(_._2.indices.toSeq)
      .foldLeft(Seq(Seq.empty[Int]))((acc, ls) => acc.flatMap(a => ls.map(a :+ _)))
    latticeSummarize(latticeCells(df, specs), specs, combos, k)
  }

  private def latticeRequire(specs: Seq[(String, Seq[Column])], k: Long,
      maxNodes: Int): Unit = {
    require(specs.nonEmpty, "kAnonymityLattice needs at least one QI ladder")
    require(k >= 2, s"k must be >= 2, got $k")
    require(specs.forall(_._2.nonEmpty), "every QI needs at least level 0")
    val nNodes = specs.map(_._2.size.toLong).product
    require(nNodes <= maxNodes,
      s"lattice has $nNodes nodes (> maxNodes=$maxNodes) — prune the " +
      "ladders (Incognito-style) or raise maxNodes knowingly")
  }

  /** The ONE data-sized pass shared by the lattice methods: finest
    * cells keyed by the level-0 values, every coarser level carried as
    * a validated per-cell constant (see [[kAnonymityLattice]]). */
  private def latticeCells(df: DataFrame,
      specs: Seq[(String, Seq[Column])]): DataFrame = {
    val names = specs.map(_._1)
    // one narrow projection carries every (qi, level) generalization
    val proj = df.select(specs.flatMap { case (n, lvls) =>
      lvls.zipWithIndex.map { case (c, i) =>
        c.cast("string").as(s"__g_${n}_$i") }
    }: _*)
    // finest cells: group by the level-0 values; every other level is
    // a function of them, so min() reads the per-cell constant — and
    // max()/count() ride along to VALIDATE that contract (min <=> max
    // catches two distinct values; count(lvl) ∈ {0, count(*)} catches
    // nullness varying within a cell, which min/max skip over)
    val lvlKeys = specs.flatMap { case (n, lvls) =>
      (1 until lvls.size).map(i => (n, i)) }
    val reps = lvlKeys.flatMap { case (n, i) => Seq(
      min(col(s"__g_${n}_$i")).as(s"__g_${n}_$i"),
      max(col(s"__g_${n}_$i")).as(s"__mx_${n}_$i"),
      count(col(s"__g_${n}_$i")).as(s"__cn_${n}_$i")) }
    val counted = count(lit(1)).as("__c")
    val cellsRaw = proj
      .groupBy(names.map(n => col(s"__g_${n}_0")): _*)
      .agg(reps.headOption.getOrElse(counted),
        (if (reps.isEmpty) Seq.empty else reps.tail :+ counted): _*)
    // the guard rides INSIDE the carried value (a detached assertion
    // column would be pruned away before it could fire)
    val cells = lvlKeys.foldLeft(cellsRaw) { case (acc, (n, i)) =>
      val g = col(s"__g_${n}_$i")
      val ok = (g <=> col(s"__mx_${n}_$i")) &&
        (col(s"__cn_${n}_$i") === 0L || col(s"__cn_${n}_$i") === col("__c"))
      acc.withColumn(s"__g_${n}_$i", when(ok, g).otherwise(raise_error(
          lit(s"kAnonymityLattice: level $i of QI '$n' is not a " +
            "deterministic function of the level-0 value (a level-0 " +
            "cell holds multiple generalized values)"))))
        .drop(s"__mx_${n}_$i", s"__cn_${n}_$i")
    }
    cells
  }

  /** Evaluate the given lattice NODES over the domain-sized cell frame
    * (cells × |combos| exploded rows, never data × nodes) — the
    * two-aggregate tail shared by the lattice methods. */
  private def latticeSummarize(cells: DataFrame,
      specs: Seq[(String, Seq[Column])], combos: Seq[Seq[Int]],
      k: Long): DataFrame = {
    val names = specs.map(_._1)
    val nodeLit = array(combos.map(c => struct(c.zip(names).map {
      case (l, n) => lit(l).as(s"lvl_$n") }: _*)): _*)
    val chosen = specs.map { case (n, lvls) =>
      lvls.indices.map(i => (i, col(s"__g_${n}_$i")))
        .foldLeft(lit(null).cast("string")) { case (acc, (i, c)) =>
          when(col("__node").getField(s"lvl_$n") === i, c).otherwise(acc) }
        .as(s"__v_$n") }
    val groups = cells.withColumn("__node", explode(nodeLit))
      .select(col("__node") +: col("__c") +: chosen: _*)
      .groupBy(col("__node") +: names.map(n => col(s"__v_$n")): _*)
      .agg(sum(col("__c")).as("__sz"))
    groups.groupBy(col("__node"))
      .agg(count(lit(1)).as("n_groups"),
        min(col("__sz")).cast("long").as("min_group_size"),
        sum(when(col("__sz") < k, col("__sz")).otherwise(0L))
          .cast("long").as("n_at_risk_rows"))
      .select(names.map(n =>
          col("__node").getField(s"lvl_$n").cast("long").as(s"lvl_$n")) ++
        Seq(col("n_groups"), col("min_group_size"), col("n_at_risk_rows"),
          when(col("min_group_size") >= k, 1L).otherwise(0L)
            .as("k_anonymous")): _*)
  }

  /** INCOGNITO-PRUNED lattice sweep (LeFevre et al. 2005, the
    * monotonicity half): k-anonymity is MONOTONE up a NESTED
    * generalization lattice — coarsening any QI only merges groups, so
    * group sizes only grow — therefore once a node clears k, every
    * node that dominates it (componentwise ≥ levels) clears k too and
    * need never be evaluated. [[kAnonymityLattice]] evaluates all
    * ∏(levels) nodes; this sweeps bottom-up by lattice height (Σ of
    * levels), evaluates only the nodes no already-anonymous node
    * dominates, and INFERS the rest. With more QI columns/levels the
    * full lattice is exponential while the frontier of minimal
    * k-anonymous nodes — exactly what a publisher picks from — stays
    * small, so the pruned sweep is the 100 TB-release answer.
    *
    * Returns one row per node, full-lattice coverage:
    * (lvl_<qi>…, n_groups, min_group_size, n_at_risk_rows,
    * k_anonymous, evaluated). Inferred nodes carry k_anonymous = 1
    * with NULL profile columns (their exact profile was never
    * computed — that is the point); `evaluated` is deterministic
    * given the data: a node is evaluated iff NO strictly-dominated
    * node is k-anonymous (the oracle replays it in closed form).
    * Σ(1 − evaluated) × cells is the explode work saved.
    *
    * STRICTER CONTRACT than the full sweep: ladders must NEST (each
    * level a deterministic function of the PREVIOUS level, not merely
    * of level 0) — monotonicity, the pruning license, fails for
    * non-nested ladders. Nesting is VALIDATED eagerly on the
    * domain-sized cell frame (one small aggregate per consecutive
    * level pair); a violating ladder fails loudly by name.
    *
    * Scale shape: the data-sized cell pass runs ONCE (persisted for
    * the sweep, released before returning — results are collected:
    * ≤ maxNodes ≤ 4096 rows, a deliberate driver bound); each height
    * is one explode job over cells × that height's UNPRUNED nodes. */
  def kAnonymityLatticePruned(df: DataFrame,
      specs: Seq[(String, Seq[Column])], k: Long = 5L,
      maxNodes: Int = 4096): DataFrame = {
    latticeRequire(specs, k, maxNodes)
    require(maxNodes <= 4096,
      s"maxNodes must be <= 4096 (results collect driver-side), got $maxNodes")
    val names = specs.map(_._1)
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel
    val cells = latticeCells(df, specs).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // nesting validation (NULL-safe: a sentinel no cast("string")
      // value can produce stands in for NULL so countDistinct sees it)
      specs.foreach { case (n, lvls) =>
        (0 until lvls.size - 1).foreach { i =>
          val bad = cells.groupBy(col(s"__g_${n}_$i"))
            .agg(countDistinct(coalesce(col(s"__g_${n}_${i + 1}"),
              lit("\u0000NULL"))).as("__d"))
            .filter(col("__d") > 1L).limit(1).count()
          require(bad == 0L,
            s"kAnonymityLatticePruned: QI '$n' level ${i + 1} does not " +
            s"NEST in level $i (one level-$i value generalizes to " +
            "multiple level-" + (i + 1) + " values) — monotonicity, " +
            "the pruning license, needs nested ladders; use " +
            "kAnonymityLattice for non-nested ones")
        }
      }
      val combos = specs.map(_._2.indices.toSeq)
        .foldLeft(Seq(Seq.empty[Int]))((acc, ls) => acc.flatMap(a => ls.map(a :+ _)))
      def dominates(a: Seq[Int], c: Seq[Int]): Boolean =
        a != c && a.lazyZip(c).forall(_ <= _)
      val anon = scala.collection.mutable.ArrayBuffer.empty[Seq[Int]]
      val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      def jl(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
      combos.groupBy(_.sum).toSeq.sortBy(_._1).foreach { case (_, atH) =>
        val (inferred, toEval) = atH.partition(c => anon.exists(dominates(_, c)))
        inferred.foreach { c =>
          anon += c
          rows += org.apache.spark.sql.Row.fromSeq(c.map(l => jl(l.toLong)) ++
            Seq(null, null, null, jl(1L), jl(0L)))
        }
        if (toEval.nonEmpty) {
          latticeSummarize(cells, specs, toEval, k).collect().foreach { r =>
            val c = names.map(n => r.getAs[Long](s"lvl_$n").toInt)
            if (r.getAs[Long]("k_anonymous") == 1L) anon += c
            rows += org.apache.spark.sql.Row.fromSeq(c.map(l => jl(l.toLong)) ++ Seq(
              jl(r.getAs[Long]("n_groups")),
              jl(r.getAs[Long]("min_group_size")),
              jl(r.getAs[Long]("n_at_risk_rows")),
              jl(r.getAs[Long]("k_anonymous")), jl(1L)))
          }
        }
      }
      val schema = org.apache.spark.sql.types.StructType(
        names.map(n => org.apache.spark.sql.types.StructField(
          s"lvl_$n", org.apache.spark.sql.types.LongType, nullable = false)) ++
        Seq("n_groups", "min_group_size", "n_at_risk_rows").map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.LongType, nullable = true)) ++
        Seq("k_anonymous", "evaluated").map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.LongType, nullable = false)))
      spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava, schema)
    } finally { cells.unpersist(); () }
  }

  /** ORDER-INDEPENDENT table fingerprint — the cross-engine checksum a
    * 100 TB migration verifies with (copy the data, fingerprint both
    * sides in their native engines, compare two numbers — never ship
    * rows): each row canonicalizes to '|'-joined strings (NULL → the
    * literal '\N', so NULL and absent differ and the empty string stays
    * distinct), hashes through the portable 56-bit md5 prefix, and the
    * hashes SUM (commutative ⇒ row order and partitioning are
    * irrelevant) in DECIMAL(38,0) — exact far past int64 at 10¹² rows —
    * reported mod 2⁶² alongside the row count. Collision odds for an
    * accidental mismatch-hiding cancellation are ~2⁻⁶², and any engine
    * with md5 + 128-bit sums replays it bit for bit.
    *
    * Callers pass CANONICAL columns: integers/strings/dates cast
    * portably; quantize doubles first (cents/milli) — raw double
    * string forms differ across engines. */
  def fingerprint(df: DataFrame, cols: Seq[Column],
      seed: Long = 42L): DataFrame = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val canon = concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit("\\N"))): _*)
    val h = conv(substring(md5(
        concat_ws("|", lit(seed.toString), canon)), 1, 14), 16, 10)
      .cast("long")
    df.agg(count(lit(1)).as("n_rows"),
        sum(h.cast("decimal(38,0)")).as("__s"))
      .select(col("n_rows"),
        pmod(col("__s"), lit(4611686018427387904L).cast("decimal(38,0)"))
          .cast("long").as("checksum"))
  }

  /** CONCENTRATION audit: the Herfindahl–Hirschman index of a
    * nonnegative measure over a key — "is revenue (tokens, traffic)
    * dangerously concentrated in a few customers (domains, sources)?"
    * — the scalar q195's per-source share table rolls up to.
    * HHI = Σ(sᵢ/S)² reported as floor ppm (10⁶ = monopoly; 10⁶/n =
    * perfectly even), plus the single largest share. Sums and the
    * Σsᵢ² product ride DECIMAL(38,0); the two floor divisions are
    * exact ([[PortableDiv.nonNeg]] — caller supplies a NONNEGATIVE
    * measure; negative weights make shares meaningless and are the
    * caller's contract to exclude). NULL measures drop. Returns ONE
    * row: (n_keys, total, hhi_ppm, top_share_ppm).
    *
    * Scale shape: one key aggregate + one reduction row — map-side
    * partials end to end. */
  def concentration(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val Dec = "decimal(38,0)"
    val per = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(col(valueCol).cast(Dec)).cast(Dec).as("__s"))
    per.agg(count(lit(1)).as("n_keys"),
        sum(col("__s")).cast(Dec).as("__S"),
        sum(col("__s") * col("__s")).cast(Dec).as("__s2"),
        max(col("__s")).cast(Dec).as("__top"))
      .select(col("n_keys"), col("__S").cast("long").as("total"),
        PortableDiv.nonNeg(col("__s2") * lit(1000000L),
          col("__S") * col("__S")).as("hhi_ppm"),
        PortableDiv.nonNeg(col("__top") * lit(1000000L), col("__S"))
          .as("top_share_ppm"))
  }

  /** HELLINGER drift per group — the second distance on the drift
    * dashboard next to [[tCloseness]]'s total variation: TV reads
    * worst-case mass movement, Hellinger (via the Bhattacharyya
    * coefficient BC = Σ_v √(p_v·q_v)) reads geometric overlap and
    * punishes support mismatch harder. Per (group, value) cell the
    * BC term √((c/n_g)·(C/N)) evaluates as ONE IEEE double
    * expression over exact integers (√ is correctly rounded — the
    * z-test discipline), floors to micro units, and integer-sums per
    * group (order-independent); values a group lacks contribute
    * exactly 0 (√(0·q) = 0), so — unlike TV — absent cells need no
    * arithmetic correction. H² = 1 − BC in ppm; `hellinger_milli` =
    * ⌊√(h2_ppm)⌋ (≡ ⌊1000·√(H²)⌋ exactly, since 1000/√10⁶ = 1).
    * NULL sensitive values drop; NULL group keys form their own
    * group (window partitioning, the tCloseness rule). Returns one
    * row per group: (groupCols…, n, bc_ppm, h2_ppm, hellinger_milli).
    *
    * Scale shape: one (group, value) cell aggregate is the only
    * data-sized pass; group sizes ride a group-partitioned window
    * over the CELL frame; the global value table and N broadcast. */
  def hellingerDrift(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "hellingerDrift needs at least one group column")
    val Dec = "decimal(38,0)"
    val g = groupCols.map(col)
    val base = df.filter(col(valueCol).isNotNull)
    val glob = base.groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__gc"))
    val n = glob.agg(sum(col("__gc")).cast(Dec).as("__tot"))
    val wg = Window.partitionBy(g: _*)
    val cells = base
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__n", sum(col("__c")).over(wg))
      .join(broadcast(glob), Seq("__v"))
      .crossJoin(broadcast(n))
    val term = floor(lit(1000000.0) * sqrt(
      (col("__c").cast("double") / col("__n").cast("double")) *
      (col("__gc").cast("double") / col("__tot").cast("double"))))
      .cast("long")
    cells.withColumn("__bc", term)
      .groupBy(g: _*)
      .agg(min(col("__n")).as("n"), sum(col("__bc")).as("bc_ppm"))
      .select(g ++ Seq(col("n"), col("bc_ppm"),
        (lit(1000000L) - col("bc_ppm")).as("h2_ppm"),
        floor(sqrt((lit(1000000L) - col("bc_ppm")).cast("double")))
          .cast("long").as("hellinger_milli")): _*)
  }
}
