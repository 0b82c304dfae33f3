package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event analytics over the event stream — the product-
  * analytics query family (cohort retention, conversion funnels) that
  * every event pipeline ends up hand-rolling. Companions to the
  * time-domain operators in [[graft.streaming.Streams]] (sessionize)
  * and [[History]] (SCD2): those reshape the timeline, these aggregate
  * user trajectories.
  *
  * Scale shape: every step is a hash aggregate or equi-join ON THE
  * USER KEY — one partitioning reused end-to-end, no windows over the
  * event stream, no driver state. Event-type filters prune before any
  * exchange.
  */
object Behavior {

  /** Cohort RETENTION matrix: users bucketed by the calendar date of
    * their first event (the cohort), counted on each later active day
    * as an offset from that date — the "day-N retention" table.
    * Returns (cohort_date date, offset_days long, n_users long);
    * offset 0 is the cohort's own size. A user counts once per
    * (cohort, offset) however many events they fired that day. */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    events.select(col(userCol), to_date(col(tsCol)).as("__d"))
      .join(first, Seq(userCol))
      .select(col(userCol), col("cohort_date"),
        datediff(col("__d"), col("cohort_date")).cast("long").as("offset_days"))
      .distinct()
      .groupBy(col("cohort_date"), col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Deterministic A/B experiment readout: users are assigned to
    * `variants` arms by the PORTABLE hash of their key (stable across
    * retries, engines, and cluster layouts — the assignment IS the
    * audit trail, no assignment table to lose), conversion = the user
    * fired `convType` at least once. Integer-exact rates (ppm, floor
    * division — the repo-wide idiom). Returns
    * (variant long, n_users, n_converted, rate_ppm). */
  def abSplit(events: DataFrame, userCol: String, typeCol: String,
      convType: String, variants: Int = 2, seed: Long = 42L): DataFrame = {
    require(variants >= 2, s"variants must be >= 2, got $variants")
    val users = events.select(col(userCol)).distinct()
      .withColumn("variant",
        pmod(Sampling.portableHash(col(userCol), seed), lit(variants.toLong)))
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol)).distinct().withColumn("__c", lit(1L))
    users.join(conv, Seq(userCol), "left")
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("__c"), lit(0L))).as("n_converted"))
      .withColumn("rate_ppm", expr("(n_converted * 1000000L) div n_users"))
  }

  /** Next-event TRANSITION matrix: per user, events ordered by
    * (`tsCol`, `tieCol`) yield (from → to) adjacent pairs; counts per
    * pair plus the row-normalized transition probability (ppm, floor
    * division) — the first-order Markov summary of user behavior
    * (where do sessions go after a click?). One window on the user
    * partitioning, then a pair aggregate; the per-from totals frame
    * (≤ |event types| rows) broadcasts back. Returns
    * (from_type, to_type, cnt, p_ppm). */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("cnt")).as("__tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("cnt"),
        expr("(cnt * 1000000L) div __tot").as("p_ppm"))
  }

  /** RATE-ANOMALY flagging (the bot heuristic): each user's PEAK
    * event rate — the max number of events inside any trailing
    * `windowSeconds` interval — computed with one microsecond-exact
    * RANGE frame on the user partitioning (the q148 machinery), then
    * thresholded. A human clicks; a scraper bursts — the peak
    * trailing count separates them far more sharply than a daily
    * total. Returns (userCol, peak_rate long, is_anomaly long 0/1).
    */
  def rateAnomalies(events: DataFrame, userCol: String, tsCol: String,
      windowSeconds: Long, threshold: Long): DataFrame = {
    require(windowSeconds >= 1 && threshold >= 1,
      s"need positive window/threshold, got ($windowSeconds, $threshold)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-(windowSeconds * 1000000L - 1), 0)
    events
      .withColumn("__r", count(lit(1)).over(w))
      .groupBy(col(userCol))
      .agg(max(col("__r")).as("peak_rate"))
      .withColumn("is_anomaly",
        when(col("peak_rate") >= threshold, 1L).otherwise(0L))
  }

  /** CUSUM CHANGEPOINT detection on per-period counts, all-integer:
    * for each group, the period whose cumulative deviation
    * |Σ_{k≤d} (cnt_k·P − total)| is maximal (P = #periods, total =
    * Σcnt — the mean is kept RATIONAL by scaling through P, so the
    * statistic is exact integers any engine replays). The "when did
    * this event type change level" audit; a flat series scores near
    * zero, a level shift peaks at the shift. One window over the
    * per-group PERIOD series (≤ |periods| rows per group — state-
    * sized, the data collapsed first). Ties break to the earliest
    * period. Returns (groupCol, change_period, cusum_score). */
  def cusumChangepoint(events: DataFrame, groupCol: String,
      tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__p"))
    val daily = events
      .groupBy(col(groupCol), to_date(col(tsCol)).as("__p"))
      .agg(count(lit(1)).as("__c"))
    val totals = daily.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("__tot"), count(lit(1)).as("__np"))
    daily.join(totals, Seq(groupCol))
      .withColumn("__cusum",
        sum(col("__c") * col("__np") - col("__tot")).over(w))
      .withColumn("__score", abs(col("__cusum")))
      .groupBy(col(groupCol))
      .agg(min(struct((-col("__score")).as("s"), col("__p").as("p"))).as("__best"))
      .select(col(groupCol), col("__best.p").as("change_period"),
        (-col("__best.s")).as("cusum_score"))
  }

  /** Market-basket ASSOCIATION rules over (basket, item) rows: for
    * each ordered item pair (a → b), support, confidence, and lift as
    * floor-integer ppm/milli — "baskets containing a also contain b".
    *
    *  - support_ppm  = |a∧b|·10⁶ div |baskets|
    *  - conf_ppm     = |a∧b|·10⁶ div |a|
    *  - lift_milli   = conf_ppm·|baskets| div |b| div 1000
    *    (>1000 ⇒ positive association; DEFINED as this division
    *    composition, the repo-wide portable-integer idiom)
    *
    * Scale shape: baskets collapse to distinct (basket, item) rows,
    * pairs generate per basket via a self-join ON THE BASKET KEY
    * (bounded by per-basket item count — baskets are small by nature;
    * a degenerate mega-basket would need a per-key cap upstream),
    * item totals broadcast back. `minSupport` prunes BEFORE output.
    * Returns (item_a, item_b, n_ab, support_ppm, conf_ppm,
    * lift_milli). */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long = 1L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    // persisted: four consumers read the distinct (basket, item) frame
    // (basket total, item totals, both pair-join sides) — unpersisted,
    // the upstream distinct would replay per consumer. Session-owned
    // blocks (the marginMine lifecycle rule). The basket total rides a
    // broadcast 1-row aggregate instead of a driver-side count(): the
    // operator stays fully LAZY and composes without firing a job at
    // construction time (the histDriftTV grandTotal shape).
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__i").isNotNull).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nb = items.agg(countDistinct(col("__b")).as("__nbk"))
    val itemCounts = items.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val pairs = items.select(col("__b"), col("__i").as("item_a"))
      .join(items.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") =!= col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(broadcast(itemCounts.select(col("__i").as("item_a"), col("__ni").as("__na"))), Seq("item_a"))
      .join(broadcast(itemCounts.select(col("__i").as("item_b"), col("__ni").as("__nb"))), Seq("item_b"))
      .crossJoin(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        expr("(n_ab * 1000000L) div __nbk").as("support_ppm"),
        expr("(n_ab * 1000000L) div __na").as("conf_ppm"),
        expr("(((n_ab * 1000000L) div __na) * __nbk) div __nb div 1000")
          .as("lift_milli"))
  }

  /** Ordered conversion FUNNEL: how many users performed the stages in
    * sequence — stage k counts users whose earliest stage-k event
    * strictly follows their committed stage-(k−1) time (the standard
    * first-touch funnel; re-orderings don't count, repeats collapse to
    * the earliest qualifying event).
    *
    * One conditional-aggregation pass per stage over the user key —
    * stages.length tiny scans, never a per-user sequence sort.
    * Returns (stage long, event_type string, n_users long), stage
    * 1-indexed in funnel order. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String],
      maxGap: Option[String] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, "funnel stages must be distinct")
    // optional WINDOWED funnel: stage k must land within `maxGap` of
    // the committed stage-(k−1) time (the "converted within an hour"
    // refinement); unbounded when absent
    val gap = maxGap.map(g => expr(s"INTERVAL $g"))
    // per user: earliest qualifying time per stage, built left-to-right
    val perUser = stages.zipWithIndex.foldLeft(
      events.select(col(userCol)).distinct()) { case (acc, (stage, i)) =>
      val evs = events.filter(col(typeCol) === stage)
        .select(col(userCol), col(tsCol).as("__t"))
      val qualified =
        if (i == 0) evs
        else {
          val joined = evs
            .join(acc.select(col(userCol), col(s"__s${i - 1}")), Seq(userCol))
            .filter(col("__t") > col(s"__s${i - 1}"))
          gap.fold(joined)(g => joined.filter(col("__t") <= col(s"__s${i - 1}") + g))
            .select(col(userCol), col("__t"))
        }
      acc.join(
        qualified.groupBy(col(userCol)).agg(min(col("__t")).as(s"__s$i")),
        Seq(userCol), "left")
    }
    // coalesce-0: sum() over an EMPTY user spine is NULL, and a funnel
    // over an empty stream must read 0 at every stage, not NULL
    val counts = perUser.select(
      (0 until stages.size).map(i =>
        coalesce(sum(when(col(s"__s$i").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as(s"__n$i")): _*)
    val stageRows = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i + 1L).as("stage"), lit(stage).as("event_type"),
        col(s"__n$i").as("n_users"))
    }
    counts.select(explode(array(stageRows: _*)).as("r"))
      .select(col("r.stage"), col("r.event_type"), col("r.n_users"))
  }

  /** RFM SEGMENTATION over an order stream: per customer, Recency
    * (latest order time), Frequency (order count), and Monetary
    * (decimal-exact spend) are each cut into `tiles` quantile bands
    * with tile 1 = BEST (most recent / most orders / highest spend),
    * concatenated into the classic "111…555" segment label.
    *
    * The quantile cut is [[Sampling.ntileByKey]] — the distributed
    * exact NTILE (range-bucketed per-key ranks + broadcast offsets),
    * so a 10⁹-customer base never lands in one window partition the
    * way `ntile() OVER (ORDER BY …)` would. Ties break by customer id
    * (deterministic, engine-portable). Returns (customer, recency,
    * frequency, monetary, r_tile, f_tile, m_tile, segment). */
  def rfmSegments(orders: DataFrame, custCol: String, tsCol: String,
      amountCol: String, tiles: Int = 5): DataFrame = {
    val base = orders.groupBy(col(custCol))
      .agg(max(unix_micros(col(tsCol))).as("recency"),
        count(lit(1)).as("frequency"),
        sum(col(amountCol).cast("decimal(18,4)")).cast("double").as("monetary"))
      .withColumn("__g", lit(1))
      // each NTILE cut reads its input twice (eager quantile probe +
      // the ranked pass); materialize the per-customer rollup ONCE and
      // run the three cuts independently off it — a stacked fold would
      // re-execute every earlier cut's windows on each re-read
      .localCheckpoint(true)
    val cut = Seq("recency" -> "r_tile", "frequency" -> "f_tile",
      "monetary" -> "m_tile").map { case (score, tile) =>
      Sampling.ntileByKey(
          base.select(col(custCol), col("__g"), col(score)),
          "__g", score, custCol, tiles)
        .select(col(custCol), col("tile").as(tile))
    }.foldLeft(base) { (acc, c) => acc.join(c, Seq(custCol)) }
    cut.select(col(custCol), col("recency"), col("frequency"), col("monetary"),
      col("r_tile").cast("long").as("r_tile"),
      col("f_tile").cast("long").as("f_tile"),
      col("m_tile").cast("long").as("m_tile"),
      concat(col("r_tile"), col("f_tile"), col("m_tile")).as("segment"))
  }

  /** LINEAR multi-touch ATTRIBUTION: each user's FIRST `convType`
    * conversion distributes exactly 1,000,000 ppm of credit equally
    * across every distinct touch event strictly before it, the
    * floor-division remainder going to the EARLIEST touches (largest-
    * remainder, (ts, tie) order) — so per-conversion credit sums to
    * exactly 1e6 and the channel report is engine-exact integers, not
    * a float soup that drifts per run. Credit is then aggregated per
    * touch type.
    *
    * Shape: one user-key aggregate for the conversion time, a user-key
    * join to prune post-conversion events BEFORE any window, one
    * rank window on the user partitioning (bounded by a user's touch
    * count), one final type aggregate. Returns
    * (event_type, n_touches, credit_ppm). */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String, tieCol: String): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__conv"))
    val touches = events.filter(col(typeCol) =!= convType)
      .join(conv, Seq(userCol))
      .filter(col(tsCol) < col("__conv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    touches
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(userCol))))
      .withColumn("__credit",
        expr("1000000L div __n") +
          when(col("__rk") <= expr("1000000L % __n"), 1L).otherwise(0L))
      .groupBy(col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n_touches"), sum(col("__credit")).as("credit_ppm"))
  }

  /** Longest consecutive-day activity STREAK per user (the engagement
    * metric): distinct active days collapse to islands by the classic
    * date-minus-rank trick (consecutive days share `day − rank`), one
    * island aggregate, one user rollup. Both windows ride the USER
    * partitioning (bounded by a user's active-day count — the data
    * collapsed to distinct days first). Returns
    * (userCol, n_active_days, n_streaks, longest_streak). */
  def activeStreaks(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col(userCol)).orderBy(col("__day"))
    events
      .select(col(userCol), to_date(col(tsCol)).as("__day"))
      .distinct()
      .withColumn("__grp", date_sub(col("__day"), row_number().over(w)))
      .groupBy(col(userCol), col("__grp"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col(userCol))
      .agg(sum(col("__len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("longest_streak"))
  }

  /** DEBOUNCE: collapse bursts to their first event — an event
    * survives iff the previous same-key event (kept or not) is more
    * than `minGapSeconds` older, i.e. chains of sub-gap events form
    * islands and only island HEADS survive. The sensor/clickstream
    * cleaning pass (double-fire suppression) as pure lag arithmetic
    * on the key partitioning: deterministic, engine-portable
    * (microsecond integers, ties by `tieCol`), no iterative driver
    * loop. Returns the surviving rows with original columns. */
  def debounce(events: DataFrame, keyCols: Seq[String], tsCol: String,
      minGapSeconds: Long, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "debounce needs at least one key column")
    require(minGapSeconds >= 1, s"minGapSeconds must be >= 1, got $minGapSeconds")
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__prev_us").isNull ||
        unix_micros(col(tsCol)) - col("__prev_us") > minGapSeconds * 1000000L)
      .drop("__prev_us")
  }

  /** Total COVERED time per key from overlapping intervals (the
    * interval-union measure): each event opens a window of
    * `windowSeconds`, overlapping windows merge, and the result is
    * each key's union length in exact seconds — "minutes of activity"
    * that double-counts nothing however bursty the stream. The
    * gaps-and-islands shape: one running-max window on the KEY
    * partitioning finds island starts (an interval whose start exceeds
    * every prior end), a running island-id sum groups them, and one
    * aggregate per island then per key finishes — microsecond-integer
    * arithmetic end to end, no self-joins, no corpus windows. Returns
    * (keyCol, n_islands, covered_seconds). */
  def coveredTime(events: DataFrame, keyCol: String, tsCol: String,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 1, s"windowSeconds must be >= 1, got $windowSeconds")
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col(keyCol)).orderBy(col("__s"))
    val wPrev = w.rowsBetween(W.unboundedPreceding, -1)
    val micros = windowSeconds * 1000000L
    events
      .select(col(keyCol), unix_micros(col(tsCol)).as("__s"))
      .withColumn("__e", col("__s") + micros)
      .withColumn("__maxPrevEnd", max(col("__e")).over(wPrev))
      .withColumn("__newIsland",
        when(col("__maxPrevEnd").isNull || col("__s") > col("__maxPrevEnd"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__newIsland")).over(w))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col("__s")).as("__is"), max(col("__e")).as("__ie"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("__cov_us"))
      .select(col(keyCol), col("n_islands"),
        expr("__cov_us div 1000000L").as("covered_seconds"))
  }

  /** Integral division that any engine replays bit-for-bit: divisions
    * only ever see NON-NEGATIVE operands (truncating and flooring
    * division agree there — Spark `div` truncates, DuckDB `//` floors,
    * so a negative dividend would silently diverge by one). */
  private def nonNegDiv(a: Column, b: Column): Column = PortableDiv.nonNeg(a, b)

  private def signedDiv(a: Column, b: Column): Column = PortableDiv.signed(a, b)

  /** CUPED variance-reduced A/B readout (Deng et al., WSDM'13): the
    * experiment metric is each user's POST-`splitTs` event count, the
    * covariate their PRE-period count; the adjusted metric
    * y − θ·(x − x̄) removes the variance the pre-period already
    * explains, tightening the readout without biasing the contrast
    * (θ is computed on the pooled population, identical for both
    * arms). Arms are the [[abSplit]] portable-hash assignment.
    *
    * Exactness: θ is the integer milli-quotient of the exact int64
    * sufficient statistics (n·Σxy − Σx·Σy) / (n·Σxx − Σx²); the
    * adjustment runs in milli-units with sign-split truncating
    * division, so every engine reproduces the same integers (bounds:
    * n·Σxy must fit int64 — holds to ~10⁸ users at ~10³ events each;
    * past that lift the stats into decimal(38,0)). ONE pass builds
    * the per-user (x, y) frame, the five statistics collapse to a
    * single broadcast row, and the arm readout is one aggregate on
    * the user key. Returns (variant, n_users, mean_raw_milli,
    * mean_adj_milli, theta_milli). */
  def cuped(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, splitTs: String, variants: Int = 2,
      seed: Long = 42L): DataFrame = {
    require(variants >= 2, s"variants must be >= 2, got $variants")
    val xy = events
      .groupBy(col(userCol))
      .agg(
        sum(when(col(tsCol) < lit(splitTs).cast("timestamp"), 1L)
          .otherwise(0L)).as("__x"),
        sum(when(col(tsCol) >= lit(splitTs).cast("timestamp"), 1L)
          .otherwise(0L)).as("__y"))
      .withColumn("variant",
        pmod(Sampling.portableHash(col(userCol), seed), lit(variants.toLong)))
    val stats = xy.agg(
      count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
      sum(col("__y")).as("__sy"), sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__x") * col("__y")).as("__sxy"))
    // zero-variance guard: a pre-period with identical per-user counts
    // (e.g. splitTs before every event ⇒ all __x = 0) zeroes the
    // denominator; the natural CUPED semantics there is θ = 0
    // (adjusted ≡ raw) — without the guard the division reads NULL
    // (or throws under ANSI) and poisons every arm's adjusted mean
    val denom = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val withTheta = stats.select(col("__n"), col("__sx"),
      when(denom === 0L, lit(0L)).otherwise(
        signedDiv((col("__n") * col("__sxy") - col("__sx") * col("__sy")) * 1000L,
          denom)).as("theta_milli"),
      signedDiv(col("__sx") * 1000L, col("__n")).as("__xbar_milli"))
    xy.crossJoin(broadcast(withTheta))
      .withColumn("__adj_milli",
        col("__y") * 1000L - signedDiv(
          col("theta_milli") * (col("__x") * 1000L - col("__xbar_milli")),
          lit(1000L)))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("__y")).as("__sy"), sum(col("__adj_milli")).as("__sadj"),
        first(col("theta_milli")).as("theta_milli"))
      .select(col("variant"), col("n_users"),
        signedDiv(col("__sy") * 1000L, col("n_users")).as("mean_raw_milli"),
        signedDiv(col("__sadj"), col("n_users")).as("mean_adj_milli"),
        col("theta_milli"))
  }


  /** INTER-ARRIVAL burstiness per event type — is traffic Poisson or
    * bursty? Gaps are per-(user, type) consecutive-event differences
    * in ms (lag over the user×type window, (ts, id) order — the
    * transitions rule: keyed windows, never a global sequence sort);
    * per type the squared coefficient of variation CV² = var/mean²
    * and the index of dispersion var/mean come exactly from three
    * integer sums: CV²·10⁶ = ⌊(n·Σg² − S²)·10⁶ / S²⌋ and D·10³ =
    * ⌊(n·Σg² − S²)·10³ / (n·S)⌋ — population variance, all products
    * in DECIMAL(38,0) (Σg² reaches 10²⁴ at ms gaps ≪ int64's
    * ceiling… n·Σg² nears 10³⁸ only past ~10¹⁰ gaps per type —
    * documented envelope). CV² ≈ 10⁶ reads Poisson-like; ≫ 10⁶
    * bursty; NULL when S = 0 or n < 2. Returns one row per type:
    * (typeCol, n_gaps, mean_gap_ms, cv2_ppm, dispersion_milli).
    *
    * Scale shape: one keyed window pass (user×type partitions) + one
    * type aggregate with map-side partials; no global window, no
    * self-join. */
  def interArrival(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val Dec = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol), col(typeCol))
      .orderBy(col(tsCol), col(idCol))
    val gaps = df
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("__t", unix_millis(col(tsCol)))
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col(typeCol), (col("__t") - col("__prev")).as("__g"))
    val agg = gaps.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__g").cast(Dec)).cast(Dec).as("__sg"),
        sum((col("__g").cast(Dec) * col("__g")).cast(Dec)).cast(Dec)
          .as("__sg2"))
    val varNum = (col("n_gaps").cast(Dec) * col("__sg2") -
      col("__sg") * col("__sg")).cast(Dec)
    agg.select(col(typeCol), col("n_gaps"),
      PortableDiv.nonNeg(col("__sg"), col("n_gaps").cast(Dec))
        .as("mean_gap_ms"),
      when(col("n_gaps") >= 2L && col("__sg") > 0L,
        PortableDiv.nonNeg(varNum * lit(1000000L),
          col("__sg") * col("__sg")))
        .otherwise(lit(null).cast("long")).as("cv2_ppm"),
      when(col("n_gaps") >= 2L && col("__sg") > 0L,
        PortableDiv.nonNeg(varNum * lit(1000L),
          col("n_gaps").cast(Dec) * col("__sg")))
        .otherwise(lit(null).cast("long")).as("dispersion_milli"))
  }

  /** EVENT TRIGRAMS — the top length-3 behavior paths ("what do
    * users actually DO, in order?"), funnel discovery without a
    * hypothesis: two leads over the per-user (ts, id) window form
    * every consecutive event-type triple, one hash aggregate counts
    * them, and the top-k by (count desc, path asc) is a bounded
    * TakeOrdered. Returns (step_1, step_2, step_3, n).
    *
    * Scale shape: one keyed window pass (user partitions — the
    * transitions rule) + one path aggregate (|types|³-bounded
    * domain) + TakeOrdered; no self-join, no collect. */
  def eventTrigrams(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    df.select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__e2", lead(col(typeCol), 1).over(w))
      .withColumn("__e3", lead(col(typeCol), 2).over(w))
      .filter(col("__e2").isNotNull && col("__e3").isNotNull)
      .groupBy(col(typeCol).as("step_1"), col("__e2").as("step_2"),
        col("__e3").as("step_3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step_1"), col("step_2"), col("step_3"))
      .limit(topK)
  }

  /** COHORT REVENUE triangle — the LTV readout: users cohorted by
    * their first-activity day, revenue accumulated by cohort AGE
    * ("how much has the day-3 cohort earned by day 12 of life?").
    * Caller pre-quantizes the day (integer) and the value (cents).
    * Per (cohort_day, age) cell: distinct active users, exact cent
    * sum, and the running cumulative over age (a window over the
    * ≤days² cell frame, cohort-partitioned — domain-sized, never the
    * event stream). Returns (cohort_day, age, n_users, cents,
    * cum_cents) with cum_cents exact DECIMAL(38,0) narrowed to long.
    *
    * Scale shape: one user aggregate (cohort assignment) + one
    * user-keyed equi-join + one (cohort, age) cell aggregate — all
    * on the user key or the bounded cell frame; no global window. */
  def cohortRevenue(df: DataFrame, userCol: String, dayCol: String,
      centsCol: String): DataFrame = {
    val Dec = "decimal(38,0)"
    val base = df.select(col(userCol).as("__u"),
      col(dayCol).cast("long").as("__d"),
      coalesce(col(centsCol).cast("long"), lit(0L)).as("__c"))
    val cohorts = base.groupBy(col("__u"))
      .agg(min(col("__d")).as("__cd"))
    val cells = base.join(cohorts, Seq("__u"))
      .groupBy(col("__cd").as("cohort_day"),
        (col("__d") - col("__cd")).as("age"))
      .agg(countDistinct(col("__u")).as("n_users"),
        sum(col("__c").cast(Dec)).cast(Dec).as("__cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_day")).orderBy(col("age"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cells
      .withColumn("cum_cents", sum(col("__cents")).over(w).cast(Dec))
      .select(col("cohort_day"), col("age"), col("n_users"),
        col("__cents").cast("long").as("cents"),
        col("cum_cents").cast("long").as("cum_cents"))
  }

  /** CHURN HAZARD by tenure — "at which week of life do users
    * leave?": tenure = last-activity day − first-activity day per
    * user; hazard(t) = ⌊10⁶ · ended(t) / atRisk(t)⌋ where atRisk(t)
    * = users whose tenure reached t (the reverse-cumulative of the
    * tenure histogram — survival analysis' discrete hazard over the
    * closed observation window; the right-censoring caveat is the
    * caller's: users still active at window end count as ended at
    * their observed tenure). Returns one row per observed tenure:
    * (tenure, n_ended, n_at_risk, hazard_ppm).
    *
    * Scale shape: one user aggregate (first/last day) + one
    * tenure-histogram aggregate (≤days rows) + a reverse-cumulative
    * window over that bounded frame. */
  def churnByTenure(df: DataFrame, userCol: String,
      dayCol: String): DataFrame = {
    val Dec = "decimal(38,0)"
    val per = df.select(col(userCol).as("__u"),
        col(dayCol).cast("long").as("__d"))
      .groupBy(col("__u"))
      .agg((max(col("__d")) - min(col("__d"))).as("tenure"))
    val hist = per.groupBy(col("tenure"))
      .agg(count(lit(1)).as("n_ended"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tenure").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // full-frame window over the ≤days-row histogram (bounded — the
    // zipfProfile rule)
    hist.withColumn("n_at_risk", sum(col("n_ended")).over(w))
      .select(col("tenure"), col("n_ended"), col("n_at_risk"),
        PortableDiv.nonNeg(col("n_ended").cast(Dec) * lit(1000000L),
          col("n_at_risk").cast(Dec)).as("hazard_ppm"))
  }


  /** KAPLAN–MEIER survival curve over the tenure histogram — the
    * product-limit estimator [[churnByTenure]]'s per-step hazard
    * composes into: S(t) = Π_{t'≤t} (1 − d_{t'}/n_{t'}), the "what
    * fraction of users survives past tenure t" readout every
    * retention review reads next to the hazard. Engine-replayable
    * WITHOUT ln (banned) or an exact rational product (n^steps
    * overflows any fixed precision): the recurrence runs in ppm with
    * a floor at EACH step — S_ppm(t) = ⌊S_ppm(prev)·(n_t − d_t)/n_t⌋,
    * S_ppm(start) = ⌊10⁶·(n₁ − d₁)/n₁⌋ — a documented ≤1-ppm-per-step
    * downward bias (≤ #steps ppm total, noise against the estimator's
    * own sampling variance), and a DuckDB recursive CTE replays every
    * floor bit for bit. Input contract and the right-censoring caveat
    * are [[churnByTenure]]'s (activity frame; users still active at
    * window end count as ended at their observed tenure). Returns one
    * row per observed tenure: (tenure, n_ended, n_at_risk,
    * survival_ppm).
    *
    * Scale shape: one user aggregate + one ≤days-row tenure histogram
    * + a reverse-cumulative window over that bounded frame (the
    * zipfProfile rule), then ONE ordered higher-order fold over the
    * histogram collected into a single ≤`maxSteps`-element array —
    * the recurrence is inherently sequential, so it runs where the
    * data is already one bounded row, never as a driver loop or a
    * per-step job. A histogram longer than `maxSteps` fails loudly
    * with the fix named (the ewmaExact rule). */
  def kaplanMeier(df: DataFrame, userCol: String, dayCol: String,
      maxSteps: Int = 512): DataFrame = {
    require(maxSteps >= 1, s"maxSteps must be >= 1, got $maxSteps")
    val per = df.select(col(userCol).as("__u"),
        col(dayCol).cast("long").as("__d"))
      .groupBy(col("__u"))
      .agg((max(col("__d")) - min(col("__d"))).as("tenure"))
    val hist = per.groupBy(col("tenure"))
      .agg(count(lit(1)).as("n_ended"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tenure").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val risky = hist.withColumn("n_at_risk", sum(col("n_ended")).over(w))
    val stepT = "struct<tenure:bigint,n_ended:bigint,n_at_risk:bigint>"
    val outT = "array<struct<tenure:bigint,n_ended:bigint," +
      "n_at_risk:bigint,survival_ppm:bigint>>"
    val arr = risky
      .agg(sort_array(collect_list(struct(col("tenure"), col("n_ended"),
        col("n_at_risk")).cast(stepT))).as("__a"))
    // the guard rides INSIDE the consumed expression (the ewmaExact
    // coalesce rule) — a standalone guard column would be pruned away
    // and never fire
    val guarded = coalesce(
      when(size(col("__a")) > maxSteps,
        raise_error(concat(
          lit(s"kaplanMeier: tenure histogram exceeds maxSteps=$maxSteps ("),
          size(col("__a")).cast("string"),
          lit(" steps) - coarsen the tenure unit or raise maxSteps"))))
        .otherwise(lit(null)).cast(s"array<$stepT>"),
      col("__a"))
    val folded = arr.select(
      aggregate(guarded, array().cast(outT),
        (acc, x) => {
          val prev = when(size(acc) === 0, lit(1000000L))
            .otherwise(element_at(acc, size(acc)).getField("survival_ppm"))
          val s = PortableDiv.nonNeg(
            prev * (x.getField("n_at_risk") - x.getField("n_ended")),
            x.getField("n_at_risk"))
          concat(acc, array(struct(
            x.getField("tenure").as("tenure"),
            x.getField("n_ended").as("n_ended"),
            x.getField("n_at_risk").as("n_at_risk"),
            s.as("survival_ppm"))))
        }).as("__r"))
    folded.select(explode(col("__r")).as("__s"))
      .select(col("__s.tenure").as("tenure"),
        col("__s.n_ended").as("n_ended"),
        col("__s.n_at_risk").as("n_at_risk"),
        col("__s.survival_ppm").as("survival_ppm"))
  }

  /** NEW-vs-RETURNING daily mix — the DAU decomposition every growth
    * dashboard opens with: per day, active users, first-ever-seen
    * users, returning users, and the new share as exact floor ppm.
    * First-seen day comes from one user aggregate; the daily cells
    * from one (day, is-new) aggregate over the user×day distinct
    * frame. Returns (day, n_active, n_new, n_returning, new_ppm).
    *
    * Scale shape: one user aggregate + one user-keyed equi-join + one
    * day-domain cell aggregate — all on the user key; no windows. */
  def newVsReturning(df: DataFrame, userCol: String,
      dayCol: String): DataFrame = {
    val Dec = "decimal(38,0)"
    val ud = df.select(col(userCol).as("__u"),
      col(dayCol).cast("long").as("__d")).distinct()
    val first = ud.groupBy(col("__u")).agg(min(col("__d")).as("__fd"))
    ud.join(first, Seq("__u"))
      .groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("__d") === col("__fd"), 1L).otherwise(0L)).as("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        PortableDiv.nonNeg(col("n_new").cast(Dec) * lit(1000000L),
          col("n_active").cast(Dec)).as("new_ppm"))
  }
}
