package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import graft.ext.{Dedup, Multimodal, Similarity, TextOps}
import graft.operators.AsOfJoin
import graft.streaming.Streams

import graft.QueryHelpers._

/** Analytics tier (q161-q237): behavioral/funnel/attribution, audits,
  * TPC-H-style SQL, text analytics, financial bars, privacy.
  * One `queries` entry per operator, one `oracleSql` ANSI-SQL twin per
  * oracle-expressible entry; merged into the gate by [[SparkEntry]]. */
private[graft] object QueriesAnalytics {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // POINT-IN-TIME feature join — the feature-store correctness
    // primitive: each purchase enriched with the user's SCD2 state
    // (last event type) AS OF the purchase instant; zero-length
    // intervals (two changes at one ts) drop so the as-of match is
    // unique, leakage-free by construction (backward join: state
    // from the FUTURE can never attach).
    "q303_pit_join" -> ((s, d) => {
      val ev = T(s, d, "events")
      val dim = graft.ext.History.scd2(ev, "user_id", "ts", "event_type",
          "event_id")
        .filter(col("valid_to").isNull || col("valid_to") > col("valid_from"))
        .select(col("user_id").as("d_user"), col("event_type").as("state"),
          col("valid_from"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.backward(
          facts, "user_id", "ts", dim, "d_user", "valid_from")
        .select(col("event_id"), col("user_id"), col("state"),
          col("valid_from"))
        .orderBy(col("event_id"))
    }),

    // NEW vs RETURNING daily mix: the DAU decomposition, exact ppm.
    "q305_new_returning" -> ((s, d) =>
      graft.ext.Behavior.newVsReturning(
        T(s, d, "events").select(col("user_id"),
          dayofmonth(col("ts")).cast("long").as("day")),
        "user_id", "day")
        .orderBy(col("day"))),

    // BOUNCE RATE: share of 30-min-gap sessions with exactly one event
    // — the q38 sessionizer rolled up to the product KPI.
    "q298_bounce_rate" -> ((s, d) => {
      val sess = Streams.sessionizeBatch(
        T(s, d, "events"), "ts", "user_id", gapMinutes = 30,
        tieBreak = Some("event_id"))
      sess.agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounce"))
        .select(col("n_sessions"), col("n_bounce"),
          when(col("n_sessions") > 0L, graft.ext.PortableDiv.nonNeg(
              col("n_bounce").cast("decimal(38,0)") * lit(1000000L),
              col("n_sessions").cast("decimal(38,0)")))
            .otherwise(lit(null).cast("long")).as("bounce_ppm"))
    }),

    // TIME-TO-CONVERT: minutes from first signup to first subsequent
    // purchase per user; exact p50/p90/p99 over the converted set via
    // the range-bucketed multi-quantile pass.
    "q299_time_to_convert" -> ((s, d) => {
      val ev = T(s, d, "events")
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("__s"))
      val lat = ev.filter(col("event_type") === "purchase")
        .join(su, Seq("user_id"))
        .filter(col("ts") >= col("__s"))
        .groupBy(col("user_id"), col("__s")).agg(min(col("ts")).as("__p"))
        .select(col("user_id"),
          floor((unix_micros(col("__p")) - unix_micros(col("__s")))
            .cast("double") / lit(60000000.0)).cast("long").as("lat_min"))
        .withColumn("__k", lit("all"))
      graft.ext.Sampling.exactQuantilesByKey(
          lat, "__k", "lat_min", "user_id", Seq(500L, 900L, 990L))
        .select(col("q_permille"), col("n"), col("q_value"))
        .orderBy(col("q_permille"))
    }),

    // ABC/PARETO CLASSES: parts bucketed A (≤80 % cumulative revenue
    // share), B (≤95 %), C — the inventory-analytics rollup of the
    // range-bucketed cumulative-share machinery.
    "q300_abc_classes" -> ((s, d) => {
      val rev = T(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      graft.ext.Sampling.cumulativeShare(rev, "l_partkey", "cents")
        .select(when(col("cum_share_ppm") <= 800000L, "A")
            .when(col("cum_share_ppm") <= 950000L, "B")
            .otherwise("C").as("abc_class"),
          col("cents"))
        .groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("cents").cast("decimal(38,0)")).cast("long").as("cents"))
        .orderBy(col("abc_class"))
    }),

    // COHORT REVENUE triangle: users cohorted by first-activity day,
    // exact cents by cohort age with running cumulative — the LTV
    // readout.
    "q291_cohort_revenue" -> ((s, d) =>
      graft.ext.Behavior.cohortRevenue(
        T(s, d, "events").select(col("user_id"),
          dayofmonth(col("ts")).cast("long").as("day"),
          round(col("value") * 100).cast("long").as("cents")),
        "user_id", "day", "cents")
        .orderBy(col("cohort_day"), col("age"))),

    // CHURN HAZARD by tenure: hazard(t) = ended(t) / at-risk(t) over
    // the first-to-last activity span, exact floor ppm.
    "q293_churn_tenure" -> ((s, d) =>
      graft.ext.Behavior.churnByTenure(
        T(s, d, "events").select(col("user_id"),
          dayofmonth(col("ts")).cast("long").as("day")),
        "user_id", "day")
        .orderBy(col("tenure"))),

    // KAPLAN–MEIER survival curve: the q293 hazard composed into the
    // product-limit estimator, per-step floor ppm (the recurrence
    // runs as ONE higher-order fold over the bounded tenure
    // histogram; the oracle replays every floor with a recursive CTE).
    "q310_kaplan_meier" -> ((s, d) =>
      graft.ext.Behavior.kaplanMeier(
        T(s, d, "events").select(col("user_id"),
          dayofmonth(col("ts")).cast("long").as("day")),
        "user_id", "day")
        .orderBy(col("tenure"))),

    // INTER-ARRIVAL burstiness per event type: CV² and index of
    // dispersion of per-user gap sequences, exact from three sums.
    "q287_burstiness" -> ((s, d) =>
      graft.ext.Behavior.interArrival(
        T(s, d, "events"), "user_id", "ts", "event_id", "event_type")
        .orderBy(col("event_type"))),

    // TOP BEHAVIOR PATHS: every consecutive event-type triple per
    // user, top 20 by count — funnel discovery without a hypothesis.
    "q288_event_trigrams" -> ((s, d) =>
      graft.ext.Behavior.eventTrigrams(
        T(s, d, "events"), "user_id", "ts", "event_id", "event_type",
        topK = 20)),



    // Join-key skew audit (operators.SkewJoin.keySkew): the topN
    // hottest fact-side keys with ppm share and ‰-of-mean ratio, all
    // floor-integer arithmetic — the pre-flight decision input for
    // plain vs salted vs AQE-split joins.
    "q161_key_skew" -> ((s, d) =>
      graft.operators.SkewJoin.keySkew(
        T(s, d, "events"), "user_id", topN = 25)),

    // Histogram MERGE contract — the FIFTH mergeable-summary class
    // (per-bin addition over a shared equi-width grid): per-shard
    // histograms summed, median read from the merged state with an
    // error of at most one bin width and never a sort of the data.
    // Power-of-two grid (0..131072, 1024 bins → width 128) keeps the
    // bin arithmetic exact; the oracle replays grid, cumulative scan,
    // and upper-edge readout.
    "q162_hist_quantile" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val ha = graft.ext.Sketches.histState(
        li.filter(col("l_orderkey") % 2 === 0), "l_returnflag",
        "l_extendedprice", 0.0, 131072.0, 1024)
      val hb = graft.ext.Sketches.histState(
        li.filter(col("l_orderkey") % 2 =!= 0), "l_returnflag",
        "l_extendedprice", 0.0, 131072.0, 1024)
      graft.ext.Sketches.histQuantile(
          graft.ext.Sketches.histMerge("l_returnflag", ha, hb),
          "l_returnflag", q = 0.5, 0.0, 131072.0, 1024)
        .orderBy(col("l_returnflag"))
    }),

    // Per-group top-k via the bounded heap aggregate
    // (functions.TopKByScore) on a RELATIONAL oracle: the ANN paths'
    // O(k)-state partial aggregate, pinned directly against the
    // row_number window it replaces (score DESC, id ASC — identical
    // total order, so results hash-match).
    "q163_topk_per_group" -> ((s, d) =>
      T(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(graft.functions.TopKByScore.topK(
          col("c_acctbal"), col("c_custkey"), 5).as("top"))
        .select(col("c_mktsegment"),
          posexplode(col("top")).as(Seq("__i", "e")))
        .select(col("c_mktsegment"), (col("__i") + 1).cast("long").as("rk"),
          col("e.id").as("c_custkey"), col("e.score").as("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rk"))),

    // SCD TYPE-2 intervalization (ext.History.scd2): collapse the
    // event stream into per-user validity intervals [valid_from,
    // valid_to) at each event_type change — "what was true when",
    // the audit complement of CDC's "what is true now". Two windows
    // on one (user, ts) partitioning; zero-length intervals retained.
    "q164_scd2" -> ((s, d) =>
      graft.ext.History.scd2(
        T(s, d, "events"), "user_id", "ts", "event_type", "event_id")
        .orderBy(col("user_id"), col("valid_from"), col("event_type"))),

    // Cross-source contamination matrix (ext.Dedup.sourceOverlap):
    // shared distinct 3-gram shingles per source pair behind the q44
    // df gate, with integer Jaccard — the provenance-level audit run
    // before document-level dedup. idCol engages the codegen'd
    // shingleRows pass (r18, guide §4 — the q193 move); doc_id is the
    // fixture's row key, so results are identical by the operator's
    // row-uniqueness contract.
    "q165_source_overlap" -> ((s, d) =>
      graft.ext.Dedup.sourceOverlap(
        T(s, d, "documents"), "source", "text", n = 3, dfCap = 100,
        idCol = "doc_id")
        .orderBy(col("src_a"), col("src_b"))),

    // Robust location/scale with NO per-group sort: median and MAD
    // via two composed histogram passes (Sketches.histMedianMad),
    // outliers by Hampel's 3-MAD rule — each estimate within one bin
    // width (4 chars on this grid). The oracle replays both passes.
    "q166_mad_outliers" -> ((s, d) =>
      graft.ext.Sketches.histMedianMad(
        T(s, d, "documents"), "lang", "n_chars", 0.0, 1024.0, 256)
        .orderBy(col("lang"))),

    // Winsorization by histogram-estimated percentile bounds
    // (Sketches.winsorize): per-lang p05/p95 clamp from ONE shared
    // histogram state, broadcast back over the data — the outlier-
    // taming transform with no per-group sort.
    "q167_winsorize" -> ((s, d) =>
      graft.ext.Sketches.winsorize(
        T(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", "n_chars", 0.0, 1024.0, 256)
        .orderBy(col("doc_id"))),

    // Cohort retention matrix (ext.Behavior.retentionCohorts): users
    // bucketed by first-event date, counted per active-day offset —
    // every step a hash aggregate or join on the user key.
    "q168_retention" -> ((s, d) =>
      graft.ext.Behavior.retentionCohorts(T(s, d, "events"), "user_id", "ts")
        .orderBy(col("cohort_date"), col("offset_days"))),

    // Ordered conversion funnel (ext.Behavior.funnel): first-touch
    // view -> click -> purchase, each stage's earliest event strictly
    // after the committed prior stage — conditional aggregation per
    // stage, never a per-user sequence sort.
    "q169_funnel" -> ((s, d) =>
      graft.ext.Behavior.funnel(T(s, d, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("stage"))),

    // Deterministic A/B readout (ext.Behavior.abSplit): portable-hash
    // arm assignment (the assignment IS the audit trail), distinct-
    // user conversion, integer-exact ppm rates.
    "q170_ab_lift" -> ((s, d) =>
      graft.ext.Behavior.abSplit(T(s, d, "events"), "user_id",
        "event_type", convType = "purchase")
        .orderBy(col("variant"))),

    // First-order Markov transition matrix (ext.Behavior
    // .transitionMatrix): adjacent event pairs per user via one
    // user-partitioned lead window, row-normalized ppm probabilities
    // via a broadcast totals frame.
    "q171_transitions" -> ((s, d) =>
      graft.ext.Behavior.transitionMatrix(T(s, d, "events"),
        "user_id", "ts", "event_type", "event_id")
        .orderBy(col("from_type"), col("to_type"))),

    // Rolling 7-day distinct users from MERGED daily HLL sketches
    // (Sketches.hllRollingDistinct) — the merge law's production use:
    // each day sketched once, every trailing window estimated from
    // register merges; the range join runs over |days|x64 register
    // rows, never the event stream.
    "q172_rolling_wau" -> ((s, d) =>
      graft.ext.Sketches.hllRollingDistinct(
        T(s, d, "events").withColumn("day", to_date(col("ts"))),
        "day", "user_id", window = 7)
        .orderBy(col("day"))),

    // PCA projection (Similarity.pcaFit/pcaProject): one-pass O(d²)
    // moment aggregate + driver-side Jacobi on the d×d covariance,
    // projection via broadcast-literal components (no join). Like
    // q59's native sketches the eigenbasis is not SQL-replayable —
    // rows-only by design; PcaSpec pins orthonormality, variance
    // ordering, and reconstruction; the fixed-basis twin q48 (SRP)
    // IS hash-matched, and q337 hash-matches the basis-INVARIANT
    // spectrum facts (exact covariance trace from integer moments +
    // every Jacobi invariant as proof columns).
    "q173_pca_project" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val model = graft.ext.Similarity.pcaFit(emb, "embedding", k = 4)
      graft.ext.Similarity.pcaProject(
          emb.select(col("vec_id"), col("embedding")), "embedding", model)
        .select(col("vec_id"), col("pc1"), col("pc2"), col("pc3"), col("pc4"))
        .orderBy(col("vec_id"))
    }),

    // BASIS-INVARIANT PCA proof gate (r14, the q315 recipe): q173's
    // eigenBASIS is data-dependent (rows-only by design), but the
    // SPECTRUM facts are basis-free and this row set is hash-matched.
    // Embedding coordinates quantize to the 1e-4 grid first, so the
    // covariance TRACE is an exact integer ratio both engines compute
    // bit for bit: trace_num = Σ_i (n·Σxq_i² − (Σxq_i)²) over den
    // n²·1e8 — DuckDB replays it from the moments, never the
    // eigenbasis. The Jacobi-side facts ride as booleans: Σλ (all d)
    // equals the exact trace (rel 1e-8), the basis is orthonormal,
    // eigenvalues descend non-negative, per-axis projected variance
    // equals its eigenvalue, and captured variance is a unit share.
    "q337_pca_invariants" -> ((s, d) => {
      import s.implicits._
      val emb = T(s, d, "embeddings")
      val xq = transform(col("embedding"),
        v => round(v.cast("double") * 10000).cast("long"))
      val m = emb.select(posexplode(xq).as(Seq("pos", "xq")))
        .groupBy(col("pos")).agg(
          sum(col("xq").cast("decimal(38,0)")).as("s1"),
          sum((col("xq") * col("xq")).cast("decimal(38,0)")).as("s2"),
          count(lit(1)).as("n"))
      val tr = m.agg(
        sum(col("n").cast("decimal(38,0)") * col("s2") - col("s1") * col("s1"))
          .as("num"), min(col("n")).as("n")).head()
      val traceNum = tr.getDecimal(0).toBigInteger
      val n = tr.getLong(1)
      val traceExact = new java.math.BigDecimal(traceNum).doubleValue() /
        (n.toDouble * n.toDouble * 1e8)
      // Jacobi on the SAME quantized (descaled) data
      val qd = emb.select(col("vec_id"),
        transform(col("embedding"),
          v => round(v.cast("double") * 10000) / 10000.0).as("qe"))
      val model = graft.ext.Similarity.pcaFit(qd, "qe", k = 4)
      def relEq(a: Double, b: Double, tol: Double): Boolean =
        math.abs(a - b) <= tol * math.max(math.abs(a), math.abs(b)) ||
          math.abs(a - b) <= 1e-12
      val eigSumOk = relEq(model.totalVariance, traceExact, 1e-8)
      val ortho = {
        val c = model.components
        val worst = (for (i <- c.indices; j <- c.indices) yield {
          val dotIj = c(i).zip(c(j)).map { case (a, b) => a * b }.sum
          math.abs(dotIj - (if (i == j) 1.0 else 0.0))
        }).max
        worst <= 1e-9
      }
      val descNonNeg = model.eigenvalues.sliding(2).forall(p =>
        p.length < 2 || p(0) >= p(1) - 1e-12) &&
        model.eigenvalues.forall(_ >= -1e-12)
      val projected = graft.ext.Similarity.pcaProject(qd, "qe", model)
      val varAggs = (1 to 4).flatMap(j => Seq(
        avg(col(s"pc$j") * col(s"pc$j")).as(s"e2_$j"),
        avg(col(s"pc$j")).as(s"e1_$j")))
      val vrow = projected.agg(varAggs.head, varAggs.tail: _*).head()
      val projVarOk = (1 to 4).forall { j =>
        val v = vrow.getAs[Double](s"e2_$j") -
          math.pow(vrow.getAs[Double](s"e1_$j"), 2)
        relEq(v, model.eigenvalues(j - 1), 1e-6)
      }
      val captured = model.varianceCaptured(4)
      val captureOk = captured > 0.0 && captured <= 1.0 + 1e-12
      Seq(
        ("capture_in_unit_range", captureOk.toString),
        ("eig_sum_matches_trace", eigSumOk.toString),
        ("eigvals_desc_nonneg", descNonNeg.toString),
        ("orthonormal_basis", ortho.toString),
        ("proj_var_matches_eigvals", projVarOk.toString),
        ("trace_den_n", n.toString),
        ("trace_num", traceNum.toString))
        .toDF("probe", "value").orderBy(col("probe"))
    }),

    // Distribution drift per source (Sketches.histDriftTV): total-
    // variation distance in ppm between each source's length profile
    // and the rest of the corpus, from ONE histogram state — the
    // "which crawl changed shape" retrain trigger; work is state-
    // sized after the single scan.
    "q174_source_drift" -> ((s, d) =>
      graft.ext.Sketches.histDriftTV(
        T(s, d, "documents"), "source", "n_chars", 0.0, 1024.0, 256)
        .orderBy(col("source"))),

    // ROWS-frame moving aggregate (the positional twin of q148's
    // RANGE frame): per user, trailing-3-events count and decimal-
    // exact sum on one (user, ts, id) window.
    "q175_moving_window" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
      T(s, d, "events").select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_3"),
          sum(col("value").cast("decimal(18,4)")).over(w)
            .cast("double").as("sum_3"))
        .orderBy(col("event_id"))
    }),

    // One-pass per-column cardinality/null profile (ext.Audit
    // .columnProfile): six lineitem columns melt to (name, value)
    // rows in one scan, then portable-HLL distincts per column — the
    // arrival-time profiling pass.
    "q176_column_profile" -> ((s, d) =>
      graft.ext.Audit.columnProfile(T(s, d, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
          "l_linestatus", "l_shipdate"))
        .orderBy(col("col_name"))),

    // Referential-integrity audit (ext.Audit.fkOrphans): three FK
    // relationships checked by LEFT ANTI joins, labeled counts (all
    // zero on the TPC-H-consistent fixture — the audit PASSING is the
    // contract).
    "q177_fk_orphans" -> ((s, d) =>
      graft.ext.Audit.fkOrphans(Seq(
        ("lineitem.orderkey", T(s, d, "lineitem"), "l_orderkey",
          T(s, d, "orders"), "o_orderkey"),
        ("orders.custkey", T(s, d, "orders"), "o_custkey",
          T(s, d, "customer"), "c_custkey"),
        ("customer.nationkey", T(s, d, "customer"), "c_nationkey",
          T(s, d, "nation"), "n_nationkey")))
        .orderBy(col("fk"))),

    // Gap-free daily spine (ext.Audit.fillDailyGaps): sparse per-day
    // error counts for two users, absent days zero-filled via a
    // sequence-exploded calendar — the reporting-table shape.
    "q178_date_spine" -> ((s, d) => {
      val daily = T(s, d, "events")
        .filter(col("user_id") < 2 && col("event_type") === "error")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      graft.ext.Audit.fillDailyGaps(daily, "day", Seq("n_events"))
        .orderBy(col("day"))
    }),

    // Market-basket association rules (ext.Behavior.associationRules):
    // parts co-ordered in the same order — support/confidence/lift as
    // floor ppm/milli; per-basket pair generation on the basket key,
    // item totals broadcast back. minPairCount prunes the tail.
    "q179_assoc_rules" -> ((s, d) =>
      graft.ext.Behavior.associationRules(
        T(s, d, "lineitem").filter(col("l_orderkey") < 2000),
        "l_orderkey", "l_partkey", minPairCount = 2L)
        .orderBy(col("item_a"), col("item_b"))),

    // Engine-portable Pearson correlation (ext.Audit.exactCorrelation):
    // decimal-exact sufficient statistics, one double conversion,
    // fixed operation order — replayable where native corr() is not.
    "q180_correlation" -> ((s, d) =>
      graft.ext.Audit.exactCorrelation(T(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy(col("col_a"), col("col_b"))),

    // The production MV loop COMPOSED: snapshot v0's state + the
    // v0→v1 snapshot DELTA (anti join on the row key between two
    // committed store versions) merged == direct recompute over v1 —
    // ties q145's time travel to q159's mergeable state; the refresh
    // reads only the delta, never re-scans the base.
    "q181_mv_snapshot_refresh" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft-mv")
      val store = new graft.core.TableStore(s, root.toString)
      val li = T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"))
      store.write("li", li.filter(col("l_orderkey") % 3 =!= 0))   // v0
      store.write("li", li)                                        // v1
      val vs = store.versions("li")
      val v0 = store.readVersion("li", vs.head)
      val v1 = store.readVersion("li", vs.last)
      val keys = Seq("l_returnflag")
      val ms = Seq("l_quantity")
      val state0 = graft.ext.Incremental.aggState(v0, keys, ms)
      val delta = v1.join(v0.select(col("l_orderkey"), col("l_linenumber")),
        Seq("l_orderkey", "l_linenumber"), "left_anti")
      val out = graft.ext.Incremental.readout(
          graft.ext.Incremental.mergeStates(keys, ms, state0,
            graft.ext.Incremental.aggState(delta, keys, ms)), keys, ms)
        .orderBy(col("l_returnflag"))
      val rows = out.collect()
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    }),

    // Vocabulary-coverage audit (TextOps.oovRate): per-doc OOV rate
    // against the corpus's own deterministic top-500 word list —
    // TakeOrdered vocab broadcast to the token stream.
    "q182_oov_rate" -> ((s, d) =>
      TextOps.oovRate(T(s, d, "documents"), "doc_id", "text", vocabSize = 500)
        .orderBy(col("doc_id"))),

    // Join-size estimation from count-min sketches (Sketches
    // .cmJoinSizeEstimate, Cormode & Muthukrishnan §4.2): the inner
    // product of two counter matrices bounds |A ⋈ B| from above —
    // the join is priced WITHOUT co-scanning the sides. The contract
    // also computes the exact size and the floor-ppm overestimate.
    "q183_join_size_est" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val o = T(s, d, "orders")
      val est = graft.ext.Sketches.cmJoinSizeEstimate(
        li, "l_orderkey", o, "o_orderkey", depth = 4, width = 1 << 18)
      val exact = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("exact_join_rows"))
      est.crossJoin(exact)
        .select(col("est_join_rows"), col("exact_join_rows"),
          expr("((est_join_rows - exact_join_rows) * 1000000L) div exact_join_rows")
            .as("err_ppm"))
    }),

    // Integer-TF-IDF keywords (TextOps.keywords): idf as the bit
    // length of the integer df ratio, so scoring replays exactly;
    // top-3 per doc over bounded per-doc partitions.
    "q184_keywords" -> ((s, d) =>
      TextOps.keywords(T(s, d, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank"))),

    // Next-word suggestion table (TextOps.nextWordTable): corpus
    // bigram argmax per context via one min(struct) aggregate —
    // map-side combine, no vocabulary-sized window.
    "q185_next_word" -> ((s, d) =>
      TextOps.nextWordTable(T(s, d, "documents"), "doc_id", "text",
        minCount = 5L)
        .orderBy(col("word"))),

    // Per-type linear trend of daily volume (Audit.groupedTrend):
    // int64 sufficient statistics over (day index, count) rows, one
    // double conversion, fixed operation order — replayable where
    // regr_slope() is not.
    "q186_trend" -> ((s, d) => {
      val daily = T(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_day"))
        .withColumn("x",
          datediff(col("day"), lit("2024-01-01").cast("date")).cast("long"))
      graft.ext.Audit.groupedTrend(daily, "event_type", "x", "n_day")
        .orderBy(col("event_type"))
    }),

    // Integer CUSUM changepoint (Behavior.cusumChangepoint): the day
    // of maximal cumulative deviation per event type — deviations
    // scaled through the period count so the statistic stays exact.
    "q187_changepoint" -> ((s, d) =>
      graft.ext.Behavior.cusumChangepoint(T(s, d, "events"),
        "event_type", "ts")
        .orderBy(col("event_type"))),

    // Curation pipeline v3 — the round-10-close composition over the
    // NEW tier: source drift gate (q174) → per-lang winsorized length
    // (q167) → exact dedup keep-min (q39) → weight-proportional PPS
    // sample of 100 docs (q160, weighted by the winsorized length).
    // Each stage is individually gated; this pins their COMPOSITION.
    "q188_curation_v3" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val kept = graft.ext.Sketches.histDriftTV(
          docs, "source", "n_chars", 0.0, 1024.0, 256)
        .filter(col("tv_ppm") <= 800000L).select(col("source"))
      val gated = docs.join(broadcast(kept), Seq("source"))
      val wins = graft.ext.Sketches.winsorize(
        gated, "lang", "n_chars", 0.0, 1024.0, 256)
      val keepers = wins
        .groupBy(TextOps.fingerprintMd5(col("text")).as("__fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      val deduped = wins.join(keepers.select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      graft.ext.Sampling.ppsSample(
          deduped.select(col("doc_id"), col("lang"), col("source"),
            col("n_chars_wins")),
          "doc_id", "n_chars_wins", n = 100)
        .orderBy(col("doc_id"))
    }),

    // Hybrid retrieval via reciprocal-rank fusion (Similarity
    // .rrfFuse): the BM25 lexical top-50 (q131's ranker) fused with
    // the cosine semantic top-50 for query vector 0 (q49's ranker) —
    // floor-integer 1000/(10+rank) contributions, no score
    // calibration. The 50-row rank windows are bounded by topK.
    "q189_hybrid_rrf" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val lex = TextOps.bm25Rank(T(s, d, "documents"), "doc_id", "text",
          Seq("data", "model", "learning"), topK = 50, logIdf = false)
        .select(col("doc_id").as("id"),
          row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
            .cast("long").as("rank"))
      val sem = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
        .select(col("nn_id").as("id"), col("rank").cast("long").as("rank"))
      Similarity.rrfFuse(Seq(lex, sem), "id", k = 20)
        .orderBy(col("rrf_milli").desc, col("id"))
    }),

    // WINDOWED funnel (Behavior.funnel with maxGap): view -> click
    // within 1 hour -> purchase within 1 hour of the click — the
    // "converted promptly" refinement of q169's unbounded funnel.
    "q190_windowed_funnel" -> ((s, d) =>
      graft.ext.Behavior.funnel(T(s, d, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"),
        maxGap = Some("1 HOUR"))
        .orderBy(col("stage"))),

    // Rate-anomaly flagging (Behavior.rateAnomalies): each user's
    // peak trailing-10-minute event count via one microsecond-exact
    // RANGE frame, thresholded — the bot heuristic.
    "q191_rate_anomalies" -> ((s, d) =>
      graft.ext.Behavior.rateAnomalies(T(s, d, "events"), "user_id",
        "ts", windowSeconds = 600L, threshold = 5L)
        .orderBy(col("user_id"))),

    // Inter-event GAP quantiles per type (time-domain × sketch
    // composition): per-user lag gaps in floor seconds, median read
    // from the q162 histogram state — latency/cadence profiling with
    // no per-type sort.
    "q192_gap_quantiles" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = T(s, d, "events")
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .select(col("event_type"),
          expr("(unix_micros(ts) - unix_micros(__prev)) div 1000000")
            .as("gap_sec"))
      graft.ext.Sketches.histQuantile(
          graft.ext.Sketches.histState(gaps, "event_type", "gap_sec",
            0.0, 8192.0, 512),
          "event_type", 0.5, 0.0, 8192.0, 512)
        .orderBy(col("event_type"))
    }),

    // Vocabulary GROWTH curve (Heaps'-law audit): each word's first-
    // occurrence doc bucketed into doc-id quartile ranges — how fast
    // does the vocabulary still grow at the corpus tail (a saturating
    // curve says a bigger crawl adds little lexical novelty). One
    // min() aggregate per word + a 4-row rollup with window cumsum.
    "q193_vocab_growth" -> ((s, d) => {
      // BIGRAM vocabulary: the fixture's unigram lexicon is tiny and
      // saturates in the first docs; word PAIRS keep appearing —
      // the curve a Heaps'-law audit actually reads
      // shingleRows, not explode(shingles(...)): the HOF transform is
      // interpreted (~5× slower/row, the TextOps scaladoc note); the
      // lead-window form emits the same bigram multiset fully
      // codegen'd, and docsSpread's id partitioning feeds the window
      // without a new exchange (r17; same rows, same min-doc result)
      val firstDoc = TextOps.shingleRows(docsSpread(s, d), "doc_id", "text", 2)
        .groupBy(col("shingle")).agg(min(col("doc_id")).as("__first"))
      val bounds = T(s, d, "documents")
        .agg(min(col("doc_id")).as("__lo"), max(col("doc_id")).as("__hi"))
      val w = Window.orderBy(col("quartile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      firstDoc.crossJoin(broadcast(bounds))
        .select(least(lit(4L), expr(
          "((__first - __lo) * 4) div (__hi - __lo + 1) + 1")).as("quartile"))
        .groupBy(col("quartile")).agg(count(lit(1)).as("new_words"))
        .withColumn("cum_vocab", sum(col("new_words")).over(w))
        .orderBy(col("quartile"))
    }),

    // Duplicate-cluster SIZE distribution (dedup health): how many
    // fingerprint clusters exist at each multiplicity — the shape
    // that says whether duplication is a few mega-clusters (crawl
    // boilerplate) or a long tail (mirrors). From the q39 fragment.
    // (the raw fixture is duplicate-free at this SF, so a
    // deterministic mirror slice — every 50th doc re-keyed — plants
    // 2-clusters and a 3-cluster, mirrored by the oracle)
    "q194_dup_size_dist" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"), col("text"))
      val mirrored = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val tripled = docs.filter(col("doc_id") === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
      docs.unionByName(mirrored).unionByName(tripled)
        .groupBy(TextOps.fingerprintMd5(col("text")).as("__fp"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("cluster_size"))
    }),

    // EXACT-permille apportionment report (largest remainder over a
    // tiny per-source aggregate): token shares that sum to exactly
    // 1000 — the q140 apportionment idiom as a presentation-grade
    // mix report (floor shares + the remainder ranking window run
    // over |sources| rows, never data).
    "q195_source_share" -> ((s, d) => {
      val counts = T(s, d, "documents")
        .groupBy(col("source"))
        .agg(sum(TextOps.tokenCountWs(col("text"))).as("tokens"))
      val total = Window.partitionBy(lit(1))
      val rankW = Window.orderBy(
        expr("(tokens * 1000) % __tot").desc, col("source"))
      counts
        .withColumn("__tot", sum(col("tokens")).over(total))
        .withColumn("__floor", expr("(tokens * 1000) div __tot"))
        .withColumn("__rk", row_number().over(rankW))
        .withColumn("__slots", expr("1000 - sum(__floor) over ()"))
        .select(col("source"), col("tokens"),
          (col("__floor") + when(col("__rk") <= col("__slots"), 1L)
            .otherwise(0L)).as("share_permille"))
        .orderBy(col("source"))
    }),

    // GROWTH ACCOUNTING (the new/retained/resurrected/churned ledger):
    // weekly user states from first-activity and prev-week flags —
    // two user-keyed passes, never a per-user scan of history.
    "q235_growth_accounting" -> ((s, d) => {
      val weeks = T(s, d, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val first = weeks.groupBy(col("user_id")).agg(min(col("wk")).as("__w0"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
      val flagged = weeks.join(first, Seq("user_id"))
        .withColumn("__prev", lag(col("wk"), 1).over(w))
        .withColumn("state",
          when(col("wk") === col("__w0"), lit("new"))
            .when(col("__prev") === date_sub(col("wk"), 7), lit("retained"))
            .otherwise(lit("resurrected")))
      val active = flagged.groupBy(col("wk"), col("state"))
        .agg(count(lit(1)).as("n_users"))
      // churned(w) = active in w-7 but not w: prev-week actives LEFT
      // ANTI current-week actives, keyed per week via a self-join on
      // the shifted week column
      val cur = weeks.select(col("user_id"), col("wk"))
      val nxt = weeks.select(col("user_id"),
        date_add(col("wk"), 7).as("wk"))
      val churned = nxt.join(cur, Seq("user_id", "wk"), "left_anti")
        .groupBy(col("wk")).agg(count(lit(1)).as("n_users"))
        .withColumn("state", lit("churned"))
        .select(col("wk"), col("state"), col("n_users"))
      active.unionByName(churned)
        .orderBy(col("wk"), col("state"))
    }),

    // GINI coefficient of customer spend, DISTRIBUTED: Σ rank·x via
    // the range-bucketed exact-rank machinery (never one global window
    // partition), all sums exact integers in cents, ONE floor division
    // composition at the end: gini_ppm = (2·Σi·xᵢ − (n+1)·Σx)·10⁶ div
    // (n·Σx) over ascending (spend, customer) ranks.
    "q236_gini" -> ((s, d) => {
      val spend = T(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("__cents"))
      // distributed ascending rank: bucket by approx quantiles, rank
      // within (bucket), offset by broadcast bucket totals (the q227
      // machinery inlined over one constant key)
      val probes = (1 until 32).map(_.toDouble / 32).toArray
      val withQ = spend.withColumn("__q", col("__cents").cast("double"))
      val bounds = Option(withQ.stat.approxQuantile("__q", probes, 0.01)) // monotone-only bounds (r17)
        .getOrElse(Array.empty[Double]).filterNot(_.isNaN).distinct.sorted
      val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col("__q") > lit(b), 1).otherwise(0)
      }
      val withB = withQ.withColumn("__bkt", bucket)
      val wIn = Window.partitionBy(col("__bkt"))
        .orderBy(col("__cents"), col("o_custkey"))
      val rn = withB.withColumn("__rn", row_number().over(wIn).cast("long"))
      val tot = withB.groupBy(col("__bkt")).agg(count(lit(1)).as("__tot"))
      val offsets = tot.as("a")
        .join(broadcast(tot.as("b")), col("b.__bkt") < col("a.__bkt"), "left")
        .groupBy(col("a.__bkt").as("__bkt"))
        .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
      rn.join(broadcast(offsets), Seq("__bkt"))
        .withColumn("__rank", col("__off") + col("__rn"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("__cents").cast("decimal(38,0)")).as("__sx"),
          sum((col("__rank") * col("__cents")).cast("decimal(38,0)")).as("__six"))
        .select(col("n_customers"),
          col("__sx").cast("long").as("total_cents"),
          // floor division on nonneg decimals via the exact
          // (a − a mod b)/b identity — decimal `/` would HALF_UP-round
          // at scale 6 and diverge from DuckDB's integer floor
          locally {
            val a = expr("CAST((2 * __six - (n_customers + 1) * __sx) * 1000000 AS DECIMAL(38,0))")
            val b = expr("CAST(n_customers AS DECIMAL(38,0)) * __sx")
            ((a - pmod(a, b)) / b).cast("long")
          }.as("gini_ppm"))
    }),

    // BENFORD first-digit audit (the fraud screen): observed leading-
    // digit counts of order totals against the Benford expectation —
    // the log10 expectation table ships as driver-computed literals
    // (model-as-data, the q218 recipe), deviation in floor ppm.
    "q237_benford" -> ((s, d) => {
      import s.implicits._
      val expected = BenfordPpm.toDF("digit", "expected_ppm")
      val obs = T(s, d, "orders")
        .select(substring(col("o_totalprice").cast("decimal(18,2)")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .filter(col("digit").between(1L, 9L))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = obs.agg(sum(col("n")).as("__t"))
      obs.crossJoin(broadcast(tot))
        .join(broadcast(expected), Seq("digit"))
        .select(col("digit"), col("n"),
          expr("(n * 1000000L) div __t").as("observed_ppm"),
          col("expected_ppm"),
          abs(expr("(n * 1000000L) div __t") - col("expected_ppm"))
            .as("abs_dev_ppm"))
        .orderBy(col("digit"))
    }),

    // STICKINESS (DAU/MAU): exact daily actives over the trailing-30
    // portable-HLL monthly estimate (the q172 register machinery at a
    // 30-day window) — the engagement ratio computed without ever
    // re-scanning a month of history per day.
    "q234_stickiness" -> ((s, d) => {
      val ev = T(s, d, "events").withColumn("day", to_date(col("ts")))
      val dau = ev.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val mau = graft.ext.Sketches.hllRollingDistinct(ev, "day", "user_id",
          window = 30)
        .withColumnRenamed("est_distinct", "mau_est")
      dau.join(mau, Seq("day"))
        .withColumn("stickiness_ppm", expr("(dau * 1000000L) div mau_est"))
        .orderBy(col("day"))
    }),

    // Cumulative CONVERSION curve (discrete survival): of users whose
    // journey starts with a view, what fraction converted within 1h /
    // 4h / 24h / 1 week — floor-ppm against the view cohort, one row
    // per horizon via a tiny explode.
    "q231_conversion_curve" -> ((s, d) => {
      val ev = T(s, d, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("__v"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("__v"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("__p"),
          first(col("__v")).as("__v0"))
        .select(col("user_id"),
          expr("(unix_micros(__p) - unix_micros(__v0)) div 1000000")
            .as("__tt"))
      val cohort = v.agg(count(lit(1)).as("__n"))
      val horizons = Seq(3600L, 14400L, 86400L, 604800L)
      conv.crossJoin(broadcast(cohort))
        .select(explode(array(horizons.map(lit(_)): _*)).as("horizon_sec"),
          col("__tt"), col("__n"))
        .groupBy(col("horizon_sec"))
        .agg(first(col("__n")).as("n_cohort"),
          count(when(col("__tt") <= col("horizon_sec"), 1L)).as("n_converted"))
        .withColumn("conv_ppm", expr("(n_converted * 1000000L) div n_cohort"))
        .orderBy(col("horizon_sec"))
    }),

    // Order↔lineitem RECONCILIATION (the ledger audit): each order's
    // header total against its detail sum in exact integer cents —
    // match / mismatch / childless counts plus the worst absolute
    // discrepancy. (The synthetic fixture prices are independent, so
    // discrepancies are EXPECTED — the contract pins the audit
    // arithmetic, not a clean ledger.)
    "q232_price_reconcile" -> ((s, d) => {
      val detail = T(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("__dc"))
      T(s, d, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("__hc"))
        .join(detail, col("o_orderkey") === col("l_orderkey"), "left")
        .select(
          when(col("__dc").isNull, lit("childless"))
            .when(abs(col("__hc") - col("__dc")) <= 100L, lit("match"))
            .otherwise(lit("mismatch")).as("status"),
          abs(col("__hc") - coalesce(col("__dc"), lit(0L))).as("__gap"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_orders"),
          max(col("__gap")).as("max_gap_cents"))
        .orderBy(col("status"))
    }),

    // Language-ID CONFUSION matrix: the q43 classifier against the
    // fixture's lang labels — per (label, prediction) counts, the
    // multi-class eval every lang filter ships with.
    "q233_lang_confusion" -> ((s, d) =>
      docsSpread(s, d)
        .select(col("lang"), TextOps.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"), col("lang_pred"))),

    // TIME-WEIGHTED average (TWAP): each observation holds until the
    // next same-user event; the mean weights values by their holding
    // duration in floor seconds — integer-exact milli arithmetic
    // (value quantized once to milli, products bounded, one floor
    // division) so bursty sampling can't bias the average.
    "q228_twap" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      T(s, d, "events")
        .withColumn("__next", lead(col("ts"), 1).over(w))
        .filter(col("__next").isNotNull)
        .select(col("user_id"),
          round(col("value") * 1000).cast("long").as("__vm"),
          expr("(unix_micros(__next) - unix_micros(ts)) div 1000000")
            .as("__dt"))
        .filter(col("__dt") > 0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_holds"),
          sum(col("__vm") * col("__dt")).as("__wsum"),
          sum(col("__dt")).as("held_seconds"))
        .select(col("user_id"), col("n_holds"), col("held_seconds"),
          expr("__wsum div held_seconds").as("twap_milli"))
        .orderBy(col("user_id"))
    }),

    // OHLC bars (candlesticks): per (user, hour) open/high/low/close
    // of the value stream — open/close via min/max(struct(ts, id,
    // value)) argmin/argmax, never a rank window.
    "q229_ohlc_bars" -> ((s, d) =>
      T(s, d, "events")
        .select(col("user_id"),
          date_trunc("hour", col("ts")).as("bar"),
          col("ts"), col("event_id"),
          round(col("value") * 1000).cast("long").as("__vm"))
        .groupBy(col("user_id"), col("bar"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("ts"), col("event_id"), col("__vm"))).as("__o"),
          max(struct(col("ts"), col("event_id"), col("__vm"))).as("__c"),
          max(col("__vm")).as("high_milli"),
          min(col("__vm")).as("low_milli"))
        .select(col("user_id"), col("bar").cast("timestamp").as("bar"),
          col("n"), col("__o.__vm").as("open_milli"),
          col("high_milli"), col("low_milli"),
          col("__c.__vm").as("close_milli"))
        .orderBy(col("user_id"), col("bar"))),

    // Top session PATHS: the q38 sessionizer's sessions rendered as
    // ordered event-type strings (short sessions only — paths are
    // presentation artifacts, not corpus-sized strings), counted and
    // top-20'd via TakeOrdered.
    "q230_top_paths" -> ((s, d) => {
      val sessions = T(s, d, "events")
        .withColumn("__prev", lag(col("ts"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
        .withColumn("__new",
          when(col("__prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("__prev")) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("__sid", sum(col("__new")).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions
        .groupBy(col("user_id"), col("__sid"))
        .agg(count(lit(1)).as("__n"),
          array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
        .filter(col("__n") <= 8)
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    }),

    // BLOCKED fuzzy join (record linkage): dirty customer names
    // (planted '#'-deletion typos) matched back by last-4-chars
    // blocking + banded Levenshtein + min(struct) best-match — never
    // a cross product, never a rank window.
    "q226_fuzzy_match" -> ((s, d) => {
      val cust = T(s, d, "customer")
      val dirty = cust.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 1000000L).as("dirty_id"),
          concat(substring(col("c_name"), 1, 8),
            substring(col("c_name"), 10, 30)).as("dirty_name"))
      graft.ext.Dedup.fuzzyJoin(dirty, "dirty_id", "dirty_name",
          cust.select(col("c_custkey"), col("c_name")), "c_custkey", "c_name",
          maxDistance = 1, blockKey = c => substring(c, -4, 4))
        .orderBy(col("dirty_id"))
    }),

    // EXACT per-language median length (Sampling.exactQuantileByKey):
    // the true order statistic via range-bucketed distributed ranks —
    // no per-key window partition, no sketch error.
    "q227_exact_median" -> ((s, d) =>
      graft.ext.Sampling.exactQuantileByKey(
          T(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "n_chars", "doc_id", qPermille = 500L)
        .orderBy(col("lang"))),

    // Array HIGHER-ORDER functions parity: transform / filter /
    // aggregate / zip_with / sort + slice over token arrays, checked
    // value-for-value against DuckDB's list lambdas — the API surface
    // a feature-engineering user reaches for first.
    "q222_array_hof" -> ((s, d) =>
      docsSpread(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__t"))
        .select(col("doc_id"),
          size(col("__t")).cast("long").as("n_tokens"),
          // transform: per-token lengths, then aggregate: exact sum
          aggregate(transform(col("__t"), t => length(t).cast("long")),
            lit(0L), (acc, x) => acc + x).as("chars_total"),
          // filter: long-token count
          size(filter(col("__t"), t => length(t) > 5)).cast("long")
            .as("n_long"),
          // zip_with adjacent (self shifted via slice): bigram join len
          size(zip_with(
            slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
            slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
            (a, b) => concat(a, lit(" "), b))).cast("long").as("n_bigrams"),
          // sort + first: lexicographically smallest token
          element_at(array_sort(col("__t")), 1).as("min_token"))
        .orderBy(col("doc_id"))),

    // NULL-semantics contract: the aggregate/grouping NULL rules every
    // engine must agree on — count(*) vs count(col), sum/avg skipping,
    // NULL group keys, coalesce/nullif — pinned cross-engine on a
    // derived frame with planted NULLs.
    "q223_null_semantics" -> ((s, d) => {
      val c = T(s, d, "customer")
        .select(col("c_custkey"),
          when(col("c_custkey") % 5 === 0, lit(null).cast("long"))
            .otherwise(col("c_nationkey").cast("long")).as("nk"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")).as("bal"))
      c.groupBy(coalesce(col("nk"), lit(-1L)).as("nk_group"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("bal")).as("n_bal"),
          dsum(col("bal")).as("sum_bal"),
          count(when(col("bal").isNull, 1L)).as("n_null_bal"),
          sum(nullif(col("nk"), lit(3L))).as("sum_nk_not3"))
        .orderBy(col("nk_group"))
    }),

    // DECIMAL-precision contract: exact fixed-point aggregation rules
    // — decimal sums, decimal×decimal products, floor/ceil to integer
    // — the arithmetic every money pipeline depends on being
    // bit-identical across engines.
    "q224_decimal_edge" -> ((s, d) =>
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            .as("sum_price"),
          round(sum(col("l_extendedprice").cast("decimal(18,4)") *
            col("l_quantity").cast("decimal(18,4)")), 0).cast("double")
            .as("sum_gross"),
          sum(floor(col("l_extendedprice")).cast("long")).as("floor_sum"),
          max(ceil(col("l_extendedprice")).cast("long")).as("ceil_max"))
        .orderBy(col("l_returnflag"))),

    // DATETIME function family parity: trunc/add_months/last_day/
    // dayofweek/quarter/epoch extraction over order dates — one row
    // per calendar month with every derived field hash-compared.
    "q225_datetime_family" -> ((s, d) =>
      T(s, d, "orders")
        .select(date_trunc("month", col("o_orderdate")).cast("date").as("m"),
          col("o_orderdate"))
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n"),
          min(to_date(col("o_orderdate"))).as("first_day"),
          max(dayofweek(col("o_orderdate")).cast("long")).as("max_dow"),
          max(quarter(col("o_orderdate")).cast("long")).as("q"),
          min(unix_micros(col("o_orderdate"))).as("min_us"))
        .withColumn("month_end", last_day(col("m")))
        .withColumn("next_month", add_months(col("m"), 1))
        .orderBy(col("m"))),

    // RECENCY-weighted engagement score: exponential half-life decay
    // as MODEL-AS-DATA — the weight table floor(1e6·2^(−age/7)) is
    // computed ONCE driver-side and shipped to both engines as
    // literals, so the score is integer-exact (in-engine pow() is not
    // bit-portable; a 41-row broadcast table is). Ages past the table
    // weigh 0 (fully decayed).
    "q218_recency_score" -> ((s, d) => {
      import s.implicits._
      val wts = RecencyWeights.toDF("age_days", "w_ppm")
      val ev = T(s, d, "events")
      val anchor = ev.agg(max(to_date(col("ts"))).as("__anchor"))
      ev.crossJoin(broadcast(anchor))
        .withColumn("age_days",
          datediff(col("__anchor"), to_date(col("ts"))).cast("long"))
        .join(broadcast(wts), Seq("age_days"), "left")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(coalesce(col("w_ppm"), lit(0L))).as("recency_score_ppm"))
        .orderBy(col("user_id"))
    }),

    // Session BOUNCE rate: the q38 sessionizer rolled to per-user
    // single-event-session shares (floor ppm) — the engagement-quality
    // readout a product dashboard leads with.
    "q219_bounce_rate" -> ((s, d) =>
      Streams.sessionizeBatch(T(s, d, "events"), "ts", "user_id", 30,
          Some("event_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounces"))
        .withColumn("bounce_ppm", expr("(n_bounces * 1000000L) div n_sessions"))
        .orderBy(col("user_id"))),

    // Time-to-convert DISTRIBUTION: per-user first view → first
    // later purchase delta in floor seconds, collapsed to converter
    // count + the q162 histogram-state median — the funnel-latency
    // readout with no global sort.
    "q220_time_to_convert" -> ((s, d) => {
      val ev = T(s, d, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("__v"))
      val deltas = ev.filter(col("event_type") === "purchase")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("__v"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("__p"),
          first(col("__v")).as("__v0"))
        .select(lit("all").as("g"),
          expr("(unix_micros(__p) - unix_micros(__v0)) div 1000000")
            .as("tt_sec"))
      graft.ext.Sketches.histQuantile(
          graft.ext.Sketches.histState(deltas, "g", "tt_sec",
            0.0, 4194304.0, 1024),
          "g", 0.5, 0.0, 4194304.0, 1024)
        .orderBy(col("g"))
    }),

    // Revenue COHORT matrix: customers bucketed by first-order month,
    // decimal-exact revenue per (cohort, month offset) — the CLV
    // retention table, exact integer month arithmetic.
    "q221_revenue_cohorts" -> ((s, d) => {
      val ord = T(s, d, "orders")
        .withColumn("__m",
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long"))
      val first = ord.groupBy(col("o_custkey")).agg(min(col("__m")).as("__m0"))
      ord.join(first, Seq("o_custkey"))
        .groupBy(col("__m0").as("cohort_month"),
          (col("__m") - col("__m0")).as("offset_months"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("cohort_month"), col("offset_months"))
    }),

    // TPC-H Q3 (shipping priority): the canonical 3-table selective
    // join-agg-topk — filters push to all three scans, the aggregate
    // is keyed on the join key, the top-10 is TakeOrdered.
    "q214_tpch_q3" -> ((s, d) => {
      val cut = lit("1998-01-01").cast("timestamp")
      T(s, d, "lineitem").filter(col("l_shipdate") > cut)
        .join(T(s, d, "orders").filter(col("o_orderdate") < cut),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 (local-supplier revenue): the 6-table star with the
    // c_nationkey = s_nationkey co-location condition; region/nation
    // broadcast, the fact-side joins stay keyed.
    "q215_tpch_q5" -> ((s, d) => {
      val y0 = lit("1996-01-01").cast("timestamp")
      val y1 = lit("1997-01-01").cast("timestamp")
      T(s, d, "lineitem")
        .join(T(s, d, "orders")
            .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(T(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q10 (returned-item customers): lost revenue per customer
    // over one quarter of returns, top 20 — join-agg-topk with the
    // dimension columns carried through the aggregate key.
    "q216_tpch_q10" -> ((s, d) => {
      val y0 = lit("1996-01-01").cast("timestamp")
      val y1 = lit("1996-04-01").cast("timestamp")
      T(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(T(s, d, "orders")
            .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 (large-volume customers): the agg-filter-rejoin shape
    // — a HAVING aggregate over the fact table becomes the semi-side
    // of the enrichment join, then the detail re-aggregates.
    "q217_tpch_q18" -> ((s, d) => {
      val big = T(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("__q"))
        .filter(col("__q") > 150)
        .select(col("l_orderkey").as("__bigkey"))
      T(s, d, "orders")
        .join(big, col("o_orderkey") === col("__bigkey"), "left_semi")
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Consecutive-day activity STREAKS (Behavior.activeStreaks): the
    // date-minus-rank island trick on the user partitioning.
    "q211_streaks" -> ((s, d) =>
      graft.ext.Behavior.activeStreaks(T(s, d, "events"), "user_id", "ts")
        .orderBy(col("user_id"))),

    // DEBOUNCE (Behavior.debounce): bursts collapse to island heads —
    // an event survives iff the previous same-(user,type) event is
    // > 60 s older. Reported as surviving counts per type next to the
    // raw counts (the suppression-rate readout).
    "q212_debounce" -> ((s, d) => {
      val ev = T(s, d, "events")
      val kept = graft.ext.Behavior.debounce(ev,
          Seq("user_id", "event_type"), "ts", minGapSeconds = 60L,
          tieCol = "event_id")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_kept"))
      ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_raw"))
        .join(kept, Seq("event_type"))
        .withColumn("suppressed_ppm",
          expr("((n_raw - n_kept) * 1000000L) div n_raw"))
        .orderBy(col("event_type"))
    }),

    // Deterministic MODE per group (Audit.modeOf): highest count,
    // ties to the smallest value — min(struct) over the (group,value)
    // rollup, never a rank window.
    "q213_mode" -> ((s, d) =>
      graft.ext.Audit.modeOf(T(s, d, "orders"),
          Seq("o_orderstatus"), "o_orderpriority")
        .orderBy(col("o_orderstatus"))),

    // Interval-UNION coverage (Behavior.coveredTime): each event opens
    // a 5-minute window, overlaps merge via gaps-and-islands on the
    // user partitioning, per-user union length in exact seconds — the
    // "minutes of activity" measure that double-counts nothing.
    "q210_covered_time" -> ((s, d) =>
      graft.ext.Behavior.coveredTime(T(s, d, "events"), "user_id", "ts",
          windowSeconds = 300L)
        .orderBy(col("user_id"))),

    // Right-to-be-forgotten across snapshot HISTORY
    // (TableStore.forgetWhere): time travel makes ordinary deletes
    // insufficient, so erasure rewrites EVERY committed version in
    // place — gated on per-version content plus the exact removed
    // count (2 versions × the matching rows).
    "q207_forget" -> ((s, d) => {
      val store = new TableStore(s, "/tmp/graft_store_q207")
      store.drop("cust_hist")
      val c = T(s, d, "customer")
      store.write("cust_hist", c) // v0
      store.write("cust_hist", c.withColumn("flag", lit(1L))) // v1
      val removed = store.forgetWhere("cust_hist", col("c_custkey") % 7 === 0)
      store.versions("cust_hist").map { v =>
        store.readVersion("cust_hist", v)
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("bal"))
          .select(lit(v.toLong).as("version"), col("n"), col("bal"),
            lit(removed).as("n_removed"))
      }.reduce(_ unionByName _).orderBy(col("version"))
    }),

    // FUNCTIONAL-DEPENDENCY audit (Audit.functionalDependencies):
    // three fixture relations profiled for determinant→dependent
    // integrity — one lhs-keyed aggregate per dependency.
    "q208_fd_audit" -> ((s, d) =>
      graft.ext.Audit.functionalDependencies(T(s, d, "nation"),
          Seq(("n_nationkey", "n_regionkey")))
        .unionByName(graft.ext.Audit.functionalDependencies(T(s, d, "customer"),
          Seq(("c_nationkey", "c_mktsegment"), ("c_custkey", "c_nationkey"))))
        .unionByName(graft.ext.Audit.functionalDependencies(T(s, d, "orders"),
          Seq(("o_orderkey", "o_custkey"))))
        .orderBy(col("dependency"))),

    // CANDIDATE-KEY discovery (Audit.candidateKeys): declared column
    // sets checked for row-identifying uniqueness — one distinct
    // aggregate per set.
    "q209_keys" -> ((s, d) =>
      graft.ext.Audit.candidateKeys(T(s, d, "customer"), Seq(
          Seq("c_custkey"), Seq("c_name"),
          Seq("c_nationkey", "c_mktsegment")))
        .orderBy(col("key_cols"))),

    // Classifier CALIBRATION table (the reliability diagram a quality
    // model ships with): the q113 scores cut into deciles by the
    // distributed exact NTILE, per-decile positive rate against an
    // arithmetic label — monotone rates = usable ranking. Min/max
    // score are order statistics (deterministic doubles); no score
    // sums ever cross engines.
    "q205_calibration" -> ((s, d) => {
      val scored = TextOps.linearModelScore(docsSpread(s, d), "doc_id",
          "text", TextOps.syntheticWeights(s, buckets = 64), buckets = 64)
        .withColumn("label", when(col("doc_id") % 3 === 0, 1L).otherwise(0L))
        .withColumn("__g", lit(1))
        // the NTILE cut reads its input twice (eager quantile probe +
        // ranked pass) — don't hash the corpus features twice
        .localCheckpoint(true)
      graft.ext.Sampling.ntileByKey(scored, "__g", "score", "doc_id", tiles = 10)
        .groupBy(col("tile").cast("long").as("decile"))
        .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"),
          min(col("score")).as("min_score"), max(col("score")).as("max_score"))
        .withColumn("pos_rate_ppm", expr("(n_pos * 1000000L) div n"))
        .orderBy(col("decile"))
    }),

    // Threshold SWEEP confusion matrix (Audit.binaryConfusion) over
    // the q113 scores: tp/fp/fn/tn + floor-ppm precision/recall/F1
    // (F1 in its tp-form — one integer division, engine-exact).
    "q206_confusion" -> ((s, d) => {
      val scored = TextOps.linearModelScore(docsSpread(s, d), "doc_id",
          "text", TextOps.syntheticWeights(s, buckets = 64), buckets = 64)
        .withColumn("label", when(col("doc_id") % 3 === 0, 1L).otherwise(0L))
      graft.ext.Audit.binaryConfusion(scored, "score", "label",
          thresholdsMilli = Seq(-100L, 0L, 100L))
        .orderBy(col("threshold_milli"))
    }),

    // Retrieval-quality EVALUATION (MRR / hit@k / recall@k) of the
    // q131 BM25 ranker against an arithmetic relevance set — the
    // metrics are floor-integer ppm, the ranking is the IEEE-replayed
    // score order, so the whole eval harness is oracle-exact. One
    // ranked top-20 per query term; all metric aggregates run over
    // those 20 rows + one broadcast corpus-relevance count.
    "q199_retrieval_eval" -> ((s, d) => {
      val docs = docsSpread(s, d)
      val nRel = docs.filter(col("doc_id") % 10 === 3)
        .agg(count(lit(1)).as("__nrel"))
      val terms = Seq("data", "model", "learning")
      terms.map { t =>
        val ranked = TextOps.bm25Rank(docs, "doc_id", "text", Seq(t),
            topK = 20, logIdf = false)
          .select(col("doc_id"),
            row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
              .cast("long").as("rank"))
        ranked.withColumn("__rel", col("doc_id") % 10 === 3)
          .agg(
            min(when(col("__rel"), col("rank"))).as("first_rel_rank"),
            sum(when(col("__rel") && col("rank") <= 10, 1L).otherwise(0L))
              .as("hits_at_10"),
            sum(when(col("__rel"), 1L).otherwise(0L)).as("hits_at_20"))
          .crossJoin(broadcast(nRel))
          .select(lit(t).as("term"), col("first_rel_rank"),
            coalesce(expr("1000000 div first_rel_rank"), lit(0L)).as("rr_ppm"),
            col("hits_at_10"), col("hits_at_20"),
            expr("(hits_at_20 * 1000000) div __nrel").as("recall_at_20_ppm"))
      }.reduce(_ unionByName _).orderBy(col("term"))
    }),

    // Snapshot COMPACTION round trip (TableStore.compact): the orders
    // table written as a deliberately fragmented snapshot (50-row
    // files), compacted into a fresh version, and read back through
    // the store — the oracle is the raw table, so "layout-only
    // rewrite" is gated on content, not trusted. File-count shrinkage
    // is pinned in DdlAndStoreSpec.
    "q204_compaction" -> ((s, d) => {
      val store = new TableStore(s, "/tmp/graft_store_q204")
      store.drop("orders_frag") // deterministic v0/v1 history per run
      // 1000-row files: fragmented enough to make compaction real
      // (sf0.1: ~150 files) without the write itself dominating the
      // contract (50-row files cost ~28 s of pure file overhead)
      store.write("orders_frag", T(s, d, "orders"), maxRecordsPerFile = 1000L)
      store.compact("orders_frag", maxRecordsPerFile = 1000000L)
      store.read("orders_frag")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    }),

    // Declarative data-CONTRACT validation (Deequ-style): five
    // row-level checks in ONE scan (each a conditional count inside a
    // single aggregate) plus one key-group aggregate for uniqueness.
    "q196_constraints" -> ((s, d) => {
      import graft.ext.Audit.{Check => C}
      graft.ext.Audit.checkConstraints(T(s, d, "orders"), Seq(
          C.notNull("o_custkey"),
          C.inRange("o_totalprice", 0.0, 600000.0),
          C.inSet("o_orderstatus", Seq("F", "O", "P")),
          C.matches("o_orderpriority", "^[1-5]-"),
          C.satisfies("date_bounds",
            col("o_orderdate") >= lit("1990-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("2010-01-01").cast("timestamp"))),
        unique = Seq(Seq("o_orderkey")))
        .orderBy(col("constraint"))
    }),

    // Triangle enumeration over the q150 link graph, DEGREE-ORDERED
    // (Suri & Vassilvitskii) so hub nodes can't explode the wedge
    // join; the oracle is the textbook a<b<c three-way self-join on
    // the normalized edge set — exactness of the oriented plan is the
    // point of the contract.
    "q197_triangles" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val e1 = docs.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * 31 + 7) % 101).as("dst"))
      val e2 = docs.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * 57 + 13) % 101).as("dst"))
      graft.ext.GraphOps.triangles(e1.unionByName(e2), "src", "dst")
        .orderBy(col("a"), col("b"), col("c"))
    }),

    // RFM segmentation: three distributed exact-NTILE cuts (the q138
    // machinery) over ONE per-customer aggregate — never a global
    // ntile() window over the customer base.
    "q198_rfm" -> ((s, d) =>
      graft.ext.Behavior.rfmSegments(T(s, d, "orders"), "o_custkey",
          "o_orderdate", "o_totalprice", tiles = 5)
        .orderBy(col("o_custkey"))),

    // K-anonymity audit over (nation, segment) quasi-identifiers:
    // group-size histogram + at-risk flag, state = |distinct QI| rows.
    "q200_k_anonymity" -> ((s, d) =>
      graft.ext.Audit.kAnonymity(T(s, d, "customer"),
          Seq("c_nationkey", "c_mktsegment"), k = 5L)
        .orderBy(col("group_size"))),

    // PRIORITY SAMPLING with the DLT estimator: 100 customers kept
    // proportional to positive balance cents, each with the unbiased
    // est_weight = max(w, tau) — subset sums over the sample estimate
    // true balance totals. Exact DECIMAL(38,0) priorities (w*2^56/h,
    // floor), portable hash, tau = the 101st priority. The contract
    // carries the >int64 decimals SPLIT at 10^18 into (hi, lo) BIGINT
    // pairs — DECIMAL(38,0) values past 2^63 render differently under
    // pyarrow/pandas/float canonicalizers (the r12 driver-vs-local
    // hash divergence), so no >int64 value may ride the gate hash.
    "q313_priority_sample" -> ((s, d) => {
      val base = T(s, d, "customer").select(
        col("c_custkey").as("id"),
        round(col("c_acctbal") * 100).cast("long").as("w"))
      val Dec = "decimal(38,0)"
      val B = lit("1000000000000000000").cast(Dec) // 10^18
      def hi(c: Column) = graft.ext.PortableDiv.floorDec(c, B)
      def lo(c: Column) = pmod(c, B).cast("long")
      graft.ext.Sampling.prioritySample(base, "id", "w", n = 100)
        .select(col("id"), col("w"),
          hi(col("priority")).as("priority_hi"),
          lo(col("priority")).as("priority_lo"),
          hi(col("est_weight")).as("est_hi"),
          lo(col("est_weight")).as("est_lo"))
        .orderBy(col("id"))
    }),

    // K-ANONYMITY GENERALIZATION LATTICE: every (nation, balance-band,
    // segment) generalization combo evaluated in ONE data pass (cells
    // first, then the 18-node lattice over the domain-sized cell
    // frame) — the release-planning sweep q200's single-node audit
    // feeds. Ladder: nation raw -> mod-5 -> '*'; balance fine band
    // (1000s of dollars) -> coarse band (10,000s) -> '*'; segment raw
    // -> '*'.
    "q309_k_anon_lattice" -> ((s, d) => {
      val cents = round(col("c_acctbal") * 100).cast("long")
      graft.ext.Audit.kAnonymityLattice(T(s, d, "customer"), Seq(
          "nation" -> Seq(col("c_nationkey"), col("c_nationkey") % 5, lit("*")),
          "bal" -> Seq(
            floor(cents.cast("double") / lit(100000.0)).cast("long"),
            floor(cents.cast("double") / lit(1000000.0)).cast("long"),
            lit("*")),
          "seg" -> Seq(col("c_mktsegment"), lit("*"))), k = 5L)
        .orderBy(col("lvl_nation"), col("lvl_bal"), col("lvl_seg"))
    }),

    // INCOGNITO-PRUNED lattice (r14): the q309 sweep with
    // monotonicity pruning — bottom-up by height, nodes dominated by
    // an already-k-anonymous node are INFERRED (k_anonymous = 1, NULL
    // profile) instead of evaluated. `evaluated` is closed-form (a
    // node evaluates iff no strictly-dominated node is k-anonymous),
    // so the oracle replays the whole sweep including what was
    // SKIPPED — an inference bug (wrong verdict or wrong frontier)
    // hash-mismatches.
    "q336_k_anon_lattice_pruned" -> ((s, d) => {
      val cents = round(col("c_acctbal") * 100).cast("long")
      graft.ext.Audit.kAnonymityLatticePruned(T(s, d, "customer"), Seq(
          "nation" -> Seq(col("c_nationkey"), col("c_nationkey") % 5, lit("*")),
          "bal" -> Seq(
            floor(cents.cast("double") / lit(100000.0)).cast("long"),
            floor(cents.cast("double") / lit(1000000.0)).cast("long"),
            lit("*")),
          "seg" -> Seq(col("c_mktsegment"), lit("*"))), k = 5L)
        .orderBy(col("lvl_nation"), col("lvl_bal"), col("lvl_seg"))
    }),

    // LINEAR multi-touch attribution: each first purchase splits
    // exactly 1e6 ppm across its preceding touches (largest-remainder
    // to the earliest), aggregated per touch type — engine-exact
    // integer credit.
    "q201_attribution" -> ((s, d) =>
      graft.ext.Behavior.linearAttribution(T(s, d, "events"), "user_id",
          "ts", "event_type", convType = "purchase", tieCol = "event_id")
        .orderBy(col("event_type"))),

    // CUPED variance-reduced A/B readout: pre-period counts as the
    // covariate, θ from exact int64 sufficient statistics, sign-split
    // truncating division — bit-identical across engines.
    "q202_cuped" -> ((s, d) =>
      graft.ext.Behavior.cuped(T(s, d, "events"), "user_id", "ts",
          "event_type", splitTs = "2024-01-15 00:00:00")
        .orderBy(col("variant"))),

    // Flesch–Kincaid readability BANDS (milli-grade floor integers,
    // vowel-group syllable proxy): the grade histogram a quality pass
    // reads to kill both anchor-text soup and minified run-ons.
    "q203_readability" -> ((s, d) => {
      val stats = docsSpread(s, d).select(
        (col("doc_id") +: TextOps.readabilityStats(col("text"))): _*)
      stats.filter(col("words") > 0)
        .withColumn("band",
          when(col("fk_grade_milli") < 0, lit(0L))
            .otherwise(least(lit(20L), expr("fk_grade_milli div 1000"))))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("fk_grade_milli")).as("min_grade_milli"),
          max(col("fk_grade_milli")).as("max_grade_milli"))
        .orderBy(col("band"))
    }))

  def oracleSql: Map[String, String] = Map(
    // SCD2 change rows (zero-length dropped) + DuckDB ASOF backward
    "q303_pit_join" ->
      """WITH ch AS (
        |  SELECT user_id, event_type, ts,
        |    lag(event_type) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |scd AS (
        |  SELECT user_id, event_type AS state, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, rn) AS valid_to
        |  FROM ch WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        |dim AS (SELECT user_id, state, valid_from FROM scd
        |  WHERE valid_to IS NULL OR valid_to > valid_from),
        |facts AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, d.state, d.valid_from
        |FROM facts f ASOF LEFT JOIN dim d
        |  ON f.user_id = d.user_id AND f.ts >= d.valid_from
        |ORDER BY event_id""".stripMargin,

    // first-seen day per user, day cells, exact ppm
    "q305_new_returning" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_part('day', ts) AS BIGINT) AS d
        |  FROM events),
        |f AS (SELECT user_id, min(d) AS fd FROM ud GROUP BY 1),
        |c AS (SELECT ud.d AS day, count(*) AS n_active,
        |    sum(CASE WHEN ud.d = f.fd THEN 1 ELSE 0 END) AS n_new
        |  FROM ud JOIN f ON f.user_id = ud.user_id GROUP BY 1)
        |SELECT day, CAST(n_active AS BIGINT) AS n_active,
        |  CAST(n_new AS BIGINT) AS n_new,
        |  CAST(n_active - n_new AS BIGINT) AS n_returning,
        |  CAST((CAST(n_new AS HUGEINT) * 1000000) // n_active AS BIGINT) AS new_ppm
        |FROM c ORDER BY day""".stripMargin,

    // the q38 session CTEs rolled up to one KPI row
    "q298_bounce_rate" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f),
        |g AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2),
        |a AS (SELECT count(*) AS n_sessions,
        |    sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS n_bounce FROM g)
        |SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
        |  CAST(n_bounce AS BIGINT) AS n_bounce,
        |  CASE WHEN n_sessions > 0
        |    THEN CAST((CAST(n_bounce AS HUGEINT) * 1000000) // n_sessions AS BIGINT)
        |    ELSE NULL END AS bounce_ppm
        |FROM a""".stripMargin,

    // first signup -> first subsequent purchase; the q255 rank rule
    "q299_time_to_convert" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS s FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |lat AS (
        |  SELECT e.user_id,
        |    CAST(floor(CAST(epoch_us(min(e.ts)) - epoch_us(su.s) AS DOUBLE) / 60000000.0) AS BIGINT) AS lat_min
        |  FROM events e JOIN su ON su.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.s
        |  GROUP BY e.user_id, su.s),
        |r AS (SELECT lat_min,
        |    row_number() OVER (ORDER BY lat_min, user_id) AS rk,
        |    count(*) OVER () AS n
        |  FROM lat),
        |q(q_permille) AS (VALUES (500), (900), (990))
        |SELECT CAST(q.q_permille AS BIGINT) AS q_permille,
        |  CAST(r.n AS BIGINT) AS n, CAST(r.lat_min AS DOUBLE) AS q_value
        |FROM r JOIN q ON r.rk = greatest(1, (q.q_permille * r.n + 999) // 1000)
        |ORDER BY q_permille""".stripMargin,

    // global cumulative share over (cents DESC, partkey), exact ppm
    "q300_abc_classes" ->
      """WITH rev AS (
        |  SELECT l_partkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT l_partkey, cents,
        |    sum(CAST(cents AS HUGEINT)) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    (SELECT sum(CAST(cents AS HUGEINT)) FROM rev) AS tot
        |  FROM rev),
        |cl AS (SELECT
        |    CASE WHEN (cum * 1000000) // tot <= 800000 THEN 'A'
        |         WHEN (cum * 1000000) // tot <= 950000 THEN 'B'
        |         ELSE 'C' END AS abc_class, cents
        |  FROM c)
        |SELECT abc_class, count(*) AS n_keys,
        |  CAST(sum(CAST(cents AS HUGEINT)) AS BIGINT) AS cents
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,

    // cohort = per-user min day; cells exact; cum over the cell frame
    "q291_cohort_revenue" ->
      """WITH b AS (
        |  SELECT user_id AS u, CAST(date_part('day', ts) AS BIGINT) AS d,
        |    CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |ch AS (SELECT u, min(d) AS cd FROM b GROUP BY 1),
        |cells AS (SELECT ch.cd AS cohort_day, b.d - ch.cd AS age,
        |    count(DISTINCT b.u) AS n_users,
        |    sum(CAST(b.c AS HUGEINT)) AS cents
        |  FROM b JOIN ch ON ch.u = b.u GROUP BY 1, 2)
        |SELECT cohort_day, age, n_users, CAST(cents AS BIGINT) AS cents,
        |  CAST(sum(cents) OVER (PARTITION BY cohort_day ORDER BY age
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |FROM cells ORDER BY cohort_day, age""".stripMargin,

    // tenure histogram + reverse-cumulative at-risk, floor-ppm hazard
    "q293_churn_tenure" ->
      """WITH per AS (
        |  SELECT user_id,
        |    max(CAST(date_part('day', ts) AS BIGINT))
        |      - min(CAST(date_part('day', ts) AS BIGINT)) AS tenure
        |  FROM events GROUP BY 1),
        |h AS (SELECT tenure, count(*) AS n_ended FROM per GROUP BY 1),
        |r AS (SELECT tenure, n_ended,
        |    sum(n_ended) OVER (ORDER BY tenure DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk
        |  FROM h)
        |SELECT tenure, n_ended, CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |  CAST((CAST(n_ended AS HUGEINT) * 1000000) // n_at_risk AS BIGINT) AS hazard_ppm
        |FROM r ORDER BY tenure""".stripMargin,

    // the q293 CTEs + a recursive CTE replaying the per-step ppm
    // floor of the product-limit recurrence, step for step
    "q310_kaplan_meier" ->
      """WITH RECURSIVE per AS (
        |  SELECT user_id,
        |    max(CAST(date_part('day', ts) AS BIGINT))
        |      - min(CAST(date_part('day', ts) AS BIGINT)) AS tenure
        |  FROM events GROUP BY 1),
        |h AS (SELECT tenure, count(*) AS n_ended FROM per GROUP BY 1),
        |r AS (SELECT tenure, n_ended,
        |    sum(n_ended) OVER (ORDER BY tenure DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_at_risk,
        |    row_number() OVER (ORDER BY tenure) AS rn
        |  FROM h),
        |rec AS (
        |  SELECT rn, tenure, n_ended, n_at_risk,
        |    CAST((CAST(1000000 AS HUGEINT) * (n_at_risk - n_ended)) // n_at_risk AS BIGINT) AS s_ppm
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.rn, r.tenure, r.n_ended, r.n_at_risk,
        |    CAST((CAST(rec.s_ppm AS HUGEINT) * (r.n_at_risk - r.n_ended)) // r.n_at_risk AS BIGINT)
        |  FROM r JOIN rec ON r.rn = rec.rn + 1)
        |SELECT tenure, n_ended, CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |  s_ppm AS survival_ppm
        |FROM rec ORDER BY tenure""".stripMargin,

    // per-(user, type) lag gaps; CV2/dispersion exact from three sums
    "q287_burstiness" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
        |  FROM events),
        |a AS (SELECT event_type, count(*) AS n,
        |    sum(CAST(gap AS HUGEINT)) AS sg,
        |    sum(CAST(gap AS HUGEINT) * gap) AS sg2
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
        |  CAST(sg // n AS BIGINT) AS mean_gap_ms,
        |  CASE WHEN n >= 2 AND sg > 0
        |    THEN CAST(((n * sg2 - sg * sg) * 1000000) // (sg * sg) AS BIGINT)
        |    ELSE NULL END AS cv2_ppm,
        |  CASE WHEN n >= 2 AND sg > 0
        |    THEN CAST(((n * sg2 - sg * sg) * 1000) // (n * sg) AS BIGINT)
        |    ELSE NULL END AS dispersion_milli
        |FROM a ORDER BY event_type""".stripMargin,

    // two leads per user, top 20 paths
    "q288_event_trigrams" ->
      """WITH t AS (
        |  SELECT event_type AS s1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s3
        |  FROM events)
        |SELECT s1 AS step_1, s2 AS step_2, s3 AS step_3, count(*) AS n
        |FROM t WHERE s2 IS NOT NULL AND s3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step_1, step_2, step_3 LIMIT 20""".stripMargin,



    // floor-integer ppm/ratio arithmetic mirrored operator for
    // operator (the ratio is DEFINED as the division composition)
    "q161_key_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS keys FROM c)
        |SELECT user_id, cnt,
        |  CAST((cnt * 1000000) // total AS BIGINT) AS share_ppm,
        |  CAST((((cnt * 1000000) // total) * keys) // 1000 AS BIGINT) AS ratio_milli
        |FROM c, t ORDER BY cnt DESC, user_id ASC NULLS FIRST LIMIT 25""".stripMargin,

    // histogram percentile replay at 0.05/0.95, then the clamp; the
    // NULL guard mirrors the engine's explicit CASE
    "q167_winsorize" ->
      """WITH v AS (SELECT doc_id, lang, n_chars, CAST(n_chars AS DOUBLE) AS x FROM documents),
        |b AS (SELECT lang, least(255, greatest(0, CAST(floor((x - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM v WHERE x IS NOT NULL),
        |h AS (SELECT lang, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT lang, bin,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n FROM h),
        |plo AS (SELECT lang, 0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS wlo
        |  FROM c WHERE cum >= CAST(ceil(0.05 * n) AS BIGINT) GROUP BY 1),
        |phi AS (SELECT lang, 0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS whi
        |  FROM c WHERE cum >= CAST(ceil(0.95 * n) AS BIGINT) GROUP BY 1)
        |SELECT v.doc_id, v.lang, v.n_chars,
        |  CASE WHEN v.x IS NULL THEN NULL
        |       ELSE least(greatest(v.x, plo.wlo), phi.whi) END AS n_chars_wins
        |FROM v LEFT JOIN plo ON v.lang = plo.lang LEFT JOIN phi ON v.lang = phi.lang
        |ORDER BY v.doc_id""".stripMargin,

    // first-event-date cohorts, distinct active (user, offset) pairs
    "q168_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT e.user_id, f.cohort_date,
        |    CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS BIGINT) AS offset_days
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort_date, offset_days, count(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // stage-k = earliest stage event strictly after the committed
    // stage-(k-1) time; inner joins carry the qualification forward
    "q169_funnel" ->
      """WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
        |    (SELECT count(*) FROM s0) AS n_users
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM s1)
        |  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s2))
        |ORDER BY stage""".stripMargin,

    // per-day registers, 7-day range-join merge by max, then the
    // standard integer estimator (the q91 recipe with a day dimension)
    "q172_rolling_wau" ->
      s"""WITH h AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(user_id AS VARCHAR))), 1, 14)) AS BIGINT) AS h
        |  FROM events),
        |b AS (
        |  SELECT day, h & 63 AS b,
        |    CASE WHEN (h >> 6) = 0 THEN 30
        |         ELSE least(30, 51 - length(bin(h >> 6))) END AS rho
        |  FROM h),
        |regs AS (SELECT day, b, max(rho) AS r FROM b GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day AS target FROM regs),
        |merged AS (
        |  SELECT d.target AS day, r.b, max(r.r) AS r
        |  FROM days d JOIN regs r ON date_diff('day', r.day, d.target) BETWEEN 0 AND 6
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT day, sum(${1L << 30} >> r) AS s, count(*) AS present
        |  FROM merged GROUP BY 1),
        |e AS (
        |  SELECT day, 64 - present AS zeros,
        |    ${709L * 4096L * (1L << 30)}
        |      // (1000 * (s + (64 - present) * ${1L << 30})) AS raw
        |  FROM s)
        |SELECT day,
        |  CAST(CASE WHEN raw <= 160 AND zeros > 0
        |    THEN ([${graft.ext.Sketches.HllLinearCounting.mkString(", ")}])[CAST(zeros AS INTEGER)]
        |    ELSE raw END AS BIGINT) AS est_distinct
        |FROM e ORDER BY day""".stripMargin,

    // portable-hash arm assignment replayed; rates are floor ppm
    "q170_ab_lift" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(user_id AS VARCHAR))), 1, 14)) AS BIGINT) % 2 AS variant
        |  FROM u),
        |c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT v.variant, count(*) AS n_users,
        |  CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |  CAST((sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS rate_ppm
        |FROM v LEFT JOIN c USING (user_id)
        |GROUP BY v.variant ORDER BY v.variant""".stripMargin,

    // one lead window per user, pair counts, floor-ppm row normalize
    "q171_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS cnt FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(cnt) AS tot FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.cnt,
        |  CAST((c.cnt * 1000000) // t.tot AS BIGINT) AS p_ppm
        |FROM c JOIN t USING (from_type)
        |ORDER BY c.from_type, c.to_type""".stripMargin,

    // first-occurrence doc per BIGRAM, quartile ranges over the id span
    "q193_vocab_growth" ->
      """WITH tk0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, unnest(CASE WHEN len(tokens) >= 2
        |    THEN list_transform(range(1, len(tokens)), i -> array_to_string(tokens[i:i+1], ' '))
        |    ELSE [] END) AS t FROM tk0),
        |fd AS (SELECT t, min(doc_id) AS first FROM tk GROUP BY 1),
        |b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
        |q AS (SELECT CAST(least(4, ((first - lo) * 4) // (hi - lo + 1) + 1) AS BIGINT) AS quartile
        |  FROM fd CROSS JOIN b),
        |g AS (SELECT quartile, count(*) AS new_words FROM q GROUP BY 1)
        |SELECT quartile, new_words,
        |  CAST(sum(new_words) OVER (ORDER BY quartile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
        |FROM g ORDER BY quartile""".stripMargin,

    // the q39 fingerprint clusters rolled to a size distribution,
    // over the same mirror-planted corpus
    "q194_dup_size_dist" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0
        |  UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id = 0),
        |c AS (
        |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |    count(*) AS cluster_size
        |  FROM d GROUP BY 1)
        |SELECT cluster_size, count(*) AS n_clusters
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // floor shares + largest-remainder top-up, slots from the floor
    // deficit — sums to exactly 1000 by construction
    "q195_source_share" ->
      """WITH c AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot FROM c),
        |f AS (SELECT source, tokens,
        |    (tokens * 1000) // t.tot AS fl, (tokens * 1000) % t.tot AS rem
        |  FROM c CROSS JOIN t),
        |r AS (SELECT source, tokens, fl,
        |    row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    (SELECT 1000 - sum(fl) FROM f) AS slots FROM f)
        |SELECT source, tokens,
        |  CAST(fl + CASE WHEN rk <= slots THEN 1 ELSE 0 END AS BIGINT) AS share_permille
        |FROM r ORDER BY source""".stripMargin,

    // each row-level check a conditional count, uniqueness a key-group
    // aggregate — one report row per constraint
    "q196_constraints" ->
      """WITH n AS (SELECT count(*) AS n_rows FROM orders),
        |v AS (
        |  SELECT 'not_null(o_custkey)' AS c,
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS nv
        |  UNION ALL SELECT 'in_range(o_totalprice)',
        |    (SELECT count(*) FROM orders WHERE o_totalprice IS NULL OR o_totalprice < 0.0 OR o_totalprice > 600000.0)
        |  UNION ALL SELECT 'in_set(o_orderstatus)',
        |    (SELECT count(*) FROM orders WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('F', 'O', 'P'))
        |  UNION ALL SELECT 'matches(o_orderpriority)',
        |    (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-'))
        |  UNION ALL SELECT 'satisfies(date_bounds)',
        |    (SELECT count(*) FROM orders WHERE NOT coalesce(o_orderdate >= TIMESTAMP '1990-01-01' AND o_orderdate < TIMESTAMP '2010-01-01', false))
        |  UNION ALL SELECT 'unique(o_orderkey)',
        |    (SELECT CAST(coalesce(sum(g.c - 1), 0) AS BIGINT)
        |     FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey) g))
        |SELECT v.c AS "constraint", n.n_rows, CAST(v.nv AS BIGINT) AS n_violations,
        |  CAST(CASE WHEN v.nv = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM v CROSS JOIN n ORDER BY "constraint"""".stripMargin,

    // the textbook a<b<c three-way self-join on the normalized
    // undirected edge set — the degree-ordered plan must enumerate
    // exactly these triangles
    "q197_triangles" ->
      """WITH raw AS (
        |  SELECT doc_id % 101 AS s, (doc_id * 31 + 7) % 101 AS d FROM documents
        |  UNION ALL
        |  SELECT doc_id % 101, (doc_id * 57 + 13) % 101 FROM documents),
        |e AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
        |  FROM raw WHERE s <> d)
        |SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |FROM e e1
        |JOIN e e2 ON e2.u = e1.v
        |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |ORDER BY a, b, c""".stripMargin,

    // three plain ntile() windows over the per-customer rollup —
    // the distributed cut must agree tile for tile
    "q198_rfm" ->
      """WITH base AS (
        |  SELECT o_custkey,
        |    max(epoch_us(o_orderdate)) AS recency,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1),
        |t AS (SELECT o_custkey, recency, frequency, monetary,
        |    CAST(ntile(5) OVER (ORDER BY recency DESC, o_custkey) AS BIGINT) AS r_tile,
        |    CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_tile,
        |    CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m_tile
        |  FROM base)
        |SELECT o_custkey, recency, frequency, monetary, r_tile, f_tile, m_tile,
        |  concat(r_tile, f_tile, m_tile) AS segment
        |FROM t ORDER BY o_custkey""".stripMargin,

    // QI group sizes rolled to a size histogram + at-risk flag
    "q200_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS sz
        |  FROM customer GROUP BY 1, 2)
        |SELECT sz AS group_size, count(*) AS n_groups,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(CASE WHEN sz < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
        |FROM g GROUP BY sz ORDER BY group_size""".stripMargin,

    // same hash, same floor division, same tie rule; tau via the
    // rank-101 row; the >int64 HUGEINT priority/estimate split at
    // 10^18 into int64-safe (hi, lo) BIGINT pairs (// and % floor on
    // the non-negative operands, matching the engine's pmod identity)
    "q313_priority_sample" ->
      """WITH b AS (
        |  SELECT c_custkey AS id, CAST(round(c_acctbal * 100) AS BIGINT) AS w
        |  FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0),
        |h AS (SELECT id, w,
        |    greatest(CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(id AS VARCHAR))), 1, 14)) AS BIGINT), 1) AS hh
        |  FROM b),
        |p AS (SELECT id, w,
        |    (CAST(w AS HUGEINT) * 72057594037927936) // hh AS pr FROM h),
        |r AS (SELECT id, w, pr,
        |    row_number() OVER (ORDER BY pr DESC, id) AS rn FROM p),
        |tau AS (SELECT max(CASE WHEN rn = 101 THEN pr END) AS t
        |  FROM r WHERE rn <= 101),
        |k AS (SELECT r.id, r.w, r.pr,
        |    greatest(CAST(r.w AS HUGEINT), coalesce(tau.t, 0)) AS est
        |  FROM r CROSS JOIN tau WHERE r.rn <= 100)
        |SELECT id, w,
        |  CAST(pr // 1000000000000000000 AS BIGINT) AS priority_hi,
        |  CAST(pr % 1000000000000000000 AS BIGINT) AS priority_lo,
        |  CAST(est // 1000000000000000000 AS BIGINT) AS est_hi,
        |  CAST(est % 1000000000000000000 AS BIGINT) AS est_lo
        |FROM k ORDER BY id""".stripMargin,

    // the exact covariance trace from integer moments on the 1e-4
    // quantized grid (hugeint arithmetic — never the eigenbasis);
    // every Jacobi-side invariant pinned as a literal 'true'
    "q337_pca_invariants" ->
      """WITH q AS (
        |  SELECT CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT) AS xq,
        |    unnest(range(len(embedding))) AS pos
        |  FROM embeddings),
        |m AS (
        |  SELECT pos, sum(CAST(xq AS HUGEINT)) AS s1,
        |    sum(CAST(xq AS HUGEINT) * xq) AS s2, count(*) AS n
        |  FROM q GROUP BY pos)
        |SELECT * FROM (
        |  SELECT 'trace_num' AS probe,
        |    CAST(sum(n * s2 - s1 * s1) AS VARCHAR) AS value FROM m
        |  UNION ALL SELECT 'trace_den_n',
        |    (SELECT CAST(count(*) AS VARCHAR) FROM embeddings)
        |  UNION ALL SELECT 'capture_in_unit_range', 'true'
        |  UNION ALL SELECT 'eig_sum_matches_trace', 'true'
        |  UNION ALL SELECT 'eigvals_desc_nonneg', 'true'
        |  UNION ALL SELECT 'orthonormal_basis', 'true'
        |  UNION ALL SELECT 'proj_var_matches_eigvals', 'true')
        |ORDER BY probe""".stripMargin,

    // one generated SELECT per lattice node over the same
    // generalization expressions, UNION ALL'd — the node summaries
    // replay the engine's two-aggregate pass group for group
    "q309_k_anon_lattice" -> {
      val nationLv = Seq("CAST(c_nationkey AS VARCHAR)",
        "CAST(c_nationkey % 5 AS VARCHAR)", "'*'")
      val balLv = Seq(
        "CAST(CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000.0) AS BIGINT) AS VARCHAR)",
        "CAST(CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 1000000.0) AS BIGINT) AS VARCHAR)",
        "'*'")
      val segLv = Seq("c_mktsegment", "'*'")
      val nodes = for {
        a <- nationLv.indices; b <- balLv.indices; c <- segLv.indices
      } yield
        s"""SELECT CAST($a AS BIGINT) AS lvl_nation, CAST($b AS BIGINT) AS lvl_bal,
           |  CAST($c AS BIGINT) AS lvl_seg, count(*) AS n_groups,
           |  CAST(min(sz) AS BIGINT) AS min_group_size,
           |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS n_at_risk_rows,
           |  CAST(CASE WHEN min(sz) >= 5 THEN 1 ELSE 0 END AS BIGINT) AS k_anonymous
           |FROM (SELECT ${nationLv(a)} AS g1, ${balLv(b)} AS g2, ${segLv(c)} AS g3,
           |    count(*) AS sz FROM customer GROUP BY 1, 2, 3)""".stripMargin
      nodes.mkString("", "\nUNION ALL\n",
        "\nORDER BY lvl_nation, lvl_bal, lvl_seg")
    },

    // the q309 node summaries + the closed-form frontier: a node is
    // evaluated iff NO strictly-dominated node is k-anonymous;
    // inferred nodes read k_anonymous = 1 with NULL profiles
    "q336_k_anon_lattice_pruned" -> {
      val nationLv = Seq("CAST(c_nationkey AS VARCHAR)",
        "CAST(c_nationkey % 5 AS VARCHAR)", "'*'")
      val balLv = Seq(
        "CAST(CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000.0) AS BIGINT) AS VARCHAR)",
        "CAST(CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 1000000.0) AS BIGINT) AS VARCHAR)",
        "'*'")
      val segLv = Seq("c_mktsegment", "'*'")
      val nodes = for {
        a <- nationLv.indices; b <- balLv.indices; c <- segLv.indices
      } yield
        s"""SELECT CAST($a AS BIGINT) AS lvl_nation, CAST($b AS BIGINT) AS lvl_bal,
           |  CAST($c AS BIGINT) AS lvl_seg, count(*) AS n_groups,
           |  CAST(min(sz) AS BIGINT) AS min_group_size,
           |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS n_at_risk_rows,
           |  CAST(CASE WHEN min(sz) >= 5 THEN 1 ELSE 0 END AS BIGINT) AS k_anonymous
           |FROM (SELECT ${nationLv(a)} AS g1, ${balLv(b)} AS g2, ${segLv(c)} AS g3,
           |    count(*) AS sz FROM customer GROUP BY 1, 2, 3)""".stripMargin
      s"""WITH nodes AS (
         |${nodes.mkString("\nUNION ALL\n")}
         |)
         |SELECT n.lvl_nation, n.lvl_bal, n.lvl_seg,
         |  CASE WHEN ev = 1 THEN n.n_groups END AS n_groups,
         |  CASE WHEN ev = 1 THEN n.min_group_size END AS min_group_size,
         |  CASE WHEN ev = 1 THEN n.n_at_risk_rows END AS n_at_risk_rows,
         |  n.k_anonymous, CAST(ev AS BIGINT) AS evaluated
         |FROM (
         |  SELECT n.*, CASE WHEN EXISTS (SELECT 1 FROM nodes a
         |      WHERE a.k_anonymous = 1
         |        AND a.lvl_nation <= n.lvl_nation AND a.lvl_bal <= n.lvl_bal
         |        AND a.lvl_seg <= n.lvl_seg
         |        AND (a.lvl_nation < n.lvl_nation OR a.lvl_bal < n.lvl_bal
         |          OR a.lvl_seg < n.lvl_seg))
         |    THEN 0 ELSE 1 END AS ev
         |  FROM nodes n) n
         |ORDER BY lvl_nation, lvl_bal, lvl_seg""".stripMargin
    },

    // first purchase per user, pre-conversion touches ranked, floor
    // ppm + largest-remainder credit, per-type rollup
    "q201_attribution" ->
      """WITH conv AS (
        |  SELECT user_id, min(ts) AS cts FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (
        |  SELECT e.user_id, e.event_type, e.ts, e.event_id
        |  FROM events e JOIN conv c ON e.user_id = c.user_id
        |  WHERE e.event_type <> 'purchase' AND e.ts < c.cts),
        |r AS (
        |  SELECT event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM t)
        |SELECT event_type, count(*) AS n_touches,
        |  CAST(sum(1000000 // n + CASE WHEN rk <= 1000000 % n THEN 1 ELSE 0 END) AS BIGINT) AS credit_ppm
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // θ from int64 sufficient statistics, sign-split division so
    // truncating (Spark div) and flooring (//) engines agree
    "q202_cuped" ->
      """WITH xy AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |v AS (SELECT *,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(user_id AS VARCHAR))), 1, 14)) AS BIGINT) % 2 AS variant
        |  FROM xy),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy FROM v),
        |t AS (SELECT n, sx,
        |    CASE WHEN (n * sxy - sx * sy) < 0
        |      THEN -(((-(n * sxy - sx * sy)) * 1000) // (n * sxx - sx * sx))
        |      ELSE ((n * sxy - sx * sy) * 1000) // (n * sxx - sx * sx) END AS theta_milli,
        |    (sx * 1000) // n AS xbar_milli FROM s),
        |a AS (SELECT v.variant, v.y,
        |    v.y * 1000 - (CASE WHEN t.theta_milli * (v.x * 1000 - t.xbar_milli) < 0
        |      THEN -((-(t.theta_milli * (v.x * 1000 - t.xbar_milli))) // 1000)
        |      ELSE (t.theta_milli * (v.x * 1000 - t.xbar_milli)) // 1000 END) AS adj_milli,
        |    t.theta_milli FROM v CROSS JOIN t)
        |SELECT variant, count(*) AS n_users,
        |  CAST((sum(y) * 1000) // count(*) AS BIGINT) AS mean_raw_milli,
        |  CAST(CASE WHEN sum(adj_milli) < 0
        |    THEN -((-sum(adj_milli)) // count(*))
        |    ELSE sum(adj_milli) // count(*) END AS BIGINT) AS mean_adj_milli,
        |  CAST(min(theta_milli) AS BIGINT) AS theta_milli
        |FROM a GROUP BY variant ORDER BY variant""".stripMargin,

    // whitespace words, terminal-punct sentence runs, vowel-group
    // syllables; FK milli-grade under nonneg floor division
    "q203_readability" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END AS words,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS sentences,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vg
        |  FROM documents),
        |g AS (SELECT
        |    (words * 390) // sentences + (vg * 11800) // words - 15590 AS grade
        |  FROM s WHERE words > 0),
        |b AS (SELECT CASE WHEN grade < 0 THEN 0
        |    ELSE least(20, grade // 1000) END AS band, grade FROM g)
        |SELECT CAST(band AS BIGINT) AS band, count(*) AS n_docs,
        |  CAST(min(grade) AS BIGINT) AS min_grade_milli,
        |  CAST(max(grade) AS BIGINT) AS max_grade_milli
        |FROM b GROUP BY band ORDER BY band""".stripMargin,

    // per-term BM25 IEEE score replay (the q131 recipe), top-20
    // ranked, floor-ppm MRR / hit@k / recall@k arithmetic
    "q199_retrieval_eval" -> RetrievalEvalSql,

    // weekly states from first-week and prev-week flags; churned via
    // the shifted-week anti-join
    "q235_growth_accounting" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS w0 FROM wk GROUP BY 1),
        |fl AS (SELECT w.user_id, w.wk, f.w0,
        |    lag(w.wk) OVER (PARTITION BY w.user_id ORDER BY w.wk) AS prev
        |  FROM wk w JOIN f USING (user_id)),
        |a AS (SELECT wk,
        |    CASE WHEN wk = w0 THEN 'new'
        |      WHEN prev = wk - 7 THEN 'retained'
        |      ELSE 'resurrected' END AS state
        |  FROM fl),
        |ag AS (SELECT wk, state, count(*) AS n_users FROM a GROUP BY 1, 2),
        |ch AS (SELECT n.wk, 'churned' AS state, count(*) AS n_users
        |  FROM (SELECT user_id, wk + 7 AS wk FROM wk) n
        |  LEFT JOIN wk c ON n.user_id = c.user_id AND n.wk = c.wk
        |  WHERE c.user_id IS NULL GROUP BY 1)
        |SELECT wk, state, n_users FROM ag
        |UNION ALL SELECT wk, state, n_users FROM ch
        |ORDER BY wk, state""".stripMargin,

    // serial rank reference: Σ rank·cents under (cents, custkey) asc
    "q236_gini" ->
      """WITH s AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS rk FROM s),
        |t AS (SELECT count(*) AS n, sum(cents) AS sx, sum(rk * cents) AS six FROM r)
        |SELECT CAST(n AS BIGINT) AS n_customers, CAST(sx AS BIGINT) AS total_cents,
        |  CAST(((2 * six - (n + 1) * sx) * 1000000) // (n * sx) AS BIGINT) AS gini_ppm
        |FROM t""".stripMargin,

    // the SAME driver-computed log10 expectation literals
    "q237_benford" -> {
      val values = BenfordPpm.map { case (dd, p) => s"($dd, $p)" }.mkString(", ")
      s"""WITH o AS (
        |  SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, count(*) AS n FROM o WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM g),
        |e(digit, expected_ppm) AS (VALUES $values)
        |SELECT g.digit, g.n,
        |  CAST((g.n * 1000000) // t.tt AS BIGINT) AS observed_ppm,
        |  CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
        |  CAST(abs((g.n * 1000000) // t.tt - e.expected_ppm) AS BIGINT) AS abs_dev_ppm
        |FROM g CROSS JOIN t JOIN e USING (digit) ORDER BY g.digit""".stripMargin
    },

    // the q172 register replay at a 30-day window + exact DAU + ratio
    "q234_stickiness" ->
      s"""WITH h AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(user_id AS VARCHAR))), 1, 14)) AS BIGINT) AS h,
        |    user_id
        |  FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM h GROUP BY 1),
        |b AS (
        |  SELECT day, h & 63 AS b,
        |    CASE WHEN (h >> 6) = 0 THEN 30
        |         ELSE least(30, 51 - length(bin(h >> 6))) END AS rho
        |  FROM h),
        |regs AS (SELECT day, b, max(rho) AS r FROM b GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day AS target FROM regs),
        |merged AS (
        |  SELECT d.target AS day, r.b, max(r.r) AS r
        |  FROM days d JOIN regs r ON date_diff('day', r.day, d.target) BETWEEN 0 AND 29
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT day, sum(${1L << 30} >> r) AS s, count(*) AS present
        |  FROM merged GROUP BY 1),
        |e AS (
        |  SELECT day, 64 - present AS zeros,
        |    ${709L * 4096L * (1L << 30)}
        |      // (1000 * (s + (64 - present) * ${1L << 30})) AS raw
        |  FROM s),
        |m AS (SELECT day,
        |    CAST(CASE WHEN raw <= 160 AND zeros > 0
        |      THEN ([${graft.ext.Sketches.HllLinearCounting.mkString(", ")}])[CAST(zeros AS INTEGER)]
        |      ELSE raw END AS BIGINT) AS mau_est
        |  FROM e)
        |SELECT m.day, CAST(dau.dau AS BIGINT) AS dau, m.mau_est,
        |  CAST((dau.dau * 1000000) // m.mau_est AS BIGINT) AS stickiness_ppm
        |FROM m JOIN dau USING (day) ORDER BY m.day""".stripMargin,

    // horizons exploded against the first-view cohort
    "q231_conversion_curve" ->
      """WITH v AS (SELECT user_id, min(ts) AS v0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |conv AS (SELECT e.user_id,
        |    (epoch_us(min(e.ts)) - epoch_us(min(v.v0))) // 1000000 AS tt
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > v.v0 GROUP BY 1),
        |n AS (SELECT count(*) AS nc FROM v),
        |h AS (SELECT unnest([3600, 14400, 86400, 604800]) AS horizon_sec)
        |SELECT CAST(h.horizon_sec AS BIGINT) AS horizon_sec,
        |  CAST(n.nc AS BIGINT) AS n_cohort,
        |  CAST(count(CASE WHEN conv.tt <= h.horizon_sec THEN 1 END) AS BIGINT) AS n_converted,
        |  CAST((count(CASE WHEN conv.tt <= h.horizon_sec THEN 1 END) * 1000000) // n.nc AS BIGINT) AS conv_ppm
        |FROM conv CROSS JOIN h CROSS JOIN n
        |GROUP BY h.horizon_sec, n.nc ORDER BY 1""".stripMargin,

    // header cents vs detail-sum cents, 1-dollar tolerance
    "q232_price_reconcile" ->
      """WITH d AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS dc
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS hc, d.dc
        |  FROM orders LEFT JOIN d ON o_orderkey = l_orderkey),
        |c AS (SELECT
        |    CASE WHEN dc IS NULL THEN 'childless'
        |      WHEN abs(hc - dc) <= 100 THEN 'match'
        |      ELSE 'mismatch' END AS status,
        |    abs(hc - coalesce(dc, 0)) AS gap
        |  FROM j)
        |SELECT status, count(*) AS n_orders,
        |  CAST(max(gap) AS BIGINT) AS max_gap_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // the q43 scorer keyed by the fixture label: per-cell counts
    "q233_lang_confusion" ->
      s"""WITH tk AS (
        |  SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    $LangScoreCols
        |  FROM tk)
        |SELECT lang, $LangArgmaxSql AS lang_pred, count(*) AS cnt
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // lead window holds, milli quantization, one floor division
    "q228_twap" ->
      """WITH h AS (
        |  SELECT user_id,
        |    CAST(round(value * 1000) AS BIGINT) AS vm,
        |    (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000000 AS dt
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, count(*) AS n_holds,
        |    CAST(sum(vm * dt) AS BIGINT) AS wsum,
        |    CAST(sum(dt) AS BIGINT) AS held_seconds
        |  FROM h WHERE dt IS NOT NULL AND dt > 0 GROUP BY 1)
        |SELECT user_id, n_holds, held_seconds,
        |  CAST(wsum // held_seconds AS BIGINT) AS twap_milli
        |FROM g ORDER BY user_id""".stripMargin,

    // argmin/argmax via rank-1 rows, min/max for high/low
    "q229_ohlc_bars" ->
      """WITH v AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bar, ts, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id, bar ORDER BY ts, event_id) AS rka,
        |    row_number() OVER (PARTITION BY user_id, bar ORDER BY ts DESC, event_id DESC) AS rkz
        |  FROM v),
        |g AS (SELECT user_id, bar, count(*) AS n,
        |    max(CASE WHEN rka = 1 THEN vm END) AS open_milli,
        |    max(vm) AS high_milli, min(vm) AS low_milli,
        |    max(CASE WHEN rkz = 1 THEN vm END) AS close_milli
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, CAST(bar AS TIMESTAMP) AS bar, n, open_milli,
        |  high_milli, low_milli, close_milli
        |FROM g ORDER BY user_id, bar""".stripMargin,

    // the q38 session CTE + ordered string_agg paths + top-20
    "q230_top_paths" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |p AS (
        |  SELECT user_id, sid, count(*) AS n,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY 1, 2),
        |c AS (SELECT path, count(*) AS n_sessions FROM p WHERE n <= 8 GROUP BY 1)
        |SELECT path, n_sessions FROM c
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    // suffix blocking + plain levenshtein + rank-1 per dirty row
    "q226_fuzzy_match" ->
      """WITH dirty AS (
        |  SELECT c_custkey + 1000000 AS dirty_id,
        |    concat(substring(c_name, 1, 8), substring(c_name, 10, 30)) AS dirty_name
        |  FROM customer WHERE c_custkey % 10 = 0),
        |cand AS (
        |  SELECT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name,
        |    levenshtein(d.dirty_name, c.c_name) AS dist
        |  FROM dirty d JOIN customer c
        |    ON substring(d.dirty_name, length(d.dirty_name) - 3, 4) = substring(c.c_name, length(c.c_name) - 3, 4)
        |  WHERE levenshtein(d.dirty_name, c.c_name) <= 1),
        |r AS (SELECT *, row_number() OVER (PARTITION BY dirty_id ORDER BY dist, c_custkey) AS rk FROM cand)
        |SELECT dirty_id, dirty_name, c_custkey, c_name, CAST(dist AS BIGINT) AS distance
        |FROM r WHERE rk = 1 ORDER BY dirty_id""".stripMargin,

    // the serial rank-window reference for the distributed order
    // statistic: value at ascending rank ceil(q*n/1000)
    "q227_exact_median" ->
      """WITH r AS (
        |  SELECT lang, CAST(n_chars AS DOUBLE) AS q, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY CAST(n_chars AS DOUBLE), doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT lang, CAST(n AS BIGINT) AS n, q AS q_value
        |FROM r WHERE rk = greatest(1, (500 * n + 999) // 1000)
        |ORDER BY lang""".stripMargin,

    // DuckDB list lambdas replay the HOF chain element for element
    "q222_array_hof" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(list_sum(list_transform(t, x -> len(x))), 0) AS BIGINT) AS chars_total,
        |  CAST(len(list_filter(t, x -> len(x) > 5)) AS BIGINT) AS n_long,
        |  CAST(greatest(len(t) - 1, 0) AS BIGINT) AS n_bigrams,
        |  list_sort(t)[1] AS min_token
        |FROM tk ORDER BY doc_id""".stripMargin,

    // the engine-agreement NULL rules, planted and replayed
    "q223_null_semantics" ->
      """WITH c AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE CAST(c_nationkey AS BIGINT) END AS nk,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
        |  FROM customer)
        |SELECT coalesce(nk, -1) AS nk_group, count(*) AS n_rows,
        |  count(bal) AS n_bal,
        |  CAST(sum(CAST(bal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
        |  CAST(count(CASE WHEN bal IS NULL THEN 1 END) AS BIGINT) AS n_null_bal,
        |  CAST(sum(nullif(nk, 3)) AS BIGINT) AS sum_nk_not3
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // decimal products summed exactly, floor/ceil to integer
    "q224_decimal_edge" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))), 0) AS DOUBLE) AS sum_gross,
        |  CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS floor_sum,
        |  CAST(max(CAST(ceil(l_extendedprice) AS BIGINT)) AS BIGINT) AS ceil_max
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // DuckDB's dayofweek is 0=Sunday where Spark's is 1=Sunday — the
    // +1 shim IS the parity contract
    "q225_datetime_family" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |  count(*) AS n,
        |  min(CAST(o_orderdate AS DATE)) AS first_day,
        |  CAST(max(dayofweek(o_orderdate) + 1) AS BIGINT) AS max_dow,
        |  CAST(max(quarter(o_orderdate)) AS BIGINT) AS q,
        |  CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS min_us,
        |  last_day(CAST(date_trunc('month', o_orderdate) AS DATE)) AS month_end,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month
        |FROM orders
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the SAME driver-computed weight literals, joined by age
    "q218_recency_score" -> {
      val values = RecencyWeights.map { case (k, w) => s"($k, $w)" }.mkString(", ")
      s"""WITH w(age_days, w_ppm) AS (VALUES $values),
        |a AS (SELECT max(CAST(ts AS DATE)) AS anchor FROM events),
        |e AS (SELECT user_id,
        |    CAST(a.anchor - CAST(ts AS DATE) AS BIGINT) AS age_days
        |  FROM events CROSS JOIN a)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(coalesce(w.w_ppm, 0)) AS BIGINT) AS recency_score_ppm
        |FROM e LEFT JOIN w USING (age_days)
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    // the q38 session CTE rolled to per-user bounce shares
    "q219_bounce_rate" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM f),
        |g AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2),
        |u AS (SELECT user_id, count(*) AS n_sessions,
        |    CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces
        |  FROM g GROUP BY 1)
        |SELECT user_id, n_sessions, n_bounces,
        |  CAST((n_bounces * 1000000) // n_sessions AS BIGINT) AS bounce_ppm
        |FROM u ORDER BY user_id""".stripMargin,

    // first view -> first later purchase deltas, the q162/q192
    // histogram median replay on a 4096-second grid
    "q220_time_to_convert" ->
      """WITH v AS (SELECT user_id, min(ts) AS v0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p0, min(v.v0) AS v0
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > v.v0 GROUP BY 1),
        |d AS (SELECT 'all' AS g,
        |    CAST((epoch_us(p0) - epoch_us(v0)) // 1000000 AS DOUBLE) AS x FROM p),
        |b AS (SELECT g, least(1023, greatest(0, CAST(floor((x - 0.0) / 4194304.0 * 1024) AS BIGINT))) AS bin FROM d),
        |h AS (SELECT g, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT g, bin,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY g) AS n FROM h)
        |SELECT g, CAST(max(n) AS BIGINT) AS n,
        |  0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 4194304.0) / 1024 AS q_est
        |FROM c WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // exact integer month arithmetic, decimal-exact revenue
    "q221_revenue_cohorts" ->
      """WITH o AS (
        |  SELECT o_custkey, o_totalprice,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m
        |  FROM orders),
        |f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY 1)
        |SELECT f.m0 AS cohort_month, o.m - f.m0 AS offset_months,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM o JOIN f USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q217_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 150)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q214_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q215_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q216_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // distinct days, date-minus-rank islands, per-user rollup
    "q211_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
        |  FROM d),
        |i AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS longest_streak
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,

    // lag-vs-previous-raw gap filter == island heads; suppression ppm
    "q212_debounce" ->
      """WITH l AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
        |  FROM events),
        |k AS (SELECT event_type, count(*) AS n_kept FROM l
        |  WHERE gap IS NULL OR gap > 60000000 GROUP BY 1),
        |r AS (SELECT event_type, count(*) AS n_raw FROM events GROUP BY 1)
        |SELECT r.event_type, r.n_raw, k.n_kept,
        |  CAST(((r.n_raw - k.n_kept) * 1000000) // r.n_raw AS BIGINT) AS suppressed_ppm
        |FROM r JOIN k USING (event_type) ORDER BY r.event_type""".stripMargin,

    // highest count, ties to the smallest value (rank-1 of the rollup)
    "q213_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT o_orderstatus, o_orderpriority, n,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority) AS rk
        |  FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_value,
        |  CAST(n AS BIGINT) AS mode_count
        |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,

    // the same gaps-and-islands arithmetic on epoch micros
    "q210_covered_time" ->
      """WITH i AS (
        |  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e FROM events),
        |m AS (SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        |  FROM i),
        |n AS (SELECT user_id, s, e,
        |    CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END AS ni FROM m),
        |isl AS (SELECT user_id, s, e,
        |    sum(ni) OVER (PARTITION BY user_id ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM n),
        |g AS (SELECT user_id, island, min(s) AS is_, max(e) AS ie FROM isl GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(ie - is_) // 1000000 AS BIGINT) AS covered_seconds
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    // both surviving versions must read the erased population; the
    // removed count is 2 versions x the matching rows
    "q207_forget" ->
      """WITH k AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
        |  FROM customer WHERE c_custkey % 7 <> 0),
        |r AS (SELECT 2 * (SELECT count(*) FROM customer WHERE c_custkey % 7 = 0) AS n_removed)
        |SELECT CAST(v AS BIGINT) AS version, k.n, k.bal,
        |  CAST(r.n_removed AS BIGINT) AS n_removed
        |FROM (SELECT unnest([0, 1]) AS v) CROSS JOIN k CROSS JOIN r
        |ORDER BY version""".stripMargin,

    // one lhs-group rollup per declared dependency
    "q208_fd_audit" ->
      """WITH
        |g1 AS (SELECT n_nationkey, count(DISTINCT n_regionkey) AS d FROM nation GROUP BY 1),
        |g2 AS (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS d FROM customer GROUP BY 1),
        |g3 AS (SELECT c_custkey, count(DISTINCT c_nationkey) AS d FROM customer GROUP BY 1),
        |g4 AS (SELECT o_orderkey, count(DISTINCT o_custkey) AS d FROM orders GROUP BY 1),
        |u AS (
        |  SELECT 'n_nationkey->n_regionkey' AS dependency, count(*) AS n_groups,
        |    count(*) FILTER (WHERE d > 1) AS n_violating, coalesce(sum(d - 1), 0) AS extra_mappings FROM g1
        |  UNION ALL SELECT 'c_nationkey->c_mktsegment', count(*),
        |    count(*) FILTER (WHERE d > 1), coalesce(sum(d - 1), 0) FROM g2
        |  UNION ALL SELECT 'c_custkey->c_nationkey', count(*),
        |    count(*) FILTER (WHERE d > 1), coalesce(sum(d - 1), 0) FROM g3
        |  UNION ALL SELECT 'o_orderkey->o_custkey', count(*),
        |    count(*) FILTER (WHERE d > 1), coalesce(sum(d - 1), 0) FROM g4)
        |SELECT dependency, n_groups, CAST(n_violating AS BIGINT) AS n_violating,
        |  CAST(extra_mappings AS BIGINT) AS extra_mappings,
        |  CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
        |FROM u ORDER BY dependency""".stripMargin,

    // one distinct-combination count per declared set
    "q209_keys" ->
      """WITH u AS (
        |  SELECT 'c_custkey' AS key_cols, (SELECT count(*) FROM customer) AS n_rows,
        |    (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer)) AS n_distinct
        |  UNION ALL SELECT 'c_name', (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM (SELECT DISTINCT c_name FROM customer))
        |  UNION ALL SELECT 'c_nationkey,c_mktsegment', (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)))
        |SELECT key_cols, n_rows, n_distinct,
        |  CAST(CASE WHEN n_rows = n_distinct THEN 1 ELSE 0 END AS BIGINT) AS is_key
        |FROM u ORDER BY key_cols""".stripMargin,

    // the q113 score replay + plain ntile(10) + per-decile label rate
    "q205_calibration" ->
      s"""WITH $ScoredDocsCtes,
        |lab AS (SELECT doc_id, score,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS label FROM scored),
        |t AS (SELECT *, CAST(ntile(10) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS decile FROM lab)
        |SELECT decile, count(*) AS n, CAST(sum(label) AS BIGINT) AS n_pos,
        |  min(score) AS min_score, max(score) AS max_score,
        |  CAST((sum(label) * 1000000) // count(*) AS BIGINT) AS pos_rate_ppm
        |FROM t GROUP BY decile ORDER BY decile""".stripMargin,

    // the q113 score replay swept over milli thresholds; F1 in its
    // tp-form so every metric is one integer floor division
    "q206_confusion" ->
      s"""WITH $ScoredDocsCtes,
        |lab AS (SELECT doc_id, score,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS label FROM scored),
        |th AS (SELECT unnest([-100, 0, 100]) AS threshold_milli),
        |p AS (SELECT th.threshold_milli,
        |    (score * CAST(1000 AS DOUBLE) >= threshold_milli) AS pred, label
        |  FROM lab CROSS JOIN th),
        |c AS (SELECT threshold_milli,
        |    CAST(count(*) FILTER (WHERE pred AND label = 1) AS BIGINT) AS tp,
        |    CAST(count(*) FILTER (WHERE pred AND label = 0) AS BIGINT) AS fp,
        |    CAST(count(*) FILTER (WHERE NOT pred AND label = 1) AS BIGINT) AS fn,
        |    CAST(count(*) FILTER (WHERE NOT pred AND label = 0) AS BIGINT) AS tn
        |  FROM p GROUP BY 1)
        |SELECT CAST(threshold_milli AS BIGINT) AS threshold_milli, tp, fp, fn, tn,
        |  CAST(CASE WHEN tp + fp = 0 THEN 0 ELSE (tp * 1000000) // (tp + fp) END AS BIGINT) AS precision_ppm,
        |  CAST(CASE WHEN tp + fn = 0 THEN 0 ELSE (tp * 1000000) // (tp + fn) END AS BIGINT) AS recall_ppm,
        |  CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0 ELSE (2 * tp * 1000000) // (2 * tp + fp + fn) END AS BIGINT) AS f1_ppm
        |FROM c ORDER BY threshold_milli""".stripMargin,

    // content gate for the layout-only rewrite: the compacted
    // store read-back must aggregate identically to the raw table
    "q204_compaction" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-user lag gaps (floor seconds), the q162 histogram replay
    // on a 16-second grid
    "q192_gap_quantiles" ->
      """WITH g AS (
        |  SELECT event_type,
        |    (epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000 AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (SELECT event_type, CAST(gap AS DOUBLE) AS x FROM g WHERE gap IS NOT NULL),
        |b AS (SELECT event_type, least(511, greatest(0, CAST(floor((x - 0.0) / 8192.0 * 512) AS BIGINT))) AS bin FROM v),
        |h AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT event_type, bin,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n FROM h)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |  0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 8192.0) / 512 AS q_est
        |FROM c WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q169's staged joins with the additional within-gap bound
    "q190_windowed_funnel" ->
      """WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s0.t0 AND e.ts <= s0.t0 + INTERVAL 1 HOUR GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 1 HOUR GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
        |    (SELECT count(*) FROM s0) AS n_users
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM s1)
        |  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s2))
        |ORDER BY stage""".stripMargin,

    // the same trailing RANGE frame on epoch micros, then max + flag
    "q191_rate_anomalies" ->
      """WITH r AS (
        |  SELECT user_id, count(*) OVER w AS r
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 599999999 PRECEDING AND CURRENT ROW)),
        |p AS (SELECT user_id, CAST(max(r) AS BIGINT) AS peak_rate FROM r GROUP BY 1)
        |SELECT user_id, peak_rate,
        |  CAST(CASE WHEN peak_rate >= 5 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM p ORDER BY user_id""".stripMargin,

    // both rankers replayed (BM25 CTEs + the cosine ranking), then
    // the floor-RRF merge; DuckDB's bm25 CTE names don't clash with
    // the cosine block's
    "q189_hybrid_rrf" -> {
      val bm25 = bm25Sql(50)
      val bmCtes = bm25.stripPrefix("WITH ")
        .split("\nSELECT doc_id, score FROM sc")(0)
      s"""WITH $bmCtes,
        |lex AS (
        |  SELECT doc_id AS id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |  FROM (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 50)),
        |v2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
        |n2 AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v2),
        |q2 AS (SELECT e AS qe, nrm AS qn FROM n2 WHERE vec_id = 0),
        |scored2 AS (
        |  SELECT n2.vec_id AS id,
        |    list_sum(list_transform(range(1, 65), i -> (n2.e[i] / n2.nrm) * (q2.qe[i] / q2.qn))) AS cosine
        |  FROM q2 CROSS JOIN n2),
        |sem AS (
        |  SELECT id, CAST(rank AS BIGINT) AS rank FROM (
        |    SELECT id, row_number() OVER (ORDER BY cosine DESC, id) AS rank FROM scored2)
        |  WHERE rank <= 50),
        |u AS (SELECT * FROM lex UNION ALL SELECT * FROM sem),
        |f AS (SELECT id, CAST(sum(1000 // (10 + rank)) AS BIGINT) AS rrf_milli,
        |    count(*) AS n_lists FROM u GROUP BY 1)
        |SELECT * FROM (SELECT * FROM f ORDER BY rrf_milli DESC, id LIMIT 20)
        |ORDER BY rrf_milli DESC, id""".stripMargin
    },

    // the four stage fragments (drift TV, histogram winsorize bounds,
    // md5 fingerprint keep-min, PPS order variable) composed verbatim
    "q188_curation_v3" ->
      """WITH v AS (SELECT doc_id, lang, source, text, CAST(n_chars AS DOUBLE) AS x FROM documents),
        |b1 AS (SELECT source, least(255, greatest(0, CAST(floor((x - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM v WHERE x IS NOT NULL),
        |st1 AS (SELECT source, bin, count(*) AS c FROM b1 GROUP BY 1, 2),
        |g1 AS (SELECT bin, sum(c) AS gc FROM st1 GROUP BY 1),
        |t1 AS (SELECT source, sum(c) AS n FROM st1 GROUP BY 1),
        |gt1 AS (SELECT sum(gc) AS gn FROM g1),
        |grid1 AS (SELECT t1.source, t1.n, g1.bin, g1.gc, coalesce(st1.c, 0) AS c, gt1.gn
        |  FROM t1 CROSS JOIN g1
        |  LEFT JOIN st1 ON st1.source = t1.source AND st1.bin = g1.bin
        |  CROSS JOIN gt1),
        |p1 AS (SELECT source, n, (c * 1000000) // n AS pa,
        |    CASE WHEN gn > n THEN ((gc - c) * 1000000) // (gn - n) END AS pr FROM grid1),
        |drift AS (SELECT source, CAST(sum(abs(pa - pr)) // 2 AS BIGINT) AS tv FROM p1 GROUP BY 1),
        |keeps AS (SELECT source FROM drift WHERE tv <= 800000),
        |gated AS (SELECT v.* FROM v JOIN keeps USING (source)),
        |b2 AS (SELECT lang, least(255, greatest(0, CAST(floor((x - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM gated WHERE x IS NOT NULL),
        |h2 AS (SELECT lang, bin, count(*) AS cnt FROM b2 GROUP BY 1, 2),
        |c2 AS (SELECT lang, bin,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n FROM h2),
        |plo AS (SELECT lang, 0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS wlo
        |  FROM c2 WHERE cum >= CAST(ceil(0.05 * n) AS BIGINT) GROUP BY 1),
        |phi AS (SELECT lang, 0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS whi
        |  FROM c2 WHERE cum >= CAST(ceil(0.95 * n) AS BIGINT) GROUP BY 1),
        |wz AS (SELECT g.doc_id, g.lang, g.source, g.text,
        |    CASE WHEN g.x IS NULL THEN NULL ELSE least(greatest(g.x, plo.wlo), phi.whi) END AS w
        |  FROM gated g JOIN plo ON g.lang = plo.lang JOIN phi ON g.lang = phi.lang),
        |fp AS (SELECT doc_id, lang, source, w,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f FROM wz),
        |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
        |dd AS (SELECT fp.* FROM fp JOIN keep USING (doc_id)),
        |h AS (SELECT doc_id, lang, source, w,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) AS u
        |  FROM dd WHERE w IS NOT NULL AND w > 0)
        |SELECT * FROM (
        |  SELECT doc_id, lang, source, w AS n_chars_wins,
        |    CAST(u AS DOUBLE) / CAST(w AS DOUBLE) AS pps
        |  FROM h ORDER BY pps, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,

    // identical integer sufficient statistics and fp composition
    "q186_trend" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |v AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', day) AS BIGINT) AS x,
        |    CAST(y AS BIGINT) AS y FROM daily),
        |a AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(x * y) AS DOUBLE) AS sxy
        |  FROM v GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |       ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |       ELSE (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END AS intercept
        |FROM a ORDER BY event_type""".stripMargin,

    // per-type daily counts, exact scaled deviations, running sum,
    // argmax by (|cusum| DESC, day ASC)
    "q187_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS p, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS tot, count(*) AS np
        |  FROM daily GROUP BY 1),
        |cs AS (SELECT d.event_type, d.p,
        |    sum(d.c * t.np - t.tot) OVER (PARTITION BY d.event_type ORDER BY d.p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        |  FROM daily d JOIN t USING (event_type)),
        |r AS (SELECT event_type, p, abs(cusum) AS score,
        |    row_number() OVER (PARTITION BY event_type ORDER BY abs(cusum) DESC, p) AS rk
        |  FROM cs)
        |SELECT event_type, p AS change_period, CAST(score AS BIGINT) AS cusum_score
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // same integer idf (bit length of the floor df ratio), same
    // (score DESC, term) top-3 window
    "q184_keywords" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tk GROUP BY 1, 2),
        |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.t, tf.tf,
        |    tf.tf * length(bin(nd.n // dfq.df)) AS score
        |  FROM tf JOIN dfq USING (t) CROSS JOIN nd
        |  WHERE dfq.df <= nd.n // 2),
        |r AS (SELECT doc_id, t, tf, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, t) AS rank
        |  FROM sc)
        |SELECT doc_id, t AS term, tf, CAST(score AS BIGINT) AS score,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // positional bigrams, per-context argmax (cnt DESC, next ASC)
    "q185_next_word" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents),
        |bg0 AS (SELECT CASE WHEN len(tokens) >= 2
        |    THEN list_transform(range(1, len(tokens)), i -> [tokens[i], tokens[i + 1]])
        |    ELSE [] END AS ps FROM tk),
        |bg AS (SELECT p[1] AS w, p[2] AS n
        |  FROM (SELECT unnest(ps) AS p FROM bg0)),
        |c AS (SELECT w, n, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |r AS (SELECT w, n, cnt,
        |    row_number() OVER (PARTITION BY w ORDER BY cnt DESC, n) AS rk
        |  FROM c)
        |SELECT w AS word, n AS next_word, cnt
        |FROM r WHERE rk = 1 AND cnt >= 5 ORDER BY word""".stripMargin,

    // both counter matrices replayed (the q95 bucket family at width
    // 2^18), per-row inner products, min, exact join count
    "q183_join_size_est" ->
      """WITH va AS (SELECT CAST(l_orderkey AS VARCHAR) AS val FROM lineitem),
        |ha AS (SELECT
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 1, 14)) AS BIGINT) AS a,
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 17, 14)) AS BIGINT) AS b
        |  FROM va),
        |ca AS (SELECT i, (a + i * b) % 262144 AS bucket, count(*) AS cnt
        |  FROM ha, range(4) t(i) GROUP BY 1, 2),
        |vb AS (SELECT CAST(o_orderkey AS VARCHAR) AS val FROM orders),
        |hb AS (SELECT
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 1, 14)) AS BIGINT) AS a,
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 17, 14)) AS BIGINT) AS b
        |  FROM vb),
        |cb AS (SELECT i, (a + i * b) % 262144 AS bucket, count(*) AS cnt
        |  FROM hb, range(4) t(i) GROUP BY 1, 2),
        |ip AS (SELECT ca.i, sum(ca.cnt * cb.cnt) AS ip
        |  FROM ca JOIN cb ON ca.i = cb.i AND ca.bucket = cb.bucket GROUP BY 1),
        |est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_rows FROM ip),
        |ex AS (SELECT count(*) AS exact_join_rows
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT est_join_rows, exact_join_rows,
        |  CAST(((est_join_rows - exact_join_rows) * 1000000) // exact_join_rows AS BIGINT) AS err_ppm
        |FROM est CROSS JOIN ex""".stripMargin,

    // the snapshot machinery is invisible to the oracle: merged
    // (v0 state, delta state) == direct recompute over v1 == the
    // full lineitem rollup (the q159 oracle restricted to one measure)
    "q181_mv_snapshot_refresh" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_l_quantity,
        |  min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // deterministic top-500 vocab (count DESC, word ASC), left-join
    // miss rate per doc in floor ppm
    "q182_oov_rate" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS t
        |  FROM documents),
        |vc AS (SELECT t FROM (
        |  SELECT t, count(*) AS c FROM tk GROUP BY 1
        |  ORDER BY c DESC, t LIMIT 500)),
        |j AS (SELECT tk.doc_id, CASE WHEN vc.t IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM tk LEFT JOIN vc ON tk.t = vc.t)
        |SELECT doc_id, count(*) AS n_tokens, CAST(sum(oov) AS BIGINT) AS n_oov,
        |  CAST((sum(oov) * 1000000) // count(*) AS BIGINT) AS oov_ppm
        |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // distinct (basket, item) rows, basket-keyed pair join, floor
    // ppm/milli; the basket count enters as the same integer literal
    "q179_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem WHERE l_orderkey < 2000 AND l_partkey IS NOT NULL),
        |nb AS (SELECT count(DISTINCT b) AS n FROM it),
        |ic AS (SELECT i, count(*) AS ni FROM it GROUP BY 1),
        |p AS (SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_ab
        |  FROM it a JOIN it c ON a.b = c.b AND a.i <> c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b, n_ab,
        |  CAST((n_ab * 1000000) // nb.n AS BIGINT) AS support_ppm,
        |  CAST((n_ab * 1000000) // na.ni AS BIGINT) AS conf_ppm,
        |  CAST((((n_ab * 1000000) // na.ni) * nb.n) // nbi.ni // 1000 AS BIGINT) AS lift_milli
        |FROM p
        |CROSS JOIN nb
        |JOIN ic na ON na.i = item_a
        |JOIN ic nbi ON nbi.i = item_b
        |ORDER BY item_a, item_b""".stripMargin,

    // identical sufficient statistics (decimal sums -> one double
    // conversion) and identical operation order -> bit-equal r
    "q180_correlation" ->
      """WITH v AS (SELECT
        |  CAST(round(l_quantity * 10000) AS BIGINT) AS x0,
        |  CAST(round(l_extendedprice * 10000) AS BIGINT) AS x1,
        |  CAST(round(l_discount * 10000) AS BIGINT) AS x2
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(x0) AS DOUBLE) AS s0,
        |  CAST(sum(x1) AS DOUBLE) AS s1,
        |  CAST(sum(x2) AS DOUBLE) AS s2,
        |  CAST(sum(x0 * x0) AS DOUBLE) AS p00,
        |  CAST(sum(x0 * x1) AS DOUBLE) AS p01,
        |  CAST(sum(x0 * x2) AS DOUBLE) AS p02,
        |  CAST(sum(x1 * x1) AS DOUBLE) AS p11,
        |  CAST(sum(x1 * x2) AS DOUBLE) AS p12,
        |  CAST(sum(x2 * x2) AS DOUBLE) AS p22
        |  FROM v)
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    CAST(n AS BIGINT) AS n,
        |    CASE WHEN sqrt(n * p00 - s0 * s0) * sqrt(n * p11 - s1 * s1) = 0 THEN NULL
        |         ELSE (n * p01 - s0 * s1) / (sqrt(n * p00 - s0 * s0) * sqrt(n * p11 - s1 * s1)) END AS corr
        |  FROM a
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_discount', CAST(n AS BIGINT),
        |    CASE WHEN sqrt(n * p00 - s0 * s0) * sqrt(n * p22 - s2 * s2) = 0 THEN NULL
        |         ELSE (n * p02 - s0 * s2) / (sqrt(n * p00 - s0 * s0) * sqrt(n * p22 - s2 * s2)) END
        |  FROM a
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount', CAST(n AS BIGINT),
        |    CASE WHEN sqrt(n * p11 - s1 * s1) * sqrt(n * p22 - s2 * s2) = 0 THEN NULL
        |         ELSE (n * p12 - s1 * s2) / (sqrt(n * p11 - s1 * s1) * sqrt(n * p22 - s2 * s2)) END
        |  FROM a)
        |ORDER BY col_a, col_b""".stripMargin,

    // six-column melt via UNION ALL, then the q91 HLL recipe keyed on
    // the column name; null counts from the same melt
    "q176_column_profile" ->
      s"""WITH p AS (
        |  SELECT 'l_orderkey' AS c, CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
        |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
        |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
        |  UNION ALL SELECT 'l_shipdate', CAST(l_shipdate AS VARCHAR) FROM lineitem),
        |stats AS (SELECT c, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
        |  FROM p GROUP BY 1),
        |h AS (SELECT c,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', v)), 1, 14)) AS BIGINT) AS h
        |  FROM p WHERE v IS NOT NULL),
        |b AS (SELECT c, h & 63 AS b,
        |    CASE WHEN (h >> 6) = 0 THEN 30
        |         ELSE least(30, 51 - length(bin(h >> 6))) END AS rho FROM h),
        |regs AS (SELECT c, b, max(rho) AS r FROM b GROUP BY 1, 2),
        |s AS (SELECT c, sum(${1L << 30} >> r) AS s, count(*) AS present FROM regs GROUP BY 1),
        |e AS (SELECT c, 64 - present AS zeros,
        |    ${709L * 4096L * (1L << 30)}
        |      // (1000 * (s + (64 - present) * ${1L << 30})) AS raw FROM s),
        |d AS (SELECT c,
        |    CAST(CASE WHEN raw <= 160 AND zeros > 0
        |      THEN ([${graft.ext.Sketches.HllLinearCounting.mkString(", ")}])[CAST(zeros AS INTEGER)]
        |      ELSE raw END AS BIGINT) AS est_distinct FROM e)
        |SELECT stats.c AS col_name, stats.n_rows, stats.n_nulls, d.est_distinct
        |FROM stats JOIN d USING (c) ORDER BY col_name""".stripMargin,

    // NOT EXISTS per relationship — the anti-join twin
    "q177_fk_orphans" ->
      """SELECT * FROM (
        |  SELECT 'customer.nationkey' AS fk,
        |    (SELECT count(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
        |      AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
        |  UNION ALL SELECT 'lineitem.orderkey',
        |    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL SELECT 'orders.custkey',
        |    (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)))
        |ORDER BY fk""".stripMargin,

    // generate_series calendar between the data's bounds, zero-filled
    "q178_date_spine" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events FROM events
        |  WHERE user_id < 2 AND event_type = 'error' GROUP BY 1),
        |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds)
        |SELECT spine.day, CAST(coalesce(n_events, 0) AS BIGINT) AS n_events
        |FROM spine LEFT JOIN daily USING (day) ORDER BY day""".stripMargin,

    // shared-grid histogram, per-source vs rest-of-corpus ppm
    // profiles, floor-TV; absent bins read as zero via the grid join
    "q174_source_drift" ->
      """WITH v AS (SELECT source, CAST(n_chars AS DOUBLE) AS x FROM documents WHERE n_chars IS NOT NULL),
        |b AS (SELECT source, least(255, greatest(0, CAST(floor((x - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM v),
        |st AS (SELECT source, bin, count(*) AS c FROM b GROUP BY 1, 2),
        |g AS (SELECT bin, sum(c) AS gc FROM st GROUP BY 1),
        |t AS (SELECT source, sum(c) AS n FROM st GROUP BY 1),
        |gt AS (SELECT sum(gc) AS gn FROM g),
        |grid AS (
        |  SELECT t.source, t.n, g.bin, g.gc, coalesce(st.c, 0) AS c, gt.gn
        |  FROM t CROSS JOIN g
        |  LEFT JOIN st ON st.source = t.source AND st.bin = g.bin
        |  CROSS JOIN gt),
        |p AS (SELECT source, n,
        |    (c * 1000000) // n AS pa,
        |    CASE WHEN gn > n THEN ((gc - c) * 1000000) // (gn - n) END AS pr
        |  FROM grid)
        |SELECT source, CAST(max(n) AS BIGINT) AS n,
        |  CAST(sum(abs(pa - pr)) // 2 AS BIGINT) AS tv_ppm
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    // the ROWS twin of q148: positional trailing-3 frame
    "q175_moving_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_3,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // same tokenize/shingle/df-gate pipeline as q44, aggregated to
    // the source level; integer Jaccard is floor division
    "q165_source_overlap" ->
      """WITH tk AS (
        |  SELECT doc_id, source, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT doc_id, source, CASE WHEN len(tokens) >= 3 THEN list_distinct(list_transform(range(1, len(tokens) - 1), i -> array_to_string(tokens[i:i+2], ' '))) ELSE [] END AS s FROM tk),
        |ex AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
        |df AS (SELECT g, count(*) AS df FROM ex GROUP BY 1),
        |kept AS (SELECT DISTINCT source, g FROM ex JOIN df USING (g) WHERE df <= 100),
        |n AS (SELECT source, count(*) AS n FROM kept GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
        |  FROM kept a JOIN kept b USING (g) WHERE a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, CAST(shared AS BIGINT) AS shared_shingles,
        |  CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
        |  CAST((shared * 1000) // (na.n + nb.n - shared) AS BIGINT) AS jaccard_milli
        |FROM pairs JOIN n na ON na.source = src_a JOIN n nb ON nb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin,

    // two histogram passes replayed on the same power-of-two grid
    // (width 4), then Hampel's 3-MAD outlier count over the devs
    "q166_mad_outliers" ->
      """WITH v AS (SELECT lang, CAST(n_chars AS DOUBLE) AS x FROM documents WHERE n_chars IS NOT NULL),
        |b1 AS (SELECT lang, least(255, greatest(0, CAST(floor((x - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM v),
        |h1 AS (SELECT lang, bin, count(*) AS cnt FROM b1 GROUP BY 1, 2),
        |c1 AS (SELECT lang, bin,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n FROM h1),
        |m1 AS (SELECT lang, CAST(max(n) AS BIGINT) AS n,
        |    0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS med
        |  FROM c1 WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT) GROUP BY 1),
        |d AS (SELECT v.lang, abs(v.x - m1.med) AS dev FROM v JOIN m1 ON v.lang = m1.lang),
        |b2 AS (SELECT lang, least(255, greatest(0, CAST(floor((dev - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM d),
        |h2 AS (SELECT lang, bin, count(*) AS cnt FROM b2 GROUP BY 1, 2),
        |c2 AS (SELECT lang, bin,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n FROM h2),
        |m2 AS (SELECT lang, 0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS mad
        |  FROM c2 WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT) GROUP BY 1),
        |o AS (SELECT d.lang, CAST(sum(CASE WHEN d.dev > 3.0 * m2.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |  FROM d JOIN m2 ON d.lang = m2.lang GROUP BY 1)
        |SELECT m1.lang, m1.n, m1.med AS med_est, m2.mad AS mad_est, o.n_outliers
        |FROM m1 JOIN m2 ON m1.lang = m2.lang JOIN o ON m1.lang = o.lang
        |ORDER BY m1.lang""".stripMargin,

    // histogram replay: identical power-of-two grid, per-bin counts
    // (the shard split is invisible — addition is lossless), one
    // cumulative scan over ≤1024 state rows, upper-edge readout
    "q162_hist_quantile" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    least(1023, greatest(0, CAST(floor((CAST(l_extendedprice AS DOUBLE) - 0.0) / 131072.0 * 1024) AS BIGINT))) AS bin
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |h AS (SELECT l_returnflag, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
        |  FROM h)
        |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 131072.0) / 1024 AS q_est
        |FROM c WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the heap aggregate's total order IS the window's (score DESC,
    // id ASC), so the relational top-5 replays it row for row; null
    // scores are ignored by the aggregate, hence the WHERE
    "q163_topk_per_group" ->
      """SELECT c_mktsegment, CAST(rk AS BIGINT) AS rk, c_custkey, c_acctbal
        |FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer WHERE c_acctbal IS NOT NULL)
        |WHERE rk <= 5 ORDER BY c_mktsegment, rk""".stripMargin,

    // SCD2 replay: change rows by null-safe lag inequality, validity
    // end by lead over the kept rows — both engines order by
    // (ts, event_id) so equal-timestamp changes intervalize alike
    "q164_scd2" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |ch AS (
        |  SELECT user_id, ts, event_id, event_type FROM o
        |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        |iv AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM ch)
        |SELECT user_id, event_type, valid_from, valid_to
        |FROM iv ORDER BY user_id, valid_from, event_type""".stripMargin)
}
