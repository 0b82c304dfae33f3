package graft.ext

import scala.collection.concurrent.TrieMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.SparkSpec

/** Power-law stress for the DISTRIBUTED connected-components loop
  * (r12 verdict item 5): q259 proves the loop on a uniform chain
  * graph; real dedup graphs have a HUB (one boilerplate cluster
  * holding a double-digit share of all edges) that concentrates the
  * edge⋈label join's hot key on one task.
  *
  * Laws, captured off the loop's INTERNAL query executions with a
  * QueryExecutionListener:
  *
  *  1. AQE (flipped in r14 — it was the NEGATIVE law through r13):
  *     with the per-round plan barrier, BOTH join children are fresh
  *     shuffles, so OptimizeSkewedJoin now fires INSIDE the loop —
  *     the default path is skew-protected whenever AQE is on.
  *  2. POSITIVE: `saltBuckets` spreads the hot key — the in-loop
  *     exchange keys on (src, __salt) — and the labeling is
  *     bit-identical to the unsalted run. Still the deterministic
  *     protection for AQE-off deployments; AutoSalt sizes it.
  */
class CcSkewSpec extends SparkSpec {
  import spark.implicits._

  private val hub = 8000L
  private val chains = 6000L
  private val nNodes = hub + 1 + 2 * chains

  private def hubGraph = {
    val nodes = spark.range(nNodes).select(col("id"))
    val edges = spark.range(1L, hub + 1)
      .select(lit(0L).as("a"), col("id").as("b"))
      .unionByName(spark.range(chains).select(
        (lit(hub + 1) + col("id") * 2).as("a"),
        (lit(hub + 2) + col("id") * 2).as("b")))
    (nodes, edges)
  }

  private def assertLabelsExact(lab: org.apache.spark.sql.DataFrame): Unit = {
    val got = lab.select(col("id"), col("cluster_id"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == nNodes)
    (0L to hub).foreach(i => assert(got(i) == 0L, s"star node $i"))
    (0L until chains).foreach { i =>
      val a = hub + 1 + 2 * i
      assert(got(a) == a && got(a + 1) == a, s"chain $a")
    }
  }

  /** Run `body` with fixture-scaled AQE skew confs and an execution
    * listener; returns every captured executed-plan string. The
    * listener bus is async, so the wait is PATTERN-based: block (with
    * a bounded deadline) until a captured plan satisfies `expect` —
    * a fixed post-capture sleep was flake-prone on loaded machines
    * (late plan captures could be missed). `skewJoinOn = false` turns
    * runtime skew protection OFF while keeping the rest of the
    * fixture confs — the arbitration tests need both worlds. */
  private def withSkewConfsCapturing(expect: String => Boolean = _ => true,
      skewJoinOn: Boolean = true)
      (body: => Unit): Seq[String] = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions",
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")
      .map(k => k -> conf.getOption(k)).toMap
    val plans = TrieMap.empty[Long, String]
    val ctr = new AtomicLong(0)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        plans.put(ctr.incrementAndGet(), qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoinOn.toString)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100b")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100b")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.shuffle.partitions", "16")
      // adaptive execution INSIDE persisted frames (SPARK-35332, ships
      // disabled) — without it the loop's joins are not adaptive at all
      conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      body
      // the listener bus is async — wait until the EXPECTED plan has
      // landed (bounded), not just any plan plus a fixed sleep
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!plans.values.exists(expect) && System.nanoTime() < deadline)
        Thread.sleep(50)
      plans.values.toSeq
    } finally {
      spark.listenerManager.unregister(listener)
      saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
    }
  }

  test("AQE law: post-barrier, the in-loop join's children are fresh shuffles and skew-split FIRES inside the loop") {
    // HISTORY: through r13 this was the NEGATIVE law — the labels side
    // rode its cache's hash partitioning, OptimizeSkewedJoin needs
    // both children freshly shuffled, so AQE could never split the
    // loop's hot partition and saltBuckets was the only protection.
    // The r14 per-round PLAN BARRIER (Bridge.planBarrier — added to
    // stop Catalyst's per-round cost compounding, see the loop's
    // comment) makes the labels side a LogicalRDD leaf: both join
    // children now exchange freshly, and AQE's skew-split fires
    // in-loop exactly as it does on the round-1-shaped probe (q331).
    // This law pins the LIFTED restriction; saltBuckets remains the
    // deterministic protection for AQE-off deployments.
    val (nodes, edges) = hubGraph
    val plans = withSkewConfsCapturing(_.contains("skew=true")) {
      val lab = Dedup.connectedComponents(nodes, "id", edges, "a", "b",
        localEdgeLimit = 0) // force the distributed loop
      assertLabelsExact(lab)
      lab.unpersist()
    }
    // the propagation join ran inside the rounds...
    assert(plans.exists(_.contains("SortMergeJoin [src")),
      s"expected the in-loop edge⋈label join in ${plans.size} captured plans")
    // ...and the hub key's partition was split by AQE under the
    // forced skew confs — unsalted runs are no longer one-task-bound
    assert(plans.exists(_.contains("skew=true")),
      "AQE did not split the in-loop join — the r14 plan barrier " +
        "should have made both children fresh shuffles")
  }

  test("POSITIVE law: saltBuckets spreads the hot key over (src, __salt) and labels stay exact") {
    val (nodes, edges) = hubGraph
    val plans = withSkewConfsCapturing(p =>
        p.contains("hashpartitioning(src") && p.contains("__salt")) {
      val lab = Dedup.connectedComponents(nodes, "id", edges, "a", "b",
        localEdgeLimit = 0, saltBuckets = 8)
      assertLabelsExact(lab)
      lab.unpersist()
    }
    // the in-loop propagation exchange now keys on the salt — the hub
    // key's 8001 rows hash into 8 buckets instead of one task
    assert(plans.exists(p => p.contains("hashpartitioning(src") &&
        p.contains("__salt")),
      s"no salted (src, __salt) exchange in ${plans.size} captured plans")
  }

  test("autoSaltBuckets decision rule: uniform graphs pick 0, hubs the next pow2 of max/mean, capped") {
    // chain: every node degree <= 2, mean ~2 — never salts
    assert(Dedup.autoSaltBuckets(maxDegree = 2, nodes = 1000, totalDegree = 1998) == 0)
    // below threshold (7.99x mean) — still 0, exact integer boundary
    assert(Dedup.autoSaltBuckets(maxDegree = 799, nodes = 1000, totalDegree = 100000) == 0)
    // at threshold (8x mean exactly) — salts, k = next pow2 of 8
    assert(Dedup.autoSaltBuckets(maxDegree = 800, nodes = 1000, totalDegree = 100000) == 8)
    // 20x mean -> 32 would exceed the cap? no: next pow2 of 20 is 32,
    // but the cap is 16
    assert(Dedup.autoSaltBuckets(maxDegree = 2000, nodes = 1000, totalDegree = 100000) == 16)
    // 9x mean -> next pow2 is 16, equals the cap
    assert(Dedup.autoSaltBuckets(maxDegree = 900, nodes = 1000, totalDegree = 100000) == 16)
    // degenerate inputs never salt
    assert(Dedup.autoSaltBuckets(0, 0, 0) == 0)
    // the q331/CcSkewSpec hub fixture: hub degree 8001 over 20001
    // nodes, 2*(8000+6000) endpoint rows -> ratio ~5715x, cap 16
    assert(Dedup.autoSaltBuckets(8001, nNodes, 2 * (hub + chains)) == 16)
  }

  test("AutoSalt: with runtime skew protection OFF the hub graph probes skewed and salts (k>1), labels exact; a chain probes uniform and does not") {
    // skewJoinOn = false: runtime protection cannot fire, so the
    // arbitration leaves the degree-profile rule in charge — salting
    // is then the ONLY hub protection and MUST engage
    val (nodes, edges) = hubGraph
    val plans = withSkewConfsCapturing(p =>
        p.contains("hashpartitioning(src") && p.contains("__salt"),
        skewJoinOn = false) {
      val lab = Dedup.connectedComponents(nodes, "id", edges, "a", "b",
        localEdgeLimit = 0, saltBuckets = Dedup.AutoSalt)
      assertLabelsExact(lab) // identical to the manual-k and unsalted runs
      lab.unpersist()
    }
    assert(plans.exists(p => p.contains("hashpartitioning(src") &&
        p.contains("__salt")),
      s"AutoSalt did not salt the hub graph (${plans.size} plans)")

    // uniform chain: the probe must resolve 0 — no __salt anywhere
    val cn = spark.range(400L).select(col("id"))
    val ce = spark.range(400L).filter(col("id") % 2 === 0)
      .select(col("id").as("a"), (col("id") + 1L).as("b"))
    val chainPlans = withSkewConfsCapturing(_.contains("SortMergeJoin [src"),
        skewJoinOn = false) {
      val lab = Dedup.connectedComponents(cn, "id", ce, "a", "b",
        localEdgeLimit = 0, saltBuckets = Dedup.AutoSalt)
      assert(lab.filter(col("cluster_id") =!= col("id") - col("id") % 2)
        .count() == 0L)
      lab.unpersist()
    }
    assert(chainPlans.exists(_.contains("SortMergeJoin [src")))
    assert(!chainPlans.exists(_.contains("__salt")),
      "AutoSalt salted a uniform chain graph — the probe should pick 0")
  }

  test("arbitration law: with runtime protection LIVE, AutoSalt stands down to 0 — no salt, skew-split still fires, labels exact") {
    // the r15 arbitration (r14 verdict What's-missing #2): all three
    // protection confs are on inside withSkewConfsCapturing, so
    // AutoSalt must resolve 0 (no __salt anywhere in the loop) and
    // the hot partition is split by AQE instead
    assert(Dedup.arbitratedSaltBuckets(16, aqeSkewLive = true) == 0)
    assert(Dedup.arbitratedSaltBuckets(16, aqeSkewLive = false) == 16)
    val (nodes, edges) = hubGraph
    val plans = withSkewConfsCapturing(_.contains("skew=true")) {
      assert(Dedup.aqeSkewProtectionLive(spark),
        "fixture confs should make the arbitration predicate true")
      val lab = Dedup.connectedComponents(nodes, "id", edges, "a", "b",
        localEdgeLimit = 0, saltBuckets = Dedup.AutoSalt)
      assertLabelsExact(lab)
      lab.unpersist()
    }
    assert(!plans.exists(_.contains("__salt")),
      "AutoSalt salted despite live runtime protection — the " +
        "arbitration should have resolved 0")
    assert(plans.exists(_.contains("skew=true")),
      "runtime skew-split did not fire on the arbitrated (unsalted) run")
  }

  test("arbitration law: the arbitrated k=0 run shuffles strictly fewer records than the salted k=16 run (labels identical)") {
    // the replication tax made concrete: with salt k every label row
    // explodes k ways into the propagation exchange every round, so
    // standing the salt down under live AQE protection must shrink
    // total shuffle-write records. Measured off TaskEnd metrics with
    // a bounded settle-wait (the listener bus is async — round-gotchas
    // rule: never a bare fixed sleep).
    val records = new AtomicLong(0)
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          records.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def measure(body: => Unit): Long = {
      records.set(0)
      spark.sparkContext.addSparkListener(sl)
      try {
        body
        // settle: wait until no new records arrive for 500 ms (bounded)
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var last = -1L
        while (records.get() != last && System.nanoTime() < deadline) {
          last = records.get()
          Thread.sleep(500)
        }
        records.get()
      } finally spark.sparkContext.removeSparkListener(sl)
    }
    val (nodes, edges) = hubGraph
    var arbitrated = 0L
    var salted = 0L
    withSkewConfsCapturing() {
      arbitrated = measure {
        val lab = Dedup.connectedComponents(nodes, "id", edges, "a", "b",
          localEdgeLimit = 0, saltBuckets = Dedup.AutoSalt) // arbitrates to 0
        assertLabelsExact(lab)
        lab.unpersist()
      }
      salted = measure {
        val lab = Dedup.connectedComponents(nodes, "id", edges, "a", "b",
          localEdgeLimit = 0, saltBuckets = 16) // explicit k is never arbitrated
        assertLabelsExact(lab) // identical labeling — the salt identity law
        lab.unpersist()
      }
    }
    assert(arbitrated > 0L && salted > 0L,
      s"shuffle metrics not captured (arbitrated=$arbitrated salted=$salted)")
    assert(arbitrated < salted,
      s"arbitrated k=0 run should shuffle fewer records than k=16 " +
        s"(got $arbitrated vs $salted)")
  }
}
