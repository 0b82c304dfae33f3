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
  * Two laws, captured off the loop's INTERNAL query executions with a
  * QueryExecutionListener:
  *
  *  1. NEGATIVE (the Spark limitation that motivates the knob): AQE
  *     skew-join does NOT protect the loop, even fully enabled with
  *     fixture-scaled thresholds and adaptive cached plans — the
  *     labels side reuses its cache's hash partitioning (no per-round
  *     re-shuffle, by design), and OptimizeSkewedJoin fires only when
  *     BOTH join children are fresh shuffles. The same join shape
  *     with both sides shuffled DOES split (q331's synchronous
  *     probe).
  *  2. POSITIVE: `saltBuckets` spreads the hot key — the in-loop
  *     exchange keys on (src, __salt) — and the labeling is
  *     bit-identical to the unsalted run.
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
    * listener; returns every captured executed-plan string. */
  private def withSkewConfsCapturing(body: => Unit): Seq[String] = {
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
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
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
      // the listener bus is async — give stragglers a beat to land
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (plans.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500)
      plans.values.toSeq
    } finally {
      spark.listenerManager.unregister(listener)
      saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
    }
  }

  test("NEGATIVE law: AQE skew-join cannot split the loop's hot partition (labels side reuses cache partitioning)") {
    val (nodes, edges) = hubGraph
    val plans = withSkewConfsCapturing {
      val lab = Dedup.connectedComponents(nodes, "id", edges, "a", "b",
        localEdgeLimit = 0) // force the distributed loop
      assertLabelsExact(lab)
      lab.unpersist()
    }
    // the propagation join ran inside the rounds...
    assert(plans.exists(_.contains("SortMergeJoin [src")),
      s"expected the in-loop edge⋈label join in ${plans.size} captured plans")
    // ...and NO skew split happened anywhere, despite forced skew
    // confs: the labels child is a cache-partitioning reuse, not a
    // shuffle, and OptimizeSkewedJoin needs both children shuffled.
    // If this assertion ever starts failing, Spark lifted the
    // limitation — saltBuckets can then be retired.
    assert(!plans.exists(_.contains("skew=true")),
      "AQE split the in-loop join — the Spark limitation this law " +
        "pins has been lifted; revisit the saltBuckets knob")
  }

  test("POSITIVE law: saltBuckets spreads the hot key over (src, __salt) and labels stay exact") {
    val (nodes, edges) = hubGraph
    val plans = withSkewConfsCapturing {
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
}
