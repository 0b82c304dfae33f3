package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph operators for web-corpus curation (north-star extensions;
  * no counterpart in the reference). The canonical use is HOST
  * AUTHORITY: Common-Crawl-style pipelines weight document quality by
  * the standing of the host in the host-link graph (page-level counts
  * are gameable, the link graph much less so).
  */
object GraphOps {

  /** floor(a / b) for non-negative int64 columns in EXACT arithmetic:
    * (a − a mod b) is divisible by b, and decimal(38,0) division keeps
    * the integer quotient exact past 2^53 (Spark's `/` on longs is
    * lossy double division; `expr("a div b")` resolves by NAME, which
    * iterative self-lineage plans make ambiguous). */
  private def floorDiv(a: Column, b: Column): Column = PortableDiv.nonNeg(a, b)

  /** Integer-exact PageRank over a directed edge list — every mass is
    * an int64 in units of 1/`scale` (ppm by default), the damping
    * factor is the exact rational `dampingPct`/100 under floor
    * division, and in-flows are INTEGER sums: bit-identical results in
    * any engine, under any partitioning — the property that lets a
    * host-authority table be a reproducible, auditable curation input
    * rather than a float soup that shifts per run.
    *
    * Semantics: mass₀ = `scale` per node; each round every node keeps
    * the base (1−d)·scale and receives Σ over in-edges of
    * ⌊⌊m·dampingPct/100⌋/outdeg⌋. Floor-division remainders and
    * dangling-node damped mass are DROPPED, not redistributed (the
    * usual simplification; total mass is then slightly sub-conserved,
    * which ranking use cases don't care about). Runs a FIXED
    * `iterations` rounds — rank stability, not convergence proof, is
    * the contract (5 rounds separates head/torso/tail hosts; run more
    * for finer tails).
    *
    * Shape per round: one equi-join of the (persisted) out-degree-
    * annotated edges with the current mass frame on the src id, one
    * hash aggregate on the dst id, one left join back to the node
    * spine — all keyed exchanges, no windows over the corpus (the
    * out-degree window partitions by src: bounded by a host's
    * out-link count). Old mass frames are unpersisted as soon as the
    * next is materialized, so the cached footprint is 2 mass frames +
    * edges regardless of iteration count. */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampingPct: Int = 85,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    require(scale > 0, s"scale must be positive, got $scale")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val w = Window.partitionBy(col("src"))
    val wEdges = e.withColumn("outdeg", count(lit(1)).over(w))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = scale * (100L - dampingPct) / 100L
    var mass = nodes.select(col("id"), lit(scale).as("mass"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    mass.count()
    for (_ <- 1 to iterations) {
      val inflow = wEdges
        .join(mass, wEdges("src") === mass("id"))
        .select(wEdges("dst").as("id"),
          floorDiv(floorDiv(col("mass") * dampingPct, lit(100L)),
            wEdges("outdeg")).as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__in"))
      val next = nodes
        .join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("__in"), lit(0L))).as("mass"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before releasing the previous round
      mass.unpersist()
      mass = next
    }
    // the final mass frame is persisted AND materialized, so the loop
    // inputs can release now — holding them would leak |E|+|V| cached
    // rows per call (the connectedComponents cleanup rule). The caller
    // owns the returned frame's release.
    wEdges.unpersist()
    nodes.unpersist()
    mass
  }

  /** Triangle enumeration over an undirected graph, DEGREE-ORDERED so
    * it survives skew: the classic hub problem (one celebrity node of
    * degree 10⁶ turns a naive wedge join into 10¹² candidate rows) is
    * defused by orienting every edge from its lower-(degree, id)
    * endpoint to the higher one — each node's OUT-degree is then
    * O(√|E|), so the wedge self-join is bounded regardless of hubs
    * (Suri & Vassilvitskii, WWW'11 "Counting Triangles and the Curse
    * of the Last Reducer").
    *
    * Returns one row per triangle with the member ids in plain
    * ascending order (`a < b < c`) — engine-portable and directly
    * SQL-replayable from the normalized edge set.
    *
    * Shape: normalize+distinct (one exchange on the edge pair), a
    * node-keyed degree aggregate joined to both endpoints, the wedge
    * self-join on the oriented source, and a final equi-join of the
    * wedge's open pair against the oriented edge set — hash joins and
    * aggregates only, never a cross product, never a window over the
    * corpus. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // undirected normalization: u < v, self-loops dropped, distinct
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("id"))
      .union(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // total order on nodes: (degree, id) — orient low → high
    val withOrd = e
      .join(deg.select(col("id").as("u"), struct(col("deg"), col("id")).as("__ou")), Seq("u"))
      .join(deg.select(col("id").as("v"), struct(col("deg"), col("id")).as("__ov")), Seq("v"))
    val oriented = withOrd.select(
        when(col("__ou") < col("__ov"), col("u")).otherwise(col("v")).as("a"),
        when(col("__ou") < col("__ov"), col("v")).otherwise(col("u")).as("b"),
        when(col("__ou") < col("__ov"), col("__ov")).otherwise(col("__ou")).as("__ob"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges a→x, a→y with ord(x) < ord(y); close against oriented x→y
    val w1 = oriented.select(col("a"), col("b").as("x"), col("__ob").as("__ox"))
    val w2 = oriented.select(col("a"), col("b").as("y"), col("__ob").as("__oy"))
    val wedges = w1.join(w2, Seq("a")).filter(col("__ox") < col("__oy"))
    val closing = oriented.select(col("a").as("x"), col("b").as("y"))
    // canonical (a < b < c) via ONE type-agnostic sort of the 3-array:
    // the old sum-minus-extremes middle-vertex arithmetic was numeric-
    // only — on STRING node ids (host graphs, the documented canonical
    // use) the implicit double cast made every middle vertex NULL
    val tri = wedges.join(closing, Seq("x", "y"), "left_semi")
      .select(sort_array(array(col("a"), col("x"), col("y"))).as("__t"))
      .select(col("__t").getItem(0).as("a"),
        col("__t").getItem(1).as("b"),
        col("__t").getItem(2).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize, then drop the two loop-internal caches — otherwise
    // every call leaks the normalized edge list and its orientation
    // (the connectedComponents cleanup rule; caller releases `tri`)
    tri.count()
    e.unpersist()
    oriented.unpersist()
    tri
  }
  /** RESOURCE-ALLOCATION link prediction over a bipartite graph
    * (Zhou, Lü & Zhang, Eur. Phys. J. B 2009): score a left-node pair
    * by Σ over shared right-neighbors of 1/deg(z) — common neighbors,
    * discounted by how promiscuous each shared neighbor is (a part
    * stocked by every supplier says little; a rare part says a lot).
    * Each 1/deg term is floor(10⁶/deg) ([[PortableDiv.nonNeg]]) so
    * the per-pair sum `ra_ppm` is integer-exact and replayable; the
    * per-term floor under-counts the real-valued index by < n_shared
    * ppm. Returns the topN pairs (left_a < left_b) by (ra_ppm desc,
    * left_a, left_b): (left_a, left_b, n_shared, ra_ppm).
    *
    * Scale: the pair explosion is bounded by `maxDeg` — right nodes
    * with deg > maxDeg are DROPPED before the self-join (they carry
    * the least signal and all the quadratic cost: the df-cap rule of
    * the n-gram dedups), deg < 2 can't form a pair, so the join emits
    * ≤ C(maxDeg, 2) rows per right node. The topN is a bounded
    * TakeOrdered, never a materialized global sort. */
  def resourceAllocation(edges: DataFrame, leftCol: String,
      rightCol: String, maxDeg: Int, topN: Int): DataFrame = {
    require(maxDeg >= 2, s"maxDeg must be >= 2, got $maxDeg")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val e = edges
      .filter(col(leftCol).isNotNull && col(rightCol).isNotNull)
      .select(col(leftCol).as("__l"), col(rightCol).as("__r"))
      .distinct()
    val deg = e.groupBy(col("__r")).agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") >= 2 && col("__deg") <= maxDeg)
    // persisted (r17): the deg-gated edge list feeds BOTH sides of the
    // pair self-join — unpersisted, the distinct + degree join replays
    // four upstream scans (plan-verified: 4 parquet scans → 1)
    val gated = e.join(deg, Seq("__r"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    gated.as("a")
      .join(gated.as("b"),
        col("a.__r") === col("b.__r") && col("a.__l") < col("b.__l"))
      .select(col("a.__l").as("left_a"), col("b.__l").as("left_b"),
        col("a.__deg").as("__deg"))
      .groupBy(col("left_a"), col("left_b"))
      .agg(count(lit(1)).as("n_shared"),
        sum(PortableDiv.nonNeg(lit(1000000L), col("__deg"))).as("ra_ppm"))
      .orderBy(col("ra_ppm").desc, col("left_a"), col("left_b"))
      .limit(topN)
  }

  /** Hierarchical TREE ROLLUP: per node, the aggregate (count, sum)
    * over its whole SUBTREE — the account-hierarchy readout every CRM
    * pipeline needs ("pipeline value under this account, all levels
    * down"; the reference's Salesforce org model is exactly such a
    * forest). A recursive CTE is the single-node formulation; the
    * distributed shape here is ANCESTOR-CLOSURE BY POINTER DOUBLING:
    *
    *   round k materializes every (node, ancestor) pair within
    *   distance < 2^k plus each node's 2^k-th ancestor (the jump
    *   pointer); both double per round, so ⌈log₂(maxDepth+1)⌉ joins
    *   close a depth-maxDepth forest — 5 rounds for depth 32, vs
    *   maxDepth sequential joins for the naive bottom-up walk.
    *
    * One (ancestor)-keyed hash aggregate over the closure finishes.
    * Closure size is Σ_v depth(v) ≈ n·avg-depth — linear for the
    * shallow forests hierarchies are in practice (document caps if
    * yours is a path graph). Cycles are the caller's contract to
    * exclude (a parent pointer forest has none); nodes whose parent
    * is NULL are roots. Returns (idCol, n_subtree, subtree_sum) —
    * count includes the node itself; sum is exact DECIMAL(38,0)
    * narrowed to long.
    *
    * Scale shape: each round is one equi-join of the closure against
    * the jump table (both node-keyed) + a distinct; no window, no
    * driver path; per-round lineage truncation via eager local
    * checkpoint (the kCorePeel rule — the round references closure
    * twice and jump three times, so persist alone leaves a
    * multiplying logical plan; measured 4× slower). */
  def treeRollup(nodes: DataFrame, idCol: String, parentCol: String,
      valueCol: String, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    // after i doubling iterations the closure covers ancestor
    // distances [0, 2^i] — iterate until 2^iters >= maxDepth
    // (iters = ⌈log₂ maxDepth⌉; 0 when the forest is one level deep)
    val iters =
      if (maxDepth == 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros((maxDepth - 1).toLong)
    val base = nodes.select(col(idCol).cast("long").as("__id"),
      col(parentCol).cast("long").as("__p"),
      col(valueCol).cast("long").as("__v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // closure starts as {(v, v)} ∪ {(v, parent(v))}; jump = parent.
    // Lineage is TRUNCATED per round (eager localCheckpoint, the
    // kCorePeel rule): each round references closure twice and jump
    // three times, so persist alone leaves a multiplying logical plan
    // that Catalyst re-analyzes per round — measured 16-20 s for 4
    // rounds on a 50k-node forest, 3.4 s truncated.
    var closure = base.select(col("__id"), col("__id").as("__anc"))
      .union(base.filter(col("__p").isNotNull)
        .select(col("__id"), col("__p").as("__anc")))
      .localCheckpoint(true)
    var jump = base.filter(col("__p").isNotNull)
      .select(col("__id"), col("__p").as("__j"))
      .localCheckpoint(true)
    for (_ <- 0 until iters.toInt) {
      val jumped = closure.join(
          jump.select(col("__id").as("__mid"), col("__j")),
          col("__anc") === col("__mid"))
        .select(col("__id"), col("__j").as("__anc"))
      closure = closure.unionByName(jumped).distinct().localCheckpoint(true)
      jump = jump.as("a").join(
          jump.as("b").select(col("__id").as("__mid"), col("__j").as("__j2")),
          col("a.__j") === col("__mid"))
        .select(col("a.__id").as("__id"), col("__j2").as("__j"))
        .localCheckpoint(true)
    }
    // completeness tripwire: one more doubling step must add NOTHING —
    // otherwise the forest is deeper than maxDepth and every high
    // ancestor would silently undercount its subtree. Sound because
    // the closure covers distances [0, 2^iters] ⊇ [0, maxDepth]: a
    // deeper forest leaves some (v, a)∘jump pair outside it.
    val leftover = closure.join(
        jump.select(col("__id").as("__mid"), col("__j")),
        col("__anc") === col("__mid"))
      .select(col("__id"), col("__j").as("__anc"))
      .join(closure, Seq("__id", "__anc"), "left_anti")
      .limit(1).count()
    if (leftover > 0L) {
      base.unpersist()
      throw new IllegalArgumentException(
        s"treeRollup: forest is deeper than maxDepth=$maxDepth - " +
          "raise maxDepth (rounds grow only logarithmically)")
    }
    val out = closure
      .join(base.select(col("__id"), col("__v")), Seq("__id"))
      .groupBy(col("__anc"))
      .agg(count(lit(1)).as("n_subtree"),
        sum(col("__v").cast("decimal(38,0)")).cast("long").as("subtree_sum"))
      .select(col("__anc").as(idCol), col("n_subtree"), col("subtree_sum"))
    out.persist(StorageLevel.MEMORY_AND_DISK).count()
    base.unpersist()
    out
  }

  /** DEGREE ASSORTATIVITY — Pearson correlation of endpoint degrees
    * over the (deduplicated) edge list: do hubs link to hubs
    * (assortative, r > 0) or to leaves (disassortative, r < 0)? The
    * directed-bipartite form: x = deg(src), y = deg(dst) per edge.
    * Degrees are exact integer aggregates; the six correlation sums
    * ride DECIMAL(38,0); r is one IEEE double expression over the
    * exact integers, floor-milli. NULL when either side's degrees
    * are constant (zero variance). Returns ONE row:
    * (n_edges, r_milli).
    *
    * Scale shape: two degree aggregates + two src/dst-keyed
    * equi-joins (the only data-sized exchanges) + one six-stat hash
    * aggregate with map-side partials; no self-join, no window. */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val Dec = "decimal(38,0)"
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__t"))
      .filter(col("__s").isNotNull && col("__t").isNotNull)
      .distinct()
    val ds = e.groupBy(col("__s")).agg(count(lit(1)).as("__dx"))
    val dt = e.groupBy(col("__t")).agg(count(lit(1)).as("__dy"))
    val xy = e.join(ds, Seq("__s")).join(dt, Seq("__t"))
    val agg = xy.agg(
      count(lit(1)).as("n_edges"),
      sum(col("__dx").cast(Dec)).cast(Dec).as("__sx"),
      sum(col("__dy").cast(Dec)).cast(Dec).as("__sy"),
      sum((col("__dx").cast(Dec) * col("__dx")).cast(Dec)).cast(Dec).as("__sx2"),
      sum((col("__dy").cast(Dec) * col("__dy")).cast(Dec)).cast(Dec).as("__sy2"),
      sum((col("__dx").cast(Dec) * col("__dy")).cast(Dec)).cast(Dec).as("__sxy"))
    val n = col("n_edges").cast("double")
    val (sx, sy) = (col("__sx").cast("double"), col("__sy").cast("double"))
    val (sx2, sy2) = (col("__sx2").cast("double"), col("__sy2").cast("double"))
    val sxy = col("__sxy").cast("double")
    val num = n * sxy - sx * sy
    val vx = n * sx2 - sx * sx
    val vy = n * sy2 - sy * sy
    agg.select(col("n_edges"),
      when(col("n_edges") >= 2L && vx > 0.0 && vy > 0.0,
        floor(lit(1000.0) * num / sqrt(vx * vy)).cast("long"))
        .otherwise(lit(null).cast("long")).as("r_milli"))
  }

  /** BOUNDED k-CORE PEEL — `rounds` rounds of "drop every node with
    * degree < k, then every edge touching a dropped node" over an
    * undirected simple edge list. Reaching a fixpoint within the
    * bound yields the true k-core (Matula & Beck 1983's peeling,
    * round-synchronous); the bound makes the distributed shape
    * replayable and the cost contract explicit — callers size
    * `rounds` to their graph's peel depth (a cascade peels one layer
    * per round; the q297 fixture reaches fixpoint in 5). Returns the
    * surviving nodes with their residual degree: (node, degree).
    *
    * Scale shape: per round ONE degree aggregate + two semi-joins
    * (edge endpoints against surviving nodes, both node-keyed);
    * per-round lineage truncation via eager local checkpoint (see the
    * body comment — persist alone leaves a 3^r logical plan); no
    * driver-side graph state. */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // Lineage is TRUNCATED per round (eager localCheckpoint), not just
    // cached: each round references the previous edge frame THREE
    // times (the frame itself + the keep set on both endpoints), so a
    // plain persist leaves a logical plan growing 3^r — Catalyst
    // re-analyzes the whole tree every round and the driver OOMs near
    // r = 7 even on a 500-edge graph (measured). pageRankInt gets away
    // with persist because its recurrence references the previous
    // frame linearly. Checkpoint blocks are executor-local and freed
    // by the ContextCleaner as rounds unreference them; `rounds` is
    // the caller's explicit cost bound.
    // undirected: orient both ways once; dedup to a simple graph
    val base = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull &&
        col("__a") =!= col("__b"))
    var e = base.union(base.select(col("__b").as("__a"), col("__a").as("__b")))
      .distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("__a")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k)
        .select(col("__a").as("__keep"))
      e = e
        .join(keep.withColumnRenamed("__keep", "__a"), Seq("__a"), "left_semi")
        .join(keep.withColumnRenamed("__keep", "__b"), Seq("__b"), "left_semi")
        .localCheckpoint(true)
    }
    e.groupBy(col("__a").as("node"))
      .agg(count(lit(1)).as("degree"))
  }
}
