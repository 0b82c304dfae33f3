package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankInt: hand-computed masses on a 3-node graph, exact") {
    // 1 -> 2, 2 -> 1, 3 -> 1; outdeg 1 everywhere
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("s", "t")
    // round 1: damp(1e6) = 850000 each
    //   node1 = 150000 + 850000 (from 2) + 850000 (from 3) = 1850000
    //   node2 = 150000 + 850000 (from 1) = 1000000
    //   node3 = 150000 (no in-edges)
    // round 2: damp(1850000)=1572500, damp(1000000)=850000, damp(150000)=127500
    //   node1 = 150000 + 850000 + 127500 = 1127500
    //   node2 = 150000 + 1572500 = 1722500
    //   node3 = 150000
    val got = GraphOps.pageRankInt(edges, "s", "t", iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1127500L, 2L -> 1722500L, 3L -> 150000L),
      s"got $got")
    spark.catalog.clearCache()
  }

  test("pageRankInt: deterministic across partition layouts; sinks keep base mass") {
    val edges = (1L to 200L).map(i => (i % 23, (i * 31 + 7) % 23)).toDF("s", "t")
    val a = GraphOps.pageRankInt(edges, "s", "t", iterations = 4)
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.pageRankInt(edges.repartition(7), "s", "t", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "masses are integer-exact: layout must not matter")
    // every node retains at least the undamped base
    assert(a.values.forall(_ >= 150000L))
    // out-degree division conserves mass at most (floors only lose)
    assert(a.values.sum <= 23L * 1000000L + 23L * 150000L)
    spark.catalog.clearCache()
  }

  test("pageRankInt: argument guards") {
    val e = Seq((1L, 2L)).toDF("s", "t")
    intercept[IllegalArgumentException](
      GraphOps.pageRankInt(e, "s", "t", iterations = 0))
    intercept[IllegalArgumentException](
      GraphOps.pageRankInt(e, "s", "t", dampingPct = 101))
    spark.catalog.clearCache()
  }

  test("triangles: K4 yields exactly its 4 triangles; duplicates/reversals/self-loops normalize away") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((2L, 1L), (3L, 3L), (4L, 5L))) // dup reversed, self-loop, pendant
      .toDF("s", "t")
    val got = GraphOps.triangles(edges, "s", "t")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    spark.catalog.clearCache()
  }

  test("triangles: STRING node ids (host graphs, the canonical use) enumerate correctly") {
    // regression: the middle vertex used sum-minus-extremes NUMERIC
    // arithmetic, which null'd every b on string ids
    val edges = Seq(("a.com", "b.com"), ("b.com", "c.com"), ("a.com", "c.com"),
      ("c.com", "d.com")).toDF("s", "t")
    val got = GraphOps.triangles(edges, "s", "t")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("a.com", "b.com", "c.com")))
    spark.catalog.clearCache()
  }

  test("triangles: a hub star has none; orientation bounds the hub's wedge fan-out") {
    // hub 0 linked to 50 leaves: naive wedge join on the hub would
    // generate C(50,2) candidates; degree-ordering orients every edge
    // leaf -> hub (leaves have degree 1), so the hub SOURCES no wedge
    val star = (1L to 50L).map(l => (0L, l)).toDF("s", "t")
    assert(GraphOps.triangles(star, "s", "t").count() == 0L)
    // and adding one leaf-leaf edge closes exactly one triangle
    val one = star.union(Seq((7L, 9L)).toDF("s", "t"))
    assert(GraphOps.triangles(one, "s", "t")
      .as[(Long, Long, Long)].collect().toSet == Set((0L, 7L, 9L)))
    spark.catalog.clearCache()
  }

  test("resourceAllocation: shared-neighbor terms floor per degree; caps gate") {
    import spark.implicits._
    val edges = Seq(
      ("s1", "p1"), ("s2", "p1"),               // deg 2 → 500000
      ("s1", "p2"), ("s2", "p2"), ("s3", "p2"), // deg 3 → 333333
      ("s3", "p3"),                             // deg 1 → no pair
      ("s1", "p1")                              // duplicate edge dedups
    ).toDF("s", "p")
    val out = GraphOps.resourceAllocation(edges, "s", "p", maxDeg = 64, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n_shared"), r.getAs[Long]("ra_ppm")))
    assert(out.toSeq == Seq(
      ("s1", "s2", 2L, 833333L),
      ("s1", "s3", 1L, 333333L),
      ("s2", "s3", 1L, 333333L)))
    // deg cap drops the deg-3 part entirely
    val capped = GraphOps.resourceAllocation(edges, "s", "p", maxDeg = 2, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Long]("ra_ppm")))
    assert(capped.toSeq == Seq(("s1", "s2", 500000L)))
  }

  test("treeRollup: subtree sums and counts on an explicit forest") {
    import spark.implicits._
    // 1 <- {2, 3}, 2 <- {4, 5}, 5 <- 6; plus a second root 7
    val nodes = Seq(
      (1L, None, 1L), (2L, Some(1L), 2L), (3L, Some(1L), 3L),
      (4L, Some(2L), 4L), (5L, Some(2L), 5L), (6L, Some(5L), 6L),
      (7L, None, 7L)
    ).toDF("id", "parent", "value")
    val out = GraphOps.treeRollup(nodes, "id", "parent", "value", maxDepth = 8)
    val m = out.collect().map(r => r.getLong(0) ->
      (r.getAs[Long]("n_subtree"), r.getAs[Long]("subtree_sum"))).toMap
    out.unpersist()
    assert(m == Map(
      1L -> ((6L, 21L)), 2L -> ((4L, 17L)), 3L -> ((1L, 3L)),
      4L -> ((1L, 4L)), 5L -> ((2L, 11L)), 6L -> ((1L, 6L)),
      7L -> ((1L, 7L))))
  }

  test("treeRollup: a deep chain closes when maxDepth covers it") {
    import spark.implicits._
    val n = 9L
    val nodes = (1L to n).map(i =>
      (i, if (i == 1) None else Some(i - 1), 1L)).toDF("id", "parent", "value")
    val out = GraphOps.treeRollup(nodes, "id", "parent", "value",
      maxDepth = n.toInt - 1)
    val m = out.collect().map(r => r.getLong(0) -> r.getAs[Long]("subtree_sum")).toMap
    out.unpersist()
    // chain: subtree of node i is {i..n}
    (1L to n).foreach(i => assert(m(i) == n - i + 1, s"node $i"))
  }

  test("treeRollup: a forest deeper than maxDepth fails loudly, not silently") {
    import spark.implicits._
    val chain = (1L to 12L).map(i =>
      (i, if (i == 1) None else Some(i - 1), 1L)).toDF("id", "parent", "value")
    val e = intercept[IllegalArgumentException] {
      GraphOps.treeRollup(chain, "id", "parent", "value", maxDepth = 4)
    }
    assert(e.getMessage.contains("deeper than maxDepth"))
    // exactly-covering maxDepth still succeeds (depth 11 <= 2^4 = 16)
    val ok = GraphOps.treeRollup(chain, "id", "parent", "value", maxDepth = 11)
    assert(ok.collect().map(_.getAs[Long]("subtree_sum")).max == 12L)
    ok.unpersist()
  }


  test("degreeAssortativity: replay of a hand graph; constant side reads NULL") {
    import spark.implicits._
    // edges: (a,x) (a,y) (b,x) -> deg a=2 b=1; x=2 y=1
    val e = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("s", "t")
    val out = GraphOps.degreeAssortativity(e, "s", "t").collect().head
    assert(out.getAs[Long]("n_edges") == 3L)
    // pairs (2,2) (2,1) (1,2): n=3 sx=5 sy=5 sx2=9 sy2=9 sxy=8
    val (n, sx, sy, sx2, sy2, sxy) = (3.0, 5.0, 5.0, 9.0, 9.0, 8.0)
    val exp = math.floor(1000.0 * (n * sxy - sx * sy) /
      math.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))).toLong
    assert(out.getAs[Long]("r_milli") == exp)
    // star: the hub side is constant-degree across edges of each src?
    // two-edge star from one hub: src degrees constant -> NULL
    val star = Seq(("h", "x"), ("h", "y")).toDF("s", "t")
    val so = GraphOps.degreeAssortativity(star, "s", "t").collect().head
    assert(so.isNullAt(so.fieldIndex("r_milli")))
  }

  test("kCorePeel: the ladder cascades away, the clique survives; duplicates collapse") {
    import spark.implicits._
    val clique = for { a <- 1 to 6; b <- (a + 1) to 6 } yield (a.toLong, b.toLong)
    // ladder(6): rails a101..a106 / b201..b206 + rungs
    val rails = (0 until 5).flatMap(i =>
      Seq((101L + i, 102L + i), (201L + i, 202L + i)))
    val rungs = (0 until 6).map(i => (101L + i, 201L + i))
    // a duplicate + a reversed edge must not inflate degrees
    val edges = (clique ++ rails ++ rungs ++ Seq((1L, 2L), (2L, 1L)))
      .toDF("a", "b")
    val out = GraphOps.kCorePeel(edges, "a", "b", k = 3, rounds = 5)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("degree")).toMap
    assert(out.keySet == (1L to 6L).toSet)
    assert(out.values.forall(_ == 5L))
  }
}
