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
}
