package graft.ext

import graft.SparkSpec
import graft.core.Fx
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV distinct-count: within 15% of exact at k=256; exact below k") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    val est = Sketches.kmvDistinctCount(li, "l_returnflag", "l_orderkey", k = 256)
      .as[(String, Double)].collect().toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (g, e) =>
      val n = exact(g).toDouble
      if (n < 256) assert(e == n, s"$g: groups below k must be exact ($e vs $n)")
      else assert(math.abs(e - n) / n < 0.15, s"$g: est $e vs exact $n")
    }
  }

  test("KMV is deterministic across recomputation") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val a = Sketches.kmvDistinctCount(li, "l_returnflag", "l_orderkey")
      .as[(String, Double)].collect().toMap
    val b = Sketches.kmvDistinctCount(li, "l_returnflag", "l_orderkey")
      .as[(String, Double)].collect().toMap
    assert(a == b)
  }

  test("sampled discrete median: close to the exact median, is an actual value") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val exact = li.groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .as[(String, Double)].collect().toMap
    val est = Sketches.sampledQuantile(li, "l_returnflag", "l_extendedprice",
      "l_orderkey", q = 0.5, fraction = 0.25)
      .as[(String, Double)].collect().toMap
    val values = li.select($"l_extendedprice").as[Double].collect().toSet
    est.foreach { case (g, e) =>
      assert(values.contains(e), s"$g: $e is not a data value")
      // medians of heavy-tailed price data: generous relative band
      assert(math.abs(e - exact(g)) / exact(g) < 0.25, s"$g: $e vs ${exact(g)}")
    }
  }
}
