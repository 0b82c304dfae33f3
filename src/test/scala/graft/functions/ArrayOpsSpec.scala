package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrayOpsSpec extends SparkSpec {
  import spark.implicits._

  test("countEqual == size(filter(=)) on strings, incl. null cases") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "a"), "a"),
      (2L, Seq("a", "b"), "z"),
      (3L, Seq.empty[String], "a"),
      (4L, Seq("x", null, "x"), "x"),
      (5L, null.asInstanceOf[Seq[String]], "a")
    ).toDF("id", "arr", "v")
    val got = df.select($"id",
        GraftFunctions.countEqual($"arr", $"v").as("c"),
        size(filter($"arr", x => x === $"v")).as("h"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getInt(1),
        if (r.isNullAt(2)) null else r.getInt(2))).toSeq
    got.foreach { case (id, c, h) =>
      assert(c == h, s"id $id: countEqual $c != HOF $h") }
    assert(got.find(_._1 == 1L).get._2 == 3)
    assert(got.find(_._1 == 4L).get._2 == 2)   // null elements never match
    assert(got.find(_._1 == 5L).get._2 == null) // null array -> null
    // null value -> 0 (the filter keeps nothing)
    val z = Seq(Tuple1(Seq("a"))).toDF("arr")
      .select(GraftFunctions.countEqual($"arr", lit(null).cast("string")))
      .head()
    assert(z.getInt(0) == 0)
  }

  test("countEqual rejects floating-point element types (NaN hazard)") {
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(1.0, 2.0))).toDF("arr")
        .select(GraftFunctions.countEqual($"arr", lit(1.0))).collect()
    }
    assert(e.getMessage.contains("graft_count_eq"), e.getMessage)
  }

  test("RewriteSizeOfEqualityFilter: the HOF pattern optimizes to the native count") {
    GraftExtensions.register(spark)
    try {
      // a Range leaf, not a LocalRelation — local literal data would
      // constant-fold the whole query before the rule can show
      val df = spark.range(1, 3).select($"id",
        when($"id" === 1L, array(lit("a"), lit("b"), lit("a")))
          .otherwise(array(lit("c"))).as("arr"))
      val q = df.select($"id",
        size(filter($"arr", x => x === lit("a"))).as("c"),
        size(filter($"arr", x => lit("b") === x)).as("d"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_count_eq"),
        s"rule did not fire:\n$optimized")
      assert(!optimized.toLowerCase.contains("array_filter"),
        s"HOF survived:\n$optimized")
      // and the rewritten plan computes the same values
      val got = q.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == Set((1L, 2, 1), (2L, 0, 0)))
      // a lambda-dependent comparison value must NOT be rewritten
      val keep = df.select(
        size(filter($"arr", x => x === concat(x, lit("")))).as("k"))
      assert(!keep.queryExecution.optimizedPlan.toString.contains("graft_count_eq"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == RewriteSizeOfEqualityFilter)
    }
  }
}
