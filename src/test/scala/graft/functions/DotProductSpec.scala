package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.0, 0.0), Seq(1.0, 1.0))
  ).toDF("id", "a", "b")

  test("native dot == HOF formulation, bit for bit") {
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (s, x) => s + x))
      .as[Double].collect().toSeq
    val native = df.select(GraftFunctions.dot($"a", $"b")).as[Double].collect().toSeq
    assert(native == hof)
    assert(native == Seq(32.0, 0.0))
  }

  test("null element or null array poisons the result (HOF parity)") {
    val withNulls = Seq(
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (None, Some(Seq(Some(1.0))))
    ).toDF("a", "b")
    val out = withNulls.select(GraftFunctions.dot($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("registered in SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("dot_test")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM dot_test WHERE id = 1")
      .as[Double].first()
    assert(r == 32.0)
    val c = spark.sql("SELECT graft_cosine(a, a) AS c FROM dot_test WHERE id = 1")
      .as[Double].first()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosine Column API == ext.Similarity formula") {
    val viaNative = df.select(GraftFunctions.cosine($"a", $"b")).as[Double].collect().toSeq
    val viaSim = df.select(graft.ext.Similarity.cosine($"a", $"b")).as[Double].collect().toSeq
    assert(viaNative.zip(viaSim).forall { case (x, y) =>
      (x.isNaN && y.isNaN) || x == y || math.abs(x - y) < 1e-15 })
  }

  test("non-double arrays are rejected at analysis") {
    val bad = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    intercept[Exception](bad.select(GraftFunctions.dot($"a", $"b")).collect())
  }

  test("fixture-scale sanity: self-dot equals squared norm") {
    val emb = graft.core.Fx.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val r = emb.select(
      GraftFunctions.dot($"e", $"e").as("d"),
      aggregate($"e", lit(0.0), (s, x) => s + x * x).as("expect"))
    assert(r.filter($"d" =!= $"expect").count() == 0)
  }
}
