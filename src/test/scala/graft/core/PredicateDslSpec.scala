package graft.core

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class PredicateDslSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df: DataFrame = Seq(
    (1L, "alpha", 10.0, Some("x")),
    (2L, "beta", 20.0, None),
    (3L, "gamma", 30.0, Some("y")),
    (4L, "delta", 40.0, None)
  ).toDF("id", "name", "score", "tag")

  private def ids(preds: Pred*): Set[Long] =
    Query.get(df, where = preds.toSeq).select("id").as[Long].collect().toSet

  test("Eq / In / NotIn") {
    assert(ids(Pred.Eq("name", "beta")) == Set(2L))
    assert(ids(Pred.In("name", Seq("alpha", "gamma"))) == Set(1L, 3L))
    assert(ids(Pred.NotIn("name", Seq("alpha", "gamma"))) == Set(2L, 4L))
  }

  test("Like / NotLike") {
    assert(ids(Pred.Like("name", "%a")) == Set(1L, 2L, 3L, 4L))
    assert(ids(Pred.Like("name", "a%")) == Set(1L))
    assert(ids(Pred.NotLike("name", "%et%")) == Set(1L, 3L, 4L))
  }

  test("IsNull / IsNotNull") {
    assert(ids(Pred.IsNull("tag")) == Set(2L, 4L))
    assert(ids(Pred.IsNotNull("tag")) == Set(1L, 3L))
  }

  test("Between inclusive on both ends / NotBetween") {
    assert(ids(Pred.Between("score", 10.0, 30.0)) == Set(1L, 2L, 3L))
    assert(ids(Pred.NotBetween("score", 10.0, 30.0)) == Set(4L))
  }

  test("operator passthrough arms (reference database/main.py:212-213)") {
    assert(ids(Pred.Op("score", ">", 20.0)) == Set(3L, 4L))
    assert(ids(Pred.Op("score", ">=", 20.0)) == Set(2L, 3L, 4L))
    assert(ids(Pred.Op("score", "<", 20.0)) == Set(1L))
    assert(ids(Pred.Op("score", "<=", 20.0)) == Set(1L, 2L))
    assert(ids(Pred.Op("score", "!=", 20.0)) == Set(1L, 3L, 4L))
    assert(ids(Pred.Op("name", "~", "^[ad]")) == Set(1L, 4L))
    intercept[IllegalArgumentException](PredicateDsl.compile(Pred.Op("score", "??", 1)))
  }

  test("conjunction fold; empty where is no filter") {
    assert(ids(Pred.Op("score", ">", 10.0), Pred.Op("score", "<", 40.0)) == Set(2L, 3L))
    assert(ids() == Set(1L, 2L, 3L, 4L))
  }
}
