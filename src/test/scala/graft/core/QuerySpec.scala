package graft.core

import graft.SparkSpec

class QuerySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", 30.0), (2L, "b", 10.0), (3L, "c", 40.0), (4L, "d", 20.0)
  ).toDF("id", "v", "score")

  test("sort -> offset -> limit clause order (D12)") {
    val r = Query.get(df,
      columns = Seq("id"),
      sortBy = Seq(SortKey("score", ascending = false)),
      limit = 2, offset = 1).as[Long].collect().toSeq
    // score desc: 3(40),1(30),4(20),2(10); offset 1 -> 1,4; limit 2 -> 1,4
    assert(r == Seq(1L, 4L))
  }

  test("falsy-zero quirk: limit=0 / offset=0 are dropped (main.py:233,239)") {
    assert(Query.get(df, limit = 0, offset = 0).count() == 4)
  }

  test("WHERE and ORDER BY may reference non-projected columns") {
    val r = Query.get(df,
      columns = Seq("v"),
      where = Seq(Pred.Op("score", ">", 15.0)),
      sortBy = Seq(SortKey("score"))).as[String].collect().toSeq
    assert(r == Seq("d", "a", "c"))
  }

  test("sort null ordering matches Postgres: ASC nulls last, DESC nulls first") {
    val withNulls = Seq((1L, Some(2.0)), (2L, None: Option[Double]), (3L, Some(1.0)))
      .toDF("id", "x")
    val asc = Query.get(withNulls, columns = Seq("id"),
      sortBy = Seq(SortKey("x"))).as[Long].collect().toSeq
    assert(asc == Seq(3L, 1L, 2L))
    val desc = Query.get(withNulls, columns = Seq("id"),
      sortBy = Seq(SortKey("x", ascending = false))).as[Long].collect().toSeq
    assert(desc == Seq(2L, 1L, 3L))
  }

  test("rows materializer crosses the driver boundary as maps") {
    val r = Query.rows(Query.get(df, where = Seq(Pred.Eq("id", 2))))
    assert(r == Seq(Map("id" -> 2L, "v" -> "b", "score" -> 10.0)))
  }
}
