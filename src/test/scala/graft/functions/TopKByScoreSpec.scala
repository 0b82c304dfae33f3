package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(TopKByScore.topK($"score", $"id", k).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "e")))
      .select($"g", $"e.id".as("id"), $"e.score".as("score"),
        ($"pos" + 1).as("rank"))

  test("matches row_number window semantics: score desc, id asc ties, rank 1-based") {
    val df = Seq(
      (1, 10L, 0.5), (1, 11L, 0.9), (1, 12L, 0.9), (1, 13L, 0.1), (1, 14L, 0.7),
      (2, 20L, 0.3), (2, 21L, 0.3), (2, 22L, 0.3)
    ).toDF("g", "id", "score")
    val got = topk(df, 3).orderBy($"g", $"rank").collect().toSeq
    assert(got == Seq(
      Row(1, 11L, 0.9, 1), Row(1, 12L, 0.9, 2), Row(1, 14L, 0.7, 3),
      Row(2, 20L, 0.3, 1), Row(2, 21L, 0.3, 2), Row(2, 22L, 0.3, 3)))
  }

  test("groups smaller than k return all their rows, still ranked") {
    val df = Seq((1, 1L, 2.0), (1, 2L, 1.0)).toDF("g", "id", "score")
    assert(topk(df, 10).count() == 2)
    assert(topk(df, 10).orderBy($"rank").select($"id").as[Long].collect().toSeq
      == Seq(1L, 2L))
  }

  test("null score or id rows are ignored; empty groups vanish") {
    val df = Seq(
      (1, Some(1L), Some(0.5)), (1, None, Some(0.9)), (1, Some(2L), None),
      (2, None, None)
    ).toDF("g", "id", "score")
    val got = topk(df, 5).collect()
    assert(got.toSeq == Seq(Row(1, 1L, 0.5, 1)))
  }

  test("insertion-order independent: agrees with a sort across many partitions") {
    val n = 5000
    val df = spark.range(n).select(
      (col("id") % 7).cast("int").as("g"),
      col("id").as("id"),
      // collision-heavy scores so ties exercise the id ordering
      (pmod(xxhash64(col("id")), lit(97)) / 97.0).as("score"))
      .repartition(16)
    val viaAgg = topk(df, 25)
      .select($"g", $"id", $"rank").orderBy($"g", $"rank")
      .collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 25)
      .select($"g", $"id", $"rank".cast("int")).orderBy($"g", $"rank")
      .collect().toSeq
    assert(viaAgg == viaWindow)
  }
}
