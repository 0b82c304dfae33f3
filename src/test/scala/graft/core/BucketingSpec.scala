package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans zero exchanges and matches the plain join") {
    val orders = Fx.t(spark, sfDir, "orders")
    val lineitem = Fx.t(spark, sfDir, "lineitem")
    Bucketing.writeBucketed(orders.withColumnRenamed("o_orderkey", "k"),
      "b_orders", "k", numBuckets = 4, sortCols = Seq("k"))
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "k"),
      "b_lineitem", "k", numBuckets = 4, sortCols = Seq("k"))
    // the fixture is tiny, so the planner would broadcast (which
    // disables bucketing); force the big-table path this demonstrates
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "k")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SortMergeJoin"), p)
      // same result as the shuffling join over the raw files
      val expected = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    Bucketing.writeBucketed(
      Fx.t(spark, sfDir, "orders").withColumnRenamed("o_orderkey", "k"),
      "b_agg", "k", numBuckets = 4)
    try {
      val agg = spark.table("b_agg").groupBy("k").agg(count(lit(1)))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
      assert(agg.count() == Fx.t(spark, sfDir, "orders").count())
    } finally spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}
