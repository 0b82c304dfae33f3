package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Fx
import graft.ext.{Dedup, TextOps}
import graft.util.Timed

/** Scratch profiler for hotspot queries (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Fx.t(spark, dir, "documents")
    Timed.timed("warmup count")(docs.count())

    val tk = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
    Timed.timed("tokens only")(tk.write.format("noop").mode("overwrite").save())

    val sets = docs.select(col("doc_id"),
      array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("s"))
    Timed.timed("shingle sets")(sets.write.format("noop").mode("overwrite").save())

    val ex = sets.select(col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("g"))
    Timed.timed("exploded")(ex.write.format("noop").mode("overwrite").save())

    val l = ex.select(col("doc_id").as("a"), col("n").as("na"), col("g"))
    val r = ex.select(col("doc_id").as("b"), col("n").as("nb"), col("g"))
    val pairs = l.join(r, Seq("g")).filter(col("a") < col("b"))
      .groupBy("a", "b", "na", "nb").agg(count(lit(1)).as("c"))
    Timed.timed("pair join+group")(pairs.write.format("noop").mode("overwrite").save())

    Timed.timed("full q44")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5, 3)
        .write.format("noop").mode("overwrite").save())

    // hypothesis: HOF shingle expr recomputed 4x (size+explode collapse,
    // then once per self-join side). persist barrier should collapse cost.
    val exP = sets.select(col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("g"))
      .persist()
    val lp = exP.select(col("doc_id").as("a"), col("n").as("na"), col("g"))
    val rp = exP.select(col("doc_id").as("b"), col("n").as("nb"), col("g"))
    val pairsP = lp.join(rp, Seq("g")).filter(col("a") < col("b"))
      .groupBy("a", "b", "na", "nb").agg(count(lit(1)).as("c"))
    Timed.timed("pair join+group PERSISTED")(pairsP.write.format("noop").mode("overwrite").save())
    println(s"exploded rows: ${exP.count()}")
    exP.unpersist()

    val li = Fx.t(spark, dir, "lineitem")
    Timed.timed("q01 count")(li.agg(count(lit(1))).write.format("noop").mode("overwrite").save())
    Timed.timed("q32 scalar")(
      li.filter(col("l_orderkey") % 100 === 0).select(
        col("l_orderkey"), col("l_linenumber"),
        year(col("l_shipdate")).cast("long").as("y"),
        month(col("l_shipdate")).cast("long").as("m"),
        upper(col("l_returnflag")).as("rf"),
        substring(col("l_linestatus"), 1, 1).as("ls"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        length(concat(col("l_returnflag"), lit("-"), col("l_linestatus")))
          .cast("long").as("strlen"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
