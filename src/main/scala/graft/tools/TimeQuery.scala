package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo re-timer for individual contract queries (not part of the
  * driver contract): `runMain graft.tools.TimeQuery q83_dedup_clusters
  * [runs]` — same session config as Bench, min + all samples printed.
  * For isolating one query's cost from suite effects when chasing a
  * bench regression. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq // comma-separated: one JVM, many queries
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      spark.catalog.clearCache()
      val ts = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[timeq] $name #$i $t%.2f s")
        t
      }
      println(f"[timeq] $name min ${ts.min}%.2f s over $runs runs")
    }
    spark.stop()
  }
}
