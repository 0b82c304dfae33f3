package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Fx
import graft.util.Timed

/** Scratch: time the heaviest contract queries individually. */
object ProfileHeavy {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fx.t(spark, dir, "documents").count() // warm
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q83_dedup_clusters", "q61_winnowing_neardup")
    for (i <- 1 to 3; n <- names) {
      val fn = graft.SparkEntry.queries(n)
      Timed.timed(s"$n #$i") {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
