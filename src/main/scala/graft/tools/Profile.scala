package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Fx
import graft.ext.Dedup
import graft.util.Timed

/** Scratch profiler for hotspot queries (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Fx.t(spark, dir, "documents")
    Timed.timed("warmup count")(docs.count())

    // q44 cross-run variance: AQE alternates join strategies run to run.
    (1 to 3).foreach { i =>
      Timed.timed(s"q44 current #$i") {
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5, 3, maxDf = 100)
          .write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
