package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for selected
  * contract queries so pushdown/broadcast/top-k shapes can be checked
  * (the ".explain and iterate" loop from the build brief). */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val want = if (args.isEmpty) Seq("q03_pred_eq", "q10_pred_between",
      "q15_topk", "q21_sql_q3", "q22_join_star", "q16_upsert_coalesce",
      "q45_minhash_neardup") else args.toSeq
    want.foreach { name =>
      println(s"\n===================== $name =====================")
      println(graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.take(60).mkString("\n"))
    }
    spark.stop()
  }
}
