package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the FINAL adaptive plan (isFinalPlan=true) for selected
  * contract queries: executes each query through the noop sink first,
  * then prints/writes the re-optimized plan — the only place AQE's
  * runtime decisions (ReusedExchange/AQEShuffleRead/join rewrites)
  * are visible (PlanDump shows the initial plan). Args:
  * `<round>/<suffix> q1 q2 ...` — files land next to PlanDump's. */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val Array(roundSuffix, names @ _*) = args
    val Array(round, suffix) = roundSuffix.split("/")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get(s"plans/$round")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val plan =
        try {
          val df = graft.SparkEntry.queries(name)(spark, dir)
          // drive THIS QueryExecution (a .write would plan its own):
          // toRdd computes every row, then the explain is final
          df.queryExecution.toRdd.count()
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        } catch { case e: Throwable => s"PLAN FAILED: ${e}" }
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[finalplan] wrote $name ($suffix): ${plan.linesIterator.size} lines")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
