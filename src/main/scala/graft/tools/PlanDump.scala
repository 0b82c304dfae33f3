package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump full `.explain("formatted")` output for selected contract
  * queries to `plans/<round>/<query>_<suffix>.txt` — the committed
  * evidence for optimization-round plan claims. Args:
  * `<round>/<suffix> q1 q2 ...` (e.g. `r17/before q114_dup_spans`).
  * Session config mirrors graft.Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE on) so plan shapes match the bench. */
object PlanDump {
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
        try graft.SparkEntry.queries(name)(spark, dir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"PLAN FAILED: ${e}" }
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote $name ($suffix): ${plan.linesIterator.size} lines")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
