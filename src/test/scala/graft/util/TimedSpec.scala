package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution
import java.util.concurrent.ConcurrentLinkedQueue

/** T1 — the timing decorator's Spark-native form: `observe` metrics are
  * computed INSIDE the job (no extra pass) and surface through a
  * QueryExecutionListener, replacing the reference's wall-clock print
  * (reference: revtron/functions/time/timer.py:6-24). */
class TimedSpec extends SparkSpec {
  import spark.implicits._

  test("timed returns the value and timedValue measures elapsed wall clock") {
    val (v, secs) = Timed.timedValue { Thread.sleep(30); 42 }
    assert(v == 42 && secs >= 0.03)
    assert(Timed.timed("label") { 7 } == 7)
  }

  test("observed metrics are computed in-job and reach the listener") {
    val seen = new ConcurrentLinkedQueue[(String, Long, Double)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          seen.add((name, row.getLong(0), row.getDouble(1)))
        }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0)).toDF("id", "x")
      Timed.observed(df, "my_metrics",
        Seq(count(lit(1)).as("n"), sum($"x").as("sum_x"))).collect()
      // the listener fires asynchronously; poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.contains(("my_metrics", 3L, 12.0)), seen.toString)
    } finally spark.listenerManager.unregister(listener)
  }
}
