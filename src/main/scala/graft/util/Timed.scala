package graft.util

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.Column

/** Timing utility, reference `timer` decorator (reference:
  * revtron/functions/time/timer.py:6-24): wraps a call, reports label +
  * elapsed seconds. Spark-native observability is added via
  * `Dataset.observe` (metrics evaluated inside the job, no extra pass). */
object Timed {

  def timed[A](label: String)(f: => A): A = {
    val (r, secs) = timedValue(f)
    println(f"[timer] $label%s ${secs}%.3f s")
    r
  }

  def timedValue[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Attach named observed metrics to a DataFrame — the Spark-native
    * analogue of the reference's decorator (computed during the job,
    * retrievable via QueryExecutionListener / streaming progress). */
  def observed(df: DataFrame, name: String, metrics: Seq[Column]): DataFrame =
    if (metrics.isEmpty) df else df.observe(name, metrics.head, metrics.tail: _*)
}
