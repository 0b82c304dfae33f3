package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental MATERIALIZED-VIEW maintenance: per-key aggregate STATE
  * frames that merge associatively, so a 100 TB corpus's rollups
  * refresh from yesterday's state + today's delta — never a re-scan
  * of the history. The same algebraic-aggregate decomposition Spark
  * itself uses for map-side partials (count/sum add; min/max combine),
  * exposed at the FRAME level so the partial lives in a table across
  * runs instead of inside one job's shuffle.
  *
  * State per key: `cnt` plus, per measure m, `sum_m` (decimal-exact,
  * so merge order cannot perturb the total), `min_m`, `max_m`. Inserts
  * only: sums/counts are retractable in principle, min/max are not —
  * deletions require recompute of the affected keys (documented
  * limitation, shared with every min/max MV).
  *
  * The q159 contract pins the law end-to-end: state(base) merged with
  * state(delta) reads out EXACTLY like a direct recompute over
  * base ∪ delta (the DuckDB oracle IS the direct recompute).
  */
object Incremental {

  private def sumCol(m: String): Column =
    sum(col(m).cast("decimal(18,4)")).as(s"__sum_$m")

  /** The mergeable state frame for `df` grouped by `keyCols`:
    * (keys*, cnt, __sum_m decimal, min_m, max_m per measure). One hash
    * aggregate — map-side partials absorb the scan. */
  def aggState(df: DataFrame, keyCols: Seq[String],
      measureCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && measureCols.nonEmpty,
      "aggState needs at least one key and one measure")
    val aggs = count(lit(1)).as("cnt") +: measureCols.flatMap(m => Seq(
      sumCol(m), min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m")))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge state frames: counts and sums ADD, mins/maxes COMBINE —
    * associative and commutative, so shards/days/partitions roll up in
    * any order. Partial sums re-narrow to the aggState sum type so a
    * merged state is itself mergeable (decimal(28,4) headroom of
    * 10^24 over the per-row 10^14 cap — saturation is a data bug, not
    * an arithmetic one). Keys present in only one frame pass through
    * (their absent partials contribute identity). */
  def mergeStates(keyCols: Seq[String], measureCols: Seq[String],
      frames: DataFrame*): DataFrame = {
    require(frames.nonEmpty, "mergeStates needs at least one frame")
    val aggs = sum(col("cnt")).as("cnt") +: measureCols.flatMap(m => Seq(
      sum(col(s"__sum_$m")).cast("decimal(28,4)").as(s"__sum_$m"),
      min(col(s"min_$m")).as(s"min_$m"),
      max(col(s"max_$m")).as(s"max_$m")))
    frames.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Read a state frame out as the user-facing rollup: cnt, and per
    * measure sum_m (double, from the exact decimal), min_m, max_m —
    * the columns a direct `GROUP BY` recompute would produce. */
  def readout(state: DataFrame, keyCols: Seq[String],
      measureCols: Seq[String]): DataFrame = {
    val cols = keyCols.map(col) ++ (col("cnt") +: measureCols.flatMap(m => Seq(
      col(s"__sum_$m").cast("double").as(s"sum_$m"),
      col(s"min_$m"), col(s"max_$m"))))
    state.select(cols: _*)
  }
}
