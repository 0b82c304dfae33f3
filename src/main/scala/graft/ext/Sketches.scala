package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, ENGINE-PORTABLE approximate aggregates — the
  * replayable complement to Spark's native sketches (HyperLogLog++
  * `approx_count_distinct`, GK `percentile_approx`), whose internal
  * state is implementation-defined and therefore un-oracle-able.
  *
  * Both estimators here are pure functions of (seed, data), built on
  * the md5-derived portable hash, so an external engine (DuckDB,
  * Postgres) reproduces them bit for bit — the property an auditable
  * 100 TB pipeline wants from its approximations: re-running the
  * estimate anywhere gives the same number, and the estimate itself is
  * testable against an oracle, not just against an error bound.
  */
object Sketches {

  /** KMV (k-minimum-values) distinct-count estimate per group
    * (Bar-Yossef et al. 2002): hash each distinct value to a uniform
    * fraction in [0,1); if the k-th smallest hash is f, the estimate is
    * (k−1)/f. Groups with < k distinct values return their EXACT count
    * (the min-k set is the whole set).
    *
    * Runs as a BOUNDED-BUFFER sketch ([[graft.functions.KmvSketch]], a
    * `TypedImperativeAggregate` with O(k) state): one pass, map-side
    * partial aggregation, no distinct pre-pass and no per-group sort —
    * duplicates and non-minimal hashes drop at the mapper. The
    * estimator is a pure function of (seed, data) via the md5-derived
    * 56-bit hash, so an external engine replays it exactly.
    *
    * Returns (groupCols*, est_distinct double). */
  def kmvDistinctCount(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256, seed: Long = 42L): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // 56-bit hash → uniform fraction in [0,1)
    val frac =
      conv(substring(md5(concat_ws("|", lit(seed.toString),
        col(valueCol).cast("string"))), 1, 14), 16, 10).cast("double") /
        lit(72057594037927936.0) // 2^56
    df.groupBy(col(groupCol))
      .agg(graft.functions.KmvSketch.estimate(
        frac, col(valueCol).cast("string"), k).as("est_distinct"))
  }

  /** DISCRETE quantile over a deterministic hash-sample: sample rows
    * with the portable md5 bucket, sort the sample per group, and pick
    * the element at rank ⌈q·n⌉ (no interpolation arithmetic — an
    * actual data value, so the result is bit-identical in any engine).
    * The approximation lives entirely in WHICH rows are sampled (a
    * pure function of seed + key); error shrinks as 1/√(fraction·N). */
  def sampledQuantile(df: DataFrame, groupCol: String, valueCol: String,
      keyCol: String, q: Double, fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile $q outside [0,1]")
    val s = Sampling.deterministicSample(df, keyCol, fraction, seed, portable = true)
    val byGroup = Window.partitionBy(col(groupCol))
    s.select(col(groupCol), col(valueCol),
        row_number().over(byGroup.orderBy(col(valueCol))).as("__rk"),
        count(lit(1)).over(byGroup).as("__n"))
      .filter(col("__rk") ===
        greatest(lit(1L), ceil(lit(q) * col("__n")).cast("long")))
      .select(col(groupCol), col(valueCol).as("q_est"))
  }
}
