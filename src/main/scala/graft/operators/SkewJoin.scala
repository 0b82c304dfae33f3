package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed keys (the manual
  * fallback when AQE's skew-join splitting isn't enough, e.g. a single
  * key holding >1 executor's worth of rows — SURVEY §7.5's 100 TB
  * rule).
  *
  * The skewed (left) side gets a deterministic salt in [0, k) derived
  * by hashing the whole row — deterministic for resume/retry, uniform
  * for distinct rows. The right side is replicated k× (explode over
  * the salt range), so each (key, salt) bucket joins 1/k of the hot
  * key's rows. Replication multiplies the right side — use only when
  * the right side is small relative to the skew being split.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // right side is REPLICATED across salts: outer-right/full joins
    // would emit each unmatched right row saltBuckets times
    val okTypes = Set("inner", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti", "cross")
    require(okTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left join types only, got: $joinType")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltBuckets.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Join-key SKEW AUDIT — the pre-flight diagnostic that decides
    * between plain shuffle join, [[saltedJoin]], and AQE skew
    * splitting: the topN hottest keys with integer-exact shares.
    *
    *  - `cnt`: fact-side rows for the key,
    *  - `share_ppm`: cnt·10⁶ div total (parts-per-million of all rows),
    *  - `ratio_milli`: share_ppm·keys div 1000 — ‰ of the mean per-key
    *    load (1000 = exactly average; a key at 50000 holds 50× its fair
    *    share and will hot-spot one reducer).
    *
    * All-integer floor arithmetic (ratio is DEFINED as the composition
    * of the two divisions, so any engine reproduces it bit for bit —
    * the repo-wide ppm idiom). Shape: one hash aggregate, a broadcast
    * of the 1-row total, per-partition top-N — never a global sort. */
  def keySkew(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN > 0, "topN must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__keys"))
    counts.crossJoin(broadcast(totals))
      .select(col(keyCol), col("cnt"),
        expr("(cnt * 1000000L) div __total").as("share_ppm"),
        expr("(((cnt * 1000000L) div __total) * __keys) div 1000").as("ratio_milli"))
      .orderBy(col("cnt").desc, col(keyCol).asc_nulls_first)
      .limit(topN)
  }
}
