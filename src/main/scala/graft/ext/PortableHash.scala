package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE portable-hash recipe every cross-engine-replayable operator in
  * this repo derives from: one seed-prefixed md5 per value, split into
  * two independent 56-bit halves (hex chars 1-14 and 17-30) that seed
  * 2-universal families h_i = a + i·b. md5 is the one hash DuckDB /
  * Postgres / Spark all compute identically (xxhash64 has no cross-
  * engine twin), and 56 bits is the widest hex slice that converts
  * losslessly through a signed long.
  *
  * Every DuckDB oracle that replays a sketch/LSH pipeline re-derives
  * these exact expressions (`CAST(concat('0x', substring(md5(
  * concat_ws('|', seed, v)), 1, 14)) AS BIGINT)` …) — change them
  * ONLY together. Users: MinHash vocabulary hashing (Dedup), count-min
  * (Sketches); KMV/HLL/sampling use the single-half form with their
  * own scaling. (BloomJoin deliberately does NOT use this: its bitmap
  * is never oracle-replayed, so it takes the faster native xxhash64.)
  */
object PortableHash {

  /** Seed-prefixed md5 hex digest (32 chars). NULL values hash as if
    * absent from the concat (concat_ws drops NULL) — oracles must use
    * DuckDB's concat_ws, not concat, to mirror this. */
  def md5Hex(c: Column, seed: Long): Column =
    md5(concat_ws("|", lit(seed.toString), c.cast("string")))

  /** Two independent 56-bit hashes from one md5. */
  def pair56(c: Column, seed: Long): (Column, Column) = {
    val h = md5Hex(c, seed)
    (conv(substring(h, 1, 14), 16, 10).cast("long"),
      conv(substring(h, 17, 14), 16, 10).cast("long"))
  }

  /** The single-half 56-bit form (hex chars 1–14) — the hash behind
    * Sampling.portableHash, HLL registers, and the KMV fraction. One
    * definition so the "change ONLY together" warning above has one
    * Spark-side site to change. */
  def first56(c: Column, seed: Long): Column =
    conv(substring(md5Hex(c, seed), 1, 14), 16, 10).cast("long")
}

/** THE portable integer-division recipe (the divisor twin of
  * [[PortableHash]]): Spark's `div` TRUNCATES while DuckDB's `//`
  * FLOORS, so cross-engine-exact quotients route every division
  * through non-negative operands, where the two agree. One shared
  * definition — GraphOps' PageRank masses, Behavior's ppm/milli
  * rates, and any future floor-quotient must not fork their own copy
  * (Stats keeps a DECIMAL(38,0)-domain variant whose operands are
  * already decimal — different input contract, same identity). */
object PortableDiv {

  /** Floor quotient for NON-NEGATIVE operands (truncation == floor
    * there). pmod keeps the remainder non-negative, the decimal cast
    * keeps a·quotient exact at int64 edges. */
  def nonNeg(a: Column, b: Column): Column =
    ((a - pmod(a, b)).cast("decimal(38,0)") / b.cast("decimal(38,0)"))
      .cast("long")

  /** Sign-split floor-magnitude quotient: −(−a div b) for a < 0 —
    * TRUNCATION toward zero in both engines (the documented milli/ppm
    * rate semantics; NOT floor toward −∞, which [[floorDec]]
    * provides for the decimal domain). */
  def signed(a: Column, b: Column): Column =
    when(a < 0, -nonNeg(-a, b)).otherwise(nonNeg(a, b))

  /** Floor-toward-−∞ quotient for DECIMAL(38,0) operands (b > 0) via
    * (a − pmod(a, b))/b — decimal `/` alone would HALF_UP-round, and
    * pmod's non-negative remainder makes the identity floor NEGATIVE
    * dividends too (DuckDB oracles shim their truncating `//` with
    * the same non-negative-mod identity). THE one decimal-domain
    * floor-quotient definition — Stats, Similarity and Sampling
    * delegate here; do not fork per-module copies. */
  def floorDec(a: Column, b: Column): Column =
    floorDecWide(a, b).cast("long")

  /** [[floorDec]] WITHOUT the long narrowing — for quotients that
    * legitimately exceed int64 (DLT priorities, per-cluster |S|²/n
    * terms). Caveat: Spark types DECIMAL(38,0)/DECIMAL(38,0) as
    * DECIMAL(38,6) — 32 INTEGRAL digits — so the dividend must stay
    * below 10³² or ANSI mode throws (callers document their bound;
    * [[graft.ext.Sampling.prioritySample]] requires w < 1.38e15). */
  def floorDecWide(a: Column, b: Column): Column = (a - pmod(a, b)) / b
}
