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
  * so merge order cannot perturb the total), `min_m`, `max_m`.
  *
  * RETRACTION BOUNDARY (the contract line every min/max MV shares):
  * counts and sums form a GROUP under signed deltas — a delete is
  * merge with sign −1 ([[retractableState]]/[[mergeRetractable]],
  * contract q261) — but min/max only form a SEMILATTICE: once the
  * extreme row is deleted, no summary of the survivors can say what
  * the new extreme is, so [[aggState]]/[[mergeStates]] (which carry
  * min/max) are APPEND-ONLY by construction. Under deletes, either
  * maintain the retractable subset incrementally and recompute min/max
  * keys on demand, or recompute the affected keys outright.
  *
  * The q159 contract pins the append-only law end-to-end: state(base)
  * merged with state(delta) reads out EXACTLY like a direct recompute
  * over base ∪ delta (the DuckDB oracle IS the direct recompute); the
  * q261 contract pins the signed law: state(base) + state(inserts) −
  * state(deletes) == direct recompute over (base ∪ inserts) ∖ deletes.
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

  /** The RETRACTABLE state frame: (keys*, cnt, __sum_m decimal) — the
    * subset of [[aggState]] that stays maintainable under deletes
    * (counts and sums form a group; min/max don't — see the object
    * doc). Same one-hash-aggregate shape. */
  def retractableState(df: DataFrame, keyCols: Seq[String],
      measureCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && measureCols.nonEmpty,
      "retractableState needs at least one key and one measure")
    val aggs = count(lit(1)).as("cnt") +: measureCols.map(sumCol)
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Signed merge of retractable states: `add` frames contribute +1,
    * `subtract` frames −1 (a delete batch is just its own
    * [[retractableState]], subtracted) — so a 100 TB MV absorbs
    * deletes from the delta's summary alone, never a rescan.
    * Associative/commutative like [[mergeStates]] — which is exactly
    * why the merge output KEEPS keys at cnt ≤ 0: a staged rollup may
    * legally apply a delete before the shard that inserted those rows
    * arrives (state(A) − state(del), THEN + state(B)), and the
    * negative balance is the information that makes the later stage
    * land on the right total. Dropping such keys mid-merge would
    * silently resurrect the deleted rows — the group has no zombies
    * only if nobody truncates it. Keys at cnt ≤ 0 drop at READOUT
    * ([[readoutRetractable]]): cnt = 0 is a fully-deleted key (absent
    * from a direct recompute too), cnt < 0 in a FINAL state means the
    * subtracted rows were never inserted anywhere — a caller-side
    * data bug the algebra cannot detect locally, surfaced as a
    * missing key rather than a poisoned sum. Partial sums re-widen to
    * decimal(28,4) so merged states stay mergeable. */
  def mergeRetractable(keyCols: Seq[String], measureCols: Seq[String],
      add: Seq[DataFrame], subtract: Seq[DataFrame]): DataFrame = {
    require(add.nonEmpty, "mergeRetractable needs at least one add frame")
    val signed = add.map(_.withColumn("__sign", lit(1L))) ++
      subtract.map(_.withColumn("__sign", lit(-1L)))
    val aggs = sum(col("cnt") * col("__sign")).as("cnt") +:
      measureCols.map(m =>
        sum(col(s"__sum_$m") * col("__sign"))
          .cast("decimal(28,4)").as(s"__sum_$m"))
    signed.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Read a retractable state out as the user-facing rollup: cnt and
    * per-measure sum_m (double, from the exact decimal). Keys at
    * cnt ≤ 0 drop HERE, not in the merge (see [[mergeRetractable]]:
    * truncating mid-merge breaks associativity under staged
    * deletes). */
  def readoutRetractable(state: DataFrame, keyCols: Seq[String],
      measureCols: Seq[String]): DataFrame = {
    val cols = keyCols.map(col) ++ (col("cnt") +: measureCols.map(m =>
      col(s"__sum_$m").cast("double").as(s"sum_$m")))
    state.filter(col("cnt") > 0L).select(cols: _*)
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
