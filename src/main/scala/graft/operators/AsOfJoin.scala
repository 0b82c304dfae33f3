package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the right row
  * with the greatest `rightTs` ≤ `leftTs` within the same key (backward
  * direction). The batch analogue of the reference's incremental
  * date-window idiom (reference: revtron/salesforce/main.py:110-128,
  * `LastModifiedDate` windows).
  *
  * Scale design — union + LOCF, not join + filter + rank: a naive
  * key-equi-join with a range filter explodes to |L_key|×|R_key| rows
  * per key before ranking. Instead both sides are UNIONed, sorted once
  * per key by (ts, side), and the right payload is carried forward with
  * `last(ignoreNulls)` — a single shuffle on the key, linear row count,
  * no blowup even for hot keys. At equal timestamps the right row sorts
  * first, so `rightTs == leftTs` matches (inclusive, like DuckDB
  * ASOF JOIN).
  *
  * Right-side key+ts duplicates must be resolved by the caller first
  * (e.g. keep-latest) — as-of is ill-defined under ties on the right.
  */
object AsOfJoin {

  /** Greatest `rightTs` ≤ `leftTs` per key (the DuckDB/pandas default
    * direction). */
  def backward(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String): DataFrame =
    join(left, leftKey, leftTs, right, rightKey, rightTs, forward = false)

  /** Smallest `rightTs` ≥ `leftTs` per key (nearest future match). */
  def forward(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String): DataFrame =
    join(left, leftKey, leftTs, right, rightKey, rightTs, forward = true)

  private def join(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      forward: Boolean): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    require(!rCols.exists(lCols.contains),
      s"column collision between sides: ${rCols.filter(lCols.contains).mkString(",")}")

    val rStruct = struct(rCols.map(col): _*)
    val rNullType = org.apache.spark.sql.types.StructType(right.schema.fields)

    val l = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(rNullType).as("__r"))
    // null-key / null-ts right rows can never be an as-of match (SQL
    // ASOF / equi-join semantics) — drop them before the union so they
    // neither match null-key left rows nor sort as ±infinity
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("__l"),
        rStruct.as("__r"))

    // backward: ascending time, right rows sort before left at equal ts
    // so rightTs == leftTs matches (inclusive). forward: the mirror —
    // descending time, carry the nearest FUTURE right row backward.
    // nulls_first in BOTH directions: a null-ts left row then has no
    // preceding right rows in its frame ⇒ match stays null.
    val tsOrd = if (forward) col("__ts").desc_nulls_first else col("__ts").asc_nulls_first
    val w = Window.partitionBy(col("__k"))
      .orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = lCols.map(c => col(s"__l.$c").as(c)) ++
      rCols.map(c => col(s"__match.$c").as(c))
    filled.select(out: _*)
  }
}
