package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range / interval joins.
  *
  * [[keyed]] — equi-key + range predicate: Catalyst plans the equi part
  * as a hash/sort-merge join and applies the range as a post-join
  * filter; per-key fan-out is bounded by the key cardinality, which is
  * the right shape when a key restricts the match set.
  *
  * [[binned]] — pure range join (no equi key): a naive theta-join is a
  * cross product. We bin the point side and EXPLODE the interval side
  * into the bins it overlaps, turning the theta-join into an equi-join
  * on bin id + a residual filter — the standard distributed range-join
  * trick (cf. Spark's own `spark.sql.join.preferSortMergeJoin` has no
  * native range join without extensions). Bin width should be on the
  * order of the median interval length.
  */
object RangeJoin {

  def keyed(left: DataFrame, right: DataFrame, keyEq: Column,
      rangeCond: Column): DataFrame =
    left.join(right, keyEq && rangeCond)

  /** Point-in-interval join via binning: `left[pointCol] ∈
    * [right[loCol], right[hiCol])`. `binWidth` in the column's native
    * numeric units (cast timestamps to epoch seconds first). */
  def binned(left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    val l = left.withColumn("__bin", floor(col(pointCol) / binWidth))
    val r = right.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    l.join(r, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
