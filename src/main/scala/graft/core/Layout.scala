package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering: Z-order (Morton) curves.
  *
  * Bucketing ([[Bucketing]]) removes the shuffle for ONE join key;
  * Z-ordering removes the SCAN for multi-dimensional range predicates:
  * sort the data along an interleaved-bit space-filling curve and every
  * parquet file covers a compact hyper-rectangle of the key space, so
  * min/max row-group statistics prune files for predicates on ANY of
  * the curve's dimensions — the layout trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, rebuilt here from the public idea (Morton
  * 1966) on plain parquet. At 100 TB this is the difference between
  * "filter on (user, day) scans everything sorted by user-only" and
  * "both predicates skip".
  *
  * The z-value itself is a pure integer bit-interleave — a codegen'd
  * expression tree of shift/and/or terms, no UDF — and therefore
  * engine-portable: the q92 contract oracle replays it in DuckDB
  * bit for bit.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of each column
    * round-robin (column j contributes bit i to output position
    * i·n + j). Inputs must be NON-NEGATIVE integers — quantize /
    * rank first (callers own the quantizer; [[rangeBucket]] below is
    * the portable default). `n·bits` must fit a signed long. */
  def zValue(bits: Int, cols: Column*): Column = {
    val n = cols.size
    require(n >= 1, "zValue needs at least one column")
    require(n * bits <= 63, s"$n cols × $bits bits exceeds a signed long")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Portable equi-width quantizer to `2^bits` cells over [lo, hi]:
    * floor((x − lo) · 2^bits / (hi − lo + 1)) in INTEGER arithmetic
    * (exact in any engine; callers pass the domain bounds — a data
    * scan to discover them would make layout planning eager). */
  def rangeBucket(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi > lo, s"degenerate domain [$lo, $hi]")
    require(bits >= 1 && bits <= 62, s"bits=$bits outside [1, 62]")
    val cells = 1L << bits
    // (span · 2^bits) is the largest intermediate the expression can
    // produce; if it exceeds a signed long the multiply wraps silently
    // and zValue then truncates the garbage to its low bits — refuse
    // up front instead (same contract style as zValue's n·bits ≤ 63).
    val span = try Math.addExact(Math.subtractExact(hi, lo), 1L) catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        s"domain [$lo, $hi] wider than a signed long")
    }
    require(span <= (Long.MaxValue >> bits),
      s"domain width $span × 2^$bits overflows a signed long — " +
        "use fewer bits or a narrower [lo, hi]")
    // out-of-domain inputs are clamped to the edge cells (a value the
    // caller said can't happen lands in cell 0 or 2^bits−1 instead of
    // corrupting the curve with a negative / overflowing bucket).
    // NULL must PROPAGATE, not clamp: Spark's greatest/least skip NULL
    // arguments, which would silently co-locate missing values with
    // the domain minimum — gate on isNotNull so NULL stays NULL (and
    // the z-value built from it stays NULL), like plain arithmetic.
    val x0 = c.cast("long")
    val x = when(x0.isNotNull, least(greatest(x0, lit(lo)), lit(hi)))
    // Catalyst IntegralDivide (`div`): exact long division — a double
    // round-trip would lose bits past 2^53
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      Bridge.expression((x - lit(lo)) * lit(cells)),
      Bridge.expression(lit(span))))
  }

  /** Cluster `df` along the z-curve of `zCol` into `numRanges` range
    * partitions, each internally z-sorted: written as parquet, every
    * output file covers a compact z-range ⇒ a compact box in every
    * interleaved dimension ⇒ row-group min/max stats prune on any of
    * them. Range partitioning samples the z distribution, so skewed
    * dimensions still yield balanced files (the curve linearizes skew
    * instead of hot-spotting it). */
  def zOrderBy(df: DataFrame, zCol: Column, numRanges: Int): DataFrame =
    df.repartitionByRange(numRanges, zCol).sortWithinPartitions(zCol)
}
