package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (the `Aggregator[IN, BUF, OUT]` surface from
  * SURVEY §2.4): element-wise MEAN of `array<double>` vectors — the
  * distributed centroid computation (per-cluster embedding mean). Runs
  * as a real partial aggregate: per-partition (sum, count) buffers,
  * merged associatively — never a collect, never a row blowup.
  *
  * Null/empty vectors are skipped; vectors of differing lengths
  * aggregate over the longest prefix each contributes to (buffers grow
  * to the longest seen). FP note: the summation order follows partition
  * merge order, so results are deterministic only up to fp rounding —
  * for the bit-exact engine-vs-oracle contract use the decimal-sum
  * DataFrame formulation (q74); this Aggregator is the TYPED API.
  */
object VectorAgg {

  private final class MeanAgg
      extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

    override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

    private def addInto(acc: Array[Double], v: Array[Double]): Array[Double] = {
      if (v == null) return acc
      val out = if (acc.length >= v.length) acc else java.util.Arrays.copyOf(acc, v.length)
      var i = 0
      while (i < v.length) { out(i) += v(i); i += 1 }
      out
    }

    override def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) =
      // empty vectors are skipped like nulls — counting them would
      // dilute every dimension of the mean while contributing nothing
      if (v == null || v.isEmpty) b else (addInto(b._1, v), b._2 + 1)

    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
      (addInto(a._1, b._1), a._2 + b._2)

    override def finish(r: (Array[Double], Long)): Array[Double] =
      if (r._2 == 0) Array.emptyDoubleArray else r._1.map(_ / r._2)

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** `ds.groupByKey(...).agg(VectorAgg.mean)` — element-wise mean. */
  def mean: TypedColumn[Array[Double], Array[Double]] = new MeanAgg().toColumn

  /** First + second MOMENTS of fixed-dim vectors in one pass — the
    * covariance sufficient statistics for PCA
    * ([[graft.ext.Similarity.pcaFit]]): buffer = (Σv [d], upper-
    * triangle Σ vᵢvⱼ [d(d+1)/2], n). O(d²) state merged associatively
    * with map-side combine — the corpus streams, only buffers cross
    * the wire. Callers guarantee every input has length exactly d. */
  private final class MomentsAgg(d: Int)
      extends Aggregator[Array[Double], (Array[Double], Array[Double], Long),
        (Array[Double], Array[Double], Long)] {

    private val tri = d * (d + 1) / 2

    override def zero: (Array[Double], Array[Double], Long) =
      (new Array[Double](d), new Array[Double](tri), 0L)

    override def reduce(b: (Array[Double], Array[Double], Long),
        v: Array[Double]): (Array[Double], Array[Double], Long) = {
      val (s1, s2, n) = b
      var i = 0
      var t = 0
      while (i < d) {
        s1(i) += v(i)
        var j = i
        while (j < d) { s2(t) += v(i) * v(j); t += 1; j += 1 }
        i += 1
      }
      (s1, s2, n + 1)
    }

    override def merge(a: (Array[Double], Array[Double], Long),
        b: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) = {
      var i = 0
      while (i < d) { a._1(i) += b._1(i); i += 1 }
      i = 0
      while (i < tri) { a._2(i) += b._2(i); i += 1 }
      (a._1, a._2, a._3 + b._3)
    }

    override def finish(r: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) = r

    override def bufferEncoder: Encoder[(Array[Double], Array[Double], Long)] =
      ExpressionEncoder[(Array[Double], Array[Double], Long)]()
    override def outputEncoder: Encoder[(Array[Double], Array[Double], Long)] =
      ExpressionEncoder[(Array[Double], Array[Double], Long)]()
  }

  /** One-pass (Σv, upper-tri ΣvvT, n) over a Dataset[Array[Double]]
    * whose vectors all have length `d`. */
  def moments(d: Int): TypedColumn[Array[Double], (Array[Double], Array[Double], Long)] =
    new MomentsAgg(d).toColumn
}
