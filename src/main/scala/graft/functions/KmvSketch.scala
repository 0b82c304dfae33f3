package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-buffer KMV (k-minimum-values) distinct-count sketch
  * (Bar-Yossef et al. 2002) as a real partial aggregate.
  *
  * The buffer is a sorted set of at most `k` (hashFraction, value)
  * pairs — the k smallest hash fractions seen, deduplicated by value so
  * repeated rows cost nothing. One pass, map-side partial aggregation,
  * O(k) state per group: the sketch shape the estimator's name
  * promises (the previous formulation found the k-th minimum via a
  * `row_number` window — a full distributed sort of every distinct
  * value per group).
  *
  * The ESTIMATOR DEFINITION is unchanged and engine-portable
  * (ext.Sketches computes the fraction with the md5-derived 56-bit
  * hash): with fewer than k distinct values the buffer holds all of
  * them and the estimate is the EXACT count; otherwise est = (k−1)/f
  * where f is the k-th smallest fraction (counting multiplicity over
  * distinct values — ties at the boundary keep the same f whichever
  * tied value is retained, so the result is deterministic).
  *
  * Children: `frac` (double — the precomputed portable hash fraction)
  * and `value` (string — the value's canonical string form, used only
  * as the dedup key; null is one distinct value via a sentinel).
  */
case class KmvSketch(
    frac: Expression,
    value: Expression,
    k: Int,
    emitSet: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Double, String)]] {

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(frac, value)
  override def nullable: Boolean = true
  // emitSet mode exposes the sketch STATE (the k-minimum (frac, value)
  // set itself) instead of the estimate — shards sketch independently,
  // [[graft.ext.Sketches.kmvMergeSets]] merges, the same estimator
  // finishes (the bounded-set merge law: the global k-min distinct set
  // is contained in the union of per-shard k-min sets)
  override def dataType: DataType =
    if (emitSet) ArrayType(StructType(Seq(
      StructField("frac", DoubleType), StructField("value", StringType))))
    else DoubleType
  override def prettyName: String =
    if (emitSet) "graft_kmv_set" else "graft_kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    (frac.dataType, value.dataType) match {
      case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (f, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, string) children, got (${f.sql}, ${v.sql})")
    }

  override def createAggregationBuffer(): mutable.TreeSet[(Double, String)] =
    mutable.TreeSet.empty[(Double, String)]

  private def insert(buf: mutable.TreeSet[(Double, String)],
      e: (Double, String)): Unit = {
    // skip values that cannot enter the k-minimum set: the common case
    // on a saturated buffer, and it keeps add/remove churn off the hot
    // path (buf.last is the current k-th minimum)
    if (buf.size < k) { buf += e; () }
    else if (implicitly[Ordering[(Double, String)]].lt(e, buf.last) && buf.add(e)) {
      buf -= buf.last; ()
    }
  }

  override def update(buf: mutable.TreeSet[(Double, String)],
      input: InternalRow): mutable.TreeSet[(Double, String)] = {
    val f = frac.eval(input)
    if (f != null) {
      val v = value.eval(input)
      insert(buf, (f.asInstanceOf[Double],
        if (v == null) KmvSketch.NullSentinel else v.toString))
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[(Double, String)],
      other: mutable.TreeSet[(Double, String)]): mutable.TreeSet[(Double, String)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[(Double, String)]): Any =
    if (emitSet)
      new GenericArrayData(buf.toSeq.map { case (f, v) =>
        InternalRow(f, UTF8String.fromString(v)) })
    else if (buf.isEmpty) null
    else if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble / buf.last._1

  override def serialize(buf: mutable.TreeSet[(Double, String)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (f, s) =>
      out.writeDouble(f)
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Double, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val f = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf += ((f, new String(b, StandardCharsets.UTF_8)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(frac = newChildren(0), value = newChildren(1))
}

object KmvSketch {
  /** Stand-in dedup key for a null value — all nulls are ONE distinct
    * value (mirrors `SELECT DISTINCT`'s null handling). */
  private[functions] val NullSentinel = "\u0000\u0000graft-null"

  /** Column form: KMV distinct-count estimate over (hash fraction,
    * dedup string). Use via [[graft.ext.Sketches.kmvDistinctCount]],
    * which supplies the portable fraction definition. */
  def estimate(frac: Column, value: Column, k: Int): Column =
    Bridge.column(
      KmvSketch(Bridge.expression(frac), Bridge.expression(value), k)
        .toAggregateExpression())

  /** Column form of the SKETCH STATE: the k-minimum (frac, value) set
    * as array<struct<frac,value>> — for shard-and-merge pipelines
    * ([[graft.ext.Sketches.kmvMinSets]]). */
  def minSet(frac: Column, value: Column, k: Int): Column =
    Bridge.column(
      KmvSketch(Bridge.expression(frac), Bridge.expression(value), k,
        emitSet = true).toAggregateExpression())
}
