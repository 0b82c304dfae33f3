package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, driver-side. */
  private def zRef(bits: Int, vals: Long*): Long = {
    var z = 0L
    val n = vals.size
    for (j <- vals.indices; i <- 0 until bits)
      z |= ((vals(j) >> i) & 1L) << (i * n + j)
    z
  }

  test("zValue matches the reference interleave on random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zValue(16, $"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == zRef(16, x, y), s"($x,$y): $z != ${zRef(16, x, y)}")
    }
    // 3 dims too (21 bits each fills 63)
    val got3 = Seq((5L, 9L, 1023L)).toDF("a", "b", "c")
      .select(Layout.zValue(21, $"a", $"b", $"c")).as[Long].head()
    assert(got3 == zRef(21, 5L, 9L, 1023L))
  }

  test("zValue monotone within a quadrant: prefix bits order the curve") {
    // points in the low-half box [0,2^15) × [0,2^15) sort strictly
    // before any point with either coordinate in the upper half
    val inBox = Layout.zValue(16, lit(32767L), lit(32767L))
    val outX = Layout.zValue(16, lit(32768L), lit(0L))
    val outY = Layout.zValue(16, lit(0L), lit(32768L))
    val Seq(in, ox, oy) =
      spark.range(1).select(inBox, outX, outY).as[(Long, Long, Long)]
        .head() match { case (a, b, c) => Seq(a, b, c) }
    assert(in < ox && in < oy, s"box max $in must precede $ox and $oy")
  }

  test("rangeBucket: integer equi-width, exact edges, engine-free arithmetic") {
    val df = Seq(0L, 1L, 9999L, 10000L - 1L).toDF("v")
      .select(Layout.rangeBucket($"v", 0L, 9999L, 16).as("b")).as[Long].collect()
    assert(df(0) == 0L)
    assert(df(2) == (9999L * 65536L) / 10000L)
    assert(df.forall(b => b >= 0 && b < 65536))
  }

  test("rangeBucket: out-of-domain inputs clamp to the edge cells") {
    val df = Seq(-5L, 0L, 9999L, 10000L, Long.MaxValue).toDF("v")
      .select(Layout.rangeBucket($"v", 0L, 9999L, 16).as("b")).as[Long].collect()
    assert(df(0) == 0L, "below-domain clamps to cell 0")
    assert(df(3) == df(2) && df(4) == df(2),
      "above-domain clamps to the top cell (no wrap past 2^bits)")
    assert(df.forall(b => b >= 0 && b < 65536))
  }

  test("rangeBucket: NULL propagates instead of clamping to cell 0") {
    val df = Seq[Option[Long]](Some(5L), None).toDF("v")
      .select(Layout.rangeBucket($"v", 0L, 9999L, 16).as("b"))
      .as[Option[Long]].collect()
    assert(df(0).isDefined)
    assert(df(1).isEmpty, "NULL input must yield NULL bucket, not cell 0")
  }

  test("rangeBucket: refuses domains whose scaled width overflows a long") {
    // width · 2^bits > Long.MaxValue → the multiply would wrap silently
    intercept[IllegalArgumentException] {
      Layout.rangeBucket(lit(1L), 0L, Long.MaxValue >> 10, 16)
    }
    // width itself wider than a signed long
    intercept[IllegalArgumentException] {
      Layout.rangeBucket(lit(1L), Long.MinValue, Long.MaxValue, 1)
    }
    // a maximal-but-legal domain still constructs
    Layout.rangeBucket(lit(1L), 0L, (Long.MaxValue >> 16) - 1L, 16)
  }

  test("zOrderBy narrows per-partition boxes in BOTH dimensions") {
    // uniform 2-d grid; z-order into 16 range partitions and measure
    // the mean per-partition extent of each dimension. A single-column
    // sort leaves the OTHER dimension's extent at ~full width; the
    // z-curve must cut both well below half.
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val z = Layout.zValue(6, col("x"), col("y"))
    def meanExtents(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val e = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max($"x") - min($"x")).as("ex"), (max($"y") - min($"y")).as("ey"))
        .agg(avg($"ex"), avg($"ey")).as[(Double, Double)].head()
      e
    }
    val (zx, zy) = meanExtents(Layout.zOrderBy(grid, z, 16))
    val (sx, sy) = meanExtents(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    // x-only sort: x extent tiny, y extent ≈ full (63)
    assert(sy > n * 0.9, s"x-sorted layout should leave y wide, got $sy")
    // z-order: both dimensions bounded — 16 partitions of a 64×64 grid
    // are 16×16 boxes (extent 15) on the ideal curve; allow slack for
    // range-sampling boundaries
    assert(zx < n * 0.5, s"z-order x extent $zx not narrowed")
    assert(zy < n * 0.5, s"z-order y extent $zy not narrowed")
    assert(zx + zy < sx + sy + n, "z-order must beat 1-d sort overall")
  }
}
