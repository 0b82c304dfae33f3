package graft.functions

import graft.SparkSpec
import graft.core.Fx
import org.apache.spark.sql.functions._

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("VectorAgg.mean: element-wise mean as a real partial aggregate") {
    val ds = Seq(
      (0L, Array(1.0, 2.0, 3.0)),
      (0L, Array(3.0, 4.0, 5.0)),
      (1L, Array(10.0, 0.0, 0.0))).toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2).agg(VectorAgg.mean)
      .collect().toMap
    assert(out(0L).toSeq == Seq(2.0, 3.0, 4.0))
    assert(out(1L).toSeq == Seq(10.0, 0.0, 0.0))
  }

  test("VectorAgg.mean skips nulls; empty group yields empty array") {
    val ds = Seq((0L, Array(2.0, 2.0)), (0L, null.asInstanceOf[Array[Double]]))
      .toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2).agg(VectorAgg.mean)
      .collect().toMap
    assert(out(0L).toSeq == Seq(2.0, 2.0)) // null vector didn't dilute the mean
  }

  test("VectorAgg.mean matches the decimal-sum DataFrame centroid within fp tolerance") {
    val emb = Fx.t(spark, sfDir, "embeddings")
      .select(($"vec_id" % 4).as("grp"), $"embedding".cast("array<double>").as("e"))
    val typed = emb.as[(Long, Array[Double])]
      .groupByKey(_._1).mapValues(_._2).agg(VectorAgg.mean)
      .collect().toMap
    val frame = emb.select($"grp", posexplode($"e").as(Seq("dim0", "v")))
      .groupBy($"grp", $"dim0")
      .agg((sum($"v".cast("decimal(18,8)")).cast("double") / count(lit(1))).as("m"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(typed.nonEmpty)
    typed.foreach { case (grp, vec) =>
      vec.zipWithIndex.foreach { case (m, dim) =>
        assert(math.abs(m - frame((grp, dim))) < 1e-9,
          s"grp=$grp dim=$dim typed=$m frame=${frame((grp, dim))}")
      }
    }
  }
}
