package graft.ext

import graft.SparkSpec
import graft.core.Fx
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def dotv(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("pcaFit: orthonormal components, variance-descending eigenvalues, stable across layouts") {
    val emb = Fx.t(spark, sfDir, "embeddings")
    val m = Similarity.pcaFit(emb, "embedding", k = 6)
    assert(m.components.length == 6 && m.eigenvalues.length == 6)
    // orthonormal basis
    for (i <- 0 until 6; j <- i until 6) {
      val d = dotv(m.components(i), m.components(j))
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-8, s"c$i.c$j = $d")
    }
    // eigenvalues descend and are non-negative (covariance is PSD)
    m.eigenvalues.zip(m.eigenvalues.drop(1)).foreach { case (a, b) =>
      assert(a >= b - 1e-12) }
    assert(m.eigenvalues.forall(_ >= -1e-9))
    assert(m.varianceCaptured(6) > 0 && m.varianceCaptured(6) <= 1 + 1e-12)
    // deterministic across partition layouts (moments merge + Jacobi
    // are order-insensitive up to fp; canonical signs pin the basis)
    val m2 = Similarity.pcaFit(emb.repartition(7), "embedding", k = 6)
    m.components.zip(m2.components).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) } }
  }

  test("pcaProject recovers a planted dominant direction") {
    // 200 points along (1,1,0)/sqrt2 with small noise on axis 3
    val pts = (0 until 200).map { i =>
      val t = (i - 100).toDouble / 10.0
      val noise = ((i * 2654435761L % 17) - 8).toDouble / 50.0
      (i.toLong, Array(t + 3.0, t - 1.0, noise))
    }
    val df = pts.toDF("vec_id", "embedding")
    val m = Similarity.pcaFit(df, "embedding", k = 3)
    // first axis ~ (1,1,0)/sqrt2; canonical sign makes entries positive
    val c1 = m.components(0)
    assert(math.abs(c1(0) - math.sqrt(0.5)) < 0.01 &&
      math.abs(c1(1) - math.sqrt(0.5)) < 0.01 &&
      math.abs(c1(2)) < 0.05, c1.mkString(","))
    assert(m.varianceCaptured(1) > 0.99)
    // projection variance along pc1 equals the first eigenvalue
    val pcs = Similarity.pcaProject(df, "embedding", m)
      .select($"pc1").as[Double].collect()
    val mean = pcs.sum / pcs.length
    val varPc = pcs.map(p => (p - mean) * (p - mean)).sum / pcs.length
    assert(math.abs(varPc - m.eigenvalues(0)) / m.eigenvalues(0) < 1e-6)
    // projected mean is ~0 (the offset centers the data)
    assert(math.abs(mean) < 1e-9)
  }

  test("full-rank projection preserves total variance (k = d reconstruction)") {
    val pts = (0 until 50).map { i =>
      (i.toLong, Array((i % 7).toDouble, (i % 5).toDouble, (i % 3).toDouble))
    }
    val df = pts.toDF("vec_id", "embedding")
    val m = Similarity.pcaFit(df, "embedding", k = 3)
    val pcs = Similarity.pcaProject(df, "embedding", m)
      .select($"pc1", $"pc2", $"pc3").as[(Double, Double, Double)].collect()
    def variance(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / xs.size
    }
    val projTotal = variance(pcs.map(_._1).toSeq) + variance(pcs.map(_._2).toSeq) +
      variance(pcs.map(_._3).toSeq)
    assert(math.abs(projTotal - m.totalVariance) / m.totalVariance < 1e-9,
      s"$projTotal vs ${m.totalVariance}")
  }

  test("rrfFuse: consensus ids outrank single-list leaders; floor-integer scores") {
    val l1 = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val l2 = Seq((3L, 1L), (1L, 2L), (9L, 3L)).toDF("id", "rank")
    val out = Similarity.rrfFuse(Seq(l1, l2), "id", k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // id 1: 1000/11 + 1000/12 = 90 + 83 = 173; id 3: 1000/13 + 1000/11 = 76 + 90 = 166
    // id 2: 1000/12 = 83; id 9: 1000/13 = 76
    assert(out(1L) == ((173L, 2L)) && out(3L) == ((166L, 2L)))
    assert(out(2L) == ((83L, 1L)) && out(9L) == ((76L, 1L)))
    // both-list ids beat any single-list id here
    assert(Seq(1L, 3L).forall(i => out(i)._1 > out(2L)._1))
  }

  test("pcaFit skips wrong-length vectors and refuses degenerate inputs") {
    val df = Seq(
      (1L, Array(1.0, 2.0)), (2L, Array(2.0, 1.0)), (3L, Array(0.5))
    ).toDF("vec_id", "embedding")
    val m = Similarity.pcaFit(df, "embedding", k = 2) // the 1-dim row is skipped
    assert(m.mean.length == 2)
    intercept[IllegalArgumentException] {
      Similarity.pcaFit(Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding"),
        "embedding", k = 2) // n = 1
    }
  }
}
