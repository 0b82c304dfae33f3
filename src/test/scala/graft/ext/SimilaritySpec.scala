package graft.ext

import graft.SparkSpec
import graft.core.Fx
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical -> 1, orthogonal -> 0, opposite -> -1") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0)
    ).toDF("a", "b", "expect")
    df.select(Similarity.cosine($"a", $"b").as("c"), $"expect").collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("l2Normalize leaves zero vectors intact") {
    val n = Seq(Tuple1(Seq(0.0, 0.0))).toDF("v")
      .select(Similarity.l2Normalize($"v")).as[Seq[Double]].first()
    assert(n == Seq(0.0, 0.0))
  }

  test("bruteForceTopK: every query's top-1 is itself when querying the corpus") {
    val emb = Fx.t(spark, sfDir, "embeddings")
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      emb.filter($"vec_id" < 5), "vec_id", "embedding", k = 3)
    val top1 = top.filter($"rank" === 1)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach(q => assert(top1(q) == q))
  }

  test("int8 quantization: bounded reconstruction error, high top-k recall") {
    val emb = Fx.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val rt = emb.select($"vec_id", $"e",
      Similarity.dequantizeInt8(Similarity.quantizeInt8($"e")).as("d"),
      Similarity.quantizeInt8($"e").getField("scale").as("s"))
    // per-element |x - dequant(x)| <= scale/2 (+fp eps)
    val viol = rt.withColumn("maxerr",
      aggregate(zip_with($"e", $"d", (x, y) => abs(x - y)), lit(0.0),
        (acc, v) => greatest(acc, v)))
      .filter($"maxerr" > $"s" / 2 + 1e-9).count()
    assert(viol == 0)
    // searching on dequantized vectors preserves the neighbor structure
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "e",
      emb.filter($"vec_id" < 5), "vec_id", "e", k = 10)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val qCorpus = emb.select($"vec_id",
      Similarity.dequantizeInt8(Similarity.quantizeInt8($"e")).as("e"))
    val approx = Similarity.bruteForceTopK(qCorpus, "vec_id", "e",
      qCorpus.filter($"vec_id" < 5), "vec_id", "e", k = 10)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall@10 was $recall")
  }

  test("IVF search reaches >=90% recall@10 vs brute force at nprobe=8/16 buckets") {
    val emb = Fx.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val idx = Similarity.ivfBuild(emb, "vec_id", "embedding", nCentroids = 16)
    val approx = Similarity.ivfSearch(idx, queries, "vec_id", "embedding",
      k = 10, nprobe = 8)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall@10 was $recall")
    // every corpus vector is assigned to exactly one bucket
    assert(idx.assigned.count() == emb.count())
  }
}
