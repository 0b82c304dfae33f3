package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (north-star extension; SURVEY §2.4 — no counterpart in the
  * reference).
  *
  * Two tiers, per the 100 TB design rule:
  *  - [[bruteForceTopK]]: exact cosine top-k — the recall baseline. The
  *    QUERY side is broadcast (small); the corpus side streams through
  *    executors; per-query top-k via window row_number. Never use when
  *    both sides are large.
  *  - [[IvfIndex]]: inverted-file ANN — corpus bucketed by nearest of C
  *    deterministic centroids (one broadcast join at build), queries
  *    probe only `nprobe` buckets ⇒ the scan shrinks by ~C/nprobe.
  *
  * All vector math is `zip_with`/`aggregate` higher-order expressions —
  * codegen-friendly, no UDFs, elements cast to double for deterministic,
  * engine-portable arithmetic (fp sums run left-to-right in array
  * order, so results are bit-stable for a given row).
  */
object Similarity {

  /** Σ aᵢ·bᵢ over two array<double> columns (left-to-right, bit-stable).
    * Backed by the native codegen'd [[graft.functions.DotProduct]]
    * expression — bit-identical to the HOF formulation
    * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` but ~1 order of
    * magnitude faster per pair. */
  def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalize; zero vectors pass through unchanged (cosine 0). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0, a).otherwise(transform(a, x => x / n))
  }

  /** Cosine similarity of two raw (unnormalized) array<double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Deterministic pseudo-random hyperplanes for sign-random-projection
    * LSH, seeded — same planes on every run/executor. */
  private[ext] def planesFor(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** SRP signature: array<int> of sign bits (1/0), one per hyperplane.
    * Cosine-similar vectors agree on most bits. */
  def srpSignature(vec: Column, dim: Int, planes: Int = 16, seed: Long = 42): Column = {
    val ps = planesFor(dim, planes, seed)
    val bits = ps.map { p =>
      val plane = array(p.map(lit): _*)
      when(dot(vec, plane) >= 0, lit(1)).otherwise(lit(0))
    }
    array(bits: _*)
  }

  /** Per-vector int8 quantization: 4× smaller than float32 (8× smaller
    * than the double working form) — at 100 TB the embedding column IS
    * the shuffle, so this is the difference between a 10 TB and a
    * 2.5 TB ANN exchange. Affine scheme: byte b encodes
    * zero + (b+128)·scale with scale = (max−min)/255, so the
    * reconstruction error per element is ≤ scale/2.
    * Returns struct(zero double, scale double, q array<tinyint>). */
  def quantizeInt8(v: Column): Column = {
    val mn = array_min(v)
    val mx = array_max(v)
    val scale = when(mx === mn, lit(1.0)).otherwise((mx - mn) / 255.0)
    struct(mn.as("zero"), scale.as("scale"),
      transform(v, x => (round((x - mn) / scale).cast("int") - 128).cast("tinyint"))
        .as("q"))
  }

  /** Inverse of [[quantizeInt8]]: back to array<double>. */
  def dequantizeInt8(qv: Column): Column =
    transform(qv.getField("q"), b =>
      qv.getField("zero") + (b.cast("double") + lit(128.0)) * qv.getField("scale"))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors by cosine (desc), ties broken by corpus id asc. Queries are
    * broadcast — keep the query side small (it is, by construction: you
    * ask for neighbors of a handful of probes at a time). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    // hash-spread the corpus: a single-file input would otherwise score
    // every candidate on one core
    val c = corpus.repartition(col(idCol)).select(col(idCol).as("nn_id"),
      l2Normalize(col(vecCol).cast("array<double>")).as("__cv"))
    val q = queries.select(col(qIdCol).as("query_id"),
      l2Normalize(col(qVecCol).cast("array<double>")).as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", dot(col("__cv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("cosine"), col("rank"))
  }

  /** IVF index: corpus rows assigned to their nearest centroid.
    * Centroids are chosen deterministically (every ⌈N/C⌉-th vector by
    * id — a seeded sample stand-in for k-means; the partitioning
    * mechanics, which is what matters for scale, is identical). */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  def ivfBuild(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int): IvfIndex = {
    val c = corpus.repartition(col(idCol)).select(col(idCol).as("__id"),
      l2Normalize(col(vecCol).cast("array<double>")).as("__v"))
    // Deterministic centroid sample WITHOUT a global sort: hash-sample
    // ~nCentroids candidates distributed-side, then number only that
    // tiny set (window over ≤C rows — never the corpus; a corpus-wide
    // row_number would serialize on one partition at scale).
    val n = c.count()
    val ratio = math.max(1L, n / nCentroids)
    val cands = c.filter(pmod(xxhash64(col("__id")), lit(ratio)) === 0)
      .limit(nCentroids)
    val centroids = cands.withColumn("centroid_id",
      (row_number().over(Window.orderBy(col("__id"))) - 1).cast("int"))
      .select(col("centroid_id"), col("__v").as("__cv"))
    // nearest centroid per corpus vector — centroid side broadcast
    val scored = c.crossJoin(broadcast(centroids))
      .withColumn("__sim", dot(col("__v"), col("__cv")))
    val best = Window.partitionBy(col("__id"))
      .orderBy(col("__sim").desc, col("centroid_id").asc)
    val assigned = scored.withColumn("__rk", row_number().over(best))
      .filter(col("__rk") === 1)
      .select(col("__id"), col("__v"), col("centroid_id"))
    IvfIndex(assigned, centroids)
  }

  /** IVF search: each query probes its `nprobe` nearest centroids and
    * scans only those buckets. Equi-join on centroid_id ⇒ bucketed,
    * shuffle-bounded; recall grows with nprobe. */
  def ivfSearch(index: IvfIndex, queries: DataFrame, qIdCol: String,
      qVecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"),
      l2Normalize(col(qVecCol).cast("array<double>")).as("__qv"))
    val qc = q.crossJoin(broadcast(index.centroids))
      .withColumn("__csim", dot(col("__qv"), col("__cv")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("centroid_id").asc)
    val probes = qc.withColumn("__pk", row_number().over(wProbe))
      .filter(col("__pk") <= nprobe)
      .select(col("query_id"), col("__qv"), col("centroid_id"))
    val scored = probes.join(index.assigned, Seq("centroid_id"))
      .withColumn("cosine", dot(col("__qv"), col("__v")))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("__id").asc)
    scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("__id").as("nn_id"), col("cosine"), col("rank"))
  }
}
