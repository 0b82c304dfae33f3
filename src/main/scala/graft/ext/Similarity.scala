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
    * LSH, seeded — same planes on every run/executor (and embeddable as
    * literals in the DuckDB oracle, which replays the SRP pipeline). */
  private[graft] def planesFor(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
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
    * `backing` is the persisted normalized corpus the index plans read
    * from — call [[IvfIndex.unpersist]] when the index is retired. */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame,
      backing: Option[DataFrame] = None) {
    def unpersist(): Unit = backing.foreach(_.unpersist())
  }

  /** Build an IVF index with spherical k-means centroids.
    *
    * Scale shape (the 100 TB rule):
    *  - training runs Lloyd's iterations DRIVER-SIDE over a BOUNDED
    *    hash-sample (~sampleFactor·C rows whatever the corpus size, a
    *    deterministic top-k by id) — the classic bounded-sample k-means
    *    recipe; the corpus is never iterated more than once per pass;
    *  - the assignment pass embeds the C trained centroids as LITERAL
    *    arrays, so nearest-centroid is a NARROW per-row expression
    *    (C codegen'd dot products + array_position argmax): no
    *    crossJoin, no per-row window, no shuffle at all;
    *  - the normalized corpus is persisted once and shared by the
    *    count, sample, and assignment passes. */
  def ivfBuild(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, kmeansIters: Int = 5, sampleFactor: Int = 40): IvfIndex = {
    val c = corpus.repartition(col(idCol)).select(col(idCol).as("__id"),
      l2Normalize(col(vecCol).cast("array<double>")).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = c.count() // also materializes the persist for the passes below
    val target = math.max(nCentroids.toLong * sampleFactor, nCentroids.toLong)
    val ratio = math.max(1L, n / math.max(1L, target))
    // deterministic bounded sample: hash-thin to ~target rows, then a
    // distributed top-k by id (TakeOrderedAndProject — never a global sort)
    val sample: Array[Array[Double]] = c
      .filter(pmod(xxhash64(col("__id")), lit(ratio)) === 0)
      .orderBy(col("__id"))
      .limit((target * 2).toInt)
      .select(col("__v")).collect()
      .map(_.getSeq[Double](0).toArray)
    val cents = lloyds(sample, nCentroids, kmeansIters)
    // assignment: argmax over C literal-centroid dot products — narrow,
    // codegen'd, zero-shuffle. Ties break to the lowest centroid_id
    // (array_position returns the FIRST index holding the max).
    val scores = array(cents.map(cv => dot(col("__v"), array(cv.map(lit).toSeq: _*))): _*)
    val assigned = c
      .withColumn("centroid_id",
        (array_position(scores, array_max(scores)) - 1).cast("int"))
      .select(col("__id"), col("__v"), col("centroid_id"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = cents.zipWithIndex.toSeq
      .map { case (v, i) => (i, v) }.toDF("centroid_id", "__cv")
    IvfIndex(assigned, centroids, Some(c))
  }

  /** Spherical k-means (Lloyd's) over an in-memory sample: cosine
    * assignment (inputs are L2-normalized), mean + renormalize update,
    * empty clusters keep their previous centroid. Deterministic: seeded
    * spread init (every ⌈n/C⌉-th sample vector), fixed iteration count. */
  private[ext] def lloyds(sample: Array[Array[Double]], c: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means sample is empty")
    val k = math.min(c, sample.length)
    val step = math.max(1, sample.length / k)
    var cents = Array.tabulate(k)(i => sample(math.min(i * step, sample.length - 1)).clone())
    // pad (corpus smaller than C): duplicate spread picks so the index
    // always has exactly C buckets
    if (k < c) cents = Array.tabulate(c)(i => cents(i % k).clone())
    val dim = sample.head.length
    for (_ <- 0 until iters) {
      val sums = Array.fill(c)(new Array[Double](dim))
      val counts = new Array[Long](c)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var j = 0
        while (j < c) {
          var d = 0.0; var i = 0
          while (i < dim) { d += v(i) * cents(j)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = j }
          j += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(c) { j =>
        if (counts(j) == 0) cents(j)
        else {
          val m = sums(j).map(_ / counts(j))
          val nrm = math.sqrt(m.map(x => x * x).sum)
          if (nrm == 0) cents(j) else m.map(_ / nrm)
        }
      }
    }
    cents
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
    // probes (queries × nprobe rows) broadcast: the corpus-side bucket
    // scan never shuffles — candidate generation is a broadcast join
    val scored = index.assigned.join(broadcast(probes), Seq("centroid_id"))
      .withColumn("cosine", dot(col("__qv"), col("__v")))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("__id").asc)
    scored.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("__id").as("nn_id"), col("cosine"), col("rank"))
  }
}
