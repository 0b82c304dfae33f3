package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension, SURVEY §2.4):
  * image/audio/video as opaque `binary` columns plus typed metadata.
  *
  * The decode step is a clearly-marked DETERMINISTIC FAKE (the container
  * has no image/audio codecs); everything Spark-side — the schema, the
  * batch-shaped partition iteration, the feature column contract — is
  * real and tested. Swap [[fakeDecode]] for a real codec call and
  * nothing else changes.
  *
  * Batch shape: [[byteHistogram]] runs via `mapPartitions` so a real
  * decoder could amortize model/codec init per partition (the JVM
  * analogue of `mapInPandas` batching).
  */
object Multimodal {

  /** media struct: opaque payload + typed metadata. */
  val MediaType: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Pack a text corpus as fake media rows (bytes = utf-8 payload) —
    * fixture plumbing for the pipeline; real data would arrive as
    * binaryFile / parquet binary columns. */
  def packAsMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      struct(
        encode(col(textCol), "UTF-8").as("bytes"),
        lit("application/octet-stream").as("mime"),
        (length(col(textCol)) % 1024 + 1).cast("int").as("width"),
        (length(col(textCol)) % 768 + 1).cast("int").as("height"),
        (length(col(textCol)) * 10L).cast("long").as("duration_ms")).as("media"))

  /** FAKE decode: byte histogram over `bins` buckets. Stands in for a
    * real image/audio feature extractor; deterministic by construction. */
  private def fakeDecode(bytes: Array[Byte], bins: Int): Array[Long] = {
    val h = new Array[Long](bins)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xFF) % bins) += 1; i += 1 }
    }
    h
  }

  /** Per-row feature extraction with per-partition batching: the real
    * pattern for codec/model amortization. Output: (media_id, features
    * array<long>, n_bytes). */
  def byteHistogram(media: DataFrame, bins: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(LongType)),
      StructField("n_bytes", LongType)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("media.bytes").as("bytes"))
      .mapPartitions { rows =>
        // per-partition init would go HERE (codec handle, model session)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          Row(r.getLong(0), fakeDecode(bytes, bins).toSeq,
            if (bytes == null) 0L else bytes.length.toLong)
        }
      }(enc)
  }

  /** Resize stand-in: keep every `factor`-th payload character (the
    * fake payload is UTF-8 text by construction) and scale the spatial
    * metadata by √factor — the Spark-side plumbing of an image
    * thumbnail pass: schema contract, metadata propagation, per-row
    * transform. A real resize swaps the sampling expression for a
    * codec call and nothing else changes. */
  def resize(media: DataFrame, factor: Int = 4): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val txt = col("media.bytes").cast("string")
    val n = length(txt)
    // every factor-th char: positions 1, 1+factor, 1+2·factor, …
    val idx = sequence(lit(1), greatest(n, lit(1)), lit(factor))
    val thumb = when(n === 0, lit(""))
      .otherwise(array_join(transform(idx, i => txt.substr(i, lit(1))), ""))
    val side = math.max(1, math.sqrt(factor.toDouble).toInt)
    media.select(col("media_id"),
      struct(
        encode(thumb, "UTF-8").as("bytes"),
        col("media.mime").as("mime"),
        greatest((col("media.width") / side).cast("int"), lit(1)).as("width"),
        greatest((col("media.height") / side).cast("int"), lit(1)).as("height"),
        col("media.duration_ms").as("duration_ms")).as("media"))
  }

  /** FAKE perceptual downsample: `samples` evenly-spaced probe bytes
    * (index i reads byte ⌊i·(nb−1)/(samples−1)⌋, unsigned). Stands in
    * for the grayscale 9×8 thumbnail a real dHash reads; POSITIONAL by
    * construction — unlike a histogram, which collapses all structure
    * and makes every same-language text "perceptually equal". */
  private def fakeSample(bytes: Array[Byte], samples: Int): Array[Long] = {
    val out = new Array[Long](samples)
    if (bytes != null && bytes.length > 0) {
      val nb = bytes.length
      var i = 0
      while (i < samples) {
        out(i) = bytes((i.toLong * (nb - 1) / (samples - 1)).toInt) & 0xFFL
        i += 1
      }
    }
    out
  }

  /** Perceptual dHash — the standard image-dedup signature (LAION-
    * style pipelines dHash/pHash thumbnails before any expensive
    * near-dup pass): 61 evenly-spaced probe samples of the decoded
    * signal, bit i = 1 iff sample[i] > sample[i+1] (gradient SIGNS —
    * they survive the re-encode/brightness perturbations that break
    * exact byte hashing, which is the point), packed little-endian
    * into a 60-bit non-negative long (the q46 SimHash width, so the
    * same 15-bit banding applies). Decode runs in the [[byteHistogram]]
    * mapPartitions shape — a real thumbnailer drops in per partition.
    * Output: (media_id, dhash, n_bytes). */
  def dHash(media: DataFrame): DataFrame = {
    val samples = 61 // 60 adjacent comparisons -> bits 0..59
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(LongType)),
      StructField("n_bytes", LongType)))
    val enc = Encoders.row(outSchema)
    val sampled = media.select(col("media_id"), col("media.bytes").as("bytes"))
      .mapPartitions { rows =>
        // per-partition init would go HERE (codec handle, model session)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          Row(r.getLong(0), fakeSample(bytes, samples).toSeq,
            if (bytes == null) 0L else bytes.length.toLong)
        }
      }(enc)
    val bit = (i: Int) =>
      when(element_at(col("features"), i + 1) >
        element_at(col("features"), i + 2), lit(1L << i))
        .otherwise(lit(0L))
    sampled.select(col("media_id"),
      (0 until samples - 1).map(bit).reduce(_ + _).as("dhash"),
      col("n_bytes"))
  }

  /** Perceptual near-dup pairs: banded Hamming join over [[dHash]]
    * signatures — 4 exact-match bands of 15 bits, so any pair within
    * Hamming distance 3 collides on at least one full band
    * (pigeonhole), then the candidate's true Hamming distance verifies
    * against `maxBits`. The media twin of the SimHash text pass (q46):
    * banding keeps the join equi-keyed — never an all-pairs product —
    * 15-bit band values (32k buckets) keep candidate volume ~n²/2¹⁵
    * per band, and the signature frame persists across its two
    * self-join sides (the decode is the expensive step; at scale it
    * must run once). Output: (a, b, hamming), a < b. */
  def dHashNearDups(media: DataFrame, maxBits: Int = 3): DataFrame = {
    require(maxBits >= 0 && maxBits <= 3,
      s"4 bands of 15 bits guarantee recall only to Hamming 3, got $maxBits")
    val bandBits = 15
    val mask = (1L << bandBits) - 1
    val sigs = dHash(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = sigs.select(col("media_id"), col("dhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("dhash"), b * bandBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bh")))
    bands.select(col("media_id").as("a"), col("dhash").as("sa"),
        col("band"), col("bh"))
      .join(bands.select(col("media_id").as("b"), col("dhash").as("sb"),
        col("band"), col("bh")), Seq("band", "bh"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(first(graft.ext.Dedup.hamming64(col("sa"), col("sb")).cast("long"))
        .as("hamming"))
      .filter(col("hamming") <= maxBits)
  }

  /** Frame sampling: n evenly-spaced fixed-size byte windows from the
    * payload (stands in for video frame extraction; pure expressions). */
  def frameSample(media: DataFrame, nFrames: Int = 4, frameBytes: Int = 32): DataFrame = {
    val idx = explode(sequence(lit(0), lit(nFrames - 1)))
    media.select(col("media_id"), idx.as("frame_no"), col("media.bytes").as("__b"))
      .withColumn("__off",
        (col("frame_no") * greatest(length(col("__b")) - frameBytes, lit(0))
          / lit(math.max(1, nFrames - 1))).cast("int") + 1)
      .select(col("media_id"), col("frame_no"),
        col("__b").substr(col("__off"), lit(frameBytes)).as("frame"))
      .withColumn("frame_len", length(col("frame")))
  }
}
