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
