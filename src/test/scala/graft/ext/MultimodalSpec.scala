package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello world"), (2L, "abc")).toDF("doc_id", "text")
  private lazy val media = Multimodal.packAsMedia(docs, "doc_id", "text")

  test("packAsMedia produces the typed media struct") {
    val mt = media.schema("media").dataType.asInstanceOf[StructType]
    assert(mt.fieldNames.toSeq == Seq("bytes", "mime", "width", "height", "duration_ms"))
    assert(mt("bytes").dataType == BinaryType)
    val r = media.filter($"media_id" === 1L).select("media.width", "media.duration_ms").first()
    assert(r.getInt(0) == 12 && r.getLong(1) == 110L)
  }

  test("byteHistogram: per-partition batched fake decode; histogram sums to n_bytes") {
    val out = Multimodal.byteHistogram(media, bins = 16).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(out(1L)._2 == 11L) // "hello world".getBytes.length
    assert(out(1L)._1.sum == 11L)
    assert(out(2L)._1.sum == 3L)
    assert(out(1L)._1.length == 16)
  }

  test("frameSample emits n frames of bounded size per media row") {
    val frames = Multimodal.frameSample(media, nFrames = 4, frameBytes = 4)
    assert(frames.filter($"media_id" === 1L).count() == 4)
    val lens = frames.select("frame_len").as[Int].collect()
    assert(lens.forall(_ <= 4))
  }

  test("dHash: 60-bit non-negative signature; identical payloads collide exactly") {
    val base = "The quick brown fox jumps over the lazy dog. " * 8
    val m = Multimodal.packAsMedia(
      Seq((1L, base), (2L, base), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text")
    val sigs = Multimodal.dHash(m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.values.forall(s => s >= 0L && s < (1L << 60)))
    assert(sigs(1L) == sigs(2L))
    assert(sigs(3L) == 0L) // empty payload: all samples 0, no gradients
  }

  test("dHashNearDups: absorbs a same-length one-byte re-encode, not a different payload") {
    val base = "The quick brown fox jumps over the lazy dog. " * 8
    val reenc = base.updated(100, 'X') // one byte, positions preserved
    val other = new scala.util.Random(7).alphanumeric.take(base.length).mkString
    val m = Multimodal.packAsMedia(
      Seq((1L, base), (2L, reenc), (3L, other)).toDF("doc_id", "text"),
      "doc_id", "text")
    val pairs = Multimodal.dHashNearDups(m, maxBits = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 <= 2L),
      s"one-byte perturbation must pair within Hamming 2: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"unrelated payload must not pair: ${pairs.toSeq}")
  }
}
