package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE tokenizer: distributed pair counts, dictionary training, and the
  * no-UDF replace-chain encoder. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower widest widest widest"),
    (3L, "newest newest newest newest newest newest")
  ).toDF("doc_id", "text")

  test("bpePairCounts: hand-checked pair frequencies weighted by word count") {
    val counts = TextOps.bpePairCounts(corpus, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'lo' appears in low(5) + lower(2) = 7; 'es' in widest(3) + newest(6) = 9
    assert(counts("lo") == 7L, s"got $counts")
    assert(counts("es") == 9L)
    assert(counts("ne") == 6L)
    // pairs never cross word boundaries (no 'wl' from "low lower")
    assert(!counts.contains("wl"))
  }

  test("trainBpeMerges: deterministic greedy merges on the word dictionary") {
    val merges = TextOps.trainBpeMerges(corpus, "text", nMerges = 4)
    // round 1: 'e'+'s' (freq 9) beats 'lo' (7); then 'es'+'t' (9);
    // the trainer is stable across runs
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")), s"got $merges")
    assert(merges == TextOps.trainBpeMerges(corpus, "text", nMerges = 4))
    // merge count respects the cap and exhaustion: a one-word corpus
    // runs out of pairs and stops early instead of looping
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = TextOps.trainBpeMerges(tiny, "text", nMerges = 10)
    assert(m == Seq(("a", "b")))
  }

  test("bpeSymbols agrees with the driver-side encoder on every word") {
    val merges = TextOps.trainBpeMerges(corpus, "text", nMerges = 6)
    val encoded = corpus.select(col("doc_id"),
        TextOps.bpeSymbols(col("text"), merges).as("syms"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val driverSide = Map(
      1L -> Seq.fill(5)(TextOps.bpeEncodeWord("low", merges)).flatten,
      2L -> (Seq.fill(2)(TextOps.bpeEncodeWord("lower", merges)) ++
        Seq.fill(3)(TextOps.bpeEncodeWord("widest", merges))).flatten,
      3L -> Seq.fill(6)(TextOps.bpeEncodeWord("newest", merges)).flatten)
    assert(encoded == driverSide, s"got $encoded")
  }

  test("merge application is leftmost-first (the replace-chain semantics)") {
    // [a a a] + (a,a) → [aa a], not [a aa]
    assert(TextOps.bpeEncodeWord("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    val df = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out = df.select(TextOps.bpeSymbols(col("text"), Seq(("a", "a"))))
      .as[Seq[String]].first()
    assert(out == Seq("aa", "a"))
  }

  test("trained merges compress: fewer symbols than characters, never fewer than words") {
    val merges = TextOps.trainBpeMerges(corpus, "text", nMerges = 8)
    val row = corpus.agg(
      sum(TextOps.bpeTokenCount(col("text"), merges)).as("bpe"),
      sum(length(regexp_replace(col("text"), "\\s+", ""))).as("chars"),
      sum(size(TextOps.tokens(col("text")))).as("words")).head()
    val (bpe, chars, words) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(bpe < chars, s"bpe=$bpe chars=$chars")
    assert(bpe >= words, s"bpe=$bpe words=$words")
  }

  test("empty and punctuation-only texts encode to zero symbols") {
    val df = Seq((1L, ""), (2L, "!!! ..."), (3L, "ok")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextOps.bpeTokenCount(col("text"), Seq(("o", "k"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }
}
