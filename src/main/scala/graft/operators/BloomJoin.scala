package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.catalyst.expressions.{ShiftRight => CShiftRight}

/** Bloom-filter join pruning (Bloom 1970): build a bitmap of the small
  * side's join keys, filter the BIG side against it BEFORE the join's
  * exchange, then run the real join on the survivors. False positives
  * only admit extra rows into the shuffle — the join itself removes
  * them — so the result is EXACTLY the plain join (the q96 contract
  * oracle is the plain join, no sketch replay needed).
  *
  * Why this exists next to Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`, the
  * InjectRuntimeFilter rule): the built-in engages only when its
  * size/selectivity thresholds and plan-shape preconditions line up,
  * silently does nothing otherwise, and its filter lives inside one
  * query's physical plan. This operator is the explicit form — it
  * always prunes, the bitmap is a deterministic pure function of
  * (seed, keys) via xxhash64 double hashing h_i = (h1 + i·h2) mod m,
  * and the pruned frame is an ordinary DataFrame you can reuse across
  * several joins or write out. (The bitmap is engine-INTERNAL by
  * design: no oracle ever replays it, because the verifying join
  * makes the result independent of which bits are set.)
  *
  * Scale shape: the bitmap build is one distributed aggregate —
  * explode keys ×k into bit positions, `bit_or` partial-aggregated
  * into ≤ m/64 words — and the driver holds only the m-bit bitmap
  * (m ≤ 2^24 ⇒ ≤ 2 MiB, the same budget as a broadcast variable; the
  * words travel to executors as ONE array literal in the filter
  * expression). The big side's probe is a narrow codegen'd filter —
  * k xxhash64-derived probes per row, no shuffle, no UDF — that cuts the
  * join exchange by the non-matching fraction. At a 1 %
  * false-positive rate that is the difference between shuffling
  * 100 TB and shuffling the ~matching slice of it.
  */
object BloomJoin {

  private def positions(c: Column, numBits: Int, numHashes: Int,
      seed: Long): Seq[Column] = {
    // xxhash64, NOT the md5-derived portable hash: the bloom's content
    // is never replayed by an oracle (correctness comes from the
    // verifying join, and the result equals the plain join regardless
    // of which bits are set), so the probe takes the cheapest
    // deterministic hash Spark codegens natively — md5+conv measured
    // ~3× slower on the big side's per-row probe. Double hashing
    // h_i = h1 + i·h2 over 56-bit-masked hashes: ANSI mode is on, so
    // the combination must be provably wrap-free (h < 2^56, i ≤ 15 ⇒
    // h1 + i·h2 < 2^60), exactly the bound the md5 halves satisfied.
    val mask = lit((1L << 56) - 1L)
    val h1 = xxhash64(lit(seed), c).bitwiseAND(mask)
    val h2 = xxhash64(lit(seed + 1L), c).bitwiseAND(mask)
    (0 until numHashes).map(i => pmod(h1 + lit(i.toLong) * h2, lit(numBits.toLong)))
  }

  private def checkParams(numBits: Int, numHashes: Int): Unit = {
    require(numBits >= 64 && numBits <= (1 << 24) && numBits % 64 == 0,
      s"numBits=$numBits outside [64, 2^24] or not a multiple of 64")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes=$numHashes outside [1, 16]")
  }

  /** Build the dense bitmap (as 64-bit words) of `keys`' membership
    * set: one distributed `bit_or` aggregate, ≤ numBits/64 rows ever
    * reach the driver. */
  def membershipWords(keys: DataFrame, keyCol: String, numBits: Int,
      numHashes: Int, seed: Long): Array[Long] = {
    checkParams(numBits, numHashes)
    val pos = array(positions(col(keyCol), numBits, numHashes, seed): _*)
    val rows = keys
      .select(explode(pos).as("__p")).distinct()
      .select(shiftright(col("__p"), 6).cast("int").as("__w"),
        col("__p").bitwiseAND(lit(63L)).cast("int").as("__b"))
      .groupBy(col("__w"))
      // SQL shiftleft takes a column shift amount (the Scala functions
      // overload is literal-only)
      .agg(expr("bit_or(shiftleft(1L, __b))").as("__word"))
      .collect()
    val words = new Array[Long](numBits / 64)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Codegen'd membership probe: k xxhash64-derived positions, each tested
    * with (words[p >> 6] >> (p & 63)) & 1 against the word array
    * embedded as one literal. May return true for absent keys (the
    * Bloom false-positive) — never false for present ones. */
  def mightContain(key: Column, words: Array[Long], numBits: Int,
      numHashes: Int, seed: Long): Column = {
    checkParams(numBits, numHashes)
    require(words.length == numBits / 64,
      s"words.length ${words.length} != numBits/64 ${numBits / 64}")
    val w = lit(words)
    positions(key, numBits, numHashes, seed).map { p =>
      val word = element_at(w, shiftright(p, 6).cast("int") + lit(1))
      val bit = p.bitwiseAND(lit(63L)).cast("int")
      // variable-amount shift: the Scala shiftright() helper only takes
      // a literal count, so bridge to Catalyst's ShiftRight directly
      Bridge.column(CShiftRight(Bridge.expression(word),
        Bridge.expression(bit))).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** The operator: prune `big` by `small`'s key bitmap, then join.
    * Inner/semi only — pruning drops big-side rows that have no match,
    * which is exactly what outer joins must keep. */
  def prunedJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, numBits: Int = 1 << 20, numHashes: Int = 5,
      seed: Long = 42L, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "leftsemi", "semi").contains(jt),
      s"bloom pruning keeps inner/left_semi semantics only, got: $joinType")
    val words = membershipWords(
      small.select(col(smallKey)).distinct(), smallKey, numBits, numHashes, seed)
    // subquery aliases: unqualified col(bigKey) === col(smallKey) is
    // AMBIGUOUS whenever both sides name the join key identically (the
    // common case) — qualify through the aliases instead
    big.filter(mightContain(col(bigKey), words, numBits, numHashes, seed))
      .as("__bloom_big")
      .join(small.as("__bloom_small"),
        col(s"__bloom_big.$bigKey") === col(s"__bloom_small.$smallKey"),
        joinType)
  }
}
