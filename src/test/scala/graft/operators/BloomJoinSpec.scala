package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val big = ((1 to 2000).map(i => (i.toLong % 500, s"row$i")) ++
    Seq((9999L, "orphan"))).toDF("bk", "payload")
  private val small = Seq((3L, "d3"), (7L, "d7"), (480L, "d480"), (777L, "d-nomatch"))
    .toDF("sk", "dim")

  test("pruned join result == plain join result") {
    val plain = big.join(small, $"bk" === $"sk").select("bk", "payload", "dim")
      .collect().toSet
    val pruned = BloomJoin.prunedJoin(big, "bk", small, "sk", numBits = 1 << 12)
      .select("bk", "payload", "dim").collect().toSet
    assert(pruned == plain)
    assert(plain.size == 12, "3 matching keys x 4 rows each")
  }

  test("no false negatives: every member key passes mightContain") {
    val keys = (0L until 500L).map(k => Tuple1(k)).toDF("k")
    val words = BloomJoin.membershipWords(keys, "k", 1 << 12, 5, 42L)
    val missed = keys.filter(!BloomJoin.mightContain($"k", words, 1 << 12, 5, 42L))
      .count()
    assert(missed == 0, s"$missed member keys rejected — bloom contract broken")
  }

  test("pruning is effective: a sparse member set rejects most of the big side") {
    // 4 member keys out of 500 distinct big-side keys; at 2^16 bits the
    // false-positive rate is ~0 so the survivor count is the true match
    // count (12) plus the orphan's chance, deterministic under the seed
    val words = BloomJoin.membershipWords(
      small.select($"sk"), "sk", 1 << 16, 5, 42L)
    val survivors = big.filter(
      BloomJoin.mightContain($"bk", words, 1 << 16, 5, 42L)).count()
    assert(survivors < big.count() / 10,
      s"$survivors of ${big.count()} rows survived — pruning ineffective")
    assert(survivors >= 12, "survivors must include every true match")
  }

  test("rejects outer join types and malformed parameters") {
    intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(big, "bk", small, "sk", joinType = "left_outer")
    }
    intercept[IllegalArgumentException] {
      BloomJoin.membershipWords(small, "sk", numBits = 100, numHashes = 5, seed = 1L)
    }
    intercept[IllegalArgumentException] {
      BloomJoin.mightContain($"bk", new Array[Long](3), 1 << 12, 5, 1L)
    }
  }

  test("same-named join keys resolve (no ambiguous-reference crash)") {
    val l = Seq((1L, "a"), (2L, "b"), (9L, "z")).toDF("k", "lv")
    val r = Seq((1L, "d1"), (2L, "d2")).toDF("k", "rv")
    val out = BloomJoin.prunedJoin(l, "k", r, "k", numBits = 1 << 12)
      .select($"lv", $"rv").as[(String, String)].collect().toSet
    assert(out == Set(("a", "d1"), ("b", "d2")))
  }

  test("left_semi pruned join matches plain left_semi") {
    val plain = big.join(small, $"bk" === $"sk", "left_semi")
      .select("bk", "payload").collect().toSet
    val pruned = BloomJoin.prunedJoin(big, "bk", small, "sk",
      numBits = 1 << 12, joinType = "left_semi")
      .select("bk", "payload").collect().toSet
    assert(pruned == plain)
  }
}
