package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join on skewed data, for every join type arm") {
    // one hot key (0) with 500 rows, a long tail, plus left-only keys
    val left = ((1 to 500).map(i => (0L, s"hot$i")) ++
      (1 to 50).map(i => (i.toLong, s"tail$i")) ++
      Seq((999L, "no-match"))).toDF("k", "lv")
    val right = Seq((0L, "dim0"), (1L, "dim1"), (7L, "dim7")).toDF("k", "rv")

    val plainInner = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().toSet
    val saltedInner = SkewJoin.saltedJoin(left, right, Seq("k"), saltBuckets = 8)
      .select("k", "lv", "rv").collect().toSet
    assert(saltedInner == plainInner)
    assert(saltedInner.size == 502) // 500 hot + tail1 + tail7

    val plainLeft = left.join(right, Seq("k"), "left").select("k", "lv", "rv")
      .collect().toSet
    val saltedLeft = SkewJoin.saltedJoin(left, right, Seq("k"), 8, "left")
      .select("k", "lv", "rv").collect().toSet
    assert(saltedLeft == plainLeft)
  }

  test("salted join rejects right/full outer (replicated right would duplicate rows)") {
    val left = Seq((1L, "a")).toDF("k", "lv")
    val right = Seq((1L, "b")).toDF("k", "rv")
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(left, right, Seq("k"), 4, "right_outer"))
    intercept[IllegalArgumentException](
      SkewJoin.saltedJoin(left, right, Seq("k"), 4, "full"))
  }
}
