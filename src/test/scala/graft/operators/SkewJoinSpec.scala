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

  test("keySkew: hot keys ranked first, ppm/ratio floor-exact, stable across layouts") {
    // 1 key with 900 rows + 100 keys with 1 row each: total 1000, 101 keys
    val rows = (1 to 900).map(_ => 0L) ++ (1L to 100L)
    val df = rows.toDF("k")
    val top = SkewJoin.keySkew(df, "k", topN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top.head == ((0L, 900L, 900000L, 90900L)),
      s"hot key share/ratio wrong: ${top.head}")
    // cold keys: 1/1000 rows -> 1000 ppm; ratio = 1000*101 div 1000 = 101
    assert(top(1) == ((1L, 1L, 1000L, 101L)) && top(2) == ((2L, 1L, 1000L, 101L)))
    val again = SkewJoin.keySkew(df.repartition(7), "k", topN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == top.toSeq)
  }
}
