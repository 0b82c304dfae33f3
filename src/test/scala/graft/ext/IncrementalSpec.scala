package graft.ext

import graft.SparkSpec
import graft.core.Fx
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def direct(df: DataFrame): Map[String, (Long, Double, Double, Double)] =
    df.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum($"l_quantity".cast("decimal(18,4)")).cast("double").as("s"),
        min($"l_quantity").as("mn"), max($"l_quantity").as("mx"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap

  private def readout(state: DataFrame): Map[String, (Long, Double, Double, Double)] =
    Incremental.readout(state, Seq("l_returnflag"), Seq("l_quantity"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap

  test("merge law: state(base) + state(delta) == direct recompute of the union") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val cut = lit("1995-01-01 00:00:00").cast("timestamp")
    val keys = Seq("l_returnflag")
    val ms = Seq("l_quantity")
    val base = Incremental.aggState(li.filter($"l_shipdate" < cut), keys, ms)
    val delta = Incremental.aggState(li.filter($"l_shipdate" >= cut), keys, ms)
    val merged = readout(Incremental.mergeStates(keys, ms, base, delta))
    assert(merged == direct(li), "merged state must equal the direct recompute")
  }

  test("merge is associative: ((a+b)+c) == (a+(b+c)) == direct over three shards") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val keys = Seq("l_returnflag")
    val ms = Seq("l_quantity")
    val shards = (0 until 3).map(i =>
      Incremental.aggState(li.filter($"l_orderkey" % 3 === i), keys, ms))
    val left = Incremental.mergeStates(keys, ms,
      Incremental.mergeStates(keys, ms, shards(0), shards(1)), shards(2))
    val right = Incremental.mergeStates(keys, ms, shards(0),
      Incremental.mergeStates(keys, ms, shards(1), shards(2)))
    assert(readout(left) == readout(right))
    assert(readout(left) == direct(li))
  }

  test("keys present in only one shard pass through with identity partials") {
    val a = Incremental.aggState(
      Seq(("x", 1.0), ("x", 3.0)).toDF("k", "v"), Seq("k"), Seq("v"))
    val b = Incremental.aggState(
      Seq(("y", 5.0)).toDF("k", "v"), Seq("k"), Seq("v"))
    val out = Incremental.readout(
        Incremental.mergeStates(Seq("k"), Seq("v"), a, b), Seq("k"), Seq("v"))
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(out == Set(("x", 2L, 4.0, 1.0, 3.0), ("y", 1L, 5.0, 5.0, 5.0)))
  }

  private def readoutR(state: DataFrame): Map[String, (Long, Double)] =
    Incremental.readoutRetractable(state, Seq("l_returnflag"), Seq("l_quantity"))
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

  test("signed law: state(base) + state(ins) - state(del) == direct over survivors") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val keys = Seq("l_returnflag")
    val ms = Seq("l_quantity")
    val base = li.filter($"l_orderkey" % 3 =!= 0)
    val ins = li.filter($"l_orderkey" % 3 === 0)
    val del = base.filter($"l_orderkey" % 5 === 1)
    val merged = Incremental.mergeRetractable(keys, ms,
      Seq(Incremental.retractableState(base, keys, ms),
        Incremental.retractableState(ins, keys, ms)),
      Seq(Incremental.retractableState(del, keys, ms)))
    val survivors = li.filter(!($"l_orderkey" % 3 =!= 0 && $"l_orderkey" % 5 === 1))
    val want = survivors.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum($"l_quantity".cast("decimal(18,4)")).cast("double").as("s"))
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(readoutR(merged) == want)
  }

  test("retraction: fully-deleted keys drop at readout; over-deleted keys drop (not poison)") {
    val keys = Seq("k"); val ms = Seq("v")
    val add = Incremental.retractableState(
      Seq(("x", 1.0), ("x", 3.0), ("y", 5.0)).toDF("k", "v"), keys, ms)
    // y fully deleted; z deleted without ever being inserted (caller bug)
    val sub = Incremental.retractableState(
      Seq(("y", 5.0), ("z", 9.0)).toDF("k", "v"), keys, ms)
    val merged = Incremental.mergeRetractable(keys, ms, Seq(add), Seq(sub))
    // the MERGE keeps y (cnt 0) and z (cnt −1) — truncating here would
    // break staged associativity; only the READOUT drops them
    assert(merged.count() == 3)
    val out = Incremental.readoutRetractable(merged, keys, ms)
      .as[(String, Long, Double)].collect().toSet
    assert(out == Set(("x", 2L, 4.0)))
  }

  test("staged delete-before-insert does NOT resurrect rows (merge keeps negative balances)") {
    // the review counterexample: sB's rows are deleted in a stage that
    // runs BEFORE sB itself merges in — a mid-merge cnt>0 truncation
    // would lose the −3 balance and read the deleted rows as alive
    val keys = Seq("k"); val ms = Seq("v")
    val sA = Incremental.retractableState(
      Seq(("k", 4.0), ("k", 6.0)).toDF("k", "v"), keys, ms)          // cnt 2, sum 10
    val sB = Incremental.retractableState(
      Seq(("k", 10.0), ("k", 10.0), ("k", 10.0)).toDF("k", "v"), keys, ms) // cnt 3, sum 30
    val del = Incremental.retractableState(
      Seq(("k", 10.0), ("k", 10.0), ("k", 10.0)).toDF("k", "v"), keys, ms) // deletes all of sB
    val staged = Incremental.mergeRetractable(keys, ms,
      Seq(Incremental.mergeRetractable(keys, ms, Seq(sA), Seq(del)), sB), Seq())
    val oneShot = Incremental.mergeRetractable(keys, ms, Seq(sA, sB), Seq(del))
    val want = Set(("k", 2L, 10.0))
    assert(Incremental.readoutRetractable(staged, keys, ms)
      .as[(String, Long, Double)].collect().toSet == want)
    assert(Incremental.readoutRetractable(oneShot, keys, ms)
      .as[(String, Long, Double)].collect().toSet == want)
  }

  test("signed merge is associative/commutative like the append-only merge") {
    val li = Fx.t(spark, sfDir, "lineitem")
    val keys = Seq("l_returnflag"); val ms = Seq("l_quantity")
    val s0 = Incremental.retractableState(li.filter($"l_orderkey" % 3 === 0), keys, ms)
    val s1 = Incremental.retractableState(li.filter($"l_orderkey" % 3 === 1), keys, ms)
    val d = Incremental.retractableState(
      li.filter($"l_orderkey" % 3 === 0 && $"l_orderkey" % 7 === 2), keys, ms)
    val a = Incremental.mergeRetractable(keys, ms, Seq(s0, s1), Seq(d))
    val b = Incremental.mergeRetractable(keys, ms,
      Seq(Incremental.mergeRetractable(keys, ms, Seq(s0), Seq(d)), s1), Seq())
    assert(readoutR(a) == readoutR(b))
  }

  test("null measures: sums/mins/maxes ignore nulls, cnt counts rows; all-null stays null") {
    val a = Incremental.aggState(
      Seq(("x", Some(2.0)), ("x", None), ("z", None)).toDF("k", "v"),
      Seq("k"), Seq("v"))
    val b = Incremental.aggState(
      Seq(("x", Some(6.0)), ("z", None)).toDF("k", "v"), Seq("k"), Seq("v"))
    val out = Incremental.readout(
        Incremental.mergeStates(Seq("k"), Seq("v"), a, b), Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out("x") == ((3L, Some(8.0), Some(2.0), Some(6.0))))
    assert(out("z") == ((2L, None, None, None)))
  }
}
