package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure laws of the bench protocol's coverage-first degradation (r16,
  * r15 verdict item 1): reference-cost parsing, cheapest-first
  * ordering, and the calibration verdict. The end-to-end budget
  * behavior is exercised by running graft.Bench with a low
  * SPARK_GRAFT_BENCH_BUDGET_S (see BASELINE.md's round notes). */
class BenchPlanSpec extends AnyFunSuite {

  private val refJson =
    """{"ref_round":"r15","mode":"per_query_min_over_three_interleaved_runs",
      |"sf":"/root/testdata/sf0.1",
      |"queries":{"q01_count":0.136,"q259_cc_distributed":14.54,
      |"q84_ann_pq":2.5,"q110_ann_ivfpq":3.25}}""".stripMargin

  test("parseRefCosts: q-named numeric entries only — metadata keys never parse as queries") {
    val ref = Bench.parseRefCosts(refJson)
    assert(ref == Map("q01_count" -> 0.136, "q259_cc_distributed" -> 14.54,
      "q84_ann_pq" -> 2.5, "q110_ann_ivfpq" -> 3.25))
    // "queries"/"ref_round"/"mode" must not match (q not followed by a digit)
    assert(!ref.contains("queries"))
    assert(Bench.parseRefRound(refJson).contains("r15"))
    assert(Bench.parseRefCosts("").isEmpty && Bench.parseRefRound("").isEmpty)
  }

  test("medianCost: mid-pack default for queries the reference has never seen") {
    assert(Bench.medianCost(Map.empty) == 1.0)
    assert(Bench.medianCost(Map("a" -> 1.0, "b" -> 2.0, "c" -> 100.0)) == 2.0)
  }

  test("cheapestFirst: reference cost ascending, name as tiebreak — the priced audits land LAST") {
    val ref = Map("q10_x" -> 5.0, "q02_y" -> 0.1, "q03_z" -> 0.1, "q30_new" -> 1.0)
    val order = Bench.cheapestFirst(
      Seq("q10_x" -> (), "q30_new" -> (), "q03_z" -> (), "q02_y" -> ()),
      n => ref(n)).map(_._1)
    assert(order == Seq("q02_y", "q03_z", "q30_new", "q10_x"))
    // no reference at all (constant cost) degrades to name order
    val byName = Bench.cheapestFirst(
      Seq("q10" -> (), "q02" -> (), "q30" -> ()), _ => 1.0).map(_._1)
    assert(byName == Seq("q02", "q10", "q30"))
  }

  test("twoPassFits: the r15 driver box (10x slowdown, 552 s reference, 1320 s budget) must read single-pass") {
    // builder box: 552 s suite, 1320 s budget — two passes fit
    // (5 + 547 + 1.1*552 = 1159 <= 0.95*1320 = 1254)
    assert(Bench.twoPassFits(elapsedS = 5, slowdown = 1.0,
      refTotalS = 552, refObsS = 5, budgetS = 1320))
    // a 1.5x-degraded box no longer fits two passes of the same suite
    assert(!Bench.twoPassFits(elapsedS = 5, slowdown = 1.5,
      refTotalS = 552, refObsS = 5, budgetS = 1320))
    // the r15 driver box: ~10x slowdown — single-pass immediately
    assert(!Bench.twoPassFits(elapsedS = 10, slowdown = 10.0,
      refTotalS = 552, refObsS = 1, budgetS = 1320))
  }

  test("singlePassFits: the r16 driver box (5.7x, 520 s reference, 1320 s budget) cannot even single-pass") {
    assert(Bench.singlePassFits(elapsedS = 5, slowdown = 1.0,
      refTotalS = 520, refObsS = 5, budgetS = 1320))
    // 5 + 5.7*(520-5) = 2940 > 1254 — the auto_fit tier must engage
    assert(!Bench.singlePassFits(elapsedS = 5, slowdown = 5.7,
      refTotalS = 520, refObsS = 5, budgetS = 1320))
  }

  test("budgetFitDeferrals: defers exactly the cheapest-first tail that does not fit; kept prefix then times completely") {
    val remaining = Seq("a" -> 1.0, "b" -> 2.0, "c" -> 4.0, "d" -> 10.0)
    // slowdown 2x, 20 s left of a 0.95*21.05≈20 s allowance:
    // 2+4=6 fits, +8=14 fits, +20=34 does not → defer only "d"
    assert(Bench.budgetFitDeferrals(remaining, elapsedS = 1.0,
      slowdown = 2.0, budgetS = 22.1) == Seq("d"))
    // ample budget → nothing deferred
    assert(Bench.budgetFitDeferrals(remaining, elapsedS = 0.0,
      slowdown = 1.0, budgetS = 1000.0).isEmpty)
    // budget already exhausted → everything deferred (named, not
    // silently skipped)
    assert(Bench.budgetFitDeferrals(remaining, elapsedS = 50.0,
      slowdown = 1.0, budgetS = 50.0) == Seq("a", "b", "c", "d"))
    // the r16 driver shape: 5.7x box, 1320 s budget, a 520 s suite
    // whose tail holds the priced audits — the kept prefix's
    // predicted cost fits the allowance, and every deferred query is
    // strictly more expensive than every kept one
    val suite = (1 to 339).map(i => f"q$i%03d" -> (if (i <= 320) 0.5 else 8.0))
    val deferred = Bench.budgetFitDeferrals(suite, elapsedS = 30.0,
      slowdown = 5.7, budgetS = 1320.0)
    val kept = suite.filterNot { case (n, _) => deferred.contains(n) }
    assert(deferred.nonEmpty && kept.nonEmpty)
    assert(30.0 + 5.7 * kept.map(_._2).sum <= 0.95 * 1320.0)
    val keptMax = kept.map(_._2).max
    assert(deferred.forall(n => suite.toMap.apply(n) >= keptMax))
  }
}
