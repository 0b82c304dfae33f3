package graft.ext

import java.sql.{Date, Timestamp}

import graft.SparkSpec

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("columnProfile: one row per column, exact nulls, HLL distincts near truth") {
    val df = Seq(
      (1L, Some("a"), Some("x")),
      (2L, Some("a"), None),
      (3L, Some("b"), Some("y")),
      (4L, None, Some("y"))
    ).toDF("id", "s1", "s2")
    val out = Audit.columnProfile(df, Seq("id", "s1", "s2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set("id", "s1", "s2"))
    assert(out("id") == ((4L, 0L, 4L)))    // HLL linear-counting: exact at tiny n
    assert(out("s1")._2 == 1L && out("s2")._2 == 1L)
    assert(out("s1")._3 == 2L && out("s2")._3 == 2L)
  }

  test("fkOrphans: counts broken references only, NULL keys are not orphans") {
    val child = Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None), (4L, Some(10L)))
      .toDF("id", "pid")
    val parent = Seq((10L, "p")).toDF("pk", "name")
    val out = Audit.fkOrphans(Seq(("child.pid", child, "pid", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("child.pid", 1L))) // only pid=99 is broken
  }

  test("exactCorrelation: recovers known perfect/zero correlations; listwise null drop") {
    val rows = (1 to 40).map { i =>
      val x = i.toDouble
      // y = 2x + 3 (corr 1); z alternates independent of x (corr ~0)
      (x, 2.0 * x + 3.0, if (i % 2 == 0) 1.0 else -1.0)
    }
    val df = rows.toDF("x", "y", "z")
    val out = Audit.exactCorrelation(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(math.abs(out(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(out(("x", "z"))) < 0.05)
    // constant column -> zero variance -> NULL, not NaN/error
    val const = Audit.exactCorrelation(
      rows.map { case (x, y, _) => (x, y, 7.0) }.toDF("x", "y", "z"), Seq("x", "z"))
      .collect().head
    assert(const.isNullAt(3))
  }

  test("associationRules: support/confidence/lift floor arithmetic on a known basket set") {
    // baskets: {A,B}, {A,B}, {A,C}, {B} -> 4 baskets; A:3 B:3 C:1
    val df = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B"), (4L, "B") // dup item collapses
    ).toDF("basket", "item")
    val out = graft.ext.Behavior.associationRules(df, "basket", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // A->B: n_ab 2, support 2/4, conf 2/3, lift (2/3)/(3/4)
    assert(out(("A", "B")) == ((2L, 500000L, 666666L, 888L)))
    assert(out(("B", "A")) == ((2L, 500000L, 666666L, 888L)))
    // A->C: conf 1/3, lift (1/3)/(1/4) = 1.333
    assert(out(("A", "C")) == ((1L, 250000L, 333333L, 1333L)))
    assert(!out.contains(("B", "C")) && !out.contains(("C", "B")))
  }

  test("groupedTrend: recovers a planted slope/intercept; constant-x reads NULL") {
    // y = 7x + 100 exactly
    val rows = (0L to 20L).map(x => ("g", x, 7L * x + 100L)) ++
      Seq(("c", 5L, 1L), ("c", 5L, 9L)) // constant x -> undefined slope
    val out = Audit.groupedTrend(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    val (n, slope, icpt) = out("g")
    assert(n == 21L)
    assert(math.abs(slope.get.asInstanceOf[Double] - 7.0) < 1e-12)
    assert(math.abs(icpt.get.asInstanceOf[Double] - 100.0) < 1e-9)
    assert(out("c")._2.isEmpty && out("c")._3.isEmpty)
  }

  test("fillDailyGaps: interior missing days appear as zeros, bounds come from the data") {
    val daily = Seq(
      (Date.valueOf("2024-01-01"), 5L),
      (Date.valueOf("2024-01-04"), 2L)
    ).toDF("day", "n")
    val out = Audit.fillDailyGaps(daily, "day", Seq("n"))
      .orderBy($"day")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(out == Seq(
      ("2024-01-01", 5L), ("2024-01-02", 0L),
      ("2024-01-03", 0L), ("2024-01-04", 2L)))
  }

  test("checkConstraints: each check counts its violations; NULL violates value checks; unique counts extras") {
    import Audit.{Check => C}
    val df = Seq(
      (Some(1L), Some("alice"), "A", 10.0),
      (Some(1L), Some("bob"), "B", 20.0), // dup id
      (None, Some("carol"), "C", 30.0), // null id; C outside set
      (Some(3L), None, "A", -5.0), // null name (violates matches too); range low
      (Some(4L), Some("Dave"), "B", 200.0) // uppercase name fails regex; range high
    ).toDF("id", "name", "status", "score")
    val out = Audit.checkConstraints(df, Seq(
        C.notNull("id"),
        C.matches("name", "^[a-z]+$"),
        C.inSet("status", Seq("A", "B")),
        C.inRange("score", 0.0, 100.0)),
      unique = Seq(Seq("id")))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("not_null(id)") == ((1L, 0L)))
    assert(out("matches(name)") == ((2L, 0L))) // NULL name + "Dave"
    assert(out("in_set(status)") == ((1L, 0L)))
    assert(out("in_range(score)") == ((2L, 0L)))
    assert(out("unique(id)") == ((1L, 0L))) // two rows share id 1
    // and a passing check reads passed = 1
    val ok = Audit.checkConstraints(df, Seq(C.notNull("status")))
      .collect().head
    assert(ok.getLong(2) == 0L && ok.getLong(3) == 1L)
  }

  test("functionalDependencies: violations counted per determinant; NULL dependents are real mappings") {
    val df = Seq(
      (1L, Some("a")), (1L, Some("a")), // consistent
      (2L, Some("a")), (2L, Some("b")), // violating: two dependents
      (3L, None), (3L, Some("c")) // violating only if NULL counts
    ).toDF("k", "v")
    val out = Audit.functionalDependencies(df, Seq(("k", "v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head
    assert(out == (("k->v", 3L, 2L, 2L, 0L)), s"got $out")
    // a holding dependency reads holds = 1
    val ok = Audit.functionalDependencies(df.filter($"k" === 1L), Seq(("k", "v")))
      .collect().head
    assert(ok.getLong(2) == 0L && ok.getLong(4) == 1L)
  }

  test("candidateKeys: uniqueness verdict per column set; composite sets count combinations") {
    val df = Seq((1L, "x", "p"), (2L, "x", "q"), (3L, "y", "p"))
      .toDF("id", "a", "b")
    val out = Audit.candidateKeys(df, Seq(Seq("id"), Seq("a"), Seq("a", "b")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("id") == ((3L, 3L, 1L)))
    assert(out("a") == ((3L, 2L, 0L)))
    assert(out("a,b") == ((3L, 3L, 1L)), "the pair identifies rows where 'a' alone does not")
  }

  test("modeOf: highest count wins, ties break to the smallest value, NULLs excluded") {
    val df = Seq(
      ("g1", Some("b")), ("g1", Some("b")), ("g1", Some("a")),
      ("g2", Some("z")), ("g2", Some("a")), // tie at 1 -> "a"
      ("g3", None), ("g3", Some("x")) // NULL never the mode
    ).toDF("g", "v")
    val out = Audit.modeOf(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("g1" -> (("b", 2L)), "g2" -> (("a", 1L)), "g3" -> (("x", 1L))))
  }

  test("kAnonymity: group-size histogram with at-risk flag below k") {
    val df = Seq(
      ("US", "A"), ("US", "A"), ("US", "A"), // size-3 group
      ("US", "B"), // singleton
      ("DE", "A") // singleton
    ).toDF("country", "seg")
    val out = Audit.kAnonymity(df, Seq("country", "seg"), k = 2L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(1L -> ((2L, 2L, 1L)), 3L -> ((1L, 3L, 0L))))
  }

  test("tCloseness: matching distribution reads 0; skewed group reads its TV") {
    import spark.implicits._
    // global = {A:3, B:1}; g1 = {A,B} (TV 1/4), g2 = {A,A} (TV 1/4)
    val df = Seq(("g1", "A"), ("g1", "B"), ("g2", "A"), ("g2", "A"))
      .toDF("qi", "s")
    val out = Audit.tCloseness(df, Seq("qi"), "s")
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("tv_ppm"))).toMap
    assert(out == Map("g1" -> ((2L, 250000L)), "g2" -> ((2L, 250000L))))
    // identical groups ⇒ every group matches the global mix exactly
    val same = Seq(("g1", "A"), ("g1", "B"), ("g2", "A"), ("g2", "B")).toDF("qi", "s")
    assert(Audit.tCloseness(same, Seq("qi"), "s")
      .collect().forall(_.getAs[Long]("tv_ppm") == 0L))
  }

  test("tCloseness: NULL sensitive rows drop from both distributions") {
    import spark.implicits._
    val df = Seq(("g1", "A"), ("g1", "B"), ("g2", "A"), ("g2", "A"),
      ("g1", null: String)).toDF("qi", "s")
    val out = Audit.tCloseness(df, Seq("qi"), "s")
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("tv_ppm"))).toMap
    assert(out == Map("g1" -> ((2L, 250000L)), "g2" -> ((2L, 250000L))))
  }

  test("tCloseness: a group missing a global value pays the absent mass") {
    import spark.implicits._
    // global {A:2, B:2}; gA = {A,A}: TV = 1/2
    val df = Seq(("gA", "A"), ("gA", "A"), ("gB", "B"), ("gB", "B")).toDF("qi", "s")
    val out = Audit.tCloseness(df, Seq("qi"), "s")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("tv_ppm")).toMap
    assert(out == Map("gA" -> 500000L, "gB" -> 500000L))
  }

  test("concentration: monopoly reads 1e6, even split reads 1e6/n") {
    import spark.implicits._
    val mono = Audit.concentration(
      Seq(("a", 100L), ("b", 0L)).toDF("k", "v"), "k", "v").collect().head
    assert(mono.getAs[Long]("hhi_ppm") == 1000000L)
    assert(mono.getAs[Long]("top_share_ppm") == 1000000L)
    val even = Audit.concentration(
      (1 to 4).map(i => (s"k$i", 25L)).toDF("k", "v"), "k", "v").collect().head
    assert(even.getAs[Long]("n_keys") == 4L)
    assert(even.getAs[Long]("hhi_ppm") == 250000L)
    assert(even.getAs[Long]("top_share_ppm") == 250000L)
    // 80/20: HHI = 0.8^2 + 0.2^2 = 0.68
    val skew = Audit.concentration(
      Seq(("a", 80L), ("b", 20L)).toDF("k", "v"), "k", "v").collect().head
    assert(skew.getAs[Long]("hhi_ppm") == 680000L)
    assert(skew.getAs[Long]("top_share_ppm") == 800000L)
  }


  test("hellingerDrift: identical distributions read BC ~ 1e6 and H2 ~ 0") {
    import spark.implicits._
    // two groups with the same value distribution as the global
    val rows = for { g <- Seq("A", "B"); (v, n) <- Seq(("x", 6), ("y", 3), ("z", 1))
      ; _ <- 1 to n } yield (g, v)
    val out = Audit.hellingerDrift(rows.toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    // per-cell floors under-count by < 1 micro each (3 cells)
    Seq("A", "B").foreach { g =>
      assert(out(g).getAs[Long]("bc_ppm") >= 999997L &&
        out(g).getAs[Long]("bc_ppm") <= 1000000L, g)
      assert(out(g).getAs[Long]("h2_ppm") <= 3L, g)
    }
  }

  test("hellingerDrift: disjoint support reads BC 0 and hellinger 1000") {
    import spark.implicits._
    // group A only sees values the complement dominates: make A's
    // support disjoint from B's; A's BC vs the GLOBAL mix stays > 0,
    // so pin the exact arithmetic instead on a hand-computed case:
    // global = {x: 3, y: 1}; group A = {x: 1}; BC_A = sqrt(1 * 3/4)
    val rows = Seq(("A", "x"), ("B", "x"), ("B", "x"), ("B", "y"))
    val out = Audit.hellingerDrift(rows.toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val bcA = math.floor(1000000.0 * math.sqrt((1.0 / 1.0) * (3.0 / 4.0))).toLong
    assert(out("A").getAs[Long]("bc_ppm") == bcA)
    assert(out("A").getAs[Long]("h2_ppm") == 1000000L - bcA)
    assert(out("A").getAs[Long]("hellinger_milli") ==
      math.floor(math.sqrt((1000000L - bcA).toDouble)).toLong)
  }

  test("kAnonymityLattice: every node's profile matches a brute-force replay") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 8 rows over (zip, age): full zips nearly unique, 2-digit zips
    // form k>=2 groups, suppression is one group of 8
    val rows = Seq(
      ("10001", 25L), ("10001", 31L), ("10002", 25L), ("10002", 31L),
      ("20001", 42L), ("20001", 44L), ("20002", 42L), ("20003", 44L))
    val df = rows.toDF("zip", "age")
    val specs = Seq(
      "zip" -> Seq(col("zip"), substring(col("zip"), 1, 2), lit("*")),
      "age" -> Seq(col("age"), (col("age") / 10L).cast("long"), lit("*")))
    val out = Audit.kAnonymityLattice(df, specs, k = 2L)
      .collect().map(r => (r.getAs[Long]("lvl_zip"), r.getAs[Long]("lvl_age")) ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("min_group_size"),
          r.getAs[Long]("n_at_risk_rows"), r.getAs[Long]("k_anonymous"))).toMap
    assert(out.size == 9) // 3 x 3 lattice
    // brute-force each node with plain Scala
    val lvlZip = Seq[String => String](identity, _.take(2), _ => "*")
    val lvlAge = Seq[Long => String](_.toString, a => (a / 10).toString, _ => "*")
    for (a <- 0 to 2; b <- 0 to 2) {
      val sizes = rows.groupBy { case (z, g) => (lvlZip(a)(z), lvlAge(b)(g)) }
        .values.map(_.size.toLong)
      val expect = (sizes.size.toLong, sizes.min,
        sizes.filter(_ < 2L).sum, if (sizes.min >= 2L) 1L else 0L)
      assert(out((a.toLong, b.toLong)) == expect, s"node ($a,$b)")
    }
    // full suppression is always k-anonymous (one group of everything)
    assert(out((2L, 2L)) == ((1L, 8L, 0L, 1L)))
    // oversized lattice refuses by name
    val err = intercept[IllegalArgumentException] {
      Audit.kAnonymityLattice(df, specs, k = 2L, maxNodes = 4)
    }
    assert(err.getMessage.contains("maxNodes=4"))
  }

  test("kAnonymityLattice: a ladder level reading ANOTHER column fails loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // salary is NOT a QI — it is outside the joint level-0 cell key,
    // so a ladder level reading it varies within a cell
    val df = Seq(("10001", 25L, 50L), ("10001", 25L, 70L), ("10002", 25L, 50L))
      .toDF("zip", "age", "salary")
    // level 1 of 'zip' illegally reads salary — two distinct
    // generalized values inside the (zip=10001, age=25) level-0 cell;
    // the r12 advice case: this used to silently produce wrong n_groups
    val badSpecs = Seq(
      "zip" -> Seq(col("zip"), col("salary").cast("string")),
      "age" -> Seq(col("age")))
    val err = intercept[Exception] {
      Audit.kAnonymityLattice(df, badSpecs, k = 2L).collect()
    }
    val msg = Option(err.getMessage).getOrElse("") +
      Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("not a deterministic function"), msg)
    // nullness varying within a cell is caught too (min/max alone skip
    // nulls and would miss it)
    val badNull = Seq(
      "zip" -> Seq(col("zip"),
        when(col("salary") === 50L, lit(null).cast("string"))
          .otherwise(substring(col("zip"), 1, 2))),
      "age" -> Seq(col("age")))
    val err2 = intercept[Exception] {
      Audit.kAnonymityLattice(df, badNull, k = 2L).collect()
    }
    val msg2 = Option(err2.getMessage).getOrElse("") +
      Option(err2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("not a deterministic function"), msg2)
  }
}
