package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Queries are fully
  * materialized through the `noop` sink (count() alone would let
  * Catalyst prune projections and under-report work). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (executor start, codegen compiler, parquet
    // footer cache) so the first timed query isn't charged for it
    SparkEntry.queries.get("q01_count")
      .foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => () })
    // Two timed runs per query, report the MIN — but as two full
    // PASSES over the suite, not back-to-back repeats. min-of-2 only
    // rejects noise the two samples don't share: back-to-back runs sit
    // inside the same ambient-load burst on this shared box (r4: q69
    // 46.9 s driver-run vs 1.6 s clean — BOTH back-to-back runs were
    // inside the burst, so min kept the inflated number). Interleaving
    // puts a query's two samples minutes apart, so any burst shorter
    // than a pass inflates at most one of them. A third, targeted pass
    // re-times only queries whose two samples still disagree ≥1.5× —
    // bounded extra cost, and it converts "burst longer than a pass"
    // into three load-independent samples.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name // a failed query must not read as a fast one
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      // queries are independent; drop any intermediate persists (LSH
      // signatures etc.) so memory stays flat across the suite
      spark.catalog.clearCache()
      t
    }
    // dev-only filter (comma substrings) for targeted local timing —
    // the driver never sets it, so the gate always runs the full suite
    val onlyPats = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').toSeq).getOrElse(Nil)
    val order = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => onlyPats.isEmpty || onlyPats.exists(n.contains) }
    // the stdout line keys queries by qNN prefix — fail BEFORE the
    // first timed pass (the keys are known now; discovering a
    // duplicate after minutes of measurement would waste the run and
    // emit no JSON at all)
    locally {
      val shortKeys = order.map(_._1.takeWhile(_ != '_'))
      val dups = shortKeys.diff(shortKeys.distinct).distinct
      require(dups.isEmpty, s"duplicate short bench keys: ${dups.mkString(",")}")
    }
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // PARTIAL-RESULT GUARANTEE (r14 lesson: the driver's timeout
    // SIGTERM'd the run mid-suite and the round's bench artifact was
    // rc=124 with parsed:null — no per-query data at all). A shutdown
    // hook flushes a VALID compact JSON line (completed-query total +
    // counts + truncated:true) and writes the per-query partial to
    // bench_out.json, so a timeout can never again yield an artifact
    // with nothing in it. `samples` is only touched under `lock`; the
    // hook is disarmed before the normal final print (one JSON line
    // per invocation either way).
    val lock = new Object
    @volatile var finished = false
    def partialJson(full: Boolean): String = lock.synchronized {
      val done = order.collect {
        case (k, _) if samples(k).nonEmpty || failed.contains(k) =>
          k -> (if (failed.contains(k)) -1.0 else samples(k).min)
      }
      val total = done.collect { case (_, v) if v >= 0 => v }.sum
      val failedJson0 = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      // locale-proof decimal formatting (the f interpolator follows the
      // JVM default locale; a comma decimal would corrupt the JSON)
      def d3(v: Double): String = BigDecimal(v)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
      val per = if (!full) "" else ",\"queries\":" + done.map { case (k, v) =>
        "\"" + k + "\":" + (if (v < 0) "null" else d3(v))
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${d3(total)},"unit":"sec","mode":"min_interleaved_2","truncated":true,"n_done":${done.size},"n_queries":${order.size},"failed":$failedJson0$per,"sf":"$sfDir"}"""
    }
    val hook = new Thread(() => if (!finished) {
      println(partialJson(full = false))
      System.out.flush()
      try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
        partialJson(full = true).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
    })
    Runtime.getRuntime.addShutdownHook(hook)
    // SELF-BUDGET (r15, the robust half of the r14 rc=124 fix): the
    // hook only helps if the SIGTERM reaches this forked JVM and hooks
    // get to run — the sure fix is to never meet the driver's timeout
    // at all. A wall budget (SPARK_GRAFT_BENCH_BUDGET_S, default
    // 1320 s ≈ 22 min — under any plausible driver timeout with
    // startup margin) DEGRADES the protocol instead of dying: past
    // the budget, pass 2/3 re-timings stop (a query keeps its pass-1
    // sample — min-of-2 merely loses its second, load-independent
    // sample) and, only if even pass 1 cannot finish on a pathological
    // box, the un-run tail reports null and is listed in "skipped".
    // Either way the process EXITS CLEANLY with a valid JSON line.
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1320").toDouble
    val tStart = System.nanoTime()
    def overBudget: Boolean = (System.nanoTime() - tStart) / 1e9 > budgetS
    val skipped = scala.collection.mutable.LinkedHashSet.empty[String]
    for (pass <- 0 until 2; (name, fn) <- order) {
      if (overBudget) {
        if (pass == 0 && samples(name).isEmpty && !failed.contains(name))
          skipped += name
      } else {
        val t = timeOne(name, fn)
        lock.synchronized { samples(name) ::= t }
      }
    }
    for ((name, fn) <- order if !overBudget) {
      val ts = samples(name)
      if (ts.nonEmpty && !failed.contains(name) &&
          ts.min > 0.3 && ts.max / ts.min >= 1.5) {
        val t = timeOne(name, fn)
        lock.synchronized { samples(name) ::= t }
      }
    }
    finished = true
    try Runtime.getRuntime.removeShutdownHook(hook)
    catch { case _: IllegalStateException => () } // already shutting down
    val results = order.map { case (name, _) =>
      val ts = samples(name)
      name -> (if (ts.isEmpty) Double.NaN else ts.min)
    }
    // a failed query's time-to-failure is noise, not cost: report it as
    // null and keep the headline total an aggregate of SUCCESSFUL runs
    // trailing zeros stripped ("0.50" -> "0.5", "2.00" -> "2"): at 150+
    // queries the stdout line is ~50 chars from the driver's 2000-char
    // tail window, and every saved char is margin against truncation
    def fmt(v: Double, scale: Int): String = {
      val s = BigDecimal(v)
        .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    }
    def entries(short: Boolean, scale: Int) = results.map { case (k, v) =>
      val key = if (short) k.takeWhile(_ != '_') else k
      "\"" + key + "\":" + (if (failed.contains(k) || skipped.contains(k) ||
        v.isNaN) "null" else fmt(v, scale))
    }.mkString("{", ",", "}")
    val total = results.collect {
      case (k, v) if !failed.contains(k) && !skipped.contains(k) && !v.isNaN => v
    }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // only surfaced when the budget actually degraded the run — the
    // normal artifact stays byte-compatible with earlier rounds. The
    // full skipped list goes to the LONG line / bench_out.json only;
    // the compact tail-window line carries just the count (a 200-name
    // array would re-create the very truncation the line exists to
    // survive).
    // a budget trip mid-pass-2 leaves some queries with ONE sample
    // (min-of-1 reads hotter than min-of-2) — surface the count so a
    // degraded total is never mistaken for a comparable one
    val singleSample = order.count { case (n, _) =>
      !failed.contains(n) && !skipped.contains(n) && samples(n).size == 1 }
    val degraded = skipped.nonEmpty || (overBudget && singleSample > 0)
    val skippedJson = if (!degraded) ""
      else ",\"budget_degraded\":true,\"n_single_sample\":" + singleSample +
        ",\"skipped\":" + skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
    val skippedCompact = if (!degraded) ""
      else s""","budget_degraded":true,"n_single_sample":$singleSample,"n_skipped":${skipped.size}"""
    def json(short: Boolean, scale: Int) =
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","mode":"min_interleaved_2","failed":$failedJson$skippedJson,"queries":${entries(short, scale)},"sf":"$sfDir"}"""
    // The driver captures only the LAST ~2000 chars of sbt output and
    // parses the JSON line out of it: with 90+ queries, full names +
    // full-precision doubles overflow that window (round 3's line was
    // truncated mid-line → parsed:null; round 8's 122-query 3-decimal
    // line left only ~150 chars of margin after sbt's `[info] ` prefix
    // and `[success]` trailer, and parsed:null again). The stdout line
    // therefore uses short qNN keys (unique by construction) and
    // 2-decimal values (~1.5 KB incl. prefix+trailer); the full-name,
    // 3-decimal version goes to bench_out.json.
    println(json(short = true, scale = 2))
    // At 173 queries even the short-key 2-decimal line is ~2.2 KB —
    // past the driver's ~2000-char tail window, so ITS start truncates
    // (r08/r09 recorded parsed:null with the line fully present; a
    // longer line only makes that worse). Emit a SECOND, compact
    // summary line afterwards: whatever the tail window cuts, the
    // final metric line is ~150 chars of guaranteed-parseable JSON
    // with the headline total and the failed list; per-query values
    // live in bench_out.json and in the (mostly visible) long line.
    println(s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","mode":"min_interleaved_2","n_queries":${results.size},"failed":$failedJson$skippedCompact,"sf":"$sfDir"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      json(short = false, scale = 3).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
