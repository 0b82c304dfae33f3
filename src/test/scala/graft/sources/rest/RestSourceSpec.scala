package graft.sources.rest

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RestSourceSpec extends SparkSpec {
  import spark.implicits._

  private def reader(org: String, n: Int = 500) =
    spark.read.format("graft-rest")
      .option("object", "account").option("org", org)
      .option("numRecords", n.toString).option("seed", "42")

  test("schema inference from describe (S4)") {
    val df = reader("t-schema").load()
    assert(df.schema.fieldNames.toSeq == Seq("Id", "Name", "Industry", "Amount",
      "NumEmployees", "IsActive", "LastModifiedDate", "IsDeleted"))
    assert(df.schema("LastModifiedDate").dataType.typeName == "timestamp")
  }

  test("deterministic full read; two-phase partitioning = ceil(n/batchSize) fetches (S6)") {
    FakeTransport.CallLog.clear()
    val df = reader("t-read").load()
    // collect(), not count() — a bare count() now collapses to the
    // pushed stats probe and never runs the two-phase scan this test
    // is about
    assert(df.collect().length == 500)
    // phase 2 ran once per 100-id batch
    assert(FakeTransport.CallLog.fetchCount == 5)
    // deterministic content
    val r = df.filter($"Id" === "00A0000007")
      .select("Name", "IsDeleted").first()
    assert(r.getString(0) == "Account 7" && !r.getBoolean(1))
  }

  test("filter pushdown reaches the remote query; unsupported filters stay post-scan") {
    FakeTransport.CallLog.clear()
    val df = reader("t-push").load()
      .filter($"Amount" > 5000.0 && $"Industry" === "Banking")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(Amount,5000.0)"), plan)
    assert(plan.contains("EqualTo(Industry,Banking)"), plan)
    val n = df.count()
    // the transport only saw matching ids — fetched row count == result count
    val expected = reader("t-push").load().collect()
      .count(r => r.getDouble(3) > 5000.0 && r.getString(2) == "Banking")
    assert(n == expected && n > 0)
  }

  test("column pruning: phase-2 fetch requests only the projected columns") {
    FakeTransport.CallLog.clear()
    val df = reader("t-prune").load().select("Id", "Name")
    df.collect()
    val fetches = FakeTransport.CallLog.fetches.toArray.map(_.toString)
    assert(fetches.nonEmpty)
    assert(fetches.forall(_.endsWith("cols=Id,Name")), fetches.mkString(";"))
  }

  test("limit pushdown caps the id scan (S6 LIMIT, main.py:142-143)") {
    FakeTransport.CallLog.clear()
    val df = reader("t-limit").load().limit(30)
    assert(df.count() == 30)
    assert(FakeTransport.CallLog.fetchCount == 1) // one 30-id batch, not 5
  }

  test("date-window incremental pull (S6 start/end date semantics)") {
    // records are modified 1/minute from 2024-01-01; take a 1h window
    val df = reader("t-window").load()
      .filter($"LastModifiedDate" >= "2024-01-01 01:00:00" &&
        $"LastModifiedDate" < "2024-01-01 02:00:00")
    assert(df.count() == 60)
  }

  test("include_deleted=false filters soft-deleted (query vs queryAll, main.py:150)") {
    val all = reader("t-del").load().count()
    val live = reader("t-del").option("includeDeleted", "false").load().count()
    assert(all == 500 && live == 490) // every 50th record is soft-deleted
  }

  test("S7 stats probe counts remotely without a scan") {
    assert(RestOps.sobjectSize(
      Map("org" -> "t-stats", "numrecords" -> "500", "seed" -> "42"), "account") == 500)
    assert(RestOps.listObjects(Map("org" -> "t-stats")) == Seq("account", "contact"))
  }

  test("aggregate pushdown: global COUNT/MIN/MAX collapse to ONE stats probe (S7 via SQL)") {
    FakeTransport.CallLog.clear()
    val df = reader("t-aggpush").load()
    val agg = df.agg(count(lit(1)).as("n"), count($"Industry").as("n_ind"),
      min($"Amount").as("min_amt"), max($"Amount").as("max_amt"),
      max($"NumEmployees").as("max_emp"), min($"Name").as("min_name"))
    assert(agg.queryExecution.executedPlan.toString.contains("AGGREGATE PUSHED"),
      agg.queryExecution.executedPlan.toString)
    val r = agg.collect().head
    // ONE remote probe; the id cursor and the row fetch never ran
    assert(FakeTransport.CallLog.stats.size == 1, FakeTransport.CallLog.stats)
    assert(FakeTransport.CallLog.idQueries.isEmpty)
    assert(FakeTransport.CallLog.fetches.isEmpty)
    // values equal a full-scan recomputation
    val full = reader("t-aggpush").load().collect()
    assert(r.getAs[Long]("n") == 500L && r.getAs[Long]("n_ind") == 500L)
    assert(r.getAs[Double]("min_amt") == full.map(_.getDouble(3)).min)
    assert(r.getAs[Double]("max_amt") == full.map(_.getDouble(3)).max)
    assert(r.getAs[Long]("max_emp") == full.map(_.getLong(4)).max)
    assert(r.getAs[String]("min_name") == "Account 0")
  }

  test("GROUP BY aggregate pushdown: grouped COUNT/MIN/MAX collapse to ONE grouped probe (S7b)") {
    FakeTransport.CallLog.clear()
    val df = reader("t-aggby").load()
    val agg = df.filter($"IsActive" === true)
      .groupBy($"Industry")
      .agg(count(lit(1)).as("n"), min($"Amount").as("min_amt"),
        max($"NumEmployees").as("max_emp"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("AGGREGATE PUSHED") && plan.contains("GROUP BY [Industry]"),
      plan)
    val rows = agg.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(FakeTransport.CallLog.stats.size == 1, FakeTransport.CallLog.stats)
    assert(FakeTransport.CallLog.idQueries.isEmpty)
    assert(FakeTransport.CallLog.fetches.isEmpty)
    // parity vs a full-scan recomputation of the same grouped aggregate
    val full = reader("t-aggby").load().collect()
      .filter(_.getAs[Boolean]("IsActive"))
      .groupBy(_.getString(2))
    assert(rows.keySet == full.keySet)
    full.foreach { case (ind, rs) =>
      val (n, minAmt, maxEmp) = rows(ind)
      assert(n == rs.length.toLong, s"$ind count")
      assert(minAmt == rs.map(_.getDouble(3)).min, s"$ind min")
      assert(maxEmp == rs.map(_.getLong(4)).max, s"$ind max")
    }
  }

  test("aggregate pushdown composes with pushed filters; unsupported shapes fall back") {
    FakeTransport.CallLog.clear()
    val filtered = reader("t-aggfil").load()
      .filter($"Industry" === "Banking")
      .agg(count(lit(1)).as("n"))
    val n = filtered.collect().head.getAs[Long]("n")
    assert(FakeTransport.CallLog.stats.size == 1)
    assert(FakeTransport.CallLog.idQueries.isEmpty)
    val expected = reader("t-aggfil").load().collect()
      .count(_.getString(2) == "Banking")
    assert(n == expected && n > 0)
    // group-by on a plain column: pushed as ONE grouped probe (r13 —
    // SOQL GROUP BY); the cursor walk never runs
    FakeTransport.CallLog.clear()
    val grouped = reader("t-agggrp").load()
      .groupBy($"Industry").agg(count(lit(1)).as("n")).collect()
    assert(grouped.length == 6)
    assert(FakeTransport.CallLog.stats.size == 1, FakeTransport.CallLog.stats)
    assert(FakeTransport.CallLog.idQueries.isEmpty)
    // distinct count: NOT pushed
    FakeTransport.CallLog.clear()
    val nd = reader("t-aggdst").load()
      .agg(countDistinct($"Industry").as("n")).collect().head.getAs[Long]("n")
    assert(nd == 6L)
    assert(FakeTransport.CallLog.stats.isEmpty)
  }

  test("aggregate pushdown respects includeDeleted like the scan path") {
    FakeTransport.CallLog.clear()
    val n = reader("t-aggdel").load().agg(count(lit(1))).collect().head.getLong(0)
    val nLive = spark.read.format("graft-rest")
      .option("object", "account").option("org", "t-aggdel")
      .option("numRecords", "500").option("seed", "42")
      .option("includeDeleted", "false").load()
      .agg(count(lit(1))).collect().head.getLong(0)
    assert(FakeTransport.CallLog.stats.size == 2)
    assert(n == 500L && nLive == 490L) // every 50th record is soft-deleted
  }

  test("S5 quota probe + S1 environment fallback") {
    val lim = RestOps.limits(Map("org" -> "t-quota"))
    assert(lim("DailyApiRequests.Max") == 100000L)
    assert(lim("DailyApiRequests.Remaining") <= lim("DailyApiRequests.Max"))
    assert(new FakeTransport("t-auth", 10, 42, "login").authenticatedEnv == "login")
    assert(new FakeTransport("t-auth", 10, 42, "weird").authenticatedEnv == "test")
  }

  test("quota admission: the scan refuses up front when remaining quota is under the floor") {
    // the fake org's remaining quota is just under 100000; a floor above
    // it must abort BEFORE the id cursor spends anything
    FakeTransport.CallLog.clear()
    val ex = intercept[Exception] {
      reader("t-admit").option("minRemainingQuota", "200000").load().collect()
    }
    assert(ex.getMessage.contains("refusing to start the scan"), ex.getMessage)
    assert(FakeTransport.CallLog.idQueries.isEmpty,
      "the id cursor must not run after a quota refusal")
    // a floor below the remaining quota admits the scan
    assert(reader("t-admit", 100).option("minRemainingQuota", "10")
      .load().collect().length == 100)
    // the PUSHED-AGGREGATE scan honors the same floor: count() collapses
    // to one remote stats probe, but a probe is still a remote call —
    // the quota refusal must hold no matter which physical scan the
    // optimizer picks (r12 advice: RestAggScan used to bypass this)
    FakeTransport.CallLog.clear()
    val exAgg = intercept[Exception] {
      reader("t-admit").option("minRemainingQuota", "200000").load().count()
    }
    assert(exAgg.getMessage.contains("pushed-aggregate"), exAgg.getMessage)
    assert(FakeTransport.CallLog.stats.isEmpty,
      "the stats probe must not run after a quota refusal")
    assert(reader("t-admit", 100).option("minRemainingQuota", "10")
      .load().count() == 100)
  }

  test("maxPartitions caps phase-2 API spend; maxIds is the driver-memory cap") {
    // 500 ids / batchSize 100 = 5 partitions; a 2-partition budget must
    // refuse (trimming would silently drop rows) with an actionable error
    val ex = intercept[Exception] {
      reader("t-cap").option("maxPartitions", "2").load().collect()
    }
    assert(ex.getMessage.contains("API-budget cap"), ex.getMessage)
    val ex2 = intercept[Exception] {
      reader("t-cap").option("maxIds", "300").load().collect()
    }
    assert(ex2.getMessage.contains("driver-memory cap"), ex2.getMessage)
    // under the caps the same scan runs (collect: the caps guard the
    // cursor walk, which a pushed count() never takes)
    assert(reader("t-cap").option("maxPartitions", "5")
      .option("maxIds", "500").load().collect().length == 500)
  }

  test("API-spend custom metrics: fetch calls per task, planned partitions from the driver") {
    val opts = Map("object" -> "account", "org" -> "t-metrics",
      "numrecords" -> "250", "seed" -> "42")
    val schema = RestTable.schemaFor(RestTable.transportFor(opts), "account")
    val scan = new RestScanBuilder(schema, opts, "account").build()
    assert(scan.supportedCustomMetrics().map(_.name()).toSet ==
      Set("restApiCalls", "restPlannedPartitions", "restRetries"))
    val batch = scan.toBatch
    val parts = batch.planInputPartitions()
    assert(parts.length == 3) // ceil(250/100)
    assert(scan.asInstanceOf[RestScan].reportDriverMetrics()
      .exists(m => m.name() == "restPlannedPartitions" && m.value() == 3L))
    // a reader that fetched its batch reports exactly one API call
    val rdr = batch.createReaderFactory().createReader(parts(0))
    var n = 0
    while (rdr.next()) n += 1
    assert(n == 100)
    val mv = rdr.currentMetricsValues()
    assert(mv.exists(m => m.name() == "restApiCalls" && m.value() == 1L))
  }

  test("streaming micro-batch read: the date cursor is the offset (S6 as CDC)") {
    // unit-level: the stream plans (lo, hi] windows into id-batch partitions
    val opts = Map("org" -> "t-stream", "numrecords" -> "300", "seed" -> "42",
      "object" -> "account")
    val stream = new RestMicroBatchStream(
      RestTable.schemaFor(RestTable.transportFor(opts), "account"), opts,
      "account", "/tmp/ckpt-unused")
    val latest = stream.latestOffset().asInstanceOf[RestOffset]
    assert(latest.micros == FakeTransport.BaseMicros + 299 * 60L * 1000000L)
    val all = stream.planInputPartitions(RestOffset(0L), latest)
    assert(all.map(_.asInstanceOf[RestInputPartition].ids.length).sum == 300)
    assert(all.length == 3) // 300 ids / batchSize 100
    // a narrower window: records 101..200 (minutes 101..200 inclusive)
    val lo = FakeTransport.BaseMicros + 100 * 60L * 1000000L
    val hi = FakeTransport.BaseMicros + 200 * 60L * 1000000L
    val windowed = stream.planInputPartitions(RestOffset(lo), RestOffset(hi))
    assert(windowed.map(_.asInstanceOf[RestInputPartition].ids.length).sum == 100)
    assert(stream.planInputPartitions(latest, latest).isEmpty)

    // end-to-end: readStream through the connector, one AvailableNow pass
    val q = spark.readStream.format("graft-rest")
      .option("object", "account").option("org", "t-stream")
      .option("numRecords", "300").option("seed", "42")
      .load()
      .groupBy($"Industry").count()
      .writeStream.format("memory").queryName("rest_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.table("rest_stream").agg(sum($"count")).first().getLong(0) == 300L)
  }

  test("DSv2 batch write upserts; read-your-writes through the connector (S8)") {
    FakeTransport.Store.clear("t-write")
    val updates = Seq(("00A0000003", "Renamed 3")).toDF("Id", "Name")
    updates.write.format("graft-rest")
      .option("object", "account").option("org", "t-write")
      .option("numRecords", "500").option("seed", "42")
      .mode("append").save()
    val after = reader("t-write").load()
      .filter($"Id" === "00A0000003").select("Name", "Amount").first()
    assert(after.getString(0) == "Renamed 3")
    assert(!after.isNullAt(1)) // untouched fields preserved (PATCH semantics)
  }

  test("throttled scan completes: 429s are retried per-partition, result identical, retries in metrics") {
    FakeTransport.CallLog.clear()
    val clean = reader("t-throttle").load().collect().map(_.getString(0)).sorted
    // every transport instance (planner + each partition reader)
    // bounces its first 2 calls with 429 Retry-After:0
    val throttled = reader("t-throttle")
      .option("throttleFirst", "2").option("maxRetries", "3")
      .option("retryBaseMs", "0").option("retryMaxMs", "0")
      .load()
    assert(throttled.collect().map(_.getString(0)).sorted.toSeq == clean.toSeq)
    // throttles actually happened (planner cursor + 5 fetch partitions)
    assert(FakeTransport.CallLog.throttles.size >= 3,
      FakeTransport.CallLog.throttles)
    // the reader surfaces its retry spend as the restRetries task metric
    val opts = Map("object" -> "account", "org" -> "t-throttle2",
      "numrecords" -> "100", "seed" -> "42", "throttlefirst" -> "1",
      "maxretries" -> "3", "retrybasems" -> "0", "retrymaxms" -> "0")
    val schema = RestTable.schemaFor(RestTable.transportFor(
      opts - "throttlefirst"), "account")
    val scan = new RestScanBuilder(schema, opts, "account").build()
    val batch = scan.toBatch
    val parts = batch.planInputPartitions()
    val rdr = batch.createReaderFactory().createReader(parts(0))
    var n = 0
    while (rdr.next()) n += 1
    assert(n == 100)
    assert(rdr.currentMetricsValues()
      .exists(m => m.name() == "restRetries" && m.value() == 1L))
    assert(scan.asInstanceOf[RestScan].reportDriverMetrics()
      .exists(m => m.name() == "restRetries" && m.value() == 1L))
  }

  test("retry budget exhausted: the scan fails LOUDLY with the throttle error, never truncates") {
    val e = intercept[Exception] {
      reader("t-throttle3")
        .option("throttleFirst", "3").option("maxRetries", "1")
        .option("retryBaseMs", "0").option("retryMaxMs", "0")
        .load().collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("REQUEST_LIMIT_EXCEEDED") || msg.contains("429"), e.toString)
    // maxRetries=0 reproduces the reference's raise-on-anything discipline
    intercept[Exception] {
      reader("t-throttle4").option("throttleFirst", "1")
        .option("maxRetries", "0").load().collect()
    }
  }

  test("throttled write completes: 429 on upsert retries instead of marking the record failed") {
    FakeTransport.Store.clear("t-throttle-w")
    FakeTransport.CallLog.clear()
    val updates = Seq(("00A0000004", "Renamed 4")).toDF("Id", "Name")
    updates.coalesce(1).write.format("graft-rest")
      .option("object", "account").option("org", "t-throttle-w")
      .option("numRecords", "50").option("seed", "42")
      .option("throttleFirst", "1").option("maxRetries", "2")
      .option("retryBaseMs", "0").option("retryMaxMs", "0")
      .mode("append").save()
    assert(FakeTransport.CallLog.throttles.size == 1)
    val after = reader("t-throttle-w", 50).load()
      .filter($"Id" === "00A0000004").select("Name").first()
    assert(after.getString(0) == "Renamed 4") // retried, not dropped
  }

  test("write-then-report: per-record status envelope, errors never throw (S8/S9)") {
    FakeTransport.Store.clear("t-status")
    val recs = Seq(
      ("00A0000001", "ok update"),
      ("BAD-ID", "malformed"),
      (null.asInstanceOf[String], "fresh insert")
    ).toDF("Id", "Name")
    val status = RestOps.upsertWithStatus(recs, "account",
      Map("org" -> "t-status", "numrecords" -> "500", "seed" -> "42"))
      .collect().map(r => (r.getAs[String]("record_id"), r.getAs[Boolean]("success"),
        r.getAs[String]("error")))
    assert(status.count(_._2) == 2)
    val failed = status.find(!_._2).get
    assert(failed._1 == "BAD-ID" && failed._3.startsWith("MALFORMED_ID"))
    val inserted = status.find(s => s._2 && s._1.startsWith("NEW")).get
    assert(inserted._3 == null)
  }
}
