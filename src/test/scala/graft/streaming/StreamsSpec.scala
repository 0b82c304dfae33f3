package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  private def mkEvents(rows: (Long, String, Long, String, Double)*) =
    rows.map(r => (r._1, ts(r._2), r._3, r._4, r._5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sessionizeBatch: micros-exact gap — 1µs past the gap opens a session, at/under it does not") {
    def tsUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val base = ts("2024-01-01 10:00:00").getTime * 1000L
    val gapUs = 30L * 60000000L
    val ev = Seq(
      (1L, tsUs(base)), (1L, tsUs(base + gapUs + 1L)),  // 1µs OVER  → new session
      (2L, tsUs(base)), (2L, tsUs(base + gapUs)),       // exactly   → same session (strict >)
      (3L, tsUs(base)), (3L, tsUs(base + gapUs - 1L)))  // 1µs under → same session
      .toDF("user_id", "ts")
    val sessions = Streams.sessionizeBatch(ev, "ts", "user_id", gapMinutes = 30)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(sessions == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("sessionAgg (session_window) == sessionizeBatch on the events fixture — batch↔streaming parity") {
    // the q37/q87-style contract for sessions: the streaming operator
    // run in batch mode and the gaps-and-islands batch twin agree on
    // (user, session_start, event count). session_end differs by
    // construction (session_window pads last_ts + gap; the batch twin
    // reports max(ts)), so it is excluded. The two differ only on
    // gaps of EXACTLY 30 minutes (>= vs >), which the fixture lacks.
    val ev = graft.core.Fx.t(spark, sfDir, "events")
    val viaWindow = Streams.sessionAgg(ev, "ts", "30 minutes")
      .select(col("user_id"), col("session_start"), col("n"))
      .as[(Long, Timestamp, Long)].collect().toSet
    val viaBatch = Streams.sessionizeBatch(ev, "ts", "user_id", gapMinutes = 30)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .as[(Long, Timestamp, Long)].collect().toSet
    assert(viaWindow.nonEmpty)
    assert(viaWindow == viaBatch)
  }

  test("sessionizeBatch: new session after gap; counts per session") {
    val ev = mkEvents(
      (1, "2024-01-01 10:00:00", 1, "a", 1.0),
      (2, "2024-01-01 10:10:00", 1, "a", 1.0),  // same session (10m gap)
      (3, "2024-01-01 11:00:00", 1, "a", 1.0),  // new session (50m > 30m)
      (4, "2024-01-01 10:00:00", 2, "a", 1.0))
    val out = Streams.sessionizeBatch(ev, "ts", "user_id", gapMinutes = 30)
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("tumblingAgg over a real stream: watermarked windowed counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = Streams.tumblingAgg(events, "ts", "10 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:01:00"), "a", 1.0),
        (2L, ts("2024-01-01 10:02:00"), "a", 2.0),
        (3L, ts("2024-01-01 10:11:00"), "b", 3.0))
      q.processAllAvailable()
      // advance watermark past the first window so it emits in Append mode
      mem.addData((4L, ts("2024-01-01 10:30:00"), "b", 4.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .select("window_start", "event_type", "n", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows.contains((ts("2024-01-01 10:00:00"), "a", 2L, 3.0)))
      assert(rows.contains((ts("2024-01-01 10:10:00"), "b", 1L, 3.0)))
    } finally q.stop()
  }

  test("sessionAgg over a real stream: events merge into one session, watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "user_id", "value")
    val q = Streams.sessionAgg(events, "ts", "30 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append).start()
    try {
      // two events 10m apart extend ONE session; the third (same user,
      // 50m later) starts a new one
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, 1.0),
        (2L, ts("2024-01-01 10:10:00"), 1L, 2.0),
        (3L, ts("2024-01-01 11:00:00"), 1L, 4.0))
      q.processAllAvailable()
      // advance the watermark past session 1's close (10:40) so Append
      // mode emits it
      mem.addData((4L, ts("2024-01-01 12:00:00"), 2L, 8.0))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .select("user_id", "session_start", "session_end", "n", "sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      // session 1: [10:00, last_ts 10:10 + 30m gap) with both events
      assert(rows.contains((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:40:00"), 2L, 3.0)), rows.toString)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops re-deliveries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("event_id", "ts")
    val q = Streams.dedupWithinWatermark(events, "ts", Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 10:00:00"))) // duplicate within watermark
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == 2)
    } finally q.stop()
  }

  test("latestPerKey: streaming upsert changelog — newer wins, late events absorbed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.UserEvent]
    val q = Streams.latestPerKey(mem.toDS())
      .writeStream.format("memory").queryName("latest_test")
      .outputMode("append").start()
    try {
      mem.addData(
        Streams.UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        Streams.UserEvent(1L, ts("2024-01-01 11:00:00"), 2.0))
      q.processAllAvailable()
      // batch 2: a LATE event for user 1 (beyond the watermark —
      // dropped by the watermark filter) + a new user within it
      mem.addData(
        Streams.UserEvent(1L, ts("2024-01-01 09:00:00"), 0.5),
        Streams.UserEvent(2L, ts("2024-01-01 11:30:00"), 7.0))
      q.processAllAvailable()
      // batch 3: a genuinely newer event for user 1 -> one more emission
      mem.addData(Streams.UserEvent(1L, ts("2024-01-01 12:00:00"), 3.0))
      q.processAllAvailable()
      val out = spark.table("latest_test").as[Streams.UserEvent].collect()
      val byUser = out.groupBy(_.user_id)
      // user 1: emitted at 11:00 (batch 1) and 12:00 (batch 3), NOT for the late 09:00
      assert(byUser(1L).map(_.value).sorted.toSeq == Seq(2.0, 3.0))
      assert(byUser(2L).map(_.value).toSeq == Seq(7.0))
    } finally q.stop()
  }

  test("materializeLatest: stream → latest-per-key changelog → snapshot-store upsert (CDC loop)") {
    implicit val sqlCtx = spark.sqlContext
    val dbRoot = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val db = new graft.Database(spark, dbRoot)
    val mem = MemoryStream[Streams.UserEvent]
    val q = Streams.materializeLatest(mem.toDS(), db, "user_latest", ckpt)
    try {
      mem.addData(
        Streams.UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        Streams.UserEvent(2L, ts("2024-01-01 10:30:00"), 7.0))
      q.processAllAvailable()
      assert(db.getTableCount("user_latest") == 2)
      // a newer event for user 1 advances the materialized row
      mem.addData(Streams.UserEvent(1L, ts("2024-01-01 11:00:00"), 2.0))
      q.processAllAvailable()
      val rows = db.getTable("user_latest")
        .select("user_id", "value").as[(Long, Double)].collect().toMap
      assert(rows == Map(1L -> 2.0, 2L -> 7.0))
      assert(db.getTableCount("user_latest") == 2) // upsert, not append
    } finally q.stop()
  }

  test("streaming near-dup ingest: 2+ micro-batches against ONE persisted corpus signature frame") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ext.Dedup
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight again"),
      (200L, "completely different content describing spark execution plans here"))
      .toDF("doc_id", "text")
    // the ingest-loop contract: corpus signatures computed ONCE,
    // persisted, shared by every epoch
    val corpusSigs = Dedup.minhashSignature(corpus, "doc_id", "text", k = 16)
      .persist()
    corpusSigs.count() // materialize before the stream starts
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-nd-ckpt").toString
      val mem = MemoryStream[(Long, String)]
      val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var epochs = 0
      val q = Streams.nearDupIngest(
        mem.toDS().toDF("doc_id", "text"), corpusSigs, corpus,
        "doc_id", "text", ckpt, threshold = 0.5, k = 16, bands = 4) {
        (pairs, _) =>
          flagged ++= pairs.select("a", "b").as[(Long, Long)].collect()
          epochs += 1
      }
      try {
        // epoch 1: a light rewrite of corpus doc 100 (first word dropped)
        // plus a novel doc
        mem.addData(
          (1L, "quick brown fox jumps over the lazy dog tonight again"),
          (2L, "unrelated fresh material nobody has ever written before now"))
        q.processAllAvailable()
        assert(flagged.toSet == Set((1L, 100L)), s"epoch 1 flags: $flagged")
        // epoch 2, SAME signature frame: rewrite of corpus doc 200
        mem.addData((3L, "different content describing spark execution plans here"))
        q.processAllAvailable()
        assert(flagged.toSet == Set((1L, 100L), (3L, 200L)), s"epoch 2 flags: $flagged")
        assert(epochs >= 2)
      } finally q.stop()
      // no corpus re-shingling per epoch: the corpus side of the
      // candidate join reads the CACHED signature frame. Count the
      // shingle-expansion generators in the epoch plan — the batch
      // side contributes the only one; the corpus branch is an
      // InMemoryTableScan (plus candidate-id-restricted text reads in
      // the verify stage, which shingle only docs a candidate names)
      val epoch = Streams.nearDupIngestBatch(
        Seq((9L, "probe text")).toDF("doc_id", "text"), corpusSigs, corpus,
        "doc_id", "text", 0.5, 16, 4, 3, portable = false)
      val cand = Dedup.lshCandidatesAcross(
        Dedup.minhashSignature(Seq((9L, "probe text")).toDF("doc_id", "text"),
          "doc_id", "text", k = 16), corpusSigs, "doc_id", k = 16, bands = 4)
      val candPlan = cand.queryExecution.executedPlan.toString
      assert(candPlan.contains("InMemoryTableScan"),
        "corpus signatures must come from the persisted frame:\n" + candPlan)
      assert(epoch.columns.toSet == Set("a", "b", "jaccard"))
    } finally corpusSigs.unpersist()
  }

  test("CDC epoch re-delivery is idempotent: replaying a committed batch leaves the snapshot unchanged") {
    // foreachBatch is at-least-once: a crash between sink write and
    // checkpoint commit re-delivers the epoch. The materialization must
    // absorb the replay — upsert idempotency lifted to the sink.
    val dbRoot = java.nio.file.Files.createTempDirectory("graft-cdc-idem").toString
    val db = new graft.Database(spark, dbRoot)
    val epoch0 = Seq(
      Streams.UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
      Streams.UserEvent(2L, ts("2024-01-01 10:30:00"), 7.0)).toDS()
    Streams.applyChangelogBatch(db, "idem_t")(epoch0, 0L)
    def snapshot() = db.getTable("idem_t")
      .select("user_id", "value").as[(Long, Double)].collect().toMap
    val afterFirst = snapshot()
    assert(afterFirst == Map(1L -> 1.0, 2L -> 7.0))
    // the re-delivered epoch: same batch, same epoch id
    Streams.applyChangelogBatch(db, "idem_t")(epoch0, 0L)
    assert(snapshot() == afterFirst, "replay must not change table content")
    assert(db.getTableCount("idem_t") == 2, "replay must not duplicate rows")
    // and the next epoch still advances normally after a replay
    val epoch1 = Seq(Streams.UserEvent(1L, ts("2024-01-01 11:00:00"), 2.0)).toDS()
    Streams.applyChangelogBatch(db, "idem_t")(epoch1, 1L)
    assert(snapshot() == Map(1L -> 2.0, 2L -> 7.0))
  }

  test("kill MID-batch: partial sink write + crash, checkpoint restart → table equals the one-shot result") {
    // the r12 verdict's missing failure mode: the idempotence test
    // above replays a COMPLETED epoch; here the sink dies AFTER a
    // partial write (a torn batch), the query crashes, and a fresh
    // query on the SAME checkpoint re-delivers the epoch in full —
    // exactly-once TABLE STATE must come out of at-least-once
    // delivery + PK-upsert idempotence, not from never failing.
    import org.apache.spark.sql.Dataset
    val root = java.nio.file.Files.createTempDirectory("graft-kill")
    val src = root.resolve("in").toString
    val ckpt = root.resolve("ckpt").toString
    val dbRoot = root.resolve("db").toString
    try {
      val db = new graft.Database(spark, dbRoot)
      def writeFile(rows: Streams.UserEvent*): Unit =
        rows.toSeq.toDS().coalesce(1).write.mode("append").parquet(src)
      def stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Streams.UserEvent]].schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .as[Streams.UserEvent]
      val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
      def faultySink(batch: Dataset[Streams.UserEvent], epochId: Long): Unit =
        if (epochId >= 1 && !batch.isEmpty && injected.compareAndSet(false, true)) {
          // the torn write: ONE row of the batch lands, then the sink dies
          val part = batch.orderBy("user_id").limit(1)
          Streams.applyChangelogBatch(db, "cdc_t")(
            part.as[Streams.UserEvent], epochId)
          throw new RuntimeException("injected sink failure after partial write")
        } else Streams.applyChangelogBatch(db, "cdc_t")(batch, epochId)
      def snapshot() = db.getTable("cdc_t")
        .select("user_id", "value").as[(Long, Double)].collect().toMap

      writeFile(
        Streams.UserEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        Streams.UserEvent(2L, ts("2024-01-01 10:30:00"), 7.0))
      val q1 = Streams.latestPerKey(stream).writeStream
        .option("checkpointLocation", ckpt).outputMode(OutputMode.Append())
        .foreachBatch(faultySink _).start()
      q1.processAllAvailable() // epoch 0 lands clean
      assert(snapshot() == Map(1L -> 1.0, 2L -> 7.0))
      writeFile(
        Streams.UserEvent(1L, ts("2024-01-01 11:00:00"), 2.0),
        Streams.UserEvent(3L, ts("2024-01-01 11:30:00"), 9.0))
      intercept[Exception](q1.processAllAvailable()) // the injected crash
      scala.util.Try(q1.stop())
      // the torn state is REAL: user 1 advanced, user 3 never landed
      assert(snapshot() == Map(1L -> 2.0, 2L -> 7.0),
        s"expected the partial write to be visible, got ${snapshot()}")
      // restart from the same checkpoint with the (now healthy) sink:
      // the failed epoch re-delivers IN FULL and upserts over the torn
      // write; a later epoch then advances normally
      val q2 = Streams.latestPerKey(stream).writeStream
        .option("checkpointLocation", ckpt).outputMode(OutputMode.Append())
        .foreachBatch(faultySink _).start()
      try {
        q2.processAllAvailable()
        assert(snapshot() == Map(1L -> 2.0, 2L -> 7.0, 3L -> 9.0),
          "checkpoint restart must complete the torn epoch")
        writeFile(Streams.UserEvent(2L, ts("2024-01-01 12:00:00"), 8.0))
        q2.processAllAvailable()
      } finally scala.util.Try(q2.stop())
      // final state == the one-shot batch result over ALL events
      assert(snapshot() == Map(1L -> 2.0, 2L -> 8.0, 3L -> 9.0))
      assert(db.getTableCount("cdc_t") == 3, "no duplicated keys from the replay")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("intervalJoin over two real streams: click attributed to impression within window") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val q = Streams.intervalJoin(
      imps.toDF().toDF("imp_id", "imp_ts", "imp_user"), "imp_user", "imp_ts",
      clicks.toDF().toDF("click_id", "click_ts", "click_user"), "click_user", "click_ts",
      lookback = "0 seconds", lookahead = "10 minutes", lateness = "5 minutes")
      .select("imp_id", "click_id")
      .writeStream.format("memory").queryName("attr_test")
      .outputMode(OutputMode.Append).start()
    try {
      imps.addData((1L, ts("2024-01-01 10:00:00"), 7L), (2L, ts("2024-01-01 10:00:00"), 8L))
      clicks.addData(
        (100L, ts("2024-01-01 10:05:00"), 7L), // within 10m of imp 1
        (101L, ts("2024-01-01 10:20:00"), 8L), // outside the window
        (102L, ts("2024-01-01 09:59:00"), 7L)) // before the impression
      q.processAllAvailable()
      val rows = spark.table("attr_test").as[(Long, Long)].collect().toSet
      assert(rows == Set((1L, 100L)))
    } finally q.stop()
  }

  test("intervalJoin batch twin equals a plain time-bounded join") {
    val e = mkEvents(
      (1, "2024-01-01 10:00:00", 1, "a", 1.0),
      (2, "2024-01-01 12:00:00", 1, "a", 1.0))
      .select($"event_id", $"ts", $"user_id")
    val o = Seq((10L, 1L, ts("2024-01-01 09:30:00")), (11L, 1L, ts("2024-01-01 07:00:00")))
      .toDF("ord_id", "cust_id", "ord_ts")
    val out = Streams.intervalJoin(e, "user_id", "ts", o, "cust_id", "ord_ts",
      lookback = "1 hours").select("event_id", "ord_id")
      .as[(Long, Long)].collect().toSet
    // event 1 sees the 09:30 order (30m back); event 2 sees neither
    assert(out == Set((1L, 10L)))
  }

  test("runningUserState: event-time timeout evicts idle keys (final snapshot re-emitted)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.UserEvent]
    val q = Streams.runningUserState(mem.toDS(), lateness = "10 minutes")
      .writeStream.format("memory").queryName("expiry_test")
      .outputMode("update").start()
    try {
      mem.addData(Streams.UserEvent(1L, ts("2024-01-01 10:00:00"), 2.0))
      q.processAllAvailable() // user 1 state armed to expire at 10:10
      mem.addData(Streams.UserEvent(2L, ts("2024-01-01 10:30:00"), 5.0))
      q.processAllAvailable() // watermark now 09:50 — user 1 still live
      mem.addData(Streams.UserEvent(2L, ts("2024-01-01 11:00:00"), 1.0))
      q.processAllAvailable() // watermark 10:20 ≥ 10:10 — user 1 EVICTED
      val user1Rows = spark.table("expiry_test").as[Streams.UserState]
        .collect().filter(_.user_id == 1L)
      // one live update + one timeout-driven final snapshot
      assert(user1Rows.length == 2)
      assert(user1Rows.forall(s => s.n == 1L && s.sum_value == 2.0))
    } finally q.stop()
  }

  test("runningUserState accumulates per-key state (mapGroupsWithState)") {
    val ds = Seq(
      Streams.UserEvent(1L, ts("2024-01-01 10:00:00"), 2.0),
      Streams.UserEvent(1L, ts("2024-01-01 11:00:00"), 3.0),
      Streams.UserEvent(2L, ts("2024-01-01 09:00:00"), 5.0)).toDS()
    val out = Streams.runningUserState(ds).collect()
      .map(s => s.user_id -> ((s.n, s.sum_value, s.last_ts))).toMap
    assert(out(1L) == ((2L, 5.0, ts("2024-01-01 11:00:00"))))
    assert(out(2L) == ((1L, 5.0, ts("2024-01-01 09:00:00"))))
  }
}
