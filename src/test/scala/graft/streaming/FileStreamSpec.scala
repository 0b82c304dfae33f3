package graft.streaming

import graft.SparkSpec
import graft.core.Fx
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The S6-as-stream path: the events fixture consumed through a real
  * parquet file stream (micro-batch), checked against the batch read. */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("events file stream == batch read; windowed agg matches batch twin") {
    val stream = Streams.eventsFileStream(spark, sfDir)
    assert(stream.isStreaming)
    val q = Streams.tumblingAgg(stream, "ts", "1 hour", lateness = "1 minute")
      .writeStream.format("memory").queryName("fs_tumbling")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamed = spark.table("fs_tumbling")
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = Fx.t(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet

    // append mode emits only watermark-closed windows; the final
    // (unclosed) hour stays in state — everything emitted must match
    // the batch result, and nearly all windows should have closed.
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size - 10, s"${streamed.size} vs ${batch.size}")
    assert(streamed.nonEmpty)
  }

  test("sketchIngest: streamed per-day HLL registers == one-shot batch registers") {
    val root = java.nio.file.Files.createTempDirectory("graft-si")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-si-ckpt")
    val store = new graft.core.TableStore(spark, root.toString)
    val q = Streams.sketchIngest(
      Streams.eventsFileStream(spark, sfDir), store, "wau_regs",
      to_date(col("ts")), "day", "user_id", ckpt.toString)
    q.processAllAvailable(); q.stop()

    val streamed = store.read("wau_regs")
      .select(col("day").cast("string"), col("__b"), col("__r"))
      .as[(String, Long, Int)].collect().toSet
    val direct = graft.ext.Sketches.hllRegisters(
        Fx.t(spark, sfDir, "events").withColumn("day", to_date(col("ts"))),
        "day", "user_id")
      .select(col("day").cast("string"), col("__b"), col("__r"))
      .as[(String, Long, Int)].collect().toSet
    assert(streamed == direct,
      "incrementally merged registers must equal the one-shot sketch")

    // idempotent merge: re-merging the final frame changes nothing
    val again = graft.ext.Sketches.hllMergeRegisters("day",
        store.read("wau_regs"), store.read("wau_regs"))
      .select(col("day").cast("string"), col("__b"), col("__r"))
      .as[(String, Long, Int)].collect().toSet
    assert(again == streamed)

    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
  }

  test("sketchIngestBatch: a REPLAYED batch is a register-level no-op (q260's law)") {
    val root = java.nio.file.Files.createTempDirectory("graft-sib")
    try {
    val store = new graft.core.TableStore(spark, root.toString)
    val ev = Fx.t(spark, sfDir, "events").select(col("ts"), col("user_id"))
    def ingest(pred: org.apache.spark.sql.Column): Unit =
      Streams.sketchIngestBatch(ev.filter(pred), store, "regs",
        to_date(col("ts")), "day", "user_id")
    val mid = dayofmonth(col("ts")) > 10 && dayofmonth(col("ts")) <= 20
    ingest(dayofmonth(col("ts")) <= 10)
    ingest(mid)
    val before = store.read("regs")
      .select(col("day").cast("string"), col("__b"), col("__r"))
      .as[(String, Long, Int)].collect().toSet
    ingest(mid) // at-least-once redelivery of the same batch
    val after = store.read("regs")
      .select(col("day").cast("string"), col("__b"), col("__r"))
      .as[(String, Long, Int)].collect().toSet
    assert(after == before, "replaying a merged batch must not move a register")
    ingest(dayofmonth(col("ts")) > 20)
    val full = store.read("regs")
      .select(col("day").cast("string"), col("__b"), col("__r"))
      .as[(String, Long, Int)].collect().toSet
    val direct = graft.ext.Sketches.hllRegisters(
        ev.withColumn("day", to_date(col("ts"))), "day", "user_id")
      .select(col("day").cast("string"), col("__b"), col("__r"))
      .as[(String, Long, Int)].collect().toSet
    assert(full == direct,
      "batch-driven ingest with a replay must equal the one-shot sketch")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("constraintIngest: per-batch reports merge additively to the one-shot batch report") {
    import graft.ext.Audit.{Check => C}
    val root = java.nio.file.Files.createTempDirectory("graft-ci")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ci-ckpt")
    val store = new graft.core.TableStore(spark, root.toString)
    val checks = Seq(
      C.notNull("user_id"),
      C.inRange("value", 0.0, 1.0),
      C.inSet("event_type", Seq("view", "click", "purchase")))
    val q = Streams.constraintIngest(
      Streams.eventsFileStream(spark, sfDir), store, "dq", checks, ckpt.toString)
    q.processAllAvailable(); q.stop()

    val streamed = store.read("dq")
      .select("constraint", "n_rows", "n_violations", "passed")
      .as[(String, Long, Long, Long)].collect().toSet
    val direct = graft.ext.Audit.checkConstraints(
        Fx.t(spark, sfDir, "events"), checks)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed == direct,
      s"cumulative stream report must equal the one-shot batch report: $streamed vs $direct")
    // the monitor actually saw data and at least one check can fail
    assert(streamed.exists(_._2 > 0))

    // EXACTLY-ONCE guard: a full replay of the same batches (fresh
    // checkpoint ⇒ ids restart at 0, all ≤ the stored high-water mark)
    // must NOT double-count the additive report
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-ci-ckpt2")
    val q2 = Streams.constraintIngest(
      Streams.eventsFileStream(spark, sfDir), store, "dq", checks, ckpt2.toString)
    q2.processAllAvailable(); q2.stop()
    val replayed = store.read("dq")
      .select("constraint", "n_rows", "n_violations", "passed")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(replayed == direct, "replayed batches must merge as no-ops")

    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
    org.apache.commons.io.FileUtils.deleteDirectory(ckpt2.toFile)
  }

  test("indexIngest: a real document stream encode-appends into the persisted index; a fresh-checkpoint replay is hwm-guarded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ext.Similarity
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ii")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ii-ckpt")
    try {
      val store = new graft.core.TableStore(spark, root.toString)
      val emb = Fx.t(spark, sfDir, "embeddings")
      val books = Similarity.pqSeededBooks(dim = 64, m = 8, ksub = 16)
      val base = Similarity.ivfPqBuild(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nCentroids = 8, books)
      Similarity.saveIvfPq(base, store, "ann")
      base.unpersist()
      val odds = emb.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .as[(Long, Seq[Double])].collect()
      val (b1, b2) = odds.partition(_._1 % 4 == 1)
      val mem = MemoryStream[(Long, Seq[Double])]
      val docs = mem.toDF().toDF("vec_id", "embedding")
      val q = Streams.indexIngest(docs, store, "ann", "vec_id",
        "embedding", ckpt.toString)
      try {
        mem.addData(b1.toSeq); q.processAllAvailable()
        mem.addData(b2.toSeq); q.processAllAvailable()
      } finally q.stop()
      // two applied micro-batches on top of the v0 save
      assert(Similarity.ivfPqManifest(store, "ann") == ((2, 0, 0)))
      val cur = Similarity.loadIvfPq(store, "ann")
      assert(cur.encoded.count() == emb.count() &&
        cur.encoded.select(col("__id")).distinct().count() == emb.count())
      // a FULL replay through a fresh checkpoint (batch ids restart at
      // 0, all <= the stored high-water mark) must be a no-op: same
      // content, same version history, no burned manifest versions
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft-ii-ckpt2")
      val mem2 = MemoryStream[(Long, Seq[Double])]
      val q2 = Streams.indexIngest(mem2.toDF().toDF("vec_id", "embedding"),
        store, "ann", "vec_id", "embedding", ckpt2.toString)
      try {
        mem2.addData(b1.toSeq); q2.processAllAvailable()
        mem2.addData(b2.toSeq); q2.processAllAvailable()
      } finally q2.stop()
      assert(store.versions("ann_manifest") == Seq(0, 1, 2),
        "a replayed delivery must not burn a manifest version")
      assert(Similarity.ivfPqManifest(store, "ann") == ((2, 0, 0)))
      org.apache.commons.io.FileUtils.deleteDirectory(ckpt2.toFile)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
    }
  }
}
