package graft.core

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Kill-window proofs for the snapshot-swap protocol (r12 verdict item
  * 4): each test MANUFACTURES the exact on-disk state a kill at one
  * protocol step leaves behind (the write path is deterministic, so
  * the states are constructible byte-for-byte), then proves the
  * previous version still serves, history stays phantom-free, and a
  * re-run converges onto the same version number. */
class TableStoreCrashSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): (TableStore, String) = {
    val root = Files.createTempDirectory("graft-crash").toString
    (new TableStore(spark, root), root)
  }

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("kill mid-parquet-write: partial v1 (no _SUCCESS) never serves; re-run converges") {
    val (store, root) = newStore()
    store.write("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v0
    // manufacture the kill: v1 exists with data files but no _SUCCESS
    val f = fs(root)
    val v1 = new Path(root, "t/v1")
    f.mkdirs(v1)
    Seq((99L, "junk")).toDF("id", "v").write.mode("overwrite")
      .parquet(new Path(root, "t/_partial_stage").toString)
    f.listStatus(new Path(root, "t/_partial_stage")).foreach { s =>
      if (s.getPath.getName.endsWith(".parquet"))
        f.rename(s.getPath, new Path(v1, s.getPath.getName))
    }
    f.delete(new Path(root, "t/_partial_stage"), true)
    assert(!f.exists(new Path(v1, "_SUCCESS")))
    // previous version serves; the partial is not history
    assert(ids(store.read("t")) == Seq(1L, 2L))
    assert(store.versions("t") == Seq(0))
    intercept[IllegalArgumentException](store.readVersion("t", 1))
    // re-run converges onto the SAME v1 (overwrite), pointer advances
    store.write("t", Seq((3L, "c")).toDF("id", "v"))
    assert(ids(store.read("t")) == Seq(3L))
    assert(store.versions("t") == Seq(0, 1))
    assert(ids(store.readVersion("t", 1)) == Seq(3L))
  }

  test("kill between parquet commit and pointer swap: phantom v1 is invisible; re-run overwrites it") {
    val (store, root) = newStore()
    store.write("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v0
    // manufacture the kill: v1 fully committed (_SUCCESS), pointer at v0
    Seq((99L, "phantom")).toDF("id", "v").write.mode("overwrite")
      .parquet(new Path(root, "t/v1").toString)
    val f = fs(root)
    assert(f.exists(new Path(root, "t/v1/_SUCCESS")))
    // the phantom is NOT current, NOT history, NOT time-travel-addressable
    assert(ids(store.read("t")) == Seq(1L, 2L))
    assert(store.versions("t") == Seq(0))
    intercept[IllegalArgumentException](store.readVersion("t", 1))
    // the re-run lands on v1 again — the phantom is overwritten, not
    // skipped (no version-number gaps from kills)
    store.write("t", Seq((3L, "c")).toDF("id", "v"))
    assert(ids(store.read("t")) == Seq(3L))
    assert(ids(store.readVersion("t", 1)) == Seq(3L))
    assert(store.versions("t") == Seq(0, 1))
  }

  test("kill between tmp-pointer write and rename: stray _LATEST.tmp is harmless and swept") {
    val (store, root) = newStore()
    store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0
    val f = fs(root)
    // manufacture the kill: a stranded pointer temp carrying v1
    val tmp = new Path(root, "t/_LATEST.tmp1")
    val out = f.create(tmp, true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    assert(ids(store.read("t")) == Seq(1L)) // still v0's content
    // the next successful write sweeps the stray temp
    store.write("t", Seq((2L, "b")).toDF("id", "v"))
    assert(ids(store.read("t")) == Seq(2L))
    assert(!f.exists(tmp))
    assert(f.listStatus(new Path(root, "t")).toSeq
      .count(_.getPath.getName.startsWith("_LATEST.tmp")) == 0)
  }

  test("kill before the FIRST swap: newest complete dir recovers as current") {
    val (store, root) = newStore()
    // manufacture: v0 committed, pointer never written at all
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite")
      .parquet(new Path(root, "t/v0").toString)
    assert(store.tableExists("t"))
    assert(ids(store.read("t")) == Seq(1L))
    assert(store.versions("t") == Seq(0))
    // and a later write proceeds normally from there
    store.write("t", Seq((2L, "b")).toDF("id", "v"))
    assert(ids(store.read("t")) == Seq(2L))
    assert(store.versions("t") == Seq(0, 1))
  }

  test("writer fence: a claimed version makes the second writer THROW before it can clobber") {
    val (store, root) = newStore()
    store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0
    val f = fs(root)
    // a live concurrent writer holds the claim on v1
    assert(f.createNewFile(new Path(root, "t/v1._CLAIM")))
    val e = intercept[IllegalStateException] {
      store.write("t", Seq((2L, "b")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("v1._CLAIM") && e.getMessage.contains("gc()"),
      e.getMessage)
    // the loser never started its parquet job — nothing clobbered
    assert(!f.exists(new Path(root, "t/v1")))
    assert(ids(store.read("t")) == Seq(1L))
    // the claimant releases; the retry proceeds normally
    f.delete(new Path(root, "t/v1._CLAIM"), false)
    store.write("t", Seq((2L, "b")).toDF("id", "v"))
    assert(ids(store.read("t")) == Seq(2L))
    assert(store.versions("t") == Seq(0, 1))
  }

  test("stale claim from a kill: re-run refuses BY NAME, gc clears it, re-run converges") {
    val (store, root) = newStore()
    store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0
    val f = fs(root)
    // manufacture a kill inside write(): claim held, v1 partial
    assert(f.createNewFile(new Path(root, "t/v1._CLAIM")))
    f.mkdirs(new Path(root, "t/v1"))
    intercept[IllegalStateException] {
      store.write("t", Seq((2L, "b")).toDF("id", "v"))
    }
    val removed = store.gc("t").sorted
    assert(removed == Seq("v1", "v1._CLAIM"), removed)
    store.write("t", Seq((2L, "b")).toDF("id", "v")) // converges onto v1
    assert(ids(store.read("t")) == Seq(2L))
    assert(store.versions("t") == Seq(0, 1))
  }

  test("pointer LOSS on a swapped table refuses loudly instead of promoting a phantom") {
    val (store, root) = newStore()
    store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0
    store.write("t", Seq((2L, "b")).toDF("id", "v")) // v1
    val f = fs(root)
    // phantom v2 (committed, never swapped), then the pointer is LOST
    Seq((99L, "phantom")).toDF("id", "v").write.mode("overwrite")
      .parquet(new Path(root, "t/v2").toString)
    f.delete(new Path(root, "t/_LATEST"), false)
    // pre-r14 behavior silently served phantom v2 here; now it refuses
    val e = intercept[IllegalStateException](store.read("t"))
    assert(e.getMessage.contains("_LATEST") && e.getMessage.contains("phantom"),
      e.getMessage)
    // operator restores the pointer to the intended version; all good
    val out = f.create(new Path(root, "t/_LATEST"), true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
    assert(ids(store.read("t")) == Seq(2L))
    assert(store.gc("t").sorted == Seq("v2"))
  }

  test("gc sweeps partials, phantoms and pointer temps; committed history is untouchable") {
    val (store, root) = newStore()
    store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0
    store.write("t", Seq((2L, "b")).toDF("id", "v")) // v1
    val f = fs(root)
    // phantom v2 (committed, unswapped), partial v3, stray pointer temp
    Seq((99L, "x")).toDF("id", "v").write.mode("overwrite")
      .parquet(new Path(root, "t/v2").toString)
    f.mkdirs(new Path(root, "t/v3"))
    val out = f.create(new Path(root, "t/_LATEST.tmp2"), true)
    try out.write("2".getBytes("UTF-8")) finally out.close()
    val removed = store.gc("t").sorted
    assert(removed == Seq("_LATEST.tmp2", "v2", "v3"), removed)
    // committed history intact, current still serves
    assert(store.versions("t") == Seq(0, 1))
    assert(ids(store.read("t")) == Seq(2L))
    assert(ids(store.readVersion("t", 0)) == Seq(1L))
    // idempotent on a clean table
    assert(store.gc("t").isEmpty)
    assert(store.gc("no_such_table").isEmpty)
  }

  // ---------------------------------------------- AtomicOps seam (r15)
  // The fence's two-writer guarantees proven THROUGH the seam: a
  // FakeFs-style AtomicOps double injects exactly the contention /
  // failure each primitive can exhibit on a non-atomic store, and the
  // protocol must refuse loudly at that point — so a deployment that
  // plugs a conditional-write implementation inherits a tested
  // contract, not a hopeful one.

  /** The default primitives, reconstructed for wrapping. */
  private def hadoopOps(root: String): AtomicOps = new AtomicOps {
    override def createExclusive(p: Path): Boolean = fs(root).createNewFile(p)
    override def renameOverwrite(src: Path, dst: Path): Unit = {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        new Path(root).toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(src, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  test("seam: a lost claim race (createExclusive=false) refuses BEFORE the parquet job — no clobber") {
    val root = Files.createTempDirectory("graft-seam").toString
    val under = hadoopOps(root)
    // a store whose exclusive-create always loses the race on claims
    val losing = new TableStore(spark, root, Some(new AtomicOps {
      override def createExclusive(p: Path): Boolean =
        if (p.getName.endsWith("._CLAIM")) false else under.createExclusive(p)
      override def renameOverwrite(src: Path, dst: Path): Unit =
        under.renameOverwrite(src, dst)
    }))
    val honest = new TableStore(spark, root)
    honest.write("t", Seq((1L, "a")).toDF("id", "v")) // v0
    val e = intercept[IllegalStateException] {
      losing.write("t", Seq((2L, "b")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("claimed by another writer"), e.getMessage)
    // the loser never started its parquet job and the table is intact
    assert(!fs(root).exists(new Path(root, "t/v1")))
    assert(ids(honest.read("t")) == Seq(1L))
  }

  test("seam: a racer committing between claim and fence is detected — the late writer aborts, the racer's snapshot serves") {
    val root = Files.createTempDirectory("graft-seam").toString
    val under = hadoopOps(root)
    val racer = new TableStore(spark, root)
    racer.write("t", Seq((1L, "a")).toDF("id", "v")) // v0
    // the slow writer's claim succeeds, but the racer's FULL commit
    // lands first (claim → write → swap → release) — simulated inside
    // createExclusive, i.e. in the win-the-claim-after-the-racer's-
    // swap window the fence exists for
    var injected = false
    val slow = new TableStore(spark, root, Some(new AtomicOps {
      override def createExclusive(p: Path): Boolean = {
        if (p.getName.endsWith("._CLAIM") && !injected) {
          injected = true
          racer.write("t", Seq((7L, "racer")).toDF("id", "v")) // v1 commits
        }
        under.createExclusive(p)
      }
      override def renameOverwrite(src: Path, dst: Path): Unit =
        under.renameOverwrite(src, dst)
    }))
    val e = intercept[IllegalStateException] {
      slow.write("t", Seq((2L, "late")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("concurrent writer detected"), e.getMessage)
    // the racer's snapshot is untouched and current
    assert(ids(racer.read("t")) == Seq(7L))
    assert(racer.versions("t") == Seq(0, 1))
  }

  test("seam: a failed pointer swap (renameOverwrite throws) leaves the old version serving; the retry converges") {
    val root = Files.createTempDirectory("graft-seam").toString
    val under = hadoopOps(root)
    var failNext = false
    val store = new TableStore(spark, root, Some(new AtomicOps {
      override def createExclusive(p: Path): Boolean = under.createExclusive(p)
      override def renameOverwrite(src: Path, dst: Path): Unit = {
        if (failNext) { failNext = false
          throw new java.io.IOException("injected: conditional PUT precondition failed")
        }
        under.renameOverwrite(src, dst)
      }
    }))
    store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0 (clean)
    failNext = true
    intercept[java.io.IOException] {
      store.write("t", Seq((2L, "b")).toDF("id", "v")) // v1 swap dies
    }
    // old version serves; v1 is a phantom; the claim was released
    assert(ids(store.read("t")) == Seq(1L))
    assert(store.versions("t") == Seq(0))
    assert(!fs(root).exists(new Path(root, "t/v1._CLAIM")))
    // the retry converges onto the same v1
    store.write("t", Seq((2L, "b")).toDF("id", "v"))
    assert(ids(store.read("t")) == Seq(2L))
    assert(store.versions("t") == Seq(0, 1))
  }

  test("seam: marker-BEFORE-rename — a first-swap crash in the window refuses loudly instead of promoting the never-current dir") {
    val root = Files.createTempDirectory("graft-seam").toString
    val under = hadoopOps(root)
    val store = new TableStore(spark, root, Some(new AtomicOps {
      override def createExclusive(p: Path): Boolean = under.createExclusive(p)
      override def renameOverwrite(src: Path, dst: Path): Unit =
        throw new java.io.IOException("injected: crash before the first swap")
    }))
    intercept[java.io.IOException] {
      store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0, swap never lands
    }
    // pre-r15 (marker after rename) this silently promoted v0 via the
    // newest-complete-dir fallback even though no swap ever landed;
    // the marker now rides ahead of the rename, so the read REFUSES
    val e = intercept[IllegalStateException](store.read("t"))
    assert(e.getMessage.contains("_LATEST") && e.getMessage.contains("refusing"),
      e.getMessage)
    // operator restores the pointer; the table serves
    val out = fs(root).create(new Path(root, "t/_LATEST"), true)
    try out.write("0".getBytes("UTF-8")) finally out.close()
    assert(ids(store.read("t")) == Seq(1L))
  }

  test("gc staleClaimMs: a FRESH claim is refused (a live writer's fence survives); 0 sweeps at-rest claims") {
    val (store, root) = newStore()
    store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0
    val f = fs(root)
    assert(f.createNewFile(new Path(root, "t/v1._CLAIM"))) // live writer
    // an hour-threshold gc must NOT break the seconds-old claim
    assert(!store.gc("t", staleClaimMs = 3600L * 1000).contains("v1._CLAIM"))
    assert(f.exists(new Path(root, "t/v1._CLAIM")))
    // the at-rest default presumes every claim stranded and sweeps it
    assert(store.gc("t").contains("v1._CLAIM"))
    assert(!f.exists(new Path(root, "t/v1._CLAIM")))
  }
}
