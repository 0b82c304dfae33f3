package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** A conditional-write object store FAKE: local files for the bytes
  * (so the TableStore's ordinary FileSystem reads see them), a
  * per-key generation map + one lock standing in for the store's
  * server-side precondition atomicity, and temp-file + atomic-move
  * standing in for an object PUT's all-or-nothing visibility. No
  * native rename, no native exclusive create — exactly the S3-class
  * shape the AtomicOps matrix names. */
final class FakeObjectStore extends ConditionalStore {
  private val lock = new Object
  // generations survive delete (monotone per key, like GCS)
  private val gens = scala.collection.mutable.Map.empty[String, Long]
  var puts = 0 // observability for specs

  override def get(key: String): Option[(Array[Byte], Long)] =
    lock.synchronized {
      val p = Paths.get(key)
      if (!Files.exists(p)) None
      else Some((Files.readAllBytes(p), gens.getOrElse(key, 1L)))
    }

  override def putIf(key: String, data: Array[Byte],
      expectGen: Option[Long]): Boolean = lock.synchronized {
    val p = Paths.get(key)
    val cur = if (Files.exists(p)) Some(gens.getOrElse(key, 1L)) else None
    val ok = (expectGen, cur) match {
      case (None, None)       => true // If-None-Match: * on an absent key
      case (Some(g), Some(c)) => g == c // generation-match
      case _                  => false
    }
    if (ok) {
      val tmp = Files.createTempFile(p.getParent, ".put", ".tmp")
      Files.write(tmp, data)
      Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      gens(key) = gens.getOrElse(key, 0L) + 1
      puts += 1
    }
    ok
  }

  override def delete(key: String): Unit = lock.synchronized {
    Files.deleteIfExists(Paths.get(key)); ()
  }
}

/** The TableStore protocol driven through [[ObjectStoreAtomicOps]]
  * over the conditional-write fake (r15 verdict missing #3): the
  * TableStoreCrashSpec seam guarantees must hold where rename is
  * copy + conditional-PUT + delete and exclusive create is an
  * If-None-Match PUT — proving the seam's contract is satisfiable on
  * a store with NO native atomic rename, and that this class is a
  * faithful template for a real S3/GCS/ABFS deployment. */
class ObjectStoreAtomicOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("conditional-store laws: If-None-Match exclusivity, generation pinning, monotone generations") {
    val root = Files.createTempDirectory("graft-objstore")
    val s = new FakeObjectStore
    val k = root.resolve("obj").toString
    assert(s.putIf(k, "a".getBytes, None))
    assert(!s.putIf(k, "b".getBytes, None), "second If-None-Match PUT must lose")
    val g1 = s.get(k).get._2
    assert(!s.putIf(k, "b".getBytes, Some(g1 + 7)), "wrong generation must fail")
    assert(s.putIf(k, "b".getBytes, Some(g1)))
    val g2 = s.get(k).get._2
    assert(g2 != g1, "every successful PUT must change the generation")
    // delete then recreate: generation stays monotone (never reuses g1)
    s.delete(k)
    assert(s.get(k).isEmpty)
    assert(s.putIf(k, "c".getBytes, None))
    assert(s.get(k).get._2 > g2)
  }

  test("full snapshot protocol over object-store ops: write/swap/read, time travel, gc — with zero native renames") {
    val root = Files.createTempDirectory("graft-objstore").toString
    val store = new TableStore(spark, root,
      Some(new ObjectStoreAtomicOps(new FakeObjectStore)))
    store.write("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v0
    store.write("t", Seq((3L, "c")).toDF("id", "v"))            // v1
    assert(ids(store.read("t")) == Seq(3L))
    assert(ids(store.readVersion("t", 0)) == Seq(1L, 2L))
    assert(store.versions("t") == Seq(0, 1))
    // the copy+delete rename leaves no stray pointer temps behind
    val stray = new java.io.File(root, "t").listFiles()
      .map(_.getName).filter(_.startsWith("_LATEST.tmp"))
    assert(stray.isEmpty, s"stray pointer temps: ${stray.mkString(",")}")
  }

  test("claim race through If-None-Match: the losing writer refuses BEFORE its parquet job") {
    val root = Files.createTempDirectory("graft-objstore").toString
    val shared = new FakeObjectStore
    val ops = new ObjectStoreAtomicOps(shared)
    val store = new TableStore(spark, root, Some(ops))
    store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0
    // a dead/concurrent writer holds the v1 claim (its If-None-Match
    // PUT won); this writer's create must return false and the fence
    // must refuse by name
    assert(ops.createExclusive(new Path(root, "t/v1._CLAIM")))
    val e = intercept[IllegalStateException] {
      store.write("t", Seq((2L, "b")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("claimed by another writer"), e.getMessage)
    assert(!new java.io.File(root, "t/v1").exists, "loser must not start parquet")
    assert(ids(store.read("t")) == Seq(1L))
  }

  test("TOCTOU on the pointer swap: a racer's PUT in the get->putIf window fails the precondition — throw, old serves, retry converges") {
    val root = Files.createTempDirectory("graft-objstore").toString
    val fake = new FakeObjectStore
    // decorate: the FIRST conditional PUT aimed at _LATEST gets a
    // racer's touch landed just before it (same pointer bytes, new
    // generation) — the narrowest window renameOverwrite carries
    var injected = false
    val racing = new ConditionalStore {
      override def get(key: String) = fake.get(key)
      override def delete(key: String): Unit = fake.delete(key)
      override def putIf(key: String, data: Array[Byte],
          expectGen: Option[Long]): Boolean = {
        if (key.endsWith("/_LATEST") && !injected && expectGen.isDefined) {
          injected = true
          val cur = fake.get(key).get
          assert(fake.putIf(key, cur._1, Some(cur._2)), "racer touch must land")
        }
        fake.putIf(key, data, expectGen)
      }
    }
    val store = new TableStore(spark, root, Some(new ObjectStoreAtomicOps(racing)))
    store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0 (first swap is If-None-Match — not injected)
    val e = intercept[IllegalStateException] {
      store.write("t", Seq((2L, "b")).toDF("id", "v")) // v1 swap hits the race
    }
    assert(e.getMessage.contains("conditional PUT"), e.getMessage)
    // the old version still serves — a last-win over the racer never happened
    assert(ids(store.read("t")) == Seq(1L))
    // the claim released (finally) and the retry converges onto v1
    store.write("t", Seq((2L, "b")).toDF("id", "v"))
    assert(ids(store.read("t")) == Seq(2L))
    assert(store.versions("t") == Seq(0, 1))
  }

  test("failed swap leaves old version serving; retry converges (the TableStoreCrashSpec seam case, object-store edition)") {
    val root = Files.createTempDirectory("graft-objstore").toString
    val fake = new FakeObjectStore
    var failNext = false
    val flaky = new ConditionalStore {
      override def get(key: String) = fake.get(key)
      override def delete(key: String): Unit = fake.delete(key)
      override def putIf(key: String, data: Array[Byte],
          expectGen: Option[Long]): Boolean =
        if (failNext && key.endsWith("/_LATEST")) { failNext = false; false }
        else fake.putIf(key, data, expectGen)
    }
    val store = new TableStore(spark, root, Some(new ObjectStoreAtomicOps(flaky)))
    store.write("t", Seq((1L, "a")).toDF("id", "v")) // v0
    failNext = true
    intercept[IllegalStateException] {
      store.write("t", Seq((2L, "b")).toDF("id", "v"))
    }
    assert(ids(store.read("t")) == Seq(1L))
    store.write("t", Seq((2L, "b")).toDF("id", "v"))
    assert(ids(store.read("t")) == Seq(2L))
    assert(store.versions("t") == Seq(0, 1))
  }
}
