package graft.sources.jdbc

import graft.SparkSpec
import graft.core.Mutations
import org.apache.spark.sql.functions._

/** Real JDBC round-trip against embedded Derby (bundled with Spark):
  * write → read with pushdown → merge-and-replace, the full
  * reference-shaped RDBMS workflow without a network. */
class JdbcOpsSpec extends SparkSpec {
  import spark.implicits._

  private val url =
    s"jdbc:derby:${java.nio.file.Files.createTempDirectory("graft-derby")}/db;create=true"

  test("liveness probe (D1)") {
    assert(JdbcOps.isAlive(spark, url))
  }

  test("write, read back with predicate pushdown into the remote query") {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    JdbcOps.write(df, url, "users", mode = "overwrite")

    val readBack = JdbcOps.read(spark, url, "users").filter($"bal" > 15.0)
    val plan = readBack.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [*IsNotNull(bal), *GreaterThan(bal,15.0)]"), plan)
    assert(readBack.select("id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("partitioned parallel read produces numPartitions JDBC partitions") {
    val df = (1L to 100L).map(i => (i, s"u$i")).toDF("id", "name")
    JdbcOps.write(df, url, "wide", mode = "overwrite")
    val part = JdbcOps.readPartitioned(spark, url, "wide", "id", 1, 100, 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
  }

  test("aggregate pushdown through the DSv2 JDBC catalog (S7 against a real engine)") {
    val df = Seq((1L, "x", 10.0), (2L, "x", 20.0), (3L, "y", 30.0))
      .toDF("id", "grp", "bal")
    JdbcOps.write(df, url, "agg_t", mode = "overwrite")
    spark.conf.set("spark.sql.catalog.derby",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.derby.url", url)
    spark.conf.set("spark.sql.catalog.derby.pushDownAggregate", "true")
    spark.conf.set("spark.sql.catalog.derby.driver",
      "org.apache.derby.jdbc.EmbeddedDriver")
    try {
      val agg = spark.table("derby.APP.AGG_T")
        .agg(count(lit(1)).as("cnt"), min($"BAL").as("mn"), max($"BAL").as("mx"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregates"), plan)
      val r = agg.collect().head
      assert(r.getLong(0) == 3L && r.getDouble(1) == 10.0 && r.getDouble(2) == 30.0)
    } finally spark.conf.unset("spark.sql.catalog.derby")
  }

  test("native upsert (Derby fallback): coalesce merge, inserts for misses, per-chunk batches") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    JdbcOps.write(target, url, "nup_t", mode = "overwrite")
    // null name on id=2 must KEEP "b" (coalesce); id=9 is a miss → insert;
    // batchSize=2 forces multiple chunks through one partition's statement
    val updates = Seq(
      (2L, None: Option[String], Some(99.0)),
      (3L, Some("C"), None: Option[Double]),
      (9L, Some("z"), Some(1.0)))
      .toDF("id", "name", "bal").repartition(2)
    JdbcOps.upsert(updates, url, "nup_t", pk = Seq("id"), batchSize = 2)
    val out = JdbcOps.read(spark, url, "nup_t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "C", 30.0), (9L, "z", 1.0)))
    // overwriteWithNull: the null must land
    val nullify = Seq((2L, None: Option[String], Some(99.0))).toDF("id", "name", "bal")
    JdbcOps.upsert(nullify, url, "nup_t", pk = Seq("id"), overwriteWithNull = true)
    val r2 = JdbcOps.read(spark, url, "nup_t").filter($"id" === 2L).collect().head
    assert(r2.isNullAt(1) && r2.getDouble(2) == 99.0)
    // idempotence: replaying the same batch changes nothing (task-retry
    // safety — Spark may re-run a partition)
    JdbcOps.upsert(updates, url, "nup_t", pk = Seq("id"), batchSize = 2)
    assert(JdbcOps.read(spark, url, "nup_t").count() == 4)
  }

  test("native upsert: keys-only frame inserts absent keys, never duplicates") {
    val target = Seq(Tuple1(1L), Tuple1(2L)).toDF("id")
    JdbcOps.write(target, url, "keys_t", mode = "overwrite")
    val batch = Seq(Tuple1(2L), Tuple1(3L), Tuple1(4L)).toDF("id")
    JdbcOps.upsert(batch, url, "keys_t", pk = Seq("id"))
    assert(JdbcOps.read(spark, url, "keys_t").orderBy("id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("native keyed update: plain SET overwrites (nulls too), returns matched rowcount") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    JdbcOps.write(target, url, "kup_t", mode = "overwrite")
    val changes = Seq(
      (1L, None: Option[String], Some(11.0)), // null name OVERWRITES (plain SET)
      (3L, Some("c3"), Some(33.0)),
      (8L, Some("x"), Some(0.0)))             // unmatched: ignored, not counted
      .toDF("id", "name", "bal")
    val n = JdbcOps.updateKeyed(changes, url, "kup_t", on = Seq("id"), batchSize = 2)
    assert(n == 2L, s"rowcount must count only matched rows, got $n")
    val out = JdbcOps.read(spark, url, "kup_t").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
    assert(out == Seq((1L, None, 11.0), (2L, Some("b"), 20.0), (3L, Some("c3"), 33.0)))
  }

  test("native upsert: intra-chunk duplicate PKs collapse sequentially, never double-insert") {
    val target = Seq((1L, "a", 10.0)).toDF("id", "name", "bal")
    JdbcOps.write(target, url, "dup_t", mode = "overwrite")
    // two rows for ABSENT pk 9 in one chunk: the batched two-step would
    // insert both; the sequential replay upserts in order (second row's
    // null name coalesces over the first's)
    val updates = Seq(
      (9L, Some("first"), Some(1.0)),
      (9L, None: Option[String], Some(2.0)),
      (1L, Some("a2"), None: Option[Double]))
      .toDF("id", "name", "bal").coalesce(1)
    JdbcOps.upsert(updates, url, "dup_t", pk = Seq("id"), batchSize = 10)
    val out = JdbcOps.read(spark, url, "dup_t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a2", 10.0), (9L, "first", 2.0)), out.toString)
  }

  test("mysql dialect emits backtick-quoted ON DUPLICATE KEY UPDATE") {
    val sql = JdbcOps.nativeUpsertSql("jdbc:mysql://h/db", "t",
      Seq("id", "name"), Seq("name"), Seq("id"), overwriteWithNull = false).get
    assert(sql == "INSERT INTO t (`id`, `name`) VALUES (?, ?) " +
      "ON DUPLICATE KEY UPDATE `name` = COALESCE(VALUES(`name`), `name`)")
    val keysOnly = JdbcOps.nativeUpsertSql("jdbc:mysql://h/db", "t",
      Seq("id"), Nil, Seq("id"), overwriteWithNull = false).get
    assert(keysOnly.endsWith("ON DUPLICATE KEY UPDATE `id` = `id`"))
  }

  test("postgres dialect emits a single aliased ON CONFLICT statement") {
    val sql = JdbcOps.nativeUpsertSql("jdbc:postgresql://h/db", "t",
      Seq("id", "name", "bal"), Seq("name", "bal"), Seq("id"),
      overwriteWithNull = false).get
    assert(sql == """INSERT INTO t AS __t ("id", "name", "bal") VALUES (?, ?, ?) """ +
      """ON CONFLICT ("id") DO UPDATE SET "name" = COALESCE(EXCLUDED."name", __t."name"), """ +
      """"bal" = COALESCE(EXCLUDED."bal", __t."bal")""")
    val nothing = JdbcOps.nativeUpsertSql("jdbc:postgresql://h/db", "t",
      Seq("id"), Nil, Seq("id"), overwriteWithNull = false).get
    assert(nothing.endsWith("""ON CONFLICT ("id") DO NOTHING"""))
    assert(JdbcOps.nativeUpsertSql("jdbc:derby:x", "t",
      Seq("id", "v"), Seq("v"), Seq("id"), overwriteWithNull = false).isEmpty)
  }

  test("upsert merge + overwrite write = the reference's ON CONFLICT workflow") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "bal")
    JdbcOps.write(target, url, "merge_t", mode = "overwrite")
    val updates = Seq((2L, None: Option[String], Some(99.0)), (9L, Some("z"), Some(1.0)))
      .toDF("id", "name", "bal")
    val merged = Mutations.upsert(
      JdbcOps.read(spark, url, "merge_t"), updates, Seq("id"))
    // replace, not write(overwrite): overwrite truncates before the
    // lazy merge plan reads the table it merges against
    JdbcOps.replace(merged, url, "merge_t")
    val out = JdbcOps.read(spark, url, "merge_t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b", 99.0), (9L, "z", 1.0)))
  }
}
