package graft

import graft.core.{ColumnSpec, Pred}
import org.apache.spark.sql.types._
import java.nio.file.Files

/** End-to-end facade walk mirroring a reference-client workflow:
  * create → upsert → get → update → delete → evolve → raw SQL. */
class DatabaseSpec extends SparkSpec {
  import spark.implicits._

  test("full reference-shaped workflow through the facade") {
    val dbRoot = Files.createTempDirectory("graft-db").toString
    val db = new Database(spark, dbRoot)
    assert(db.isAlive)

    db.createTable("users", Seq(
      ColumnSpec("id", LongType), ColumnSpec("name", StringType),
      ColumnSpec("bal", DoubleType)), primaryKey = Seq("id"))
    assert(db.checkTableExists("users"))
    assert(db.getTables == Seq("users"))
    assert(db.getTableColumns("users") == Seq("id", "name", "bal"))
    assert(db.getTableCount("users") == 0)

    // upsert inserts; returned keys = touched PKs (D8 RETURNING)
    val keys = db.upsert("users",
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "bal"), Seq("id"))
    assert(keys.as[Long].collect().toSet == Set(1L, 2L))
    assert(db.getTableCount("users") == 2)

    // second upsert: coalesce merge + insert
    db.upsert("users",
      Seq((2L, None: Option[String], Some(99.0)), (3L, Some("c"), None: Option[Double]))
        .toDF("id", "name", "bal"), Seq("id"))
    val afterUpsert = db.get("users", sortBy = Some("id")).collect().toSeq
    assert(afterUpsert.map(_.getLong(0)) == Seq(1L, 2L, 3L))
    assert(afterUpsert(1).getString(1) == "b")    // coalesce kept old name
    assert(afterUpsert(1).getDouble(2) == 99.0)   // new balance won

    // D12 read pipeline
    val top = db.get("users", columns = Seq("id"),
      where = Seq(Pred.Op("bal", ">", 5.0)),
      sortBy = Some("bal"), ascending = false, limit = 1)
    assert(top.as[Long].collect().toSeq == Seq(2L))

    // D13 keyed update returns rowcount
    val n = db.update("users",
      Seq((1L, "renamed")).toDF("id", "name"), Seq("id"))
    assert(n == 1L)
    assert(db.get("users", where = Seq(Pred.Eq("id", 1)))
      .collect().head.getString(1) == "renamed")

    // D14 predicate delete
    db.delete("users", Seq(Pred.Op("bal", ">=", 99.0)))
    assert(db.getTableCount("users") == 2)

    // D10 additive evolution via re-declare + addColumn
    db.createTable("users", Seq(
      ColumnSpec("id", LongType), ColumnSpec("name", StringType),
      ColumnSpec("bal", DoubleType), ColumnSpec("tag", StringType)))
    assert(db.getTableColumns("users") == Seq("id", "name", "bal", "tag"))
    db.addColumn("users", "score", IntegerType)
    assert(db.getTableColumns("users").contains("score"))

    // D15 raw SQL over a registered view
    db.registerView("users")
    assert(db.executeRaw("SELECT count(*) AS c FROM users").as[Long].first() == 2L)
    assert(db.getViews.contains("users"))

    // D7+: persistent views — stored SQL, replanned per use, survives
    // a new Database handle over the same root
    db.createView("active_users", "SELECT id, name FROM users WHERE id > 0")
    assert(db.getViews.contains("active_users"))
    assert(db.getView("active_users").count() == 2L)
    val db2 = new Database(spark, dbRoot)
    assert(db2.getViews.contains("active_users"))
    assert(db2.getView("active_users").columns.toSeq == Seq("id", "name"))
    db2.dropView("active_users")
    assert(!db2.getViews.contains("active_users"))

    // D17 verbose ⇒ formatted physical plan
    val plan = db.explain(db.get("users", where = Seq(Pred.Eq("id", 1))))
    assert(plan.contains("Physical Plan") && plan.contains("PushedFilters"))

    // full-table delete (no where) empties the table
    db.delete("users")
    assert(db.getTableCount("users") == 0)
  }

  test("multi-namespace addressing: ns.table, explicit-schema probe, per-ns isolation (D1)") {
    val root = Files.createTempDirectory("graft-ns").toString
    val pub = new Database(spark, root)
    val stg = new Database(spark, root, namespace = "staging")
    pub.createTable("t", Seq(ColumnSpec("id", LongType), ColumnSpec("v", StringType)))
    stg.createTable("t", Seq(ColumnSpec("id", LongType), ColumnSpec("v", StringType)))
    pub.upsert("t", Seq((1L, "pub")).toDF("id", "v"), Seq("id"))
    // qualified write from the OTHER handle
    pub.upsert("staging.t", Seq((1L, "stg"), (2L, "stg2")).toDF("id", "v"), Seq("id"))
    // isolation: same table name, different contents per namespace
    assert(pub.getTableCount("t") == 1)
    assert(pub.getTableCount("staging.t") == 2)
    assert(stg.getTableCount("t") == 2)
    assert(stg.getTableCount("public.t") == 1)
    assert(stg.getTable("public.t").select("v").as[String].head() == "pub")
    // probes: qualified name and the reference's explicit-schema form
    assert(pub.checkTableExists("staging.t"))
    assert(pub.checkTableExists("t", "staging"))
    assert(!pub.checkTableExists("missing.t"))
    assert(pub.getTables == Seq("t"))
    assert(pub.getTables("staging") == Seq("t"))
    // qualified DDL + mutation routing
    pub.addColumn("staging.t", "extra", StringType)
    assert(stg.getTableColumns("t") == Seq("id", "v", "extra"))
    pub.delete("staging.t", Seq(Pred.Eq("id", 2)))
    assert(stg.getTableCount("t") == 1)
  }

  test("opt-in PK validation rejects a merge that would keep duplicate keys") {
    val root = Files.createTempDirectory("graft-dbv").toString
    val db = new Database(spark, root)
    // a corrupted snapshot (written outside the facade) with dup PKs
    new graft.core.TableStore(spark, root).write("dup",
      Seq((1L, "x"), (1L, "y")).toDF("id", "name"))
    val updates = Seq((2L, "z")).toDF("id", "name")
    intercept[IllegalStateException](
      db.upsert("dup", updates, Seq("id"), validatePk = true))
    // without validation the merge goes through (documented: validate,
    // not enforce), and a clean table passes validation silently
    db.upsert("dup", updates, Seq("id"))
    new graft.core.TableStore(spark, root).write("clean",
      Seq((1L, "x")).toDF("id", "name"))
    db.upsert("clean", updates, Seq("id"), validatePk = true)
    assert(db.getTableCount("clean") == 2)
  }
}
