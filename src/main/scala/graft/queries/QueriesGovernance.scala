package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.TextOps
import graft.QueryHelpers._

/** Governance & connector-surface tier (split from QueriesCuration —
  * zero behavior change): multi-namespace addressing (D1),
  * autoincrement assignment (D16), DDL constraints (D9/D16), PII
  * scrub, and the REST catalog/quota probes (S3/S5). One `queries`
  * entry per operator with its `oracleSql` ANSI twin; merged into the
  * gate by [[SparkEntry]]. */
private[graft] object QueriesGovernance {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---------------------------------------- D1 multi-namespace addressing
    // The reference binds one Postgres schema per Database handle
    // (main.py:39-46 schema='public') but can address and probe other
    // schemas (main.py:67-69 explicit-schema exists). Here: two
    // namespaces under one root carry a same-named table with different
    // contents; the PUBLIC-bound handle lists/probes/reads the staging
    // namespace via `staging.geo` and the explicit-schema overload.
    // region/nation are SF-invariant (5/25 rows), so every fact is
    // fixture-replayable.
    "q109_namespaces" -> ((s, d) => {
      import s.implicits._
      import graft.core.ColumnSpec
      import org.apache.spark.sql.types.{LongType, StringType}
      val rootPath = java.nio.file.Files.createTempDirectory("graft-ns")
      val dbPub = new graft.Database(s, rootPath.toString)
      val dbStg = new graft.Database(s, rootPath.toString, namespace = "staging")
      val specs = Seq(ColumnSpec("geo_id", LongType), ColumnSpec("geo_name", StringType))
      dbPub.createTable("geo", specs, primaryKey = Seq("geo_id"))
      dbStg.createTable("geo", specs, primaryKey = Seq("geo_id"))
      dbPub.upsert("geo", T(s, d, "region")
        .select(col("r_regionkey").cast("long").as("geo_id"),
          col("r_name").as("geo_name")), pk = Seq("geo_id"))
      // qualified addressing WRITES across namespaces too
      dbPub.upsert("staging.geo", T(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("geo_id"),
          col("n_name").as("geo_name")), pk = Seq("geo_id"))
      val facts = Seq(
        ("exists:geo", dbPub.checkTableExists("geo").toString),
        ("exists:staging.geo", dbPub.checkTableExists("staging.geo").toString),
        ("exists:geo@staging", dbPub.checkTableExists("geo", "staging").toString),
        ("exists:missing.geo", dbPub.checkTableExists("missing.geo").toString),
        ("count:public", dbPub.getTableCount("geo").toString),
        ("count:staging", dbPub.getTableCount("staging.geo").toString),
        ("tables:public", dbPub.getTables.mkString(",")),
        ("tables:staging", dbPub.getTables("staging").mkString(","))) ++
        // cross-namespace READ through the public handle
        dbPub.getTable("staging.geo").filter(col("geo_id") < 5)
          .collect().map(r => (s"row:${r.getLong(0)}", r.getString(1))).toSeq
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(rootPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      facts.toDF("kind", "name").orderBy(col("kind"), col("name"))
    }),

    // ---------------------------------------- D16 autoincrement ASSIGNMENT
    // The reference's insert-without-id flow (main.py:33, SQLAlchemy
    // autoincrement = server-assigned ids): batch 1 carries NO id column
    // at all → dense ids 1..n in (name, bal) order; batch 2 mixes an
    // explicit-id update (COALESCE keeps its old bal) with two NULL-id
    // inserts that continue the sequence from the table max. The oracle
    // replays the sequence with row_number() + max-offset.
    "q108_autoincrement" -> ((s, d) => {
      import s.implicits._
      import graft.core.ColumnSpec
      import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
      val rootPath = java.nio.file.Files.createTempDirectory("graft-auto")
      val db = new graft.Database(s, rootPath.toString)
      db.createTable("acct", Seq(
        ColumnSpec("id", LongType, nullable = false, autoincrement = true),
        ColumnSpec("name", StringType),
        ColumnSpec("bal", DoubleType)), primaryKey = Seq("id"))
      val b1 = T(s, d, "customer").filter(col("c_custkey") <= 20)
        .select(col("c_name").as("name"), col("c_acctbal").as("bal"))
      db.upsert("acct", b1, pk = Seq("id"))
      val b2 = Seq(
        (Some(3L), "patched", Option.empty[Double]),
        (Option.empty[Long], "aa-new", Some(2.5)),
        (Option.empty[Long], "zz-new", Some(1.5)))
        .toDF("id", "name", "bal")
      db.upsert("acct", b2, pk = Seq("id"))
      val out = db.getTable("acct").orderBy(col("id"))
      // freeze driver-side (22 rows) before deleting the store root —
      // the returned frame must not depend on the temp snapshot files
      import scala.jdk.CollectionConverters._
      val frozen = s.createDataFrame(out.collect().toSeq.asJava, out.schema)
      java.nio.file.Files.walk(rootPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      frozen
    }),

    // PII scrub (ext.TextOps.scrubPii): Dolma/C4-style masking. The
    // fixture has no natural PII, so the query deterministically
    // injects an email+URL+IP tail into every 7th doc and the oracle
    // replays injection, per-type counts, and the staged scrub
    // character-for-character (portable regex subset, global replace).
    "q106_pii_scrub" -> ((s, d) => {
      val inj = T(s, d, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com via http://site"), col("doc_id").cast("string"),
            lit(".example/page or 10.0.0."), (col("doc_id") % 250).cast("string")))
          .otherwise(col("text")).as("text"))
      val (ne, nu, ni) = TextOps.piiCounts(col("text"))
      inj.select(col("doc_id"), ne.as("n_email"), nu.as("n_url"), ni.as("n_ip"),
        md5(TextOps.scrubPii(col("text"))).as("scrubbed_md5"))
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------------ D9/D16 DDL contract
    // create-with-constraints → store round trip → read-back →
    // validateUnique (reference database/main.py:119-170 create_table
    // with primary_key/unique_columns, main.py:28-37 ColumnModel).
    // Every fact is a driver-side value (the q90 recipe): typed specs
    // carry default/autoincrement/FK metadata into the created schema,
    // the composite PK survives the parquet round trip, re-create over
    // an existing table evolves additively, and checkfirst=False on an
    // existing table throws instead of silently replacing.
    "q101_ddl_constraints" -> ((s, d) => {
      import s.implicits._
      import graft.core.{ColumnSpec, Ddl}
      import org.apache.spark.sql.types.{LongType, StringType}
      val rootPath = java.nio.file.Files.createTempDirectory("graft-ddl")
      val db = new graft.Database(s, rootPath.toString)
      val specs = Seq(
        ColumnSpec("region", StringType, nullable = false),
        ColumnSpec("order_id", LongType, nullable = false),
        ColumnSpec("status", StringType, default = Some("new")),
        ColumnSpec("cust_id", LongType, foreignKey = Some("customer.c_custkey")),
        ColumnSpec("seq", LongType, autoincrement = true))
      db.createTable("ord", specs, primaryKey = Seq("region", "order_id"),
        uniqueColumns = Seq("seq"))
      // constraint metadata read back THROUGH the store (parquet round
      // trip), not from the in-memory specs
      val created = db.getTable("ord").schema
      val metaFacts = created.fields.flatMap { f =>
        val m = f.metadata
        Seq(
          if (m.contains("primary_key")) Some(("pk", f.name)) else None,
          if (m.contains("unique")) Some(("unique", f.name)) else None,
          if (m.contains("default")) Some((s"default:${f.name}", m.getString("default"))) else None,
          if (m.contains("autoincrement")) Some(("autoincrement", f.name)) else None,
          if (m.contains("foreign_key")) Some((s"fk:${f.name}", m.getString("foreign_key"))) else None
        ).flatten
      }.toSeq
      val existsErr =
        try { db.createTable("ord", specs, checkExisting = false); "none" }
        catch { case _: IllegalStateException => "thrown" }
      val batch = Seq(
        ("EU", 1L, "new", 10L, 1L),
        ("EU", 2L, "paid", 11L, 2L),
        ("US", 1L, "new", 12L, 3L))
        .toDF("region", "order_id", "status", "cust_id", "seq")
      db.upsert("ord", batch, pk = Seq("region", "order_id"), validatePk = true)
      // re-create over the existing table: additive evolution only
      db.createTable("ord", specs :+ ColumnSpec("note", StringType),
        primaryKey = Seq("region", "order_id"))
      val t = db.getTable("ord")
      val rows = metaFacts ++
        Seq(
          ("count", db.getTableCount("ord").toString),
          ("create_existing", existsErr),
          ("pk_valid", Ddl.validateUnique(t, Seq("region", "order_id")).toString),
          ("status_unique", Ddl.validateUnique(t, Seq("status")).toString)) ++
        db.getTableColumns("ord").map(("column", _))
      val out = rows.toDF("kind", "name").orderBy(col("kind"), col("name"))
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(rootPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      out
    }),

    // ------------------------------------------------ S3 REST catalog
    // list-objects + per-object describe→schema over the deterministic
    // fake org (reference salesforce/main.py:91-100 get_sobjects +
    // describe): the remote catalog surfaced as (object, position,
    // field, Spark type) rows.
    "q102_rest_catalog" -> ((s, d) => {
      import s.implicits._
      import graft.sources.rest.RestOps
      val opts = Map("object" -> "account", "org" -> "catverify",
        "numRecords" -> "10", "seed" -> "42")
      RestOps.listObjects(opts).flatMap { o =>
        RestOps.read(s, opts + ("object" -> o)).schema.fields.zipWithIndex
          .map { case (f, i) => (o, i.toLong, f.name, f.dataType.simpleString) }
      }.toDF("obj", "pos", "field", "dtype").orderBy(col("obj"), col("pos"))
    }),

    // ------------------------------------------------ S5 quota probe
    // limits before/after a full two-phase scan (reference
    // salesforce/main.py:102-104 DailyApiRequests): the scan's API
    // spend is deterministic — 1 describe (schema inference) + 1 id
    // cursor query + ceil(400/100) = 4 id-batch fetches = 6 calls.
    // The aggregate reads a real column so column pruning keeps the
    // fetch column list non-empty (an empty list would re-describe per
    // partition and change the arithmetic). count DISTINCT on purpose:
    // a plain count(Id) now collapses to the pushed stats probe (q306
    // prices THAT path — 1 describe + 1 stats = 2 calls) and would
    // never walk the cursor this contract is pricing.
    "q103_rest_limits" -> ((s, d) => {
      import s.implicits._
      import graft.sources.rest.{FakeTransport, RestOps}
      val opts = Map("object" -> "account", "org" -> "limitsverify",
        "numRecords" -> "400", "seed" -> "42")
      FakeTransport.CallLog.clear()
      val before = RestOps.limits(opts)
      val scanned = RestOps.read(s, opts)
        .agg(count_distinct(col("Id"))).head().getLong(0)
      val after = RestOps.limits(opts)
      Seq(
        ("max", before("DailyApiRequests.Max").toString),
        ("remaining_before", before("DailyApiRequests.Remaining").toString),
        ("remaining_after", after("DailyApiRequests.Remaining").toString),
        ("rows_scanned", scanned.toString))
        .toDF("metric", "value").orderBy(col("metric"))
    }),

    // ------------------------------------------------ D17 verbose plan
    // The reference's verbose compiled-SQL print (database/
    // main.py:165-170) maps to Database.explain's formatted physical
    // plan. Driver-visible proof (the q306 recipe): the plan STRING of
    // a filtered projection carries the pushed filter, the pruned read
    // schema, and the scan node — each fact a deterministic boolean
    // row, so a pushdown/pruning regression hash-mismatches the gate,
    // not just a spec. (PlanShapeSpec pins more shapes; this entry is
    // the driver-run subset.)
    "q315_plan_print" -> ((s, d) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-d17")
      try {
        val db = new graft.Database(s, root.toString)
        val df = T(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("c_mktsegment"))
        val p = db.explain(df)
        // STRUCTURAL fact extraction (r14 advice): locate the
        // PushedFilters/ReadSchema sections and match their CONTENTS
        // order-independently, so a Spark version reordering filters
        // or reformatting the struct rendering cannot hash-mismatch a
        // gate whose pushdown/pruning still hold
        val pushedOk =
          "PushedFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p).exists { m =>
            m.group(1).contains("EqualTo(c_mktsegment,BUILDING)") &&
              m.group(1).contains("IsNotNull(c_mktsegment)")
          }
        val schemaOk =
          "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).exists { m =>
            m.group(1).split(",").map(_.trim).toSet == Set(
              "c_custkey:bigint", "c_name:string",
              "c_acctbal:double", "c_mktsegment:string")
          }
        Seq(
          ("plan:header", p.contains("== Physical Plan ==").toString),
          ("plan:pushed_filter", pushedOk.toString),
          ("plan:read_schema_pruned", schemaOk.toString),
          ("plan:scan_parquet", p.contains("Scan parquet").toString),
          ("plan:nationkey_pruned", (!p.contains("c_nationkey")).toString))
          .toDF("probe", "value").orderBy(col("probe"))
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
      }
    }),

    // ------------------------------------------------ S1 auth fallback
    // The reference's login→test environment fallback + env-var
    // credential resolution (salesforce/main.py:79-87). Driver-visible
    // proof: the fake transport's environment normalization (login and
    // test pass through, anything else falls back to test — the
    // reference's try-login-then-test collapsed to its fixed point)
    // and RestCredentials.fromEnv's all-three-or-nothing contract,
    // each a literal row. (HttpTransportSpec drives the real-wire
    // endpoint-order fallback against a local HTTP server.)
    "q316_rest_auth_env" -> ((s, d) => {
      import s.implicits._
      import graft.sources.rest.{FakeTransport, RestCredentials}
      val envRows = Seq("login", "test", "sandbox", "").map(e => (
        s"env:${if (e.isEmpty) "<empty>" else e}",
        new FakeTransport("t-q316", 1, 42, e).authenticatedEnv))
      val all = Map(
        "GRAFT_REST_CLIENT_ID" -> "cid",
        "GRAFT_REST_CLIENT_SECRET" -> "csec",
        "GRAFT_REST_REFRESH_TOKEN" -> "rtok")
      val credRows = Seq(
        ("creds:complete",
          RestCredentials.fromEnv(all).isDefined.toString),
        ("creds:missing_id",
          RestCredentials.fromEnv(all - "GRAFT_REST_CLIENT_ID").isDefined.toString),
        ("creds:missing_secret",
          RestCredentials.fromEnv(all - "GRAFT_REST_CLIENT_SECRET").isDefined.toString),
        ("creds:missing_token",
          RestCredentials.fromEnv(all - "GRAFT_REST_REFRESH_TOKEN").isDefined.toString),
        ("creds:resolved", RestCredentials.fromEnv(all)
          .map(c => s"${c.clientId}|${c.clientSecret}|${c.refreshToken}")
          .getOrElse("none")))
      (envRows ++ credRows).toDF("probe", "value").orderBy(col("probe"))
    }),

    // ------------------------------------------------ T1 timer
    // The reference's wall-clock decorator (timer.py:6-24) as
    // Timed.timed/timedValue + the Spark-native observe() analogue.
    // Driver-visible proof: elapsed > 0 over a real job, the wrapped
    // value passes through unchanged, and observed() is a transparent
    // decorator (row-preserving).
    "q317_timed" -> ((s, d) => {
      import s.implicits._
      import graft.util.Timed
      val (sc, secsScalar) = Timed.timedValue {
        Thread.sleep(1L); (1L to 1000L).sum }
      val (cnt, secsJob) = Timed.timedValue(T(s, d, "region").count())
      val viaTimed = Timed.timed("q317_probe")(T(s, d, "nation").count())
      val observed = Timed.observed(T(s, d, "nation"), "q317_obs",
        Seq(count(lit(1)).as("n_rows"))).count()
      Seq(
        ("timed:job_elapsed_positive", (secsJob > 0.0).toString),
        ("timed:job_result", (cnt == 5L).toString),
        ("timed:label_passthrough", (viaTimed == 25L).toString),
        ("timed:observed_row_preserving", (observed == 25L).toString),
        ("timed:scalar_elapsed_positive", (secsScalar > 0.0).toString),
        ("timed:scalar_result", (sc == 500500L).toString))
        .toDF("probe", "value").orderBy(col("probe"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // every plan fact is a boolean BY CONTRACT — the Spark side reads
    // them off the live formatted plan, so a pushdown or pruning
    // regression hash-mismatches here (the q306 rule)
    "q315_plan_print" ->
      """SELECT * FROM (VALUES
        |  ('plan:header', 'true'),
        |  ('plan:nationkey_pruned', 'true'),
        |  ('plan:pushed_filter', 'true'),
        |  ('plan:read_schema_pruned', 'true'),
        |  ('plan:scan_parquet', 'true')) AS t(probe, value)
        |ORDER BY probe""".stripMargin,

    // environment normalization fixed points + the all-three-or-nothing
    // env-credential rule, as literals
    "q316_rest_auth_env" ->
      """SELECT * FROM (VALUES
        |  ('creds:complete', 'true'),
        |  ('creds:missing_id', 'false'),
        |  ('creds:missing_secret', 'false'),
        |  ('creds:missing_token', 'false'),
        |  ('creds:resolved', 'cid|csec|rtok'),
        |  ('env:<empty>', 'test'),
        |  ('env:login', 'login'),
        |  ('env:sandbox', 'test'),
        |  ('env:test', 'test')) AS t(probe, value)
        |ORDER BY probe""".stripMargin,

    // the timer's contract: elapsed strictly positive, wrapped values
    // pass through, observe() row-preserving — all booleans
    "q317_timed" ->
      """SELECT * FROM (VALUES
        |  ('timed:job_elapsed_positive', 'true'),
        |  ('timed:job_result', 'true'),
        |  ('timed:label_passthrough', 'true'),
        |  ('timed:observed_row_preserving', 'true'),
        |  ('timed:scalar_elapsed_positive', 'true'),
        |  ('timed:scalar_result', 'true')) AS t(probe, value)
        |ORDER BY probe""".stripMargin,

    // every q101 fact is a deterministic driver-side value (the q90
    // recipe): the created constraint metadata, the post-evolution
    // column set, the upserted row count, and both validateUnique
    // verdicts over the three literal rows
    "q101_ddl_constraints" ->
      """SELECT * FROM (VALUES
        |  ('autoincrement', 'seq'),
        |  ('column', 'region'), ('column', 'order_id'), ('column', 'status'),
        |  ('column', 'cust_id'), ('column', 'seq'), ('column', 'note'),
        |  ('count', '3'), ('create_existing', 'thrown'),
        |  ('default:status', 'new'), ('fk:cust_id', 'customer.c_custkey'),
        |  ('pk', 'region'), ('pk', 'order_id'),
        |  ('pk_valid', 'true'), ('status_unique', 'false'),
        |  ('unique', 'seq')) AS t(kind, name)
        |ORDER BY kind, name""".stripMargin,

    // the fake org's catalog is static: two objects with fixed field
    // lists (Transport.scala objects map) — the VALUES literal IS the
    // generator
    "q102_rest_catalog" ->
      """SELECT obj, CAST(pos AS BIGINT) AS pos, field, dtype FROM (VALUES
        |  ('account', 0, 'Id', 'string'), ('account', 1, 'Name', 'string'),
        |  ('account', 2, 'Industry', 'string'), ('account', 3, 'Amount', 'double'),
        |  ('account', 4, 'NumEmployees', 'bigint'), ('account', 5, 'IsActive', 'boolean'),
        |  ('account', 6, 'LastModifiedDate', 'timestamp'), ('account', 7, 'IsDeleted', 'boolean'),
        |  ('contact', 0, 'Id', 'string'), ('contact', 1, 'Name', 'string'),
        |  ('contact', 2, 'AccountId', 'string'), ('contact', 3, 'Email', 'string'),
        |  ('contact', 4, 'LastModifiedDate', 'timestamp'), ('contact', 5, 'IsDeleted', 'boolean')
        |) AS t(obj, pos, field, dtype)
        |ORDER BY obj, pos""".stripMargin,

    // namespace facts replayed from the SF-invariant region/nation
    // fixtures (counts, probe results, cross-namespace reads)
    "q109_namespaces" ->
      """WITH facts(kind, name) AS (
        |  SELECT 'exists:geo', 'true'
        |  UNION ALL SELECT 'exists:staging.geo', 'true'
        |  UNION ALL SELECT 'exists:geo@staging', 'true'
        |  UNION ALL SELECT 'exists:missing.geo', 'false'
        |  UNION ALL SELECT 'count:public', CAST((SELECT count(*) FROM region) AS VARCHAR)
        |  UNION ALL SELECT 'count:staging', CAST((SELECT count(*) FROM nation) AS VARCHAR)
        |  UNION ALL SELECT 'tables:public', 'geo'
        |  UNION ALL SELECT 'tables:staging', 'geo'
        |  UNION ALL SELECT 'row:' || CAST(n_nationkey AS VARCHAR), n_name
        |  FROM nation WHERE n_nationkey < 5)
        |SELECT kind, name FROM facts ORDER BY kind, name""".stripMargin,

    // autoincrement sequence replay: batch 1 (no id column) numbers
    // 1..20 in (name, bal) order; batch 2's NULL-id rows continue from
    // the table max (20) in the same order; the explicit-id row merges
    // under the COALESCE rule (patched name, old bal kept)
    "q108_autoincrement" ->
      """WITH b1 AS (
        |  SELECT c_name AS name, c_acctbal AS bal FROM customer WHERE c_custkey <= 20),
        |t1 AS (
        |  SELECT row_number() OVER (ORDER BY name, bal) AS id, name, bal FROM b1),
        |news AS (
        |  SELECT (SELECT count(*) FROM b1) + row_number() OVER (ORDER BY name, bal) AS id,
        |    name, bal
        |  FROM (VALUES ('aa-new', 2.5), ('zz-new', 1.5)) v(name, bal)),
        |upd(id, name) AS (VALUES (3, 'patched')),
        |merged AS (
        |  SELECT t1.id, COALESCE(u.name, t1.name) AS name, t1.bal
        |  FROM t1 LEFT JOIN upd u ON t1.id = u.id
        |  UNION ALL
        |  SELECT id, name, bal FROM news)
        |SELECT CAST(id AS BIGINT) AS id, name, CAST(bal AS DOUBLE) AS bal
        |FROM merged ORDER BY id""".stripMargin,

    // staged scrub replay: count each type on the PREVIOUS stage's
    // text (so a URL's host never double-counts as an IP), 'g' flag =
    // Spark's replace-all default
    "q106_pii_scrub" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com via http://site' || CAST(doc_id AS VARCHAR) || '.example/page or 10.0.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE text END AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id, text, regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 FROM inj),
        |s2 AS (SELECT doc_id, text, t1, regexp_replace(t1, 'https?://[^ \t\n\r]+', '<URL>', 'g') AS t2 FROM s1)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(t1, 'https?://[^ \t\n\r]+')) AS BIGINT) AS n_url,
        |  CAST(len(regexp_extract_all(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ip,
        |  md5(regexp_replace(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')) AS scrubbed_md5
        |FROM s2 ORDER BY doc_id""".stripMargin,

    // quota arithmetic: 100000 cap; the scan spends exactly 6 calls
    // (1 describe + 1 id query + 400/100 fetch batches); all 400 rows
    // (includeDeleted defaults true) are counted
    "q103_rest_limits" ->
      """SELECT * FROM (VALUES
        |  ('max', '100000'),
        |  ('remaining_after', '99994'),
        |  ('remaining_before', '100000'),
        |  ('rows_scanned', '400')) AS t(metric, value)
        |ORDER BY metric""".stripMargin
  )
}
