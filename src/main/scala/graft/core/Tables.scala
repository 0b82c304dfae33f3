package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture access: one parquet file per table under a scale-factor dir
  * (TESTDATA.md). Also registers temp views so `Sql.executeRaw` (D15)
  * can address tables by name, mirroring the reference's schema-scoped
  * table addressing (reference: revtron/database/main.py:39-46,59-66). */
object Fx {
  val StarTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val AllTables: Seq[String] =
    StarTables ++ Seq("events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver has regenerated events.parquet with DIFFERENT physical
    // ts types across rounds: TIMESTAMP(NANOS) (vectorized reader
    // rejects it; readable only via nanosAsLong, arriving as LongType)
    // and, currently, TIMESTAMP_MICROS with isAdjustedToUTC=false
    // (arriving as TIMESTAMP_NTZ, which e.g. CAST(.. AS BIGINT)
    // rejects). Normalize BOTH to session-zoned TimestampType at this
    // single chokepoint so every downstream consumer sees one type.
    // Normalization is SCAN-NATIVE: disabling NTZ schema inference
    // makes the parquet scan itself yield session-zoned TimestampType
    // for micros-NTZ files (the pre-3.4 read behavior — identical
    // micros decode, and value-preserving since the session tz is
    // UTC). This matters at scale: a normalizing cast ABOVE the scan
    // would block ts predicate pushdown, turning every date-window
    // incremental pull (q33/q35, reference salesforce/main.py:110-128)
    // into a full 100 TB scan. PlanShapeSpec locks the PushedFilters.
    // With inference disabled, no read here can produce TIMESTAMP_NTZ,
    // so the only remaining special case is the nanos generation
    // (arriving as LongType via nanosAsLong). Downstream operators
    // (e.g. Streams.sessionizeBatch) are still NTZ-proof on their own,
    // for user-supplied frames read outside this chokepoint.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The micros-NTZ → session-zoned normalization above is only
    // value-preserving when the session tz is UTC. Every graft entry
    // point sets it, but nothing else enforces it at this chokepoint —
    // and a silent off-UTC read would shift every event timestamp.
    require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "graft fixture reads require spark.sql.session.timeZone=UTC " +
        "(NTZ-to-session-zoned normalization is value-preserving only in UTC)")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        // nanos-as-long: exact integer division (a double division
        // would lose precision at 1e18 nanos)
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }

  /** Idempotent: (re-)register every fixture table as a temp view.
    * Memoized per (session, dir) — re-reading 10 parquet footers per
    * SQL query is measurable overhead in the bench loop. Registered
    * views capture the parquet FILE LISTING at registration time, so if
    * the files under `dir` are rewritten in-session, pass
    * `force = true` to re-resolve (the memo can't see disk changes). */
  def registerAll(spark: SparkSession, dir: String, force: Boolean = false): Unit = {
    val key = "graft.fx.registeredDir"
    if (force || !spark.conf.getOption(key).contains(dir)) {
      AllTables.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
      spark.conf.set(key, dir)
    }
  }
}

/** Catalog + snapshot-versioned storage.
  *
  * Replaces the reference's live-Postgres reflection and DDL (reference:
  * revtron/database/main.py:59-86) with a parquet-snapshot store:
  * mutations produce a NEW immutable snapshot directory and a pointer
  * swap makes it current — whole-write atomicity (the reference only had
  * per-chunk atomicity, SURVEY §3.2). Concurrent writers are out of
  * scope (single-writer, like the reference's single client).
  *
  * Layout: `$root/$name/v{N}/part-*.parquet` + `$root/$name/_LATEST`
  * containing the current version number.
  */
final class TableStore(spark: SparkSession, root: String) {
  private val VersionDir = "v(\\d+)".r
  private val ClaimFile = "v(\\d+)\\._CLAIM".r
  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def tableDir(name: String) = new Path(root, name)
  private def latestFile(name: String) = new Path(tableDir(name), "_LATEST")
  private def claimFile(name: String, v: Int) =
    new Path(tableDir(name), s"v$v._CLAIM")
  // breadcrumb created after the FIRST successful swap: distinguishes
  // "pointer never existed" (pre-first-swap kill — recoverable from the
  // newest complete dir) from "pointer LOST on a swapped table" (manual
  // damage — recovery must not silently promote a phantom snapshot)
  private def swappedMarker(name: String) = new Path(tableDir(name), "_SWAPPED")

  /** The raw `_LATEST` pointer, no recovery fallback — what the write
    * fence watches (the fallback would see the fencing writer's OWN
    * freshly committed dir and misread it as a racer). */
  private def readPointer(name: String): Option[Int] = {
    val lf = latestFile(name)
    if (!fs.exists(lf)) None
    else {
      val in = fs.open(lf)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  private def currentVersion(name: String): Option[Int] = {
    val ptr = readPointer(name)
    if (ptr.isDefined) ptr
    else {
      val dir = tableDir(name)
      if (!fs.exists(dir)) None
      else if (fs.exists(swappedMarker(name)))
        // a swap HAS landed on this table before, so a missing pointer
        // is damage, not a first-swap kill — refusing beats silently
        // promoting a committed-but-never-current phantom dir
        throw new IllegalStateException(
          s"table $name: _LATEST pointer is missing but the table has " +
          "swapped before (_SWAPPED marker present) — the newest " +
          "complete dir may be a phantom that was never current. " +
          "Restore _LATEST to the intended version (then gc() sweeps " +
          "the rest); refusing to guess")
      else
        // pointer never existed (kill before the very FIRST swap):
        // recover the newest COMPLETE snapshot directory — only dirs
        // whose parquet job committed (_SUCCESS) qualify; a crash
        // mid-write leaves a partial dir that must never be served
        fs.listStatus(dir).toSeq.filter(_.isDirectory)
          .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
          .map(_.getPath.getName)
          .collect { case VersionDir(n) => n.toInt }
          .maxOption
    }
  }

  def tableExists(name: String): Boolean = currentVersion(name).isDefined

  def listTables(): Seq[String] = {
    val r = new Path(root)
    if (!fs.exists(r)) Nil
    else fs.listStatus(r).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(tableExists).sorted
  }

  def listColumns(name: String): Seq[String] = read(name).columns.toSeq

  def count(name: String): Long = read(name).count()

  def read(name: String): DataFrame = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    spark.read.parquet(new Path(tableDir(name), s"v$v").toString)
  }

  /** All COMMITTED snapshot versions of a table, ascending — every
    * `v{N}` directory whose parquet job wrote `_SUCCESS`, capped at
    * the current pointer. The history the time-travel read below
    * addresses; a crash-partial snapshot (no `_SUCCESS`) never
    * appears, and neither does a PHANTOM snapshot — one whose parquet
    * job committed but whose pointer swap never landed (a kill in the
    * write-to-swap window): it is not history until the swap makes it
    * so, and the next [[write]] overwrites it. */
  def versions(name: String): Seq[Int] = {
    val dir = tableDir(name)
    val cap = currentVersion(name)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName)
      .collect { case VersionDir(n) => n.toInt }
      .filter(v => cap.exists(v <= _))
      .sorted
  }

  /** Time-travel read: the table AS OF snapshot `version` (Delta-style
    * `VERSION AS OF`). Snapshots are immutable once committed, so this
    * is just a scan of the old directory — audits, reproducing a
    * training run against the exact corpus it saw, and diffing two
    * curation runs all read history this way. Mutations never rewrite
    * old versions ([[write]] always creates `v{N+1}`), so the history
    * stays valid until [[drop]]; compaction/retention policy is the
    * caller's. */
  def readVersion(name: String, version: Int): DataFrame = {
    val dest = new Path(tableDir(name), s"v$version")
    require(fs.exists(dest) && fs.exists(new Path(dest, "_SUCCESS")) &&
        currentVersion(name).exists(version <= _),
      s"no committed snapshot v$version of table $name " +
        s"(committed: ${versions(name).mkString(",")})")
    spark.read.parquet(dest.toString)
  }

  /** Write a new snapshot then atomically swap the pointer.
    * `partitionBy` lays the snapshot out hive-style (`col=value/`
    * directories) so reads with a filter on those columns prune whole
    * partitions at planning time (`PartitionFilters` in the scan) —
    * the storage-level filter for 100 TB tables. `maxRecordsPerFile`
    * caps rows per output file (0 = Spark default): the small-files /
    * giant-files guard — a 100 TB snapshot wants ~128 MB-to-1 GB files,
    * not one file per shuffle partition of arbitrary size. */
  /** CRASH-SAFETY PROTOCOL (every kill window is spec-pinned in
    * TableStoreCrashSpec):
    *   0. WRITER FENCE: exclusive-create `v{N}._CLAIM` (atomic on
    *      HDFS/local), then re-validate the base pointer — a second
    *      writer racing this version either loses the claim or sees a
    *      moved base, and THROWS before its parquet job can clobber
    *      `v{N}`; silent last-wins is impossible;
    *   1. parquet job → `v{N}` (partial dir has no `_SUCCESS`; never
    *      served, overwritten by the next write);
    *   2. re-validate the base pointer, then pointer text →
    *      `_LATEST.tmp{N}`, hsync'd before close (the bytes are
    *      durable before the swap can expose them);
    *   3. ONE atomic overwrite-rename → `_LATEST` (no delete-then-
    *      rename window in which a crash leaves the table
    *      pointer-less; a failed rename throws, never passes silently);
    *   4. the claim releases (finally — a FAILED write never blocks
    *      the retry); stray `_LATEST.tmp*` from earlier kills are
    *      swept after the swap ([[gc]] sweeps orphan snapshot dirs
    *      and stale claims on demand).
    * A kill between 0 and 3 leaves the previous version serving AND a
    * stale claim: the store cannot distinguish a dead writer from a
    * live concurrent one, so the re-run throws BY NAME and [[gc]]
    * clears the claim — then the re-run converges onto the same
    * `v{N}`. A kill before the very first swap is recovered by
    * [[currentVersion]]'s newest-complete-dir fallback (guarded by
    * the `_SWAPPED` breadcrumb: once any swap has landed, a missing
    * pointer refuses loudly instead of promoting a phantom). */
  def write(name: String, df: DataFrame, partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): Unit = {
    val basedOn = currentVersion(name)
    // the fence watches the RAW pointer: before the first-ever swap it
    // is None even when the fallback recovers a committed dir, and our
    // own parquet commit never moves it — only a racer's swap does
    val basePointer = readPointer(name)
    val next = basedOn.getOrElse(-1) + 1
    val dest = new Path(tableDir(name), s"v$next")
    fs.mkdirs(tableDir(name)) // createNewFile needs the parent
    if (!fs.createNewFile(claimFile(name, next)))
      throw new IllegalStateException(
        s"table $name: v$next is already claimed by another writer " +
        s"(${claimFile(name, next).getName} present). If that writer " +
        "is dead (killed mid-write), run gc() to clear stale claims " +
        "and retry; if it is alive, this write would have clobbered " +
        "its snapshot")
    try {
      def fence(): Unit = {
        val cur = readPointer(name)
        if (cur != basePointer) throw new IllegalStateException(
          s"table $name: concurrent writer detected — the pointer " +
          s"moved from $basePointer to $cur while this write was in " +
          s"flight; aborting (any v$next output is orphaned, gc() " +
          "sweeps it). Re-read and retry on the new current version")
      }
      fence() // the claim may have been won AFTER a racer's swap landed
      val w0 = df.write.mode("overwrite")
      val w = if (maxRecordsPerFile > 0) w0.option("maxRecordsPerFile", maxRecordsPerFile) else w0
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(dest.toString)
      fence() // last look before the swap becomes visible
      val tmp = new Path(tableDir(name), s"_LATEST.tmp$next")
      val out = fs.create(tmp, true)
      // durable before visible: hsync (or flush where the fs has no
      // Syncable) so a post-swap crash cannot surface a truncated pointer
      try { out.write(next.toString.getBytes("UTF-8")); out.hsync() }
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        new Path(root).toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, latestFile(name), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      if (!fs.exists(swappedMarker(name))) fs.createNewFile(swappedMarker(name))
      // sweep pointer temps a previous kill stranded (cheap: name-match
      // on the table dir listing only)
      fs.listStatus(tableDir(name)).toSeq.filter(_.isFile)
        .map(_.getPath).filter(_.getName.startsWith("_LATEST.tmp"))
        .foreach(p => fs.delete(p, false))
    } finally fs.delete(claimFile(name, next), false)
  }

  /** Orphan GC — the explicit sweep for leftovers a kill stranded:
    * crash-PARTIAL snapshot dirs (no `_SUCCESS`), PHANTOM dirs above
    * the current pointer (parquet committed, swap never landed — the
    * next write would overwrite `v{pointer+1}` anyway, but later
    * phantoms from repeated kills would linger), and stray
    * `_LATEST.tmp*` pointer temps, and STALE WRITER CLAIMS
    * (`v{N}._CLAIM` a kill stranded — claims only exist mid-write, so
    * at rest every claim is stale). Never touches committed history
    * at or below the pointer, nor the `_SWAPPED` breadcrumb. Returns
    * the deleted path names. Safe to run any time under the
    * single-writer contract — with concurrent writers, running gc
    * while another writer is mid-flight would break ITS claim, so
    * quiesce first. */
  def gc(name: String): Seq[String] = {
    val dir = tableDir(name)
    if (!fs.exists(dir)) return Nil
    val cap = currentVersion(name)
    val doomed = fs.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      n match {
        case _ if st.isFile && n.startsWith("_LATEST.tmp") => Some(st.getPath)
        case ClaimFile(_) if st.isFile => Some(st.getPath)
        case VersionDir(v) if st.isDirectory =>
          val committed = fs.exists(new Path(st.getPath, "_SUCCESS"))
          val pointed = cap.exists(v.toInt <= _)
          if (!committed || !pointed) Some(st.getPath) else None
        case _ => None
      }
    }
    doomed.foreach(p => fs.delete(p, true))
    doomed.map(_.getName)
  }

  def drop(name: String): Unit =
    if (fs.exists(tableDir(name))) fs.delete(tableDir(name), true)

  /** Compaction: rewrite the CURRENT snapshot as a new version with a
    * controlled file layout (small-files repair after many incremental
    * upserts — each upsert writes a full snapshot, but its file count
    * follows the shuffle partitioning of the moment, not the table's
    * ideal layout). Data is byte-identical; only the physical layout
    * changes, and history stays intact (compaction is just another
    * committed version). */
  def compact(name: String, partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): Unit =
    write(name, read(name), partitionBy, maxRecordsPerFile)

  /** Physical-layout stats of the CURRENT snapshot: (file count, total
    * bytes, min file bytes, max file bytes) from the directory listing
    * — the small-file observability [[compact]] acts on (a 100 TB
    * table serving 10⁶ kilobyte files is a metadata DoS on the
    * planner; this is the number a compaction policy watches). Pure
    * driver-side metadata, no scan. */
  def layoutStats(name: String): (Int, Long, Long, Long) = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val sizes = fs.listStatus(new Path(tableDir(name), s"v$v")).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen)
    require(sizes.nonEmpty, s"committed snapshot v$v of $name has no data files")
    (sizes.length, sizes.sum, sizes.min, sizes.max)
  }

  /** Right-to-be-forgotten: physically excise every row matching
    * `condition` from EVERY committed snapshot version — time travel
    * makes ordinary deletes insufficient (a GDPR erasure that leaves
    * the user in `v3` of history hasn't erased anything), so this is
    * the one operation allowed to rewrite committed versions in place.
    * NULL conditions keep the row (only a definite match is erased).
    * Version numbers, history shape, and the current pointer are all
    * preserved; returns the total rows removed across versions.
    *
    * Each version is one filter scan materialized BEFORE its directory
    * is overwritten (read-then-overwrite on the same path needs the
    * barrier), so cost is one pass over history — the expected shape
    * for an erasure batch job. */
  def forgetWhere(name: String, condition: org.apache.spark.sql.Column): Long = {
    var removed = 0L
    versions(name).foreach { v =>
      val cur = readVersion(name, v)
      val before = cur.count()
      val keep = cur
        .filter(!org.apache.spark.sql.functions.coalesce(
          condition, org.apache.spark.sql.functions.lit(false)))
        .localCheckpoint(true)
      removed += before - keep.count()
      keep.write.mode("overwrite")
        .parquet(new Path(tableDir(name), s"v$v").toString)
      keep.unpersist()
    }
    removed
  }

  /** Retention: delete all but the newest `keepLast` committed
    * snapshots. The time-travel horizon is a RESOURCE decision — old
    * versions cost storage forever otherwise; this is the `VACUUM`
    * analogue. The current version is always retained (`keepLast` ≥ 1
    * enforced); returns the versions actually deleted. */
  def expireVersions(name: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val vs = versions(name)
    val doomed = vs.dropRight(keepLast)
    doomed.foreach(v => fs.delete(new Path(tableDir(name), s"v$v"), true))
    doomed
  }

  // ------------------------------------------------------------- views
  // Persistent views: stored SQL text under `$root/_views/<name>.sql`
  // (the reference's get_views lists REAL database views,
  // main.py:85-86 — the snapshot-store analogue is stored query text,
  // the classic logical-view design: nothing materialized, the SQL
  // replans against the CURRENT snapshot on every use).
  private def viewsDir = new Path(root, "_views")
  private def viewFile(name: String) = new Path(viewsDir, s"$name.sql")

  def createView(name: String, sql: String): Unit = {
    val out = fs.create(viewFile(name), true)
    try out.write(sql.getBytes("UTF-8")) finally out.close()
  }

  def viewSql(name: String): Option[String] =
    if (!fs.exists(viewFile(name))) None
    else {
      val in = fs.open(viewFile(name))
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    }

  def listViews(): Seq[String] =
    if (!fs.exists(viewsDir)) Nil
    else fs.listStatus(viewsDir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".sql")).map(_.stripSuffix(".sql")).sorted

  def dropView(name: String): Unit =
    if (fs.exists(viewFile(name))) fs.delete(viewFile(name), false)
}
