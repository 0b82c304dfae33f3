package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run with NO exchange at read
  * time — the storage-level answer to "this join shuffles 100 TB every
  * night" (SCALE.md). The reference's fixed-size chunking
  * (revtron/database/main.py:92,100-101) is the degenerate single-node
  * cousin of this idea: partition the data by key once, operate per
  * partition thereafter.
  *
  * Bucket metadata lives in the session catalog, so `spark.table` must
  * be used for reads (a bare parquet path read has no bucket info).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table. Both sides of a future
    * join must use the same `numBuckets` and key. Replaces an existing
    * table of the same name — including a STALE warehouse directory a
    * previous session left behind that the (in-memory) catalog no
    * longer knows about, which would otherwise fail the create with
    * LOCATION_ALREADY_EXISTS. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // resolve the managed location the way saveAsTable will: inside the
    // CURRENT database's directory (default db = warehouse root) — a
    // hardcoded <warehouse>/<table> would delete the wrong data when a
    // non-default database is current
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val db = spark.catalog.currentDatabase
    val dbDir = if (db == "default") warehouse
      else new org.apache.hadoop.fs.Path(warehouse, s"${db.toLowerCase}.db")
    val loc = new org.apache.hadoop.fs.Path(dbDir, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — Catalyst sees the
    * matching output partitioning and plans a SortMergeJoin with zero
    * Exchange operators (verified in BucketingSpec). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
