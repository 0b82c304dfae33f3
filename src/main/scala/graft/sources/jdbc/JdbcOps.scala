package graft.sources.jdbc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink — the reference's ACTUAL substrate (`Database` is a
  * Postgres wrapper over a `db_url`, reference:
  * revtron/database/main.py:39-49). The parquet-snapshot [[graft.core.TableStore]]
  * is the analytics-grade default; this module is the drop-in path when
  * the target really is an RDBMS.
  *
  * Spark's JDBC source gives the same transfer heuristics the reference
  * hand-codes, but planned by Catalyst: predicate pushdown into the
  * remote WHERE (the reference builds it by hand, main.py:191-216),
  * column pruning into the SELECT, aggregate pushdown
  * (`pushDownAggregate`), and partitioned parallel reads
  * (`partitionColumn`/`numPartitions` — the principled version of the
  * reference's fixed 1000-row chunks, main.py:92,100-101).
  */
object JdbcOps {

  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).load()

  /** Parallel partitioned read: numPartitions concurrent connections,
    * each scanning one stride of [lower, upper] on partitionColumn. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Write (append/overwrite). Upsert (`INSERT … ON CONFLICT`) is not
    * in Spark's JDBC sink vocabulary — the engine-level
    * [[graft.core.Mutations.upsert]] merge + overwrite write is the
    * distributed equivalent. */
  def write(df: DataFrame, url: String, table: String,
      mode: String = "append", options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).mode(mode).save()

  /** Safe read-modify-replace of the SAME table: JDBC overwrite
    * truncates before the (lazy) plan reads, so `write(merge(read(t)),
    * t, "overwrite")` silently merges against an EMPTY table. This
    * helper materializes the result first (eager localCheckpoint cuts
    * the lineage back to the source table), then overwrites — the JDBC
    * cousin of the snapshot store's write-new-then-swap (SURVEY §3.2).
    * Not crash-atomic (use TableStore for that); correct under lazy
    * evaluation, which is the trap that actually bites. */
  def replace(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit =
    write(df.localCheckpoint(true), url, table, "overwrite", options)

  /** D1 liveness probe against the remote — the reference's bare
    * `select 1 as is_alive` (main.py:47), valid without FROM on
    * Postgres/MySQL/SQLite (the dialects the reference targets). Derby
    * alone insists on a FROM clause, so Derby URLs get its dummy table.
    * Probe failures return false (a liveness probe never throws). */
  def isAlive(spark: SparkSession, url: String): Boolean = {
    val probe =
      if (url.startsWith("jdbc:derby")) "select 1 as is_alive from SYSIBM.SYSDUMMY1"
      else "select 1 as is_alive"
    try
      spark.read.format("jdbc")
        .option("url", url).option("query", probe)
        .load().collect().head.get(0).toString == "1"
    catch { case scala.util.control.NonFatal(_) => false }
  }
}
