package graft.sources.files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources/sinks beyond parquet (CSV / JSON lines / text),
  * with the schema discipline a 100 TB pipeline needs:
  *
  *  - reads take an EXPLICIT schema by default — schema inference is a
  *    whole extra pass over the data and is non-deterministic under
  *    sampling, so it is opt-in (`inferSchema`), never the default;
  *  - `columnNameOfCorruptRecord` routes malformed rows to a column
  *    instead of dropping them silently (PERMISSIVE), so a corrupt
  *    0.001% of an ingest is visible and quarantinable;
  *  - all paths/partitioning/compression flow through standard Spark
  *    options — these helpers pin the defaults, not wrap the API away.
  */
object FileSources {

  val CorruptCol = "_corrupt_record"

  /** Read CSV with an explicit schema; malformed rows land in
    * [[CorruptCol]] (add it to the schema to inspect them). */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ",",
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read
      .option("header", header)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .options(options)
      .schema(schema)
      .csv(path)

  /** Read JSON-lines with an explicit schema (one object per line —
    * the splittable form; multiLine JSON is a single-split read and is
    * deliberately NOT the default). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .options(options)
      .schema(schema)
      .json(path)

  /** Read raw text: one row per line (`value: string`) — the ingest
    * form for the document pipeline (id = hash of content or path). */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF()

  /** Rows whose [[CorruptCol]] is non-null — the quarantine stream.
    * Spark refuses a query that reads ONLY the corrupt column straight
    * off raw files (the parser would have nothing to fail on), so this
    * CACHES the input frame — which a quarantine pass wants anyway:
    * parse once, split into clean + corrupt. The cache handle is the
    * caller's `df` reference: call `df.unpersist()` once both streams
    * are consumed, or each ingest batch leaks one cached relation. */
  def corruptRows(df: DataFrame): DataFrame = {
    require(df.columns.contains(CorruptCol),
      s"schema must include $CorruptCol to quarantine corrupt rows")
    val parsed = df.cache()
    parsed.filter(org.apache.spark.sql.functions.col(CorruptCol).isNotNull)
  }

  /** Read ORC (columnar, predicate-pushdown-capable like parquet —
    * the interop format when upstream systems are Hive/Trino-based).
    * Schema comes from the file footer; pass `schema` to pin it. */
  def orc(spark: SparkSession, path: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.options(options)
    schema.fold(r)(r.schema).orc(path)
  }

  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("header", header)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).csv(path)
  }

  def writeJsonLines(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }
}
