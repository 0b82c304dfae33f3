package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative column model, reference `Database.ColumnModel` (reference:
  * revtron/database/main.py:28-37): name/type/default/server_default/
  * autoincrement/foreign_key. Spark has no enforced constraints, so PK /
  * unique / FK / default are carried in [[StructField]] metadata and
  * (optionally) VALIDATED on write rather than enforced (SURVEY §7.5). */
final case class ColumnSpec(
    name: String,
    dataType: DataType,
    nullable: Boolean = true,
    default: Option[Any] = None,
    autoincrement: Boolean = false,
    foreignKey: Option[String] = None) {

  def toField: StructField = {
    val mb = new MetadataBuilder()
    default.foreach(d => mb.putString("default", String.valueOf(d)))
    if (autoincrement) mb.putBoolean("autoincrement", true)
    foreignKey.foreach(fk => mb.putString("foreign_key", fk))
    StructField(name, dataType, nullable, mb.build())
  }
}

/** DDL + additive schema evolution, reference `Database.create_table` /
  * `add_column` (reference: revtron/database/main.py:119-189). */
object Ddl {

  def toStruct(specs: Seq[ColumnSpec]): StructType = StructType(specs.map(_.toField))

  /** Create-if-absent with additive evolution: if the table exists and
    * `checkExisting`, diff declared vs existing columns and ADD the
    * missing ones (never drop or retype) — reference main.py:129-140.
    * With `checkExisting = false` an existing table is an ERROR
    * (mirroring the reference's checkfirst=False, main.py:163-164) —
    * never silently replaced. PK/unique membership is recorded in the
    * created schema's field metadata. */
  def createTable(
      store: TableStore,
      spark: SparkSession,
      name: String,
      specs: Seq[ColumnSpec],
      primaryKey: Seq[String] = Nil,
      uniqueColumns: Seq[String] = Nil,
      checkExisting: Boolean = true): Unit = {
    if (store.tableExists(name)) {
      if (!checkExisting)
        throw new IllegalStateException(s"table already exists: $name")
      val existing = store.read(name)
      val missing = specs.filterNot(s => existing.columns.contains(s.name))
      if (missing.nonEmpty) store.write(name, evolveSchema(existing, missing))
    } else {
      val schema = StructType(toStruct(specs).fields.map { f =>
        val mb = new MetadataBuilder().withMetadata(f.metadata)
        if (primaryKey.contains(f.name)) mb.putBoolean("primary_key", true)
        if (uniqueColumns.contains(f.name)) mb.putBoolean("unique", true)
        f.copy(metadata = mb.build())
      })
      store.write(name, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    }
  }

  /** `ALTER TABLE … ADD COLUMN` for parquet snapshots: project the new
    * column with its default (reference main.py:172-189). A NOT NULL
    * column needs a default — existing rows would otherwise violate the
    * declared constraint the moment it was added (we REFUSE rather than
    * silently record a nullable column the caller declared NOT NULL). */
  def addColumn(df: DataFrame, spec: ColumnSpec): DataFrame = {
    require(spec.nullable || spec.default.nonEmpty,
      s"cannot add NOT NULL column '${spec.name}' without a default: " +
        "existing rows would be null")
    df.withColumn(spec.name,
      lit(spec.default.orNull).cast(spec.dataType))
  }

  /** Additive evolution: add every missing declared column; never drop
    * or retype existing ones (reference main.py:129-140). */
  def evolveSchema(df: DataFrame, specs: Seq[ColumnSpec]): DataFrame =
    specs.filterNot(s => df.columns.contains(s.name)).foldLeft(df)(addColumn)

  /** Align a reader to a target schema (read-side evolution): missing
    * columns null-filled, order normalized — the unionByName idiom. */
  def conformTo(df: DataFrame, schema: StructType): DataFrame = {
    val withAll = schema.fields.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    withAll.select(schema.fieldNames.map(col): _*)
  }

  /** Re-apply declared per-column metadata (PK/unique/autoincrement/
    * default/FK) from a previous schema onto a mutated frame. Join and
    * coalesce expressions STRIP field metadata, so without this the
    * first upsert would silently drop the table's declared constraints
    * from the stored snapshot (and autoincrement assignment would stop
    * working on the second batch). Columns new to the frame (additive
    * evolution) pass through untouched. */
  def preserveMetadata(df: DataFrame, prev: StructType): DataFrame = {
    val metaByName = prev.fields
      .map(f => f.name.toLowerCase -> f.metadata).toMap
    df.select(df.schema.fields.map { f =>
      metaByName.get(f.name.toLowerCase) match {
        case Some(m) if m != Metadata.empty => col(f.name).as(f.name, m)
        case _ => col(f.name)
      }
    }.toSeq: _*)
  }

  /** PK/unique VALIDATION (not enforcement): true iff no duplicate keys.
    * Distributed check — a partial-agg groupBy, no collect. */
  def validateUnique(df: DataFrame, keys: Seq[String]): Boolean =
    df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).isEmpty

  /** Autoincrement surrogate ids: dense, stable (sorted by `orderBy`),
    * 1-based — NOT monotonically_increasing_id, whose values are
    * partition-sparse (SURVEY §7.5).
    *
    * Two-phase distributed shape (the packSequences prefix-sum idea):
    * a range-partitioned sort, then `zipWithIndex` assigns per-partition
    * row numbers plus broadcast exclusive partition offsets. NOT a
    * `Window.orderBy` with no partitioning — that funnels the whole
    * table through ONE task and was the last single-partition global
    * window in the tree. zipWithIndex's two passes (count job + map job)
    * both read the sort's shuffle files, so the data shuffles once. The
    * RDD seam is the one operation Catalyst cannot express
    * (per-partition offset assignment); prune columns BEFORE calling —
    * the row transcoding here costs per byte carried. */
  def assignIds(df: DataFrame, idCol: String, orderBy: Seq[String]): DataFrame = {
    require(orderBy.nonEmpty, "assignIds requires at least one order column")
    val sorted = df.orderBy(orderBy.map(col): _*)
    val out = StructType(sorted.schema.fields :+
      StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rdd, out)
  }

  /** D16 autoincrement ASSIGNMENT (reference main.py:33 — SQLAlchemy
    * autoincrement means the SERVER assigns ids to inserted rows that
    * do not provide one; the metadata flag alone does nothing). Batch
    * rows whose `idCol` is absent or NULL receive DENSE ids continuing
    * from the current maximum across BOTH the table and the batch's
    * explicit ids; explicit ids pass through untouched. Assignment
    * order is `orderBy` over the id-less rows — a Postgres sequence's
    * assignment order is connection-interleaving trivia, so we promote
    * determinism to the contract instead (same batch ⇒ same ids,
    * replayable by an oracle). Ids are assigned via [[assignIds]]'s
    * two-phase zipWithIndex shape — never a single-partition window —
    * and an empty table starts the sequence at 1. */
  def fillAutoincrement(target: DataFrame, batch: DataFrame, idCol: String,
      orderBy: Seq[String]): DataFrame = {
    val idType = target.schema.fields
      .find(_.name.equalsIgnoreCase(idCol)).map(_.dataType).getOrElse(LongType)
    val hasCol = batch.columns.exists(_.equalsIgnoreCase(idCol))
    def maxOf(df: DataFrame): Long = {
      val r = df.agg(max(col(idCol).cast("long"))).head()
      if (r.isNullAt(0)) 0L else math.max(0L, r.getLong(0))
    }
    val base = math.max(maxOf(target), if (hasCol) maxOf(batch) else 0L)
    def assign(rows: DataFrame): DataFrame =
      assignIds(rows, idCol, orderBy)
        .withColumn(idCol, (col(idCol) + base).cast(idType))
    if (!hasCol) assign(batch)
    else if (batch.filter(col(idCol).isNull).isEmpty) batch
    else batch.filter(col(idCol).isNotNull)
      .unionByName(assign(batch.filter(col(idCol).isNull).drop(idCol))
        .select(batch.columns.map(col): _*))
  }
}
