package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-SQL passthrough, reference `Database.execute_raw` (reference:
  * revtron/database/main.py:287-293). The reference ships the string to
  * Postgres; here the full Catalyst parse → analyze → optimize → execute
  * pipeline runs it — this is the entry point that makes the engine a
  * query engine rather than a DSL (SURVEY §2.1 D15). */
object Sql {
  def executeRaw(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  // `ALTER TABLE t ADD COLUMNS (a TYPE, …)` / `ADD COLUMN a TYPE` — the
  // reference's add_column idiom arriving as raw SQL (database/
  // main.py:172-189). Spark's own ALTER TABLE only touches catalog
  // tables, so [[graft.Database.executeRaw]] routes a match to the
  // snapshot store's additive evolution instead.
  private val AlterAddParens =
    """(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+COLUMNS?\s*\((.+)\)\s*;?\s*""".r
  // the bare form must admit parenthesized TYPES — DECIMAL(10,2),
  // VARCHAR(20) — so the column-def group is anything fromDDL can parse
  private val AlterAddBare =
    """(?is)\s*ALTER\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)\s+ADD\s+COLUMNS?\s+(.+?)\s*;?\s*""".r

  /** Parse an additive ALTER TABLE statement → (table, added columns).
    * Column definitions use Spark DDL syntax (`name TYPE, …`). */
  def parseAlterAddColumns(sql: String): Option[(String, org.apache.spark.sql.types.StructType)] = {
    val m = sql match {
      case AlterAddParens(t, cols) => Some((t, cols))
      case AlterAddBare(t, cols) => Some((t, cols))
      case _ => None
    }
    m.flatMap { case (t, cols) =>
      scala.util.Try(org.apache.spark.sql.types.StructType.fromDDL(cols))
        .toOption.map(t -> _)
    }
  }

  /** The reference's verbose compiled-SQL print (database/main.py:281-283)
    * maps to the physical plan dump. */
  def explain(df: DataFrame): String = df.queryExecution.explainString(
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
}
