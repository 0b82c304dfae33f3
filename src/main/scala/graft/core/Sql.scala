package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-SQL passthrough, reference `Database.execute_raw` (reference:
  * revtron/database/main.py:287-293). The reference ships the string to
  * Postgres; here the full Catalyst parse → analyze → optimize → execute
  * pipeline runs it — this is the entry point that makes the engine a
  * query engine rather than a DSL (SURVEY §2.1 D15). */
object Sql {
  def executeRaw(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** The reference's verbose compiled-SQL print (database/main.py:281-283)
    * maps to the physical plan dump. */
  def explain(df: DataFrame): String = df.queryExecution.explainString(
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
}
