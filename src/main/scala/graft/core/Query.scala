package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sort key: column name + direction. */
final case class SortKey(col: String, ascending: Boolean = true)

/** The main read path.
  *
  * Mirrors the reference's `Database.get` (reference:
  * revtron/database/main.py:218-248): projection, predicate-DSL filter,
  * single-column ORDER BY asc/desc, OFFSET, LIMIT. Clause semantics are
  * standard SQL order: sort → offset → limit (the reference builds offset
  * first but SQLAlchemy compiles to standard clause order — see SURVEY
  * §2.1 D12). The reference's falsy-zero quirk (`limit=0`/`offset=0`
  * dropped, main.py:233,239) is preserved: non-positive values are ignored.
  *
  * Scale notes: projection and filters are plain Catalyst expressions ⇒
  * column pruning + predicate pushdown reach the parquet scan for free;
  * `orderBy + limit` (no offset) collapses to `TakeOrderedAndProject` —
  * no global sort materialization.
  */
object Query {

  def get(
      df: DataFrame,
      columns: Seq[String] = Nil,
      where: Seq[Pred] = Nil,
      sortBy: Seq[SortKey] = Nil,
      limit: Int = 0,
      offset: Int = 0): DataFrame = {
    // SQL clause semantics: WHERE and ORDER BY may reference columns
    // outside the projection, so project LAST (Catalyst prunes the scan
    // to the union of referenced columns either way).
    var out = df
    PredicateDsl.compileAll(where).foreach(p => out = out.filter(p))
    // Postgres null ordering (the engine the reference delegates to):
    // ASC ⇒ NULLS LAST, DESC ⇒ NULLS FIRST — Spark's defaults are the
    // opposite, so make it explicit.
    if (sortBy.nonEmpty)
      out = out.orderBy(sortBy.map(k =>
        if (k.ascending) col(k.col).asc_nulls_last
        else col(k.col).desc_nulls_first): _*)
    if (offset > 0) out = out.offset(offset)
    if (limit > 0) out = out.limit(limit)
    if (columns.nonEmpty) out = out.select(columns.map(col): _*)
    out
  }

  /** The reference materializes every read to `list[dict]`
    * (main.py:241-244). We keep everything distributed and cross the
    * driver boundary only when the caller explicitly asks for rows. */
  def rows(df: DataFrame): Seq[Map[String, Any]] = {
    val names = df.columns
    df.collect().toSeq.map { r: Row =>
      names.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
    }
  }
}
