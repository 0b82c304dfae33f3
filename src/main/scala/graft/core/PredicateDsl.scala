package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate DSL.
  *
  * Mirrors the reference's `_where_clause` (reference:
  * revtron/database/main.py:191-216): a *conjunctive* list of per-column
  * predicates where a plain value means equality (main.py:214-215), a
  * `{operator, value}` dict dispatches on the operator name
  * (main.py:197-211), and any unrecognized operator falls through to an
  * arbitrary comparison passthrough (main.py:212-213).
  *
  * Spark-first design: every arm compiles to a plain Catalyst [[Column]]
  * expression, so all predicates stay inside whole-stage codegen and are
  * eligible for datasource pushdown (parquet `PushedFilters`) — nothing is
  * evaluated driver-side.
  */
sealed trait Pred
object Pred {
  final case class Eq(col: String, value: Any)                 extends Pred
  final case class In(col: String, values: Seq[Any])           extends Pred
  final case class NotIn(col: String, values: Seq[Any])        extends Pred
  final case class Like(col: String, pattern: String)          extends Pred
  final case class NotLike(col: String, pattern: String)       extends Pred
  final case class IsNull(col: String)                         extends Pred
  final case class IsNotNull(col: String)                      extends Pred
  /** Inclusive on both ends, like SQL BETWEEN (main.py:208-209). */
  final case class Between(col: String, lo: Any, hi: Any)      extends Pred
  final case class NotBetween(col: String, lo: Any, hi: Any)   extends Pred
  /** Arbitrary-operator passthrough (main.py:212-213): `>`, `>=`, `<`,
    * `<=`, `!=`, `<>`, `~`/`regexp`. */
  final case class Op(col: String, op: String, value: Any)     extends Pred
  /** Escape hatch: a raw Column predicate (Spark-native extension). */
  final case class Raw(condition: Column)                      extends Pred
}

object PredicateDsl {

  def compile(p: Pred): Column = p match {
    case Pred.Eq(c, v)            => col(c) === lit(v)
    case Pred.In(c, vs)           => col(c).isin(vs: _*)
    case Pred.NotIn(c, vs)        => !col(c).isin(vs: _*)
    case Pred.Like(c, pat)        => col(c).like(pat)
    case Pred.NotLike(c, pat)     => !col(c).like(pat)
    case Pred.IsNull(c)           => col(c).isNull
    case Pred.IsNotNull(c)        => col(c).isNotNull
    case Pred.Between(c, lo, hi)  => col(c).between(lit(lo), lit(hi))
    case Pred.NotBetween(c, l, h) => !col(c).between(lit(l), lit(h))
    case Pred.Raw(cond)           => cond
    case Pred.Op(c, op, v) => op match {
      case ">"              => col(c) > lit(v)
      case ">="             => col(c) >= lit(v)
      case "<"              => col(c) < lit(v)
      case "<="             => col(c) <= lit(v)
      case "!=" | "<>"      => col(c) =!= lit(v)
      case "=" | "=="       => col(c) === lit(v)
      case "~" | "regexp"   => col(c).rlike(String.valueOf(v))
      case other =>
        throw new IllegalArgumentException(s"unsupported operator: $other")
    }
  }

  /** Conjunction fold, as in the reference (all predicates ANDed,
    * main.py:216). Empty list ⇒ no filter. */
  def compileAll(ps: Seq[Pred]): Option[Column] =
    ps.map(compile).reduceOption(_ && _)
}
