package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: COUNT of array elements equal to a
  * value — the codegen'd replacement for the interpreted
  * higher-order-function idiom `size(filter(arr, x -> x = v))` (one
  * closure dispatch per element; this repo's no-HOF-on-hot-paths rule
  * — the BM25 per-term tf counters are exactly this shape).
  *
  * Semantics match the HOF form exactly under default
  * (non-legacy-sizeOfNull) settings: NULL array → NULL; NULL value →
  * 0 (`x = NULL` is never TRUE, so the filter keeps nothing); NULL
  * elements never match. Floating-point element types are REJECTED at
  * type-check: SQL `=` treats NaN = NaN as TRUE while generated
  * primitive `==` does not, and silently diverging on NaN is worse
  * than not optimizing a float count.
  */
case class CountEqualInArray(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(et, _) if et == FloatType || et == DoubleType =>
        TypeCheckResult.TypeCheckFailure(
          "graft_count_eq does not support floating-point elements " +
            "(NaN equality diverges from SQL '=')")
      case ArrayType(et, _) if et == right.dataType =>
        TypeCheckResult.TypeCheckSuccess
      case (l) => TypeCheckResult.TypeCheckFailure(
        s"graft_count_eq requires (array<T>, T), got ${l.sql} and " +
          s"${right.dataType.sql}")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_count_eq"

  private lazy val elementType =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(elementType)

  override def eval(input: InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) return null
    val v = right.eval(input)
    if (v == null) return 0
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && ordering.equiv(a.get(i, elementType), v)) c += 1
      i += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val et = elementType
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val c = ctx.freshName("c")
    val elem = ctx.freshName("elem")
    val getter = CodeGenerator.getValue(leftGen.value, et, i)
    val javaType = CodeGenerator.javaType(et)
    val equal = ctx.genEqual(et, elem, rightGen.value)
    ev.copy(code = code"""
      |${leftGen.code}
      |boolean ${ev.isNull} = ${leftGen.isNull};
      |int ${ev.value} = 0;
      |if (!${ev.isNull}) {
      |  ${rightGen.code}
      |  if (!${rightGen.isNull}) {
      |    int $n = ${leftGen.value}.numElements();
      |    int $c = 0;
      |    for (int $i = 0; $i < $n; $i++) {
      |      if (!${leftGen.value}.isNullAt($i)) {
      |        $javaType $elem = $getter;
      |        if ($equal) $c++;
      |      }
      |    }
      |    ${ev.value} = $c;
      |  }
      |}
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountEqualInArray =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: rewrite `size(filter(arr, x -> x = v))` (and the
  * flipped `v = x`) to [[CountEqualInArray]] — the HOF pair allocates
  * an intermediate filtered array and dispatches an interpreted
  * closure per element; the rewrite is one codegen'd counting loop
  * with no allocation. Fires only when the comparison value does not
  * reference the lambda variable, the element type is non-floating
  * (NaN guard — see the expression), and `size` has non-legacy null
  * semantics (legacy size(NULL) = −1, the expression says NULL).
  *
  * Inject at session build with
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or at
  * runtime via `GraftExtensions.register(spark)` (which appends it to
  * `spark.experimental.extraOptimizations`).
  */
object RewriteSizeOfEqualityFilter extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, EqualTo, LambdaFunction, NamedLambdaVariable, Size}

  private def floatingElems(arr: Expression): Boolean = arr.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayFilter(arr, LambdaFunction(
            EqualTo(x: NamedLambdaVariable, v), Seq(lv: NamedLambdaVariable), _)), false)
          if x.exprId == lv.exprId && v.deterministic && !floatingElems(arr) &&
            !v.exists(_.isInstanceOf[NamedLambdaVariable]) =>
        CountEqualInArray(arr, v)
      case Size(ArrayFilter(arr, LambdaFunction(
            EqualTo(v, x: NamedLambdaVariable), Seq(lv: NamedLambdaVariable), _)), false)
          if x.exprId == lv.exprId && v.deterministic && !floatingElems(arr) &&
            !v.exists(_.isInstanceOf[NamedLambdaVariable]) =>
        CountEqualInArray(arr, v)
    }
}
