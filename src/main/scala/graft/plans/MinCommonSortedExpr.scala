package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * SMALLEST COMMON element of two SORTED long arrays — the exactly-once
 * emission kernel of the state-free cosine join (r19, VERDICT r18 #5): a
 * token-keyed candidate join emits one row per SHARED token (measured
 * multiplicity 19.6 on q126's corpus at sf10), and the downstream
 * `.distinct()` over (qualifying × multiplicity) rows was the dominant
 * phase (35.2 s of 46.9 s). Keeping only the row whose join token equals
 * `min_common_sorted(ka, kb)` emits each pair exactly once, shrinking the
 * distinct's input by the multiplicity factor. Same flat-merge/no-alloc
 * discipline as [[IntersectCountSortedExpr]], with the EARLY EXIT at the
 * first match (cheaper than a full count).
 *
 * CONTRACT: both inputs sorted ascending with distinct elements and no null
 * elements (the `sort_array(xxhash64(...))` discipline); the caller owns
 * sortedness. Returns Long.MinValue when the arrays share nothing — on the
 * query path the join key is present in BOTH arrays by construction, so the
 * sentinel never matches a real key (a real xxhash64 equal to the sentinel
 * would additionally need disjoint arrays, which the join precludes). Null
 * input array → null.
 *
 * SQL surface (registered by [[GraftExtensions]]):
 * `min_common_sorted(a, b)` over two `array<long>`.
 */
case class MinCommonSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "min_common_sorted expects two sorted array<long>, got " +
          s"(${l.simpleString(5)}, ${r.simpleString(5)})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "min_common_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinCommonSortedKernel.minCommon(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.MinCommonSortedKernel.minCommon($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinCommonSortedExpr =
    copy(left = newLeft, right = newRight)
}

object MinCommonSortedExpr {
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("min_common_sorted"),
    new ExpressionInfo(classOf[MinCommonSortedExpr].getName,
      "min_common_sorted"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => MinCommonSortedExpr(a, b)
      case _ => throw new IllegalArgumentException(
        "usage: min_common_sorted(sorted array<long>, sorted array<long>)")
    })
}

object MinCommonSortedKernel {
  /** Merge scan over two ascending long arrays; returns the first (=
   * smallest) common element, or Long.MinValue when disjoint. */
  def minCommon(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) return x
      else if (x < y) i += 1
      else j += 1
    }
    Long.MinValue
  }
}
