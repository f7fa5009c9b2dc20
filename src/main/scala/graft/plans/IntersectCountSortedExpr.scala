package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/**
 * Exact intersection COUNT of two SORTED arrays — the per-pair kernel of the
 * prefix-pigeonhole exact-similarity joins ([[graft.operators.Dedup]]): one
 * merge scan, no hash set build, no result-array allocation, whole-stage
 * codegen. `array_intersect` would be semantically equivalent on distinct
 * inputs but builds a per-row hash set AND materializes the intersection
 * array — at billions of verify rows that allocation IS the cost (the r17
 * HOF lesson, PLANS.md r17 §6: per-pair work must be flat codegen).
 *
 * CONTRACT: both inputs sorted ascending (binary UTF8 order for strings,
 * numeric for longs — `sort_array`'s order) with DISTINCT elements and no
 * null elements; the caller owns sortedness (a violation undercounts —
 * this kernel cannot detect it). Null input array → null.
 *
 * SQL surface (registered by [[GraftExtensions]]):
 * `intersect_count_sorted(a, b)` over `array<string>` or `array<long>`.
 */
case class IntersectCountSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "intersect_count_sorted expects two sorted array<string> or two " +
          s"sorted array<long>, got (${l.simpleString(5)}, ${r.simpleString(5)})")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "intersect_count_sorted"

  private def isString: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isString)
      IntersectCountKernel.countStrings(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      IntersectCountKernel.countLongs(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isString) "countStrings" else "countLongs"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.IntersectCountKernel.$m($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSortedExpr =
    copy(left = newLeft, right = newRight)
}

object IntersectCountSortedExpr {
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("intersect_count_sorted"),
    new ExpressionInfo(classOf[IntersectCountSortedExpr].getName,
      "intersect_count_sorted"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => IntersectCountSortedExpr(a, b)
      case _ => throw new IllegalArgumentException(
        "usage: intersect_count_sorted(sorted array, sorted array)")
    })
}

object IntersectCountKernel {
  /** Merge scan over two ascending UTF8String arrays. */
  def countStrings(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Merge scan over two ascending long arrays. */
  def countLongs(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
