package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Sparse integer dot product of two sorted-key weighted vectors — the
 * weighted twin of [[IntersectCountSortedExpr]], and the per-pair kernel of
 * the r18 state-free tf-idf cosine path ([[graft.operators.Similarity]]):
 * one merge scan over (ka, wa) × (kb, wb), accumulating wa·wb on equal
 * keys, whole-stage codegen, no allocation.
 *
 * CONTRACT: `ka`/`kb` sorted ascending, each aligned with its weight array
 * (same length); weights NON-NEGATIVE with Σ|wa·wb| < 2⁶³ (the tf-idf
 * fixed-point domain: wt ≤ 1000·tf keeps products ≪ 2⁴⁰). Runs of EQUAL
 * keys within one side (hash collisions) multiply their weight SUMS —
 * an over-count of the true per-term products under non-negative weights,
 * so a ≥-threshold gate stays RECALL-SAFE even on a colliding vocabulary;
 * the caller's census decides when the value is exact (collision-free
 * keys ⟹ exact dot).
 *
 * SQL surface (registered by [[GraftExtensions]]):
 * `dot_sorted(ka, wa, kb, wb)` over `array<long>` ×4 → long.
 */
case class DotSortedExpr(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "dot_sorted expects four array<long> children (ka, wa, kb, wb), got " +
        children.map(_.dataType.simpleString(5)).mkString("(", ", ", ")"))
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "dot_sorted"

  override protected def nullSafeEval(ka: Any, wa: Any, kb: Any, wb: Any): Any =
    DotSortedKernel.dot(ka.asInstanceOf[ArrayData], wa.asInstanceOf[ArrayData],
      kb.asInstanceOf[ArrayData], wb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ka, wa, kb, wb) =>
      s"${ev.value} = graft.plans.DotSortedKernel.dot($ka, $wa, $kb, $wb);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): DotSortedExpr =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object DotSortedExpr {
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("dot_sorted"),
    new ExpressionInfo(classOf[DotSortedExpr].getName, "dot_sorted"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b, c, d) => DotSortedExpr(a, b, c, d)
      case _ => throw new IllegalArgumentException(
        "usage: dot_sorted(sorted keys a, weights a, sorted keys b, weights b)")
    })
}

object DotSortedKernel {
  /** Merge scan; equal-key RUNS contribute sum(wa_run)·sum(wb_run). */
  def dot(ka: ArrayData, wa: ArrayData, kb: ArrayData, wb: ArrayData): Long = {
    val na = ka.numElements(); val nb = kb.numElements()
    var i = 0; var j = 0; var acc = 0L
    while (i < na && j < nb) {
      val x = ka.getLong(i); val y = kb.getLong(j)
      if (x == y) {
        var sa = 0L
        while (i < na && ka.getLong(i) == x) { sa += wa.getLong(i); i += 1 }
        var sb = 0L
        while (j < nb && kb.getLong(j) == x) { sb += wb.getLong(j); j += 1 }
        acc += sa * sb
      } else if (x < y) i += 1
      else j += 1
    }
    acc
  }
}
