package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native cosine similarity over two `array<double>` columns — the codegen'd
 * replacement for the higher-order-function folds in
 * [[graft.functions.VectorFunctions.cosine]].
 *
 * BIT-IDENTICAL to the HOF formulation (and to the DuckDB oracle twin): the
 * kernel performs the same left-fold double additions in the same order
 * (`acc + a(i)*b(i)` from index 0), the same `sqrt`, the same final division —
 * IEEE 754 double ops are deterministic, so `round(x, 4)` hash-matches.
 *
 * SQL surface (registered by [[GraftExtensions]]): `cosine_sim(a, b)`.
 */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<double>, array<double>), got (${l.simpleString(5)}, ${r.simpleString(5)})")
    }
  override def dataType: DataType = DoubleType
  // beyond null inputs, the kernel yields null for ragged/null-element arrays
  // (matching the HOF formulation this expression replaces)
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cos")
      s"""
         |java.lang.Double $boxed = graft.plans.CosineKernel.cosine($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => CosineSimilarityExpr(a, b)
      case _ => throw new IllegalArgumentException("usage: cosine_sim(array<double>, array<double>)")
    })
}

object CosineKernel {
  /**
   * Same fold order as `aggregate(zip_with(a,b,*), 0.0, +)` → identical
   * doubles. Same null semantics too: unequal lengths (zip_with null-pads,
   * poisoning the fold) or any null element → null, exactly what the HOF
   * formulation yields — so the optimizer rewrite never changes results.
   */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      i += 1
    }
    i = 0
    while (i < n) { val x = a.getDouble(i); na += x * x; i += 1 }
    i = 0
    while (i < n) { val y = b.getDouble(i); nb += y * y; i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0) java.lang.Double.valueOf(0.0) else java.lang.Double.valueOf(dot / denom)
  }
}
