package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/**
 * Fused cosine argmax over a member array — the codegen'd kernel behind
 * [[graft.operators.Ivf.assignTwoLevelData]]'s fine stage. The HOF
 * formulation (`array_max(transform(members, m -> struct(cosine_sim(vec,
 * m.vec), -m.cid)))`) evaluates the lambda through the interpreter per
 * member — measured 58.7 s vs the when-chain's 10.4 s for the same sf10
 * assignment — while this kernel is ONE fused loop over the broadcast
 * member structs, keeping the centroids-as-data plan O(coarseN) AND at
 * kernel speed.
 *
 * SEMANTICS — exactly the HOF form it replaces: per member, the shared
 * [[CosineKernel.cosine]] fold (bit-identical doubles); the winner is the
 * lexicographic max of `struct(s, negid = -cid)` under Spark's struct
 * ordering, i.e. highest cosine, ties to the LOWEST member cid, a null
 * cosine (ragged/null-element vector) ordering below every real value.
 * Returns `struct(s, negid)` — null only for an empty/null member array —
 * so it drops into the exact slot `array_max(transform(...))` occupied;
 * equality with [[graft.operators.Ivf.assignTwoLevel]] stays pinned by
 * IvfSpec.
 *
 * SQL surface (registered by [[GraftExtensions]]):
 * `cosine_argmax(vec, members)` with
 * `members: array<struct<cid: bigint, vec: array<double>>>` (field names
 * free — the struct is read positionally).
 */
case class CosineArgmaxExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == LongType &&
            (f1.dataType match {
              case ArrayType(DoubleType, _) => true
              case _ => false
            }) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_argmax expects (array<double>, array<struct<bigint, array<double>>>), " +
          s"got (${l.simpleString(5)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("s", DoubleType, nullable = true),
    StructField("negid", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_argmax"

  override protected def nullSafeEval(v: Any, members: Any): Any =
    CosineArgmaxKernel.argmax(v.asInstanceOf[ArrayData],
      members.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) => {
      val row = ctx.freshName("amx")
      s"""
         |InternalRow $row = graft.plans.CosineArgmaxKernel.argmax($v, $m);
         |if ($row == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $row; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineArgmaxExpr =
    copy(left = newLeft, right = newRight)
}

object CosineArgmaxExpr {
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("cosine_argmax"),
    new ExpressionInfo(classOf[CosineArgmaxExpr].getName, "cosine_argmax"),
    (children: Seq[Expression]) => children match {
      case Seq(v, m) => CosineArgmaxExpr(v, m)
      case _ => throw new IllegalArgumentException(
        "usage: cosine_argmax(array<double>, array<struct<bigint, array<double>>>)")
    })
}

object CosineArgmaxKernel {
  /** Null member-array elements are skipped (cannot arise from the
   * driver-built model; defensive only). Returns null iff no member was
   * considered. Comparison mirrors Spark's struct ordering over
   * (s, negid) with s NULLS-smallest: a null cosine loses to any real
   * one; among equal (or both-null) cosines the higher negid (= lower
   * cid) wins. Real cosines compare via `java.lang.Double.compare` —
   * Spark's physical double ordering — so NaN ranks above every real
   * value and −0.0 below +0.0, exactly as `array_max` would rank them
   * (only reachable with NaN/±Inf vector elements, but exact is exact). */
  def argmax(v: ArrayData, members: ArrayData): InternalRow = {
    val n = members.numElements()
    var found = false
    var bestHas = false
    var bestS = 0.0
    var bestNeg = 0L
    var i = 0
    while (i < n) {
      if (!members.isNullAt(i)) {
        val m = members.getStruct(i, 2)
        val neg = -m.getLong(0)
        val s = CosineKernel.cosine(v, m.getArray(1))
        val better =
          if (!found) true
          else if (s == null) !bestHas && neg > bestNeg
          else if (!bestHas) true
          else {
            val c = java.lang.Double.compare(s.doubleValue(), bestS)
            c > 0 || (c == 0 && neg > bestNeg)
          }
        if (better) {
          found = true
          bestHas = s != null
          if (s != null) bestS = s.doubleValue()
          bestNeg = neg
        }
      }
      i += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](
      if (bestHas) java.lang.Double.valueOf(bestS) else null, bestNeg))
  }
}
