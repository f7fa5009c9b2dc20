package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native content-defined-chunking boundary detection — the codegen'd kernel
 * behind q81. Computes the positions `i ∈ [8, len]` (1-based, inclusive)
 * where the polynomial hash of characters `i-7..i` — Horner fold
 * `acc = (acc*31 + char) mod 2^20` — satisfies `hash mod 32 == 0`: the
 * boundaries move WITH the content, the property that makes CDC dedup robust
 * to insertions.
 *
 * The HOF formulation (`filter(sequence(...), i -> aggregate(...substr...))`)
 * is the value-identical oracle twin but evaluates interpreted at ~0.25 s PER
 * ROW (nested lambdas, per-character `substr` scans); this kernel is one
 * O(len) byte pass. ASCII corpus precondition: the kernel reads bytes, the
 * SQL twin reads characters — identical only while every character is one
 * byte (asserted against the corpus by the q81 oracle gate itself).
 *
 * SQL surface (registered by [[GraftExtensions]]): `cdc_bounds(text)`.
 */
case class CdcBoundsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds expects (string), got ${other.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_bounds"

  override protected def nullSafeEval(input: Any): Any =
    CdcBoundsKernel.bounds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CdcBoundsKernel.bounds($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundsExpr =
    copy(child = newChild)
}

object CdcBoundsExpr {
  /** (identifier, info, builder) for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("cdc_bounds"),
    new ExpressionInfo(classOf[CdcBoundsExpr].getName, "cdc_bounds"),
    (children: Seq[Expression]) => children match {
      case Seq(text) => CdcBoundsExpr(text)
      case _ => throw new IllegalArgumentException("usage: cdc_bounds(<string>)")
    })
}

/** The per-row kernel, shared by interpreted eval and generated code. */
object CdcBoundsKernel {
  private final val Window = 8
  private final val HashMod = 1048576L // 2^20
  private final val BoundaryMod = 32L

  def bounds(text: UTF8String): GenericArrayData = {
    val b = text.getBytes
    val len = b.length
    val out = new java.util.ArrayList[Any]()
    var i = Window
    while (i <= len) {
      var acc = 0L
      var k = i - Window
      while (k < i) {
        acc = (acc * 31 + (b(k) & 0xffL)) % HashMod
        k += 1
      }
      if (acc % BoundaryMod == 0) out.add(java.lang.Long.valueOf(i.toLong))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
