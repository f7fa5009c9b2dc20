package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/**
 * Native random-hyperplane LSH signature over an `array<double>` embedding —
 * the codegen'd replacement for the `nBits × dim`-term expression tree that
 * [[graft.functions.VectorFunctions.hyperplaneSignature]] builds (thousands
 * of Add/Multiply nodes: slow to codegen, slow to evaluate; the kernel is one
 * fused loop over a cached ±1 weight matrix).
 *
 * BIT-IDENTICAL to the built-in formulation and the DuckDB oracle twin:
 * plane j's weight for dimension i is ±1 from the parity of the last md5
 * byte of `"j:i"`, the projection is the same left-to-right double summation,
 * bit j is set iff the projection is strictly positive. Out-of-range or
 * null elements make every projection null in the HOF form, which the
 * `when(proj > 0, ...).otherwise(0)` guard turns into an all-zero signature —
 * the kernel returns 0L for those inputs to match.
 *
 * SQL surface (registered by [[GraftExtensions]]): `hyperplane_sig(vec, dim, nBits)`.
 */
case class HyperplaneSignatureExpr(child: Expression, dim: Int, nBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if dim > 0 && nBits > 0 && nBits <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<double> with 0 < nBits <= 62, got ${other.simpleString(10)}, dim=$dim, nBits=$nBits")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneKernel.signature(input.asInstanceOf[ArrayData], dim, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HyperplaneKernel.signature($c, $dim, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatureExpr =
    copy(child = newChild)
}

object HyperplaneSignatureExpr {
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("hyperplane_sig"),
    new ExpressionInfo(classOf[HyperplaneSignatureExpr].getName, "hyperplane_sig"),
    (children: Seq[Expression]) => children match {
      case Seq(v, Literal(dim: Int, IntegerType), Literal(nBits: Int, IntegerType)) =>
        HyperplaneSignatureExpr(v, dim, nBits)
      case _ => throw new IllegalArgumentException(
        "usage: hyperplane_sig(array<double>, <int literal dim>, <int literal nBits>)")
    })
}

/** Per-row kernel with a process-wide cache of the deterministic ±1 weight
 * matrix (md5 parity of "j:i" — identical on any engine, no stored model). */
object HyperplaneKernel {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def weights(dim: Int, nBits: Int): Array[Double] =
    cache.computeIfAbsent((dim, nBits), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val w = new Array[Double](nBits * dim)
      var j = 0
      while (j < nBits) {
        var i = 0
        while (i < dim) {
          val d = md.digest(s"$j:$i".getBytes("UTF-8"))
          w(j * dim + i) = if ((d(d.length - 1) & 1) == 1) 1.0 else -1.0
          i += 1
        }
        j += 1
      }
      w
    })

  def signature(v: ArrayData, dim: Int, nBits: Int): Long = {
    // HOF parity: element_at past the end or a null element nulls every
    // projection, and the otherwise(0) guard zeroes every bit
    if (v.numElements() < dim) return 0L
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return 0L; i += 1 }
    val w = weights(dim, nBits)
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var proj = 0.0
      val off = j * dim
      i = 0
      while (i < dim) { proj += v.getDouble(i) * w(off + i); i += 1 }
      if (proj > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
