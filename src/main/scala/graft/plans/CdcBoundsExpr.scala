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
 * O(len) pass. Positions and the hashed values are CODE POINTS — matching
 * `ascii(substr(text, i, 1))` in both Spark and DuckDB — via a single
 * inline UTF-8 decode, so non-ASCII text chunks identically to the SQL twin
 * (on all-ASCII input the decode degenerates to the byte values).
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
    val nBytes = b.length
    // one-pass UTF-8 → code-point decode; nBytes is an upper bound on the
    // code-point count. UTF8String does not guarantee valid UTF-8 (a binary
    // cast to string reaches this kernel unchecked), so malformed bytes —
    // a lone continuation byte, a truncated sequence, or a lead byte whose
    // following bytes are not continuations — degrade to single one-byte
    // code points instead of reading past the buffer or swallowing a valid
    // neighbor. Valid input decodes identically to before.
    val cps = new Array[Int](nBytes)
    var len = 0
    var p = 0
    while (p < nBytes) {
      val b0 = b(p) & 0xff
      var step =
        if (b0 < 0x80) 1
        else if (b0 < 0xc0) 1 // invalid lone continuation byte
        else if (b0 < 0xe0) 2
        else if (b0 < 0xf0) 3
        else 4
      // a multi-byte sequence is consumed only when every following byte is
      // a genuine continuation (10xxxxxx) — otherwise the lead byte alone
      // becomes one code point, matching a validating decoder's positions
      if (step > 1 && p + step <= nBytes) {
        var j = 1
        while (j < step) {
          if ((b(p + j) & 0xc0) != 0x80) { step = 1; j = 4 } else j += 1
        }
      }
      if (step == 1 || p + step > nBytes) { cps(len) = b0; p += 1 }
      else if (step == 2) {
        cps(len) = ((b0 & 0x1f) << 6) | (b(p + 1) & 0x3f); p += 2
      } else if (step == 3) {
        cps(len) = ((b0 & 0x0f) << 12) | ((b(p + 1) & 0x3f) << 6) |
          (b(p + 2) & 0x3f); p += 3
      } else {
        cps(len) = ((b0 & 0x07) << 18) | ((b(p + 1) & 0x3f) << 12) |
          ((b(p + 2) & 0x3f) << 6) | (b(p + 3) & 0x3f); p += 4
      }
      len += 1
    }
    val out = new java.util.ArrayList[Any]()
    var i = Window
    while (i <= len) {
      var acc = 0L
      var k = i - Window
      while (k < i) {
        acc = (acc * 31 + cps(k)) % HashMod
        k += 1
      }
      if (acc % BoundaryMod == 0) out.add(java.lang.Long.valueOf(i.toLong))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
