package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate: `topk_by(score, id, k)` keeps the k highest
 * `(score DESC, id ASC)` entries seen in the group and returns them as a
 * sorted `array<struct<score: double, id: bigint>>`.
 *
 * THE point of this operator is the exchange it avoids: Spark's idiomatic
 * top-k-per-group (`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`)
 * shuffles EVERY scored row to the group's single window partition — N·Q rows
 * for a kNN query, with all N corpus rows of one query landing on one
 * reducer. As a `TypedImperativeAggregate`, this operator runs inside hash
 * aggregation with map-side partial aggregation: each task truncates each
 * group to k entries in a bounded heap BEFORE the shuffle, so the exchange
 * carries ≈ tasks × groups × k entries and the final merge is a k-way heap
 * union. Same result, scale-safe plan.
 *
 * Determinism: the ordering (score DESC, id ASC) is total when ids are
 * unique, so results are exactly the rows `row_number()` would keep.
 */
case class TopKByExpr(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"topk_by expects (double, bigint) with k > 0, got (${score.dataType.simpleString}, ${id.dataType.simpleString}), k=$k")
    }

  override def dataType: DataType = TopKByExpr.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val sorted = buffer.sortedBestFirst()
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap = TopKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByExpr =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByExpr {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** (identifier, info, builder) for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("topk_by"),
    new ExpressionInfo(classOf[TopKByExpr].getName, "topk_by"),
    (children: Seq[Expression]) => children match {
      case Seq(score, id, Literal(k: Int, IntegerType)) => TopKByExpr(score, id, k)
      case _ => throw new IllegalArgumentException(
        "usage: topk_by(<double score>, <bigint id>, <int literal k>)")
    })
}

/**
 * Bounded min-heap of (score, id): the root is the WORST kept entry
 * (lowest score, ties broken by highest id), so `offer` evicts in O(log k)
 * and the heap never exceeds k entries — constant memory per group.
 */
final class TopKHeap(val k: Int) {
  // worst-first comparator: lower score first; equal scores → higher id first
  private val heap = new java.util.PriorityQueue[TopKHeap.Entry](
    math.max(1, math.min(k, 1024)),
    (a: TopKHeap.Entry, b: TopKHeap.Entry) => {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    })

  def offer(score: Double, id: Long): Unit = {
    if (heap.size < k) {
      heap.add(new TopKHeap.Entry(score, id))
    } else {
      val worst = heap.peek()
      // better than the worst kept ⇔ (score, -id) strictly greater
      if (score > worst.score || (score == worst.score && id < worst.id)) {
        heap.poll()
        heap.add(new TopKHeap.Entry(score, id))
      }
    }
  }

  def absorb(other: TopKHeap): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); offer(e.score, e.id) }
  }

  /** Entries sorted (score DESC, id ASC) — the `row_number()` keep order. */
  def sortedBestFirst(): Array[(Double, Long)] = {
    val arr = new Array[TopKHeap.Entry](heap.size)
    heap.toArray(arr)
    java.util.Arrays.sort(arr, (a: TopKHeap.Entry, b: TopKHeap.Entry) => {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    })
    arr.map(e => (e.score, e.id))
  }

  def toBytes: Array[Byte] = {
    val arr = sortedBestFirst()
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }
}

object TopKHeap {
  final class Entry(val score: Double, val id: Long)

  def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.offer(bb.getDouble, bb.getLong); i += 1 }
    h
  }
}
