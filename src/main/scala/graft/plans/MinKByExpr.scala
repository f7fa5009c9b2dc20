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
 * Bounded min-k aggregate: `mink_by(key, id, k)` keeps the k entries with the
 * smallest `(key ASC, id ASC)` order seen in the group and returns them as a
 * sorted `array<struct<key: bigint, id: bigint>>`.
 *
 * The exact-key sibling of [[TopKByExpr]] (which ranks by a double score):
 * both 60-bit hash keys and ids are longs here, so the ordering is EXACT —
 * negating a 60-bit hash into `topk_by`'s double score would round below
 * 2^53 and could reorder near-equal keys. Used by the bounded-heap
 * stratified sampler ([[graft.operators.CorpusOps.sampleStratifiedBounded]]):
 * the window formulation shuffles and sorts every stratum row to rank-filter
 * the first `quota`; this aggregate truncates each stratum to k entries
 * map-side, so the exchange carries ≈ tasks × strata × k entries — the
 * mega-stratum skew case stops existing.
 */
case class MinKByExpr(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKHeap] {

  override def children: Seq[Expression] = Seq(key, id)

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, id.dataType) match {
      case (LongType, LongType) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"mink_by expects (bigint, bigint) with k > 0, got (${key.dataType.simpleString}, ${id.dataType.simpleString}), k=$k")
    }

  override def dataType: DataType = MinKByExpr.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "mink_by"

  override def createAggregationBuffer(): MinKHeap = new MinKHeap(k)

  override def update(buffer: MinKHeap, input: InternalRow): MinKHeap = {
    val s = key.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: MinKHeap, other: MinKHeap): MinKHeap = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: MinKHeap): Any = {
    val sorted = buffer.sortedBestFirst()
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buffer: MinKHeap): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): MinKHeap = MinKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKByExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKByExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinKByExpr =
    copy(key = newChildren(0), id = newChildren(1))
}

object MinKByExpr {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** (identifier, info, builder) for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("mink_by"),
    new ExpressionInfo(classOf[MinKByExpr].getName, "mink_by"),
    (children: Seq[Expression]) => children match {
      case Seq(key, id, Literal(k: Int, IntegerType)) => MinKByExpr(key, id, k)
      case _ => throw new IllegalArgumentException(
        "usage: mink_by(<bigint key>, <bigint id>, <int literal k>)")
    })
}

/**
 * Bounded max-heap of (key, id): the root is the WORST kept entry (largest
 * (key, id)), so `offer` evicts in O(log k) and the heap never exceeds k
 * entries — constant memory per group.
 */
final class MinKHeap(val k: Int) {
  // worst-first comparator: larger (key, id) first
  private val heap = new java.util.PriorityQueue[MinKHeap.Entry](
    math.max(1, math.min(k, 1024)),
    (a: MinKHeap.Entry, b: MinKHeap.Entry) => {
      val c = java.lang.Long.compare(b.key, a.key)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    })

  def offer(key: Long, id: Long): Unit = {
    if (heap.size < k) {
      heap.add(new MinKHeap.Entry(key, id))
    } else {
      val worst = heap.peek()
      if (key < worst.key || (key == worst.key && id < worst.id)) {
        heap.poll()
        heap.add(new MinKHeap.Entry(key, id))
      }
    }
  }

  def absorb(other: MinKHeap): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); offer(e.key, e.id) }
  }

  /** Entries sorted (key ASC, id ASC) — the `row_number()` keep order. */
  def sortedBestFirst(): Array[(Long, Long)] = {
    val arr = new Array[MinKHeap.Entry](heap.size)
    heap.toArray(arr)
    java.util.Arrays.sort(arr, (a: MinKHeap.Entry, b: MinKHeap.Entry) => {
      val c = java.lang.Long.compare(a.key, b.key)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    })
    arr.map(e => (e.key, e.id))
  }

  def toBytes: Array[Byte] = {
    val arr = sortedBestFirst()
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }
}

object MinKHeap {
  final class Entry(val key: Long, val id: Long)

  def fromBytes(k: Int, bytes: Array[Byte]): MinKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new MinKHeap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong, bb.getLong); i += 1 }
    h
  }
}
