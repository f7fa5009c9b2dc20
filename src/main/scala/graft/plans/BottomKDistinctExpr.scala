package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded bottom-k DISTINCT aggregate: `bottomk_distinct(v, k)` keeps the k
 * smallest distinct bigint values seen in the group and returns them sorted
 * ascending as `array<bigint>`.
 *
 * This is the KMV sketch's exchange fix ([[graft.operators.Sketches]]): the
 * window formulation (`distinct` + `row_number() OVER (ORDER BY h)`) shuffles
 * and sorts EVERY distinct (group, hash) row to take k minima. As a
 * `TypedImperativeAggregate` this runs inside hash aggregation with map-side
 * partial aggregation: each task deduplicates AND truncates its group to k
 * values before the shuffle, so the exchange carries ≈ tasks × groups × k
 * longs instead of every distinct hash in the corpus, and no sort ever runs.
 * Merging two partials is a k-way set union re-truncated to k — exactly the
 * KMV sketch's lossless merge property.
 */
case class BottomKDistinctExpr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSet] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType if k > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"bottomk_distinct expects (bigint) with k > 0, got ${child.dataType.simpleString}, k=$k")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_distinct"

  override def createAggregationBuffer(): BottomKSet = new BottomKSet(k)

  override def update(buffer: BottomKSet, input: InternalRow): BottomKSet = {
    val v = child.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BottomKSet, other: BottomKSet): BottomKSet = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: BottomKSet): Any =
    new GenericArrayData(buffer.sortedAscending())

  override def serialize(buffer: BottomKSet): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): BottomKSet = BottomKSet.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinctExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinctExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKDistinctExpr =
    copy(child = newChildren(0))
}

object BottomKDistinctExpr {
  /** (identifier, info, builder) for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("bottomk_distinct"),
    new ExpressionInfo(classOf[BottomKDistinctExpr].getName, "bottomk_distinct"),
    (children: Seq[Expression]) => children match {
      case Seq(v, Literal(k: Int, IntegerType)) => BottomKDistinctExpr(v, k)
      case _ => throw new IllegalArgumentException(
        "usage: bottomk_distinct(<bigint value>, <int literal k>)")
    })
}

/**
 * Bounded sorted set of longs: at most k distinct values, evicting the
 * largest when a smaller new value arrives — O(log k) per offer, constant
 * memory per group.
 */
final class BottomKSet(val k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long]()

  def offer(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last() && !set.contains(v)) {
      set.pollLast()
      set.add(v)
      ()
    }
  }

  def absorb(other: BottomKSet): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) offer(it.next())
  }

  /** The kept values, smallest first. */
  def sortedAscending(): Array[Long] = {
    val arr = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }

  def toBytes: Array[Byte] = {
    val arr = sortedAscending()
    val bb = ByteBuffer.allocate(4 + arr.length * 8)
    bb.putInt(arr.length)
    arr.foreach(bb.putLong)
    bb.array()
  }
}

object BottomKSet {
  def fromBytes(k: Int, bytes: Array[Byte]): BottomKSet = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new BottomKSet(k)
    var i = 0
    while (i < n) { s.offer(bb.getLong); i += 1 }
    s
  }
}
