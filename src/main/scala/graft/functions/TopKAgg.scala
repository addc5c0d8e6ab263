package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score, id) pairs under the
  * ordering score DESC, id ASC. State is O(k) regardless of input
  * size — the point of the aggregate: a distributed top-k never
  * shuffles more than k rows per partial, where a window row_number
  * shuffles EVERY candidate row into one task per partition key.
  */
final class TopKBuffer(val k: Int) {
  // worst-first ordering so head() is the eviction candidate
  private val ord = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(a._1, b._1) // lower score = worse
      if (c != 0) c else java.lang.Long.compare(b._2, a._2) // higher id = worse
    }
  }
  private val set = new java.util.TreeSet[(Long, Long)](ord)

  def add(score: Long, id: Long): Unit = {
    if (set.size < k) { set.add((score, id)); () }
    else if (ord.compare((score, id), set.first()) > 0) {
      set.pollFirst(); set.add((score, id)); ()
    }
  }

  def addAll(other: TopKBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) { val (s, i) = it.next(); add(s, i) }
  }

  def isEmpty: Boolean = set.isEmpty

  /** Best-first (score DESC, id ASC). */
  def result(): Array[(Long, Long)] = {
    val arr = new Array[(Long, Long)](set.size)
    val it = set.descendingIterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }
}

/** top_k_by(score, id, k) → ARRAY<STRUCT<score, id BIGINT>>,
  * best-first. Catalyst-native TypedImperativeAggregate with O(k)
  * state: partial aggregation does the candidate pruning map-side, so
  * a top-k over N rows shuffles O(k · partitions) rows instead of N —
  * the scale-correct shape for ANN candidate selection (SCALE.md
  * round-4: row-multiplying or row-collecting operators must not
  * inherit a single reducer).
  *
  * Scores may be BIGINT or DOUBLE. Doubles are kept in the buffer as
  * order-isomorphic long bits (IEEE-754 total order: magnitude bits of
  * negatives are inverted so signed-long comparison matches double
  * comparison), so the O(k) primitive buffer and its serialization are
  * shared by both types; NaN orders above +Inf, matching Spark's
  * window-sort semantics.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0, "k must be > 0")
  // children are unresolved at construction — type-check lazily
  private lazy val floating = score.dataType == DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (score.dataType, id.dataType) match {
      case (LongType | DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by expects (BIGINT|DOUBLE score, BIGINT id), got (${s.sql}, ${i.sql})")
    }
  }

  // self-inverse: sign bit is preserved, negative magnitudes reversed
  private def toSortable(bits: Long): Long =
    bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
  private def fromSortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(toSortable(s))

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", score.dataType, nullable = false),
    StructField("id", LongType, nullable = false))))
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val key =
        if (floating)
          toSortable(java.lang.Double.doubleToLongBits(s.asInstanceOf[Double]))
        else s.asInstanceOf[Long]
      buffer.add(key, i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    if (buffer.isEmpty) return null
    new GenericArrayData(buffer.result().map { case (s, i) =>
      InternalRow(if (floating) fromSortable(s) else s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val pairs = buffer.result()
    val bb = java.nio.ByteBuffer.allocate(8 + pairs.length * 16)
    bb.putInt(buffer.k)
    bb.putInt(pairs.length)
    for ((s, i) <- pairs) { bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val kk = bb.getInt
    val n = bb.getInt
    val b = new TopKBuffer(kk)
    var i = 0
    while (i < n) { b.add(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge._

  /** Column API: top-k (score DESC, id ASC) with O(k) aggregate state. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    column(TopKAgg(expression(score), expression(id), k).toAggregateExpression())
}
