package graft.functions

import graft.kernel.IntervalCompressor
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** compress_intervals as a catalyst-native TypedImperativeAggregate.
  *
  * Versus the udaf(Aggregator) form this removes the per-row
  * catalyst↔Scala conversion (two boxed Option[Long] per input row) —
  * update reads primitive longs straight off the InternalRow. The
  * buffer stays a live IntervalCompressor object inside
  * ObjectHashAggregate; (de)serialization happens only at shuffle
  * boundaries, as a compact (count, start*, stop*) long image of the
  * COMPRESSED state, so a partial state is never larger than the
  * merged interval set (reference 1M-interval bound:
  * src/IntervalCompressor.cpp:5).
  */
case class CompressIntervalsAgg(
    start: Expression,
    stop: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[IntervalCompressor] {

  override def children: Seq[Expression] = Seq(start, stop)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("stop", LongType, nullable = false))))
  override def prettyName: String = "compress_intervals"

  override def createAggregationBuffer(): IntervalCompressor = new IntervalCompressor

  override def update(buffer: IntervalCompressor, input: InternalRow): IntervalCompressor = {
    val s = start.eval(input)
    val e = stop.eval(input)
    if (s != null && e != null)
      buffer.add(s.asInstanceOf[Long], e.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: IntervalCompressor, other: IntervalCompressor): IntervalCompressor = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: IntervalCompressor): Any = {
    if (buffer.isEmpty) return null
    val pairs = buffer.result()
    new GenericArrayData(pairs.map { case (s, e) =>
      InternalRow(s, e)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: IntervalCompressor): Array[Byte] = {
    val pairs = buffer.result() // compress before shipping
    val bb = java.nio.ByteBuffer.allocate(4 + pairs.length * 16)
    bb.putInt(pairs.length)
    for ((s, e) <- pairs) { bb.putLong(s); bb.putLong(e) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): IntervalCompressor = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val c = new IntervalCompressor
    var i = 0
    while (i < n) { c.add(bb.getLong, bb.getLong); i += 1 }
    c
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CompressIntervalsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CompressIntervalsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(start = newChildren(0), stop = newChildren(1))
}
