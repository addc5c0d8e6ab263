package graft.functions

import graft.kernel.Sketches
import graft.kernel.Sketches.{FreqSketch, ThetaSketch}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native sketch aggregates (kernel/Sketches.scala). All are
  * TypedImperativeAggregates: live sketch objects inside
  * ObjectHashAggregate, partial (map-side) aggregation everywhere, and
  * only the O(k) canonical serialized state crosses shuffle
  * boundaries — at 100 TB a distinct-count over any column shuffles
  * kilobytes per partition instead of the column.
  */

/** theta_sketch(expr, k) → BINARY: canonical KMV theta sketch of the
  * distinct values of expr (string / integral / binary child). The
  * sketch VALUE is the point: write it per shard/day, union later with
  * [[ThetaUnionAgg]], estimate with Sketches ops — no corpus rescan.
  */
case class ThetaSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  // lazy: child.dataType is unresolved at construction during analysis
  private lazy val hashOne: Any => Long = child.dataType match {
    case StringType => v => Sketches.hashString(v.asInstanceOf[UTF8String].toString)
    case LongType => v => Sketches.hashLong(v.asInstanceOf[Long])
    case IntegerType => v => Sketches.hashLong(v.asInstanceOf[Int].toLong)
    case ShortType => v => Sketches.hashLong(v.asInstanceOf[Short].toLong)
    case ByteType => v => Sketches.hashLong(v.asInstanceOf[Byte].toLong)
    case BinaryType => v => Sketches.hashLong(
      java.util.Arrays.hashCode(v.asInstanceOf[Array[Byte]]).toLong)
    case other => throw new IllegalArgumentException(
      s"theta_sketch: unsupported input type $other")
  }

  override def createAggregationBuffer(): ThetaSketch = new ThetaSketch(k)

  override def update(buffer: ThetaSketch, input: InternalRow): ThetaSketch = {
    val v = child.eval(input)
    if (v != null) buffer.updateHash(hashOne(v))
    buffer
  }

  override def merge(buffer: ThetaSketch, other: ThetaSketch): ThetaSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: ThetaSketch): Any = buffer.serialized
  override def serialize(buffer: ThetaSketch): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): ThetaSketch =
    ThetaSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** theta_union(sketch_binary) → BINARY: union of serialized theta
  * sketches (the re-merge half of the save-state workflow).
  */
case class ThetaUnionAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union"

  override def createAggregationBuffer(): ThetaSketch = new ThetaSketch(k)

  override def update(buffer: ThetaSketch, input: InternalRow): ThetaSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(ThetaSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: ThetaSketch, other: ThetaSketch): ThetaSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: ThetaSketch): Any = buffer.serialized
  override def serialize(buffer: ThetaSketch): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): ThetaSketch =
    ThetaSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** kll_sketch(expr, k) → BINARY: KLL quantile sketch of a numeric
  * column (kernel/Sketches.QuantileSketch). Quantile estimates are
  * EXACT (= quantile_disc) while a group holds <= k values; past k the
  * additive rank error is ~O(1/k). Like the theta aggregates, the
  * VALUE is the point: persist per-shard sketches, merge later with
  * [[KllMergeAgg]] — cross-corpus length/score distributions without
  * rescanning or shuffling the raw column.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Sketches.QuantileSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch"

  // lazy: child.dataType is unresolved at construction during analysis
  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case other => throw new IllegalArgumentException(
      s"kll_sketch: unsupported input type $other")
  }

  override def createAggregationBuffer(): Sketches.QuantileSketch =
    new Sketches.QuantileSketch(k)

  override def update(buffer: Sketches.QuantileSketch,
      input: InternalRow): Sketches.QuantileSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(toDouble(v))
    buffer
  }

  override def merge(buffer: Sketches.QuantileSketch,
      other: Sketches.QuantileSketch): Sketches.QuantileSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: Sketches.QuantileSketch): Any = buffer.serialized
  override def serialize(buffer: Sketches.QuantileSketch): Array[Byte] =
    buffer.serialized
  override def deserialize(bytes: Array[Byte]): Sketches.QuantileSketch =
    Sketches.QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** kll_merge(sketch_binary) → BINARY: merge of serialized KLL sketches
  * (the re-merge half of the save-state workflow).
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Sketches.QuantileSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge"

  override def createAggregationBuffer(): Sketches.QuantileSketch =
    new Sketches.QuantileSketch(k)

  override def update(buffer: Sketches.QuantileSketch,
      input: InternalRow): Sketches.QuantileSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(Sketches.QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Sketches.QuantileSketch,
      other: Sketches.QuantileSketch): Sketches.QuantileSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: Sketches.QuantileSketch): Any = buffer.serialized
  override def serialize(buffer: Sketches.QuantileSketch): Array[Byte] =
    buffer.serialized
  override def deserialize(bytes: Array[Byte]): Sketches.QuantileSketch =
    Sketches.QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** freq_items(expr, k) → ARRAY<STRUCT<item, count_min, count_max>>:
  * Misra-Gries heavy hitters with at most k counters, counts exact when
  * distinct items <= k, guaranteed bounds otherwise; sorted by
  * count_min desc, item asc.
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_min", LongType, nullable = false),
    StructField("count_max", LongType, nullable = false))))
  override def prettyName: String = "freq_items"

  override def createAggregationBuffer(): FreqSketch = {
    require(child.dataType == StringType,
      s"freq_items: expected STRING input, got ${child.dataType}")
    new FreqSketch(k)
  }

  override def update(buffer: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqSketch, other: FreqSketch): FreqSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: FreqSketch): Any = {
    val rows = buffer.result().map { case (item, lo, hi) =>
      InternalRow(UTF8String.fromString(item), lo, hi)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: FreqSketch): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): FreqSketch =
    FreqSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
