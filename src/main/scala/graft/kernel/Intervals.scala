package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Interval merge kernel — no Spark dependencies.
  *
  * Semantics ported from the reference's interval compressor
  * (reference: src/IntervalCompressor.cpp:1-65): inverted pairs are
  * swapped on add; overlapping OR touching intervals merge
  * (`next.start <= cur.stop`); the buffer auto-compresses at 1,000,000
  * pending intervals so aggregate state stays bounded; output is
  * sorted by (start, stop).
  */
final class IntervalCompressor extends Serializable {
  import IntervalCompressor.CompressThreshold

  private[kernel] var starts = new ArrayBuffer[Long]()
  private[kernel] var stops = new ArrayBuffer[Long]()

  def add(start: Long, stop: Long): Unit = {
    if (start > stop) { starts += stop; stops += start }
    else { starts += start; stops += stop }
    if (starts.length >= CompressThreshold) compress()
  }

  def addAll(other: IntervalCompressor): Unit = {
    var i = 0
    while (i < other.starts.length) {
      add(other.starts(i), other.stops(i))
      i += 1
    }
    compress() // bound state after combining parallel partials
  }

  def compress(): Unit = {
    if (starts.isEmpty) return
    val n = starts.length
    val pairs = new Array[(Long, Long)](n)
    var i = 0
    while (i < n) { pairs(i) = (starts(i), stops(i)); i += 1 }
    java.util.Arrays.sort(pairs, Ordering.Tuple2[Long, Long])
    starts = new ArrayBuffer[Long]()
    stops = new ArrayBuffer[Long]()
    var curStart = pairs(0)._1
    var curStop = pairs(0)._2
    i = 1
    while (i < n) {
      val (s, e) = pairs(i)
      if (s <= curStop) { if (e > curStop) curStop = e }
      else {
        starts += curStart; stops += curStop
        curStart = s; curStop = e
      }
      i += 1
    }
    starts += curStart
    stops += curStop
  }

  def isEmpty: Boolean = starts.isEmpty
  def size: Int = starts.length

  /** Compressed, (start,stop)-sorted result. */
  def result(): Array[(Long, Long)] = {
    compress()
    val out = new Array[(Long, Long)](starts.length)
    var i = 0
    while (i < starts.length) { out(i) = (starts(i), stops(i)); i += 1 }
    out
  }
}

object IntervalCompressor {
  /** Reference: src/IntervalCompressor.cpp:5 (1M buffered intervals). */
  val CompressThreshold: Int = 1000000
}
