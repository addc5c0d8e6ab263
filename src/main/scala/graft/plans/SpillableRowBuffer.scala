// This file deliberately lives under org.apache.spark.sql.execution:
// ExternalAppendOnlyUnsafeRowArray — Spark's spill-capable UnsafeRow
// buffer, the exact structure WindowExec/SortMergeJoinExec buffer
// partitions with — is private[sql]. The facade exposes the minimal
// add/iterate surface graft.plans.HashFramelessWindowExec needs, so
// the buffering behind the hash-window operator inherits Spark's
// task-memory accounting and disk spill instead of reinventing them.
package org.apache.spark.sql.execution.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray

/** Append-only row buffer that keeps up to `inMemoryThreshold` rows on
  * heap and transparently spills through UnsafeExternalSorter beyond
  * that (insertion order is preserved either way). `add` copies the
  * incoming row, so callers may pass the reused row of an upstream
  * iterator.
  */
class SpillableRowBuffer(
    inMemoryThreshold: Int,
    inMemorySizeThreshold: Long,
    spillThreshold: Int,
    spillSizeThreshold: Long) {
  private val arr = new ExternalAppendOnlyUnsafeRowArray(
    inMemoryThreshold, inMemorySizeThreshold, spillThreshold, spillSizeThreshold)
  def add(row: UnsafeRow): Unit = arr.add(row)
  /** Rows in insertion order; the returned row object may be reused
    * between next() calls — copy if retained. */
  def iterator: Iterator[InternalRow] = arr.generateIterator()
  def length: Int = arr.length
  def clear(): Unit = arr.clear()
}
