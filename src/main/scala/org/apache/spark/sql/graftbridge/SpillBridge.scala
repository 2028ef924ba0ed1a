package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.ExternalAppendOnlyUnsafeRowArray

/** Spillable append-only UnsafeRow buffer for custom physical
  * operators — a thin facade over Spark's
  * `ExternalAppendOnlyUnsafeRowArray` (the structure SortMergeJoin and
  * Window use for their buffered sides), which is `private[sql]`; the
  * facade lives under org.apache.spark.sql like the other bridges.
  *
  * Rows stay in an on-heap array up to `inMemoryRows` / `inMemoryBytes`
  * and transparently migrate into an UnsafeExternalSorter past that —
  * from there memory pressure spills to disk instead of OOMing the
  * executor. `add` copies the row (callers can hand in a projection's
  * reused buffer); `iterator` may itself return a reused row per call,
  * so consumers must copy anything they retain.
  */
class SpillableRowBuffer(inMemoryRows: Int, inMemoryBytes: Long) {
  private val arr = new ExternalAppendOnlyUnsafeRowArray(
    inMemoryRows, inMemoryBytes, Int.MaxValue, Long.MaxValue)
  def add(row: UnsafeRow): Unit = arr.add(row)
  def clear(): Unit = arr.clear()
  def length: Int = arr.length
  def isEmpty: Boolean = arr.isEmpty
  /** Bytes spilled to disk so far — 0 while fully in memory. */
  def spillSize: Long = arr.spillSize
  def iterator: Iterator[UnsafeRow] = arr.generateIterator()
}
