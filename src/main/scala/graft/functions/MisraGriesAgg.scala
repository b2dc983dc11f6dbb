package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch of a string column as a native
  * mergeable TypedImperativeAggregate: the buffer is at most `k`
  * (item, counter) pairs, `update` is the classic MG step (increment
  * if tracked, insert if room, otherwise decrement every counter and
  * evict zeros), and `merge` sums two buffers then applies the
  * Agrawal/Cormode mergeable reduction (subtract the (k+1)-th largest
  * counter from all, keep the positive ones).
  *
  * Guarantee (the reason this is THE candidate stage for frequent-item
  * mining at 100 TB): after any sequence of updates and merges over a
  * stream of total length N, every tracked counter undercounts its
  * item's true frequency by at most N/(k+1) — so any item with true
  * count > N/(k+1) is STILL IN the sketch. The sketch therefore yields
  * a candidate SUPERSET of the heavy hitters above that threshold,
  * with fixed k-bounded state per group shuffled map-side regardless
  * of stream length; an exact recount over the (tiny, broadcastable)
  * candidate set then removes false positives. The emitted value is
  * just the candidate item array (sorted for determinism) — counts
  * are re-derived exactly downstream, so sketch-internal tie-breaking
  * never reaches the output.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  // analysis-time type gate (r7 review): a non-string child would
  // otherwise pass analysis and die per-task in update's
  // asInstanceOf[UTF8String]
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_misra_gries requires a STRING child, got ${other.simpleString}")
    }

  // k <= 0 would make every update take the decrement-all branch and
  // the sketch silently emit an empty candidate set ("no heavy
  // hitters") — fail at analysis time instead (ADVICE r5)
  require(k >= 1, s"graft_misra_gries needs k >= 1, got $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Subtract `cut` from every counter and evict the non-positive
    * ones — the shared step of both the classic update eviction
    * (cut = 1) and the mergeable top-k reduction (cut = (k+1)-th
    * largest).
    */
  private def decrementAndEvict(buf: mutable.HashMap[String, Long],
                                cut: Long): Unit = {
    buf.mapValuesInPlace((_, c) => c - cut)
    buf.filterInPlace((_, c) => c > 0)
  }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        // decrement-all step; O(k) but amortized O(1) per update
        // (each decrement pays back an earlier increment)
        case None => decrementAndEvict(buf, 1L)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long])
    : mutable.HashMap[String, Long] = {
    b.foreach { case (i, c) => a.update(i, a.getOrElse(i, 0L) + c) }
    if (a.size > k)
      // mergeable reduction: subtract the (k+1)-th largest counter
      decrementAndEvict(a,
        a.values.toArray.sorted(Ordering[Long].reverse).apply(k))
    a
  }

  /** Sorted candidate items only — counts are sketch estimates, never
    * emitted; the consumer recounts exactly.
    */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val byteArrs = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(
      4 + byteArrs.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(byteArrs).foreach { case ((_, c), bytes) =>
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
    : mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_misra_gries"
}

object MisraGriesAgg {
  /** Column-API entry point: the sorted Misra–Gries candidate items
    * (array<string>, at most k entries) of a string column.
    */
  def candidates(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
