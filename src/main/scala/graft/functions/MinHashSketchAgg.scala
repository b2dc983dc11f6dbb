package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-permutation MinHash sketch of a string column as a native
  * TypedImperativeAggregate: the aggregation buffer is the k current
  * minima, `update` folds one value in with k cheap long-domain
  * re-hashes of its 64-bit digest, `merge` is the element-wise min of
  * two buffers — associative and commutative, so map-side partial
  * aggregation applies and the shuffled state is k longs per group
  * REGARDLESS of group size. That mergeable-sketch property is the
  * whole point at 100 TB: a per-group distinct-set signature without
  * shuffling the sets.
  *
  * Jaccard similarity between two groups is then estimated by the
  * fraction of positions where their sketches agree (each position is
  * an independent min-wise permutation).
  */
case class MinHashSketchAgg(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

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
          s"graft_minhash_sketch requires a STRING child, got ${other.simpleString}")
    }

  // k = 0 silently yields an empty sketch ("nothing similar") and
  // k < 0 crashes at serialize time — same guard as MisraGriesAgg
  require(k >= 1, s"graft_minhash_sketch needs k >= 1, got $k")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val base = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(base, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_minhash_sketch"
}

object MinHashSketchAgg {
  /** Column-API entry point: MinHash sketch (array<long> of size k)
    * of a string column within each group.
    */
  def sketch(c: Column, k: Int = 64): Column =
    ColumnBridge.column(
      MinHashSketchAgg(ColumnBridge.expression(c), k)
        .toAggregateExpression())
}
