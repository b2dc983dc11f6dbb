package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Term-frequency-weighted 64-bit SimHash signature of a pre-hashed
  * token column (one input row per token OCCURRENCE, value = the
  * token's 64-bit hash), emitted as the four 16-bit band values
  * `[bits 0-15, 16-31, 32-47, 48-63]` — bit b of the signature is 1
  * iff the running count of tokens with hash-bit b set minus tokens
  * with it clear is >= 0, and within a band the LOWEST bit index is
  * the MOST significant packed bit (exactly the `packBits` fold it
  * replaces, asserted value-identical in SimilaritySpec).
  *
  * Why a TypedImperativeAggregate and not 64 `sum(when(...))` columns:
  * the r3 driver bench measured the 64-column hash aggregate's
  * generated code at ~7 s of one-time Janino compilation (2.5 s warm)
  * — under a contended box that cold cost collapsed to 35 s. This
  * buffer is 64 longs updated in a tight loop (longs, not ints: a
  * group with more than 2^31 token occurrences would silently
  * overflow an int counter and flip signature bits — 512 B/group is
  * still tiny), its merge is elementwise add (associative +
  * commutative, so map-side partial aggregation applies), and the
  * shuffled state is 512 bytes per group regardless of document
  * length — the same mergeable-sketch contract as
  * MinHashSketchAgg, with no wide codegen to compile.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // analysis-time type gate: the SQL-registered form would otherwise
  // accept any child and die per-task with ClassCastException on the
  // asInstanceOf[Long] in update (r7 review)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash_bands requires a BIGINT child, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  /** Four 16-bit bands; band j packs bits 16j..16j+15 with bit 16j as
    * the most significant packed bit (the packBits fold order).
    */
  override def eval(buf: Array[Long]): Any = {
    val bands = new Array[Long](4)
    var j = 0
    while (j < 4) {
      var acc = 0L
      var b = 16 * j
      while (b < 16 * (j + 1)) {
        acc = acc * 2 + (if (buf(b) >= 0) 1L else 0L)
        b += 1
      }
      bands(j) = acc
      j += 1
    }
    new GenericArrayData(bands)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_simhash"
}

object SimHashAgg {
  /** Column-API entry point: the four 16-bit SimHash band values
    * (array<long> of size 4) of a long-hash column within each group.
    */
  def bands(c: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
