package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Mergeable d×d sufficient statistics of an integer-quantized vector
  * column (the Gram/covariance pass of `emb_covariance` /
  * `emb_pca_power`), as ONE TypedImperativeAggregate.
  *
  * The buffer is (n, Σxᵢ per dim, Σxᵢxⱼ per upper-triangle pair) —
  * d + d(d+1)/2 + 1 longs, associative and commutative under
  * element-wise addition, so map-side partial aggregation applies and
  * the shuffled state is ONE ~17 KB buffer per partition (d=64)
  * REGARDLESS of corpus size. This replaces the posexplode self-join
  * formulation, which materialized and shuffled N·d² rows (82 M at
  * sf1) before its partial aggregate could combine them (r9 verdict
  * item 6): same exact integer algebra, zero join, one scan.
  *
  * eval emits the finished upper triangle as
  * array<struct<i, j, cov_num, n>> (1-based dims, i <= j, (i,j)
  * order) with cov_num = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ — exact BIGINT arithmetic,
  * partitioning-invariant, byte-identical to the DuckDB mirror.
  * d is taken from the first vector seen; a mixed-width corpus is a
  * hard error, not a silent misalignment.
  *
  * Exactness BOUND (ADVICE r10, tightened r11 review): every
  * arithmetic step — per-row products, running sums, partial-buffer
  * merges, and the n·Σxᵢxⱼ − Σxᵢ·Σxⱼ finisher — runs through
  * addExact/multiplyExact, so ANY 64-bit wrap anywhere on the path
  * fails loudly instead of flowing into a confidently wrong answer
  * (an accumulation that wrapped to a small value would otherwise
  * pass the finisher's own check). With milli-quantized components
  * |q| ≤ ~1000 (Σxᵢxⱼ ≤ n·10⁶) the finisher is the binding term at
  * n ≲ 3×10⁶ rows; a corpus past the bound needs a re-quantization or
  * a widened (HUGEINT-style) finisher, not a silent wrong answer.
  */
case class GramCovAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramCovAgg.Buf] {

  import GramCovAgg.Buf

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_gram_cov requires an ARRAY<BIGINT> child, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Buf = new Buf(-1, 0L, null, null)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val vec = v.asInstanceOf[ArrayData]
      val d = vec.numElements()
      if (buf.d == -1) buf.init(d)
      else require(d == buf.d,
        s"graft_gram_cov: vector width $d != first-seen width ${buf.d}")
      var i = 0
      while (i < d) {
        require(!vec.isNullAt(i),
          s"graft_gram_cov: null component at dim $i")
        i += 1
      }
      buf.n = Math.addExact(buf.n, 1L)
      var idx = 0
      i = 0
      // exact ops end to end (r11 review): the finisher's
      // multiplyExact alone could bless an ACCUMULATION that had
      // already wrapped (e.g. per-row products of ±2^31 components
      // summing to an exact multiple of 2^64 — eval would then return
      // a confidently wrong 0). addExact/multiplyExact here cost one
      // overflow branch per fused op, negligible next to the array
      // reads, and make every wrap on the whole path loud.
      while (i < d) {
        val qi = vec.getLong(i)
        buf.s(i) = Math.addExact(buf.s(i), qi)
        var j = i
        while (j < d) {
          buf.g(idx) =
            Math.addExact(buf.g(idx), Math.multiplyExact(qi, vec.getLong(j)))
          idx += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (b.d == -1) a
    else if (a.d == -1) b
    else {
      require(a.d == b.d,
        s"graft_gram_cov: merging widths ${a.d} and ${b.d}")
      a.n = Math.addExact(a.n, b.n)
      var i = 0
      while (i < a.s.length) {
        a.s(i) = Math.addExact(a.s(i), b.s(i)); i += 1
      }
      i = 0
      while (i < a.g.length) {
        a.g(i) = Math.addExact(a.g(i), b.g(i)); i += 1
      }
      a
    }
  }

  override def eval(buf: Buf): Any = {
    if (buf.d == -1) new GenericArrayData(Array.empty[Any])
    else {
      val d = buf.d
      val out = new Array[Any](d * (d + 1) / 2)
      var idx = 0
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val row = new GenericInternalRow(4)
          row.setLong(0, (i + 1).toLong)
          row.setLong(1, (j + 1).toLong)
          // multiplyExact/subtractExact: past the ~3e6-row exactness
          // bound (see scaladoc) this throws instead of wrapping
          row.setLong(2, Math.subtractExact(
            Math.multiplyExact(buf.n, buf.g(idx)),
            Math.multiplyExact(buf.s(i), buf.s(j))))
          row.setLong(3, buf.n)
          out(idx) = row
          idx += 1
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: Buf): Array[Byte] = {
    if (buf.d == -1) ByteBuffer.allocate(4).putInt(-1).array()
    else {
      val bb = ByteBuffer.allocate(4 + 8 + 8 * (buf.s.length + buf.g.length))
      bb.putInt(buf.d).putLong(buf.n)
      buf.s.foreach(bb.putLong)
      buf.g.foreach(bb.putLong)
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    if (d == -1) new Buf(-1, 0L, null, null)
    else {
      val n = bb.getLong
      val s = Array.fill(d)(bb.getLong)
      val g = Array.fill(d * (d + 1) / 2)(bb.getLong)
      new Buf(d, n, s, g)
    }
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("cov_num", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): GramCovAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramCovAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramCovAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_gram_cov"
}

object GramCovAgg {

  /** Mutable sufficient-stats buffer: d = -1 until the first vector
    * fixes the width.
    */
  final class Buf(var d: Int, var n: Long,
      var s: Array[Long], var g: Array[Long]) {
    def init(width: Int): Unit = {
      d = width
      s = new Array[Long](width)
      g = new Array[Long](width * (width + 1) / 2)
    }
  }

  /** Column-API entry point: upper-triangle covariance numerators
    * array<struct<i, j, cov_num, n>> of an ARRAY<BIGINT> column.
    */
  def gram(c: Column): Column =
    ColumnBridge.column(
      GramCovAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
