package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Register-deterministic HyperLogLog sketch of a BIGINT column as the
  * raw m=4096 register array (p=12), for `agg_hll_union` — replacing
  * the engine-specific DataSketches `hll_sketch_agg` whose estimator
  * DuckDB 1.0 cannot mirror (the r8 documented negative; r12 VERDICT
  * next-round task 2).
  *
  * Determinism contract (what makes the oracle pairing possible):
  *   - hash   = XXH64.hashLong(v, seed=42) — the exact Spark-codegen
  *     xxHash64 long finalizer, already mirrored bit-for-bit in DuckDB
  *     HUGEINT SQL by [[graft.operators.OracleXxh64.hashLongSteps]];
  *   - index  = top p=12 bits of the UNSIGNED hash (`h >>> 52`);
  *   - rho    = 1-based position of the leftmost 1-bit in the low 52
  *     bits, i.e. `53 - bitlen(h & (2^52-1))`, and 53 when they are all
  *     zero — pure integer arithmetic, mirrored in DuckDB as
  *     `53 - length(ltrim(bin(w::UBIGINT), '0'))` (no floating log2,
  *     whose off-by-one at exact powers of two would silently flip a
  *     register).
  * Register state therefore depends only on the SET of input values —
  * never on row, partition, or merge order (max is associative and
  * commutative, so map-side partial aggregation applies) — and the
  * identical registers are computable in DuckDB SQL, which is what
  * turns this operator from declared-N into rows+schema+hash green.
  *
  * The ESTIMATE is deliberately not computed here: eval emits the
  * registers and the downstream plan derives `Σ 2^(53-M_j)` as an
  * exact DECIMAL(38,0) (order-free) plus the classic
  * alpha_m·m²/S estimate with linear-counting small-range correction
  * in one final double step — the agg_corr_exact sufficient-statistics
  * discipline applied to a sketch.
  *
  * Scale: the buffer is 4096 bytes per group regardless of input size
  * (rho <= 53 fits a byte), the shuffle ships only those 4 KB partials,
  * and unioning per-group/per-day sketches is an elementwise max over
  * 4096-element arrays — the build-once-union-at-query-time pattern
  * this operator exists to demonstrate at 100 TB.
  */
case class HllRegistersAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllRegistersAgg.{M, P, SEED}

  // analysis-time type gate (the SimHashAgg precedent): the
  // SQL-registered form would otherwise accept any child and die
  // per-task on the asInstanceOf[Long] in update
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_registers requires a BIGINT child, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XXH64.hashLong(v.asInstanceOf[Long], SEED)
      val idx = (h >>> (64 - P)).toInt
      val w = h & ((1L << (64 - P)) - 1L)
      // 1-based leftmost-1 position within the low 52 bits; 53 if none
      val rho =
        if (w == 0L) (64 - P + 1)
        else (64 - P + 1) - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](M)
    var i = 0
    while (i < M) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegistersAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_hll_registers"
}

object HllRegistersAgg {
  /** Register count exponent / count: m = 2^p = 4096 (standard error
    * 1.04/sqrt(m) ≈ 1.6%, comfortably inside the spec's 5% gate). */
  val P: Int = 12
  val M: Int = 1 << P
  val SEED: Long = 42L
  /** Max register value = leftmost-1 absent in 64-P = 52 bits → 53. */
  val RHO_MAX: Int = 64 - P + 1

  /** alpha_m·m² for m=4096, evaluated ONCE here; both the Spark plan
    * and the DuckDB oracle take this exact double as a literal (via
    * [[alphaM2Literal]]) so the estimate arithmetic starts from a
    * bit-identical constant on both sides. */
  val ALPHA_M2: Double = 0.7213 / (1.0 + 1.079 / M) * M * M

  /** Shortest-round-trip decimal literal of [[ALPHA_M2]] — pasteable
    * into Spark `expr(...)` and DuckDB SQL alike. */
  def alphaM2Literal: String = java.lang.Double.toString(ALPHA_M2)

  /** Column-API entry point: the m=4096 int register array of a
    * BIGINT column within each group. */
  def registers(c: Column): Column =
    ColumnBridge.column(
      HllRegistersAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
