package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** k-permutation MinHash signature of a hashed-shingle set as one
  * fused codegen'd pass.
  *
  * Replaces the interpreted `transform(sequence(0, k-1), i ->
  * array_min(transform(hset, h -> xxhash64(h, i))))`, which evaluates
  * k * |hset| lambda calls per row and allocates k intermediate arrays
  * (round-2 driver bench: 12.0 s for dedup_minhash at sf0.1, dominated
  * by this signature). Values are bit-identical (asserted in
  * SimilaritySpec): Spark's `xxhash64(h, i)` over (long h, int i) is
  * `XXH64.hashInt(i, XXH64.hashLong(h, 42))`, and the per-shingle
  * `hashLong` is hoisted out of the permutation loop — 1 + k hash
  * calls per shingle instead of 2k.
  *
  * An empty input set yields Long.MaxValue sentinels (the built-in
  * form yields nulls; callers never produce empty shingle sets —
  * LlmQueries.shingled emits at least one shingle per document).
  */
case class MinHashSigExpr(child: Expression, k: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<long> input and k > 0, got " +
        s"${child.dataType.simpleString}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base = XXH64.hashLong(arr.getLong(i), 42L)
      var j = 0
      while (j < k) {
        val h = XXH64.hashInt(j, base)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $base = $xxh.hashLong($a.getLong($i), 42L);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $h = $xxh.hashInt($j, $base);
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigExpr = copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSigExpr {
  /** Column API: k-permutation MinHash signature (`array<long>`) of an
    * `array<long>` hashed-shingle set.
    */
  def sig(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(c), k))
}
