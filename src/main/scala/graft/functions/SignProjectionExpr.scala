package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** All sign-random-projection LSH band values of one embedding in a
  * single fused pass, as a native codegen'd Catalyst expression.
  *
  * The built-in formulation — `transform(bands, b -> aggregate(bits,
  * (acc, i) -> acc * 2 + sign(aggregate(zip_with(emb, plane, *), +))))`
  * — evaluates every lambda per element in interpreted mode and
  * allocates a zipped array per (row, bit): 64 interpreted dot products
  * per row. That cost dominated the round-2 driver bench for the three
  * signature consumers (ann_lsh_topk 21.7 s, dedup_embedding_cosine
  * 14.1 s) and swung 5-8x between runs. Here the hyperplane matrix is a
  * codegen reference object and the whole signature is one tight
  * primitive loop nest that fuses into the surrounding stage.
  *
  * Semantics are bit-identical to the interpreted form (asserted in
  * SimilaritySpec): per band, msb-first `acc * 2 + (dot >= 0 ? 1 : 0)`
  * over `bitsPerBand` planes, dot products summed left-to-right over
  * the common prefix of vector and plane.
  */
case class SignProjectionExpr(child: Expression, planes: Seq[Seq[Double]],
                              bitsPerBand: Int) extends UnaryExpression {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // bitsPerBand >= 1 FIRST: short-circuit keeps the modulo from
    // throwing a raw ArithmeticException inside analysis, and a
    // negative bitsPerBand would otherwise pass (8 % -4 == 0) and
    // crash with NegativeArraySizeException per row at execution
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if bitsPerBand >= 1 && planes.nonEmpty &&
        planes.length % bitsPerBand == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_sign_projection requires array<float|double> input and " +
        s"|planes| divisible by bitsPerBand, got " +
        s"${child.dataType.simpleString}, ${planes.length} planes, " +
        s"$bitsPerBand bits/band")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val nBands = planes.length / bitsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = 0L
      var j = 0
      while (j < bitsPerBand) {
        val p = planeArr(b * bitsPerBand + j)
        val n = math.min(arr.numElements(), p.length)
        var s = 0.0
        var k = 0
        while (k < n) {
          val x = if (isF) arr.getFloat(k).toDouble else arr.getDouble(k)
          s += x * p(k)
          k += 1
        }
        acc = acc * 2 + (if (s >= 0) 1L else 0L)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
      val nBands = planes.length / bitsPerBand
      val getter = if (elemIsFloat) "getFloat" else "getDouble"
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
         |long[] $out = new long[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $bitsPerBand; $j++) {
         |    double[] $p = $pRef[$b * $bitsPerBand + $j];
         |    int $n = java.lang.Math.min($a.numElements(), $p.length);
         |    double $s = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      $s += ((double) $a.$getter($k)) * $p[$k];
         |    }
         |    $acc = $acc * 2L + ($s >= 0 ? 1L : 0L);
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignProjectionExpr = copy(child = newChild)

  override def prettyName: String = "graft_sign_projection"
}

object SignProjectionExpr {
  /** Column API: all `planes.length / bitsPerBand` LSH band values of
    * an `array<float|double>` embedding as `array<long>`.
    */
  def bands(c: Column, planes: Seq[Seq[Double]], bitsPerBand: Int): Column =
    ColumnBridge.column(
      SignProjectionExpr(ColumnBridge.expression(c), planes, bitsPerBand))
}
