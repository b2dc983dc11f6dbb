package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| of two ASCENDING-SORTED long arrays as one codegen'd merge
  * walk — no per-call hash-set allocation, no intermediate array.
  *
  * The built-in `size(array_intersect(a, b))` builds a hash set and an
  * output array per invocation; on the near-dup verify path that runs
  * once per candidate pair (~200k pairs at sf0.1) it dominates the
  * query. Inputs MUST be sorted ascending and duplicate-free (callers
  * sort once per row with `array_sort(array_distinct(...))` — amortized
  * over every pair the row appears in); elements must be non-null.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_intersect_count requires two array<long> inputs, " +
          s"got ${left.dataType.simpleString} and " +
          s"${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < nx && j < ny) {
      val vx = x.getLong(i)
      val vy = y.getLong(j)
      if (vx == vy) { n += 1; i += 1; j += 1 }
      else if (vx < vy) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val vx = ctx.freshName("vx")
      val vy = ctx.freshName("vy")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $vx = $a.getLong($i);
         |  long $vy = $b.getLong($j);
         |  if ($vx == $vy) { $n++; $i++; $j++; }
         |  else if ($vx < $vy) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_count"
}

object SortedIntersectCountExpr {
  /** Column API: intersection size of two sorted `array<long>`s. */
  def count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
