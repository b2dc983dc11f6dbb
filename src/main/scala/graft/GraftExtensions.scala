package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProductExpr, MinHashSigExpr, SortedIntersectCountExpr}

/** Session extension that registers the engine's custom codegen
  * expressions as SQL functions, so the SQL-text API (SURVEY.md §2.N)
  * reaches the same codegen'd kernels the DataFrame API uses:
  *
  *   spark.sql.extensions=graft.GraftExtensions   (or
  *   `SparkSession.builder.withExtensions(new GraftExtensions)`)
  *
  *   SELECT graft_dot(a.emb, b.emb)                -- fused dot product
  *   SELECT graft_sorted_intersect_count(ga, gb)   -- merge-walk |A∩B|
  *   SELECT graft_minhash_sig(shingle_hashes, 16)  -- k-perm signature
  *                                                 -- over array<long>
  *
  * Registration is additive metadata on the session — no planner
  * behavior changes, so every Catalyst rule and strategy continues to
  * apply (the expressions participate in whole-stage codegen exactly
  * as their DataFrame spellings do).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def requireArity(name: String, n: Int,
                           children: Seq[Expression]): Unit =
    if (children.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${children.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      info("graft_dot"),
      (children: Seq[Expression]) => {
        requireArity("graft_dot", 2, children)
        DotProductExpr(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count"),
      (children: Seq[Expression]) => {
        requireArity("graft_sorted_intersect_count", 2, children)
        SortedIntersectCountExpr(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig"),
      (children: Seq[Expression]) => {
        requireArity("graft_minhash_sig", 2, children)
        children(1) match {
          // accept any integral literal width (16, 16L, SMALLINT...)
          case Literal(k: Int, _) => MinHashSigExpr(children(0), k)
          case Literal(k: Long, _) => MinHashSigExpr(children(0), k.toInt)
          case Literal(k: Short, _) => MinHashSigExpr(children(0), k.toInt)
          case Literal(k: Byte, _) => MinHashSigExpr(children(0), k.toInt)
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig: k must be an integer literal, got $other")
        }
      }))
  }
}
