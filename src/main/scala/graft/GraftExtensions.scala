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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      info("graft_dot"),
      (children: Seq[Expression]) =>
        DotProductExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count"),
      (children: Seq[Expression]) =>
        SortedIntersectCountExpr(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig"),
      (children: Seq[Expression]) => children(1) match {
        case Literal(k: Int, _) => MinHashSigExpr(children(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_minhash_sig: k must be an integer literal, got $other")
      }))
  }
}
