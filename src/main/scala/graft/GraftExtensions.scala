package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, HeavyHittersSketch, KmvSketch, TextCanonExpr, TopKByScore}

/** Registers graft's native expressions for SQL use:
  * `SELECT cosine_sim(a, b)` / `text_canon(s)` — codegen'd Catalyst
  * expressions, not UDFs, so they participate in whole-stage
  * codegen — and the bounded
  * sketch aggregates `top_k_by_score(score, id, tag, k)`,
  * `heavy_hitters(item, capacity)` and `kmv_sketch(hash, k)` (the
  * size argument must be an integer literal in each; it sizes the
  * per-partition state at plan time).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: size must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))
    ))
    ext.injectFunction((
      new FunctionIdentifier("text_canon"),
      new ExpressionInfo(classOf[TextCanonExpr].getName, "text_canon"),
      (exprs: Seq[Expression]) => TextCanonExpr(exprs.head)
    ))
    ext.injectFunction((
      new FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHittersSketch].getName,
        "heavy_hitters"),
      (exprs: Seq[Expression]) => HeavyHittersSketch(exprs.head,
        intLit(exprs(1), "heavy_hitters"))
    ))
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
      (exprs: Seq[Expression]) => KmvSketch(exprs.head,
        intLit(exprs(1), "kmv_sketch"))
    ))
    ext.injectFunction((
      new FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 4) throw new IllegalArgumentException(
          s"top_k_by_score expects 4 arguments (score, id, tag, k), " +
            s"got ${exprs.length}")
        val k = exprs(3) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"top_k_by_score: k must be an integer literal, got $other")
        }
        TopKByScore(exprs(0), exprs(1), exprs(2), k)
      }
    ))
  }
}
