package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, TopKByScore}

/** Registers graft's native expressions for SQL use:
  * `SELECT cosine_sim(a, b)` — a codegen'd Catalyst expression, not a
  * UDF, so it participates in whole-stage codegen — and the
  * bounded-heap aggregate `top_k_by_score(score, id, tag, k)` (k must
  * be an integer literal; it sizes the per-partition heap at plan
  * time).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))
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
