package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BandSigsExpr, BpeUnitsExpr, CosineSimilarity, EmbedSimHash2Expr, EmbedSimHashExpr, HeavyHittersSketch, HllSketch, KmvSketch, MinHashSigExpr, NGramHashesExpr, NGramHashesPosExpr, ShingleSetExpr, SimHashExpr, StringHashExpr, TextCanonExpr, TokenHashesExpr, TopKByScore}

/** Registers graft's native expressions for SQL use:
  * `SELECT cosine_sim(a, b)` / `text_canon(s)` — codegen'd Catalyst
  * expressions, not UDFs, so they participate in whole-stage
  * codegen — the full TextHash kernel family (`token_hashes`,
  * `shingle_set`, `ngram_hashes[_pos]`, `minhash_sig`, `band_sigs`,
  * `simhash`, `embed_simhash`, `string_poly_hash`, `bpe_units`), and
  * the bounded
  * sketch aggregates `top_k_by_score(score, id, tag, k)`,
  * `heavy_hitters(item, capacity)`, `kmv_sketch(hash, k)` and
  * `hll_sketch(hash, p)` (the
  * size argument must be an integer literal in each; it sizes the
  * per-partition state at plan time — and `ngram_hashes[_pos]`'s `n`
  * likewise).
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
      new FunctionIdentifier("hll_sketch"),
      new ExpressionInfo(classOf[HllSketch].getName, "hll_sketch"),
      (exprs: Seq[Expression]) => HllSketch(exprs.head,
        intLit(exprs(1), "hll_sketch"))
    ))
    // The TextHash kernel family: unary array/string transforms.
    def unary(name: String, cls: Class[_],
        build: Expression => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        (exprs: Seq[Expression]) => build(exprs.head)))
    unary("token_hashes", classOf[TokenHashesExpr], TokenHashesExpr)
    unary("shingle_set", classOf[ShingleSetExpr], ShingleSetExpr)
    unary("minhash_sig", classOf[MinHashSigExpr], MinHashSigExpr)
    unary("band_sigs", classOf[BandSigsExpr], BandSigsExpr)
    unary("simhash", classOf[SimHashExpr], SimHashExpr)
    unary("embed_simhash", classOf[EmbedSimHashExpr], EmbedSimHashExpr)
    unary("embed_simhash2", classOf[EmbedSimHash2Expr], EmbedSimHash2Expr)
    unary("string_poly_hash", classOf[StringHashExpr], StringHashExpr)
    unary("bpe_units", classOf[BpeUnitsExpr], BpeUnitsExpr)
    ext.injectFunction((
      new FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[NGramHashesExpr].getName, "ngram_hashes"),
      (exprs: Seq[Expression]) => NGramHashesExpr(exprs.head,
        intLit(exprs(1), "ngram_hashes"))
    ))
    ext.injectFunction((
      new FunctionIdentifier("ngram_hashes_pos"),
      new ExpressionInfo(classOf[NGramHashesPosExpr].getName,
        "ngram_hashes_pos"),
      (exprs: Seq[Expression]) => NGramHashesPosExpr(exprs.head,
        intLit(exprs(1), "ngram_hashes_pos"))
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
