package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the TextHash spec (see [[TextHash]] for the
  * spec itself and its DuckDB twin).
  *
  * The spec is expressible with Spark's higher-order functions
  * (`transform`/`aggregate`), and the first implementation did so —
  * but HOFs evaluate their lambda per array element through the
  * interpreter (one boxed function call per element), which made
  * MinHash over ~10⁵ shingle values per partition the bench
  * bottleneck (78 s at sf0.1). These expressions compute the same
  * values in tight JVM loops and stay inside whole-stage codegen via
  * `doGenCode` delegating to the static [[TextHashKernels]] methods —
  * one call per row, zero per-element dispatch.
  *
  * Each expression is pinned to the HOF formulation by
  * TextHashSpec's cross-engine test values.
  */
object TextHashKernels {

  import TextHash.{P, SimMult, SimMult2, Mod32, SimBits, PermA, PermB,
    NumPerms, Bands, RowsPerBand, EmbedPlanes, embedPlaneA, embedPlaneB}

  /** Polynomial char hash per token: fold (h·31 + codepoint) mod P. */
  def tokenHashes(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i).toString
      var h = 0L
      var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        h = (h * 31 + cp) % P
        j += Character.charCount(cp)
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct 3-gram shingle hashes (first-occurrence order). */
  def shingleSet(th: ArrayData): ArrayData = {
    val n = th.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= n - 3) {
      val s = (((th.getLong(i) * 31 + th.getLong(i + 1)) % P) * 31 +
        th.getLong(i + 2)) % P
      seen.add(s)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  private val permA: Array[Long] = PermA.toArray
  private val permB: Array[Long] = PermB.toArray

  /** 16-permutation MinHash signature over a shingle array. The
    * signature of an EMPTY shingle set is the empty array (callers
    * filter < 3-token docs out before this point; the HOF spec
    * yields nulls there and the oracle drops the doc entirely).
    */
  def minHashSig(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](NumPerms)
    var j = 0
    while (j < NumPerms) {
      val a = permA(j); val b = permB(j)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * sh.getLong(i) + b) % P
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 4 LSH band signatures from a MinHash signature. */
  def bandSigs(mh: ArrayData): ArrayData = {
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      val o = b * RowsPerBand
      out(b) = ((((mh.getLong(o) * 31 + mh.getLong(o + 1)) % P) * 31 +
        mh.getLong(o + 2)) * 31 + mh.getLong(o + 3)) % P
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct n-gram hashes over a token-hash array (first-occurrence
    * order): gram i = fold (h·31 + th[i+j]) mod P over j < n — the
    * 3-gram [[shingleSet]] generalized to any width (decontamination
    * probes use 8). Fewer than n tokens ⇒ empty array.
    */
  def ngramHashes(th: ArrayData, n: Int): ArrayData = {
    val m = th.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= m - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        h = (h * 31 + th.getLong(i + j)) % P
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** POSITIONAL n-gram hashes: one entry per gram start (no dedup),
    * index i holding the hash of tokens [i, i+n). Same fold as
    * [[ngramHashes]]; the positional variant exists for span-level
    * analysis (duplicated-span dedup needs to know WHERE a gram sits,
    * not just that it occurs). Fewer than n tokens ⇒ empty array.
    */
  def ngramHashesPos(th: ArrayData, n: Int): ArrayData = {
    val m = th.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        h = (h * 31 + th.getLong(i + j)) % P
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over token hashes (multiplicity-weighted): bits
    * 0-31 vote on (t·SimMult) mod 2³², bits 32-63 on (t·SimMult2)
    * mod 2³² — both products exact in signed 64-bit.
    */
  def simHash(th: ArrayData): Long = {
    val votes = new Array[Long](SimBits)
    val n = th.numElements()
    var i = 0
    while (i < n) {
      val h = th.getLong(i)
      val m1 = (h * SimMult) % Mod32
      val m2 = (h * SimMult2) % Mod32
      var b = 0
      while (b < 32) {
        if (((m1 >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        if (((m2 >> b) & 1L) == 1L) votes(b + 32) += 1 else votes(b + 32) -= 1
        b += 1
      }
      i += 1
    }
    var f = 0L
    var b = 0
    while (b < SimBits) {
      if (votes(b) > 0) f |= 1L << b
      b += 1
    }
    f
  }

  /** 64-bit sign-of-dot signature of an embedding over deterministic
    * ±1 hyperplanes (random-hyperplane LSH for cosine): bit p is set
    * iff Σ_d sign(p,d)·emb[d] ≥ 0, with
    * sign(p,d) = +1 iff ((embedPlaneA(p)·(d+1) + embedPlaneB(p)) mod P)
    * even. Accumulation is left-to-right double — bit-identical to
    * the DuckDB twin (TextHash.duckEmbedSimHash).
    */
  def embedSimHash(emb: ArrayData): Long = embedSimHashWord(emb, 0)

  /** Second 64-plane signature word (planes 64-127, same derivation
    * law — the block-offset construction extends past plane 63
    * unchanged): the scale step for corpora past
    * [[TextHash.EmbedBandWiden2N]], where even 16-bit slices of one
    * word stop pruning and the band layout moves to 4×32 bits across
    * the 128-bit two-word signature.
    */
  def embedSimHash2(emb: ArrayData): Long = embedSimHashWord(emb, 1)

  private def embedSimHashWord(emb: ArrayData, word: Int): Long = {
    val n = emb.numElements()
    val off = word * EmbedPlanes
    var sig = 0L
    var j = 0
    while (j < EmbedPlanes) {
      val a = embedPlaneA(off + j)
      val b = embedPlaneB(off + j)
      var dot = 0.0
      var d = 0
      while (d < n) {
        val s = if (((a * (d + 1) + b) % P) % 2 == 0L) 1.0 else -1.0
        dot += s * emb.getDouble(d)
        d += 1
      }
      if (dot >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Whole-string polynomial hash (the document fingerprint). */
  def stringHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var j = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      h = (h * 31 + cp) % P
      j += Character.charCount(cp)
    }
    h
  }
}

/** Base for unary array→array kernel expressions. */
abstract class KernelArrayExpression extends UnaryExpression {
  protected def kernelName: String
  protected def inputElemType: DataType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == inputElemType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<${inputElemType.simpleString}>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[ArrayData])

  protected def kernel(a: ArrayData): ArrayData

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.$kernelName($c)")
}

case class TokenHashesExpr(child: Expression) extends KernelArrayExpression {
  override protected def kernelName: String = "tokenHashes"
  override protected def inputElemType: DataType = StringType
  override protected def kernel(a: ArrayData): ArrayData =
    TextHashKernels.tokenHashes(a)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class ShingleSetExpr(child: Expression) extends KernelArrayExpression {
  override protected def kernelName: String = "shingleSet"
  override protected def inputElemType: DataType = LongType
  override protected def kernel(a: ArrayData): ArrayData =
    TextHashKernels.shingleSet(a)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class NGramHashesExpr(child: Expression, n: Int)
    extends KernelArrayExpression {
  override protected def kernelName: String = "ngramHashes"
  override protected def inputElemType: DataType = LongType
  override protected def kernel(a: ArrayData): ArrayData =
    TextHashKernels.ngramHashes(a, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.ngramHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class NGramHashesPosExpr(child: Expression, n: Int)
    extends KernelArrayExpression {
  override protected def kernelName: String = "ngramHashesPos"
  override protected def inputElemType: DataType = LongType
  override protected def kernel(a: ArrayData): ArrayData =
    TextHashKernels.ngramHashesPos(a, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.ngramHashesPos($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class MinHashSigExpr(child: Expression) extends KernelArrayExpression {
  override protected def kernelName: String = "minHashSig"
  override protected def inputElemType: DataType = LongType
  override protected def kernel(a: ArrayData): ArrayData =
    TextHashKernels.minHashSig(a)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class BandSigsExpr(child: Expression) extends KernelArrayExpression {
  override protected def kernelName: String = "bandSigs"
  override protected def inputElemType: DataType = LongType
  override protected def kernel(a: ArrayData): ArrayData =
    TextHashKernels.bandSigs(a)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<bigint>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(a: Any): Any =
    TextHashKernels.simHash(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.simHash($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class EmbedSimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"embed_simhash expects array<double>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(a: Any): Any =
    TextHashKernels.embedSimHash(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.embedSimHash($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class EmbedSimHash2Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"embed_simhash2 expects array<double>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(a: Any): Any =
    TextHashKernels.embedSimHash2(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.embedSimHash2($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class StringHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"string_poly_hash expects string, got ${other.catalogString}")
  }
  override protected def nullSafeEval(a: Any): Any =
    TextHashKernels.stringHash(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.stringHash($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column API for the kernels. */
object TextHashExprs {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def token_hashes(col: Column): Column = c(TokenHashesExpr(e(col)))
  def shingle_set(col: Column): Column = c(ShingleSetExpr(e(col)))
  def ngram_hashes(col: Column, n: Int): Column = c(NGramHashesExpr(e(col), n))
  def ngram_hashes_pos(col: Column, n: Int): Column =
    c(NGramHashesPosExpr(e(col), n))
  def minhash_sig(col: Column): Column = c(MinHashSigExpr(e(col)))
  def band_sigs(col: Column): Column = c(BandSigsExpr(e(col)))
  def simhash(col: Column): Column = c(SimHashExpr(e(col)))
  def embed_simhash(col: Column): Column = c(EmbedSimHashExpr(e(col)))
  def embed_simhash2(col: Column): Column = c(EmbedSimHash2Expr(e(col)))
  def string_poly_hash(col: Column): Column = c(StringHashExpr(e(col)))
}
