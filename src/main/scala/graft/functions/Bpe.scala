package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-merge (BPE) tokenization as a compiled kernel — the
  * "real tokenizer" counterpart to the whitespace/regex counts of
  * d7: subword UNITS from a fixed rank-ordered merge table, the
  * algorithm production tokenizers run at encode time (a trained
  * vocabulary would swap in a bigger table; the procedure is
  * identical).
  *
  * Apply semantics (the classic greedy encode): a token starts as
  * its code-point symbols; each merge (a, b) → ab is applied in
  * RANK ORDER as one left-to-right pass replacing every adjacent
  * (a, b). Merges compose across ranks — (t,h)→th then (th,e)→the —
  * which is what makes the table a real BPE hierarchy rather than a
  * digram list.
  *
  * The DuckDB mirror ([[Bpe.duckBpeCtes]]) evaluates the SAME table
  * with repeated leftmost single replacements on a space-separated
  * symbol string (a recursive CTE over the DISTINCT token
  * vocabulary). Replacing the leftmost occurrence until none remain
  * is equivalent to the kernel's single greedy pass: a merge at
  * position j can't create a new (a, b) occurrence — ab ≠ a and
  * ab ≠ b since merges strictly grow — so the occurrence set after
  * a leftmost merge is exactly the remaining original occurrences.
  */
object BpeKernels {

  /** Rank-ordered merge table: fixed public English digram/trigram
    * hierarchy, shared verbatim with the oracle via
    * [[Bpe.duckMergeValues]].
    */
  val Merges: Array[(String, String)] = Array(
    "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e", "h" -> "e",
    "a" -> "t", "e" -> "n", "e" -> "s", "o" -> "r", "t" -> "i",
    "s" -> "t", "a" -> "r", "o" -> "u", "l" -> "e", "m" -> "e")

  private val mA = Merges.map(_._1)
  private val mB = Merges.map(_._2)

  /** Greedy BPE encode of one token, units appended to `out`. */
  def bpeWord(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    val syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms(k) = new String(Character.toChars(cp))
      k += 1
      i += Character.charCount(cp)
    }
    var n = syms.length
    var r = 0
    while (r < mA.length) {
      val a = mA(r); val b = mB(r)
      // One left-to-right pass, compacting in place: the write
      // cursor w never passes the read cursor j, and a merge writes
      // at w <= j so syms(j + 1) is still unread.
      var w = 0
      var j = 0
      while (j < n) {
        if (j + 1 < n && syms(j) == a && syms(j + 1) == b) {
          syms(w) = a + b; j += 2
        } else {
          syms(w) = syms(j); j += 1
        }
        w += 1
      }
      n = w
      r += 1
    }
    var q = 0
    while (q < n) { out.add(UTF8String.fromString(syms(q))); q += 1 }
  }

  /** array<string> tokens → array<string> of every token's BPE
    * units, in document order.
    */
  def bpeUnits(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) bpeWord(t.toString, out)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

case class BpeUnitsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_units expects array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    BpeKernels.bpeUnits(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernels.bpeUnits($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column API + DuckDB mirror for the BPE kernel. */
object Bpe {

  def bpe_units(col: Column): Column =
    ColumnBridge.column(BpeUnitsExpr(ColumnBridge.expression(col)))

  /** The merge table as a SQL VALUES list — single source of truth
    * with [[BpeKernels.Merges]].
    */
  def duckMergeValues: String = BpeKernels.Merges.zipWithIndex
    .map { case ((a, b), r) => s"($r, '$a', '$b')" }.mkString(", ")

  /** CTE chain (requires WITH RECURSIVE): per-doc word rows
    * `wtoks(doc_id, tok, widx)` and the BPE result per DISTINCT
    * vocabulary word `wunits(tok, s)` — s is the word's units joined
    * by single spaces. Encoding once per vocabulary word (not per
    * occurrence) is both what real tokenizers do (an encode cache)
    * and what keeps the recursion tiny.
    */
  def duckBpeCtes(rel: String): String =
    s"""mg(r, a, b) AS (SELECT * FROM (VALUES $duckMergeValues) m(r, a, b)),
       |wtoks AS (
       |  SELECT doc_id,
       |    unnest(${TextHash.duckTokens("text")}) AS tok,
       |    generate_subscripts(${TextHash.duckTokens("text")}, 1) AS widx
       |  FROM $rel
       |),
       |vocab AS (SELECT DISTINCT tok FROM wtoks),
       |useed AS (
       |  SELECT tok,
       |    ' ' || array_to_string(string_split(tok, ''), ' ') || ' ' AS s
       |  FROM vocab
       |),
       |bpe AS (
       |  SELECT tok, s, 0 AS r FROM useed
       |  UNION ALL
       |  SELECT b.tok,
       |    CASE WHEN contains(b.s, ' ' || m.a || ' ' || m.b || ' ')
       |      THEN regexp_replace(b.s, ' ' || m.a || ' ' || m.b || ' ',
       |        ' ' || m.a || m.b || ' ')
       |      ELSE b.s END,
       |    CASE WHEN contains(b.s, ' ' || m.a || ' ' || m.b || ' ')
       |      THEN b.r ELSE b.r + 1 END
       |  FROM bpe b JOIN mg m ON m.r = b.r
       |),
       |wunits AS (
       |  SELECT tok, trim(s) AS s FROM bpe
       |  WHERE r = ${BpeKernels.Merges.length}
       |)""".stripMargin
}
