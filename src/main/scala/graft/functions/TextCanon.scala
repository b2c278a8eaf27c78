package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization — the normalization boilerplate at
  * the head of every curation pipeline, as ONE compiled kernel pass
  * instead of a 5-deep interpreter chain of regexp_replace calls
  * (Spark has no built-in NFC normalize at all; the alternative is a
  * UDF, which forfeits codegen).
  *
  * Contract (in order):
  *   1. zero-width chars (U+200B..U+200D, U+FEFF BOM) dropped — and
  *      dropped BEFORE normalization: a zero-width char between a
  *      base and its combining mark blocks NFC, so stripping after
  *      would leave a decomposed pair that a SECOND canon pass
  *      composes — breaking idempotence (caught by the fuzz spec);
  *   2. NFC compose (é as e+U+0301 → U+00E9) — java.text.Normalizer,
  *      identical to ICU on the composition sequences that occur in
  *      web text;
  *   3. no-break spaces (U+00A0, U+2007, U+202F) → ' ';
  *   4. per-codepoint lowercase — matches SQL `lower` on ASCII and
  *      Latin-1; full-casefold locale specials (tr İ, ß→ss) are OUT
  *      of contract (neither engine's `lower` applies them either);
  *   5. whitespace runs ([ \t\n\f\r] — exactly RE2's `\s` set)
  *      collapse to one space, leading/trailing trimmed.
  *
  * The DuckDB twin `trim(regexp_replace(replace(replace(lower(
  * nfc_normalize(s)), nbsp, ' '), zwsp, ''), '\s+', ' ', 'g'))`
  * strips zero-width AFTER normalizing — the two orders agree
  * whenever no zero-width char separates a composable pair, which
  * holds for the d39 planted corpus (zero-width dirt is appended,
  * never interleaved) and is md5-pinned there.
  *
  * One pass after the strip, one output allocation; stays inside
  * whole-stage codegen via `doGenCode` → the static kernel.
  */
object TextCanonKernels {

  private def isZeroWidth(cp: Int): Boolean =
    (cp >= 0x200B && cp <= 0x200D) || cp == 0xFEFF

  def canon(s: UTF8String): UTF8String = {
    val raw = s.toString
    val kept = new java.lang.StringBuilder(raw.length)
    var j = 0
    while (j < raw.length) {
      val cp = raw.codePointAt(j)
      j += Character.charCount(cp)
      if (!isZeroWidth(cp)) kept.appendCodePoint(cp)
    }
    val nfc = java.text.Normalizer.normalize(
      kept.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      i += Character.charCount(cp)
      val mapped =
        if (cp == 0x00A0 || cp == 0x2007 || cp == 0x202F) ' '.toInt
        else if (isZeroWidth(cp)) -1 // unreachable post-strip; totality
        else Character.toLowerCase(cp)
      if (mapped >= 0) {
        if (mapped == ' ' || mapped == '\t' || mapped == '\n' ||
            mapped == '\f' || mapped == '\r') {
          // Collapse; `started` gates the leading trim for free.
          pendingSpace = started
        } else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.appendCodePoint(mapped)
          started = true
        }
      }
    }
    // A trailing pendingSpace is simply never emitted: right trim.
    UTF8String.fromString(sb.toString)
  }
}

case class TextCanonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_canon expects string, got ${other.catalogString}")
  }
  override protected def nullSafeEval(a: Any): Any =
    TextCanonKernels.canon(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextCanonKernels.canon($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextCanon {
  /** NFC + nbsp-map + zero-width-strip + lowercase + ws-collapse. */
  def text_canon(col: Column): Column =
    ColumnBridge.column(TextCanonExpr(ColumnBridge.expression(col)))
}
