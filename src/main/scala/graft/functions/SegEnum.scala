package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled all-mask segmentation enumerator for the unigram-LM
  * trainer (UnigramLm.scoredSegs): one expression generating, per
  * word, every cut-mask segmentation — (piece count, space-joined
  * segmentation string, pieces) — replacing the interpreted
  * `sequence`-explode + `filter` + two `transform`s + `substring` +
  * `array_join` chain that previously ran per (word, mask) row
  * (≤ 2^(len−1) masks per word at the trainer's 12-char cap, each
  * paying ~5 interpreted higher-order dispatches before the piece
  * join — the AlphaPruneKept/NearestCentroidCell measurement class).
  *
  * Semantics are EXACTLY the HOF chain's: mask bit t−1 set ⇔ a cut
  * after character t (1-based), pieces are the substrings between
  * consecutive cuts in left-to-right order, `segstr` joins them with
  * single spaces, and masks with fewer than `minPieces` pieces are
  * dropped (the prune step's proper-substring restriction). Output
  * order is ascending mask — the enumeration order the `sequence`
  * explode produced; downstream aggregation is order-insensitive
  * (the winner is a total-order argmin), the CTE mirror unchanged.
  *
  * Words longer than 20 chars would overflow the mask space
  * (2^(len−1) structs); the trainer caps at 12 upstream, and this
  * expression re-checks loudly rather than materializing garbage.
  */
case class SegEnumAll(
    child: Expression,
    minPieces: Int) extends UnaryExpression {

  require(minPieces >= 1,
    s"seg_enum: minPieces must be >= 1, got $minPieces")

  override def dataType: DataType = SegEnumAll.resultType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"seg_enum expects a string word, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    SegEnumKernels.enumerate(a.asInstanceOf[UTF8String], minPieces)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SegEnumKernels.enumerate(" +
        s"$a, $minPieces);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SegEnumKernels {

  /** All cut-mask segmentations of `w`: array of (np, segstr, ps)
    * structs in ascending-mask order, masks with np < minPieces
    * dropped. Substring semantics match Spark `substring` on the
    * word's UTF-8 string (cuts index CHARACTERS, exactly like the
    * `length`/`substring` pair the HOF chain used).
    */
  private val Space = UTF8String.fromString(" ")

  def enumerate(w: UTF8String, minPieces: Int): GenericArrayData = {
    // Character semantics = Spark SQL's (`length`/`substring` count
    // code points): everything goes through UTF8String, matching the
    // HOF chain this kernel replaces byte-for-byte.
    val len = w.numChars()
    require(len <= 20,
      s"seg_enum: word length $len exceeds the 20-char mask bound " +
        "(the trainer caps words upstream)")
    if (len == 0) return new GenericArrayData(new Array[Any](0))
    val nMasks = 1L << (len - 1)
    val out = new java.util.ArrayList[Any](nMasks.toInt)
    var mask = 0L
    while (mask < nMasks) {
      // Piece count = popcount + 1; skip early when below minPieces.
      val np = java.lang.Long.bitCount(mask) + 1
      if (np >= minPieces) {
        val ps = new Array[UTF8String](np)
        var start = 0
        var p = 0
        var t = 1
        while (t <= len) {
          val cutHere = t == len || ((mask >> (t - 1)) & 1L) == 1L
          if (cutHere) {
            // SQL substring: 1-based start, char count length.
            ps(p) = w.substringSQL(start + 1, t - start)
            start = t
            p += 1
          }
          t += 1
        }
        out.add(InternalRow(np.toLong,
          UTF8String.concatWs(Space, ps: _*),
          new GenericArrayData(ps.asInstanceOf[Array[Any]])))
      }
      mask += 1L
    }
    new GenericArrayData(out.toArray)
  }
}

object SegEnumAll {

  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("np", LongType, nullable = false),
    StructField("segstr", StringType, nullable = false),
    StructField("ps", ArrayType(StringType, containsNull = false),
      nullable = false))),
    containsNull = false)

  /** Column API: `seg_enum($"w", minPieces)`. */
  def seg_enum(w: Column, minPieces: Int): Column =
    ColumnBridge.column(SegEnumAll(ColumnBridge.expression(w), minPieces))
}
