package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Compiled nearest-centroid assignment: the k-means / IVF hot step
  * (`argmax_cell cosine(row, centroid_cell)`) as ONE native Catalyst
  * expression over the row's embedding, with the bounded k×dims
  * centroid matrix baked in as a codegen reference object (it is
  * driver-known and tiny — the same table the previous formulation
  * shipped as a one-row broadcast array).
  *
  * Why a kernel (the TextHashExprs treatment, measured before
  * building): the previous `aggregate()` fold dispatched k
  * interpreted lambda steps per row — profiled at ~0.41 µs per
  * row·cell at k=256 on sf0.1×20 (KMeansProfile), ~10× the cost of
  * the cosine arithmetic itself, i.e. HOF dispatch dominated. The
  * kernel reads the embedding ONCE into a primitive array, reuses
  * the row norm across all k cells (the fold recomputed it k times),
  * and runs k tight primitive dot loops inside whole-stage codegen.
  *
  * Result parity is bit-exact with the fold it replaces: the dot and
  * both squared norms accumulate left-to-right exactly as
  * [[CosineSimilarity]] does (same IEEE op sequence; interleaving
  * independent accumulators does not change each one's order), the
  * score is `dot / (sqrt(nx) * sqrt(ny))` with the same
  * multiply-then-divide shape, centroid norms are precomputed (same
  * value, computed once), and the strictly-greater argmax over cells
  * in ascending cell order keeps the earliest cell on ties — the
  * (cos DESC, cell ASC) row_number order the oracle states. The
  * comparison uses Spark SQL's double semantics (NaN greatest,
  * -0.0 == 0.0), not raw Java `>`.
  */
case class NearestCentroidCell(
    child: Expression,
    cells: Array[Long],
    cvecs: Array[Array[Double]]) extends UnaryExpression {

  require(cells.length == cvecs.length && cells.nonEmpty,
    "nearest_centroid needs a non-empty (cell, cvec) table")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** sqrt of each centroid's squared norm, accumulated left-to-right
    * — the exact value CosineSimilarity's per-pair loop produces.
    */
  @transient private lazy val sqrtNorms: Array[Double] =
    cvecs.map { v =>
      var ny = 0.0; var i = 0
      while (i < v.length) { ny += v(i) * v(i); i += 1 }
      math.sqrt(ny)
    }

  override def nullSafeEval(a: Any): Any =
    NearestCentroidKernels.nearest(
      a.asInstanceOf[ArrayData], isFloat, cells, cvecs, sqrtNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "long[]")
    val mRef = ctx.addReferenceObj("cvecs", cvecs, "double[][]")
    val nRef = ctx.addReferenceObj("sqrtNorms", sqrtNorms, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NearestCentroidKernels.nearest(" +
        s"$a, $isFloat, $cellsRef, $mRef, $nRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCentroidKernels {

  /** Spark SQL's double comparison: NaN greater than everything,
    * NaN == NaN, and -0.0 == 0.0 (`==` fires before the NaN checks)
    * — mirrors Utils.nanSafeCompareDoubles so the argmax can't
    * diverge from the Catalyst GreaterThan it replaces.
    */
  private def gtSparkSql(x: Double, y: Double): Boolean =
    if (java.lang.Double.isNaN(x) && java.lang.Double.isNaN(y)) false
    else if (x == y) false
    else if (java.lang.Double.isNaN(x)) true
    else if (java.lang.Double.isNaN(y)) false
    else x > y

  /** Argmax cell by cosine, ties to the earliest (lowest) cell —
    * cells MUST arrive sorted ascending.
    */
  def nearest(emb: ArrayData, floatElems: Boolean, cells: Array[Long],
      cvecs: Array[Array[Double]], sqrtNorms: Array[Double]): Long = {
    val n = emb.numElements()
    val x = new Array[Double](n)
    var nx = 0.0
    var i = 0
    while (i < n) {
      val v = if (floatElems) emb.getFloat(i).toDouble else emb.getDouble(i)
      x(i) = v; nx += v * v
      i += 1
    }
    val sx = math.sqrt(nx)
    var best = -2.0 // cosine >= -1 > -2: the fold's seed, always replaced
    var bestCell = -1L
    var c = 0
    while (c < cvecs.length) {
      val cv = cvecs(c)
      val d = math.min(n, cv.length)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += x(j) * cv(j); j += 1 }
      val cs = dot / (sx * sqrtNorms(c))
      if (gtSparkSql(cs, best)) { best = cs; bestCell = cells(c) }
      c += 1
    }
    bestCell
  }
}

object NearestCentroidCell {
  /** Column API: `nearest_centroid($"embedding", sortedCentTable)`.
    * @param cents (cell, centroid vector) pairs, ANY order — sorted
    *   ascending by cell here so ties resolve to the lowest cell.
    */
  def nearest_centroid(emb: Column,
      cents: Seq[(Long, Array[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    ColumnBridge.column(NearestCentroidCell(ColumnBridge.expression(emb),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray))
  }
}
