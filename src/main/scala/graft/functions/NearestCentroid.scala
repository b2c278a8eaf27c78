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

/** Compiled top-`nprobe` cell routing — the multi-probe counterpart
  * of [[NearestCentroidCell]] and the scale fix for the walk-family
  * build substrate's routing stage: `knnGraphProbed` previously
  * scored every vector against ALL nlist centroids through an
  * interpreted `transform` lambda and a full `array_sort` over nlist
  * structs — with nlist ∝ n (the trainedCells rule) that stage was
  * the measured super-linear term of the whole nav-build family
  * (e28/e41/e46/e49 at 15–25× per 10× data at sf1→sf10; the lambda
  * dispatch + per-row struct-array allocation carry a ~10× constant
  * over the cosine arithmetic, per KMeansProfile). This kernel reads
  * the embedding ONCE, reuses the row norm across all cells, keeps a
  * bounded nprobe-slot insertion list instead of sorting nlist
  * structs, and runs entirely inside whole-stage codegen.
  *
  * Semantics: the top-`nprobe` cells by (cosine DESC, cell ASC) — the
  * probe order `ivfProbeTopK`'s row_number and the DuckDB oracle's
  * `ORDER BY cosine DESC, cell` state. Comparison is Spark SQL double
  * semantics via the same `gtSparkSql` as [[NearestCentroidCell]]
  * (NaN greatest, NaN==NaN, -0.0==0.0) — note this matches the
  * oracle MORE faithfully than the `array_sort` formulation it
  * replaces (a struct sort ranks a NaN cosine last instead of
  * first; zero-norm vectors are the only way to hit that corner).
  * Fewer cells than `nprobe` returns them all, exactly like
  * `slice(array_sort(..), 1, nprobe)` did.
  */
case class NearestCellsProbed(
    child: Expression,
    cells: Array[Long],
    cvecs: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {

  require(cells.length == cvecs.length && cells.nonEmpty,
    "nearest_cells needs a non-empty (cell, cvec) table")
  require(nprobe >= 1, s"nearest_cells needs nprobe >= 1, got $nprobe")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val sqrtNorms: Array[Double] =
    cvecs.map { v =>
      var ny = 0.0; var i = 0
      while (i < v.length) { ny += v(i) * v(i); i += 1 }
      math.sqrt(ny)
    }

  override def nullSafeEval(a: Any): Any =
    NearestCentroidKernels.nearestK(
      a.asInstanceOf[ArrayData], isFloat, cells, cvecs, sqrtNorms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "long[]")
    val mRef = ctx.addReferenceObj("cvecs", cvecs, "double[][]")
    val nRef = ctx.addReferenceObj("sqrtNorms", sqrtNorms, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NearestCentroidKernels.nearestK(" +
        s"$a, $isFloat, $cellsRef, $mRef, $nRef, $nprobe);")
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

  /** Top-`nprobe` cells by (cosine DESC, cell ASC) as a bounded
    * insertion list — cells MUST arrive sorted ascending, so an
    * equal-score candidate never displaces an earlier (lower) cell.
    * Returns min(nprobe, #cells) entries in probe order.
    */
  def nearestK(emb: ArrayData, floatElems: Boolean, cells: Array[Long],
      cvecs: Array[Array[Double]], sqrtNorms: Array[Double],
      nprobe: Int): ArrayData = {
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
    val m = math.min(nprobe, cvecs.length)
    val ks = new Array[Double](m)
    val kc = new Array[Long](m)
    var filled = 0
    var c = 0
    while (c < cvecs.length) {
      val cv = cvecs(c)
      val d = math.min(n, cv.length)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += x(j) * cv(j); j += 1 }
      val cs = dot / (sx * sqrtNorms(c))
      // Insertion point: strictly-greater only, so ties land AFTER
      // the earlier (lower) cell — the (cos DESC, cell ASC) order.
      var p = 0
      while (p < filled && !gtSparkSql(cs, ks(p))) p += 1
      if (p < m) {
        var t = math.min(filled, m - 1)
        while (t > p) { ks(t) = ks(t - 1); kc(t) = kc(t - 1); t -= 1 }
        ks(p) = cs; kc(p) = cells(c)
        if (filled < m) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(kc, filled))
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

  /** Column API: `nearest_cells($"embedding", centTable, nprobe)` —
    * array<bigint> of the top-nprobe cells in probe order
    * (cos DESC, cell ASC). Input pairs in ANY order.
    */
  def nearest_cells(emb: Column, cents: Seq[(Long, Array[Double])],
      nprobe: Int): Column = {
    val sorted = cents.sortBy(_._1)
    ColumnBridge.column(NearestCellsProbed(ColumnBridge.expression(emb),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, nprobe))
  }
}
