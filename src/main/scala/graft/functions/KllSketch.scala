package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch — the member the sketch family lacked
  * (KMV/HLL counts distinct, CMS/Misra-Gries counts frequency; this
  * summarizes RANK): a deterministic multi-level compaction summary
  * in the KLL/MRL lineage (Karnin-Lang-Liberty 2016; Manku et al.
  * 1998), with the randomness replaced by a FIXED schedule — the
  * KMV determinism discipline, so runs are reproducible and the
  * lossless regime is oracle-checkable.
  *
  * Structure: level l holds items of weight 2^l in an unsorted
  * buffer of capacity `cap`. When a level overflows, its items are
  * sorted and every SECOND one is promoted to level l+1 (weight
  * doubles), alternating the kept offset (even ranks on the 1st
  * compaction of a level, odd on the 2nd, …) so the deterministic
  * halving does not systematically bias ranks the way keep-even
  * alone would.
  *
  * Guarantees:
  *   - TOTAL WEIGHT is exactly n always (compaction moves mass,
  *     never loses it) — so counts derived from the sketch are
  *     exact;
  *   - while n ≤ cap the sketch is LOSSLESS: level 0 holds the full
  *     multiset and rank-selection over it is the exact order
  *     statistic (this is the oracle-checked regime — d76 sizes cap
  *     above the per-group row counts at every tested SF);
  *   - under compaction each halving of a level-l buffer perturbs
  *     any rank by at most 2^l, giving the standard ~H·n/cap rank
  *     error for H active levels (FunctionsSpec checks an empirical
  *     error grid at cap 32/64/128 against exact ranks);
  *   - bounded state: ≤ cap items per level × ≤ log2(n/cap)+1
  *     levels, so per-group aggregation state under
  *     ObjectHashAggregate is O(cap · log n) regardless of group
  *     size — per-group percentiles never shuffle the group's rows.
  *
  * Determinism: the result is a pure function of the per-partition
  * input orders and the merge order, both deterministic for a fixed
  * partitioning; in the lossless regime it is a function of the
  * input MULTISET alone (FunctionsSpec pins bit-equality across
  * repartitionings there).
  *
  * Returns `array<struct<v:bigint,w:bigint>>` sorted by (v, w):
  * the summary items with their weights. Callers derive quantiles
  * by cumulative-weight rank selection (see d76's
  * cum-sum-then-threshold shape), keeping the aggregate generic
  * over which and how many quantiles are wanted.
  */
case class KllSketch(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch.Buffer] {

  require(cap >= 2, s"kll_sketch needs cap >= 2, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_sketch: value must be bigint, got ${other.catalogString}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("w", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): KllSketch.Buffer =
    new KllSketch.Buffer(cap)

  override def update(buf: KllSketch.Buffer, input: InternalRow)
      : KllSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KllSketch.Buffer, other: KllSketch.Buffer)
      : KllSketch.Buffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllSketch.Buffer): Any = {
    val items = buf.items.sortBy(t => (t._1, t._2))
    new GenericArrayData(items.map { case (v, w) =>
      InternalRow(v, w)
    }.toArray[Any])
  }

  override def serialize(buf: KllSketch.Buffer): Array[Byte] = {
    val lv = buf.levels
    var bytes = 4
    lv.foreach(b => bytes += 8 + 8 * b.length)
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(lv.length)
    var l = 0
    while (l < lv.length) {
      bb.putInt(lv(l).length)
      bb.putInt(buf.parity(l))
      lv(l).foreach(bb.putLong)
      l += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllSketch.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val nLevels = bb.getInt
    val buf = new KllSketch.Buffer(cap)
    var l = 0
    while (l < nLevels) {
      val n = bb.getInt
      val par = bb.getInt
      val level = new ArrayBuffer[Long](n)
      var i = 0
      while (i < n) { level += bb.getLong; i += 1 }
      buf.restoreLevel(l, level, par)
      l += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KllSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}

object KllSketch {

  /** Multi-level compaction buffer. Level l's items carry weight
    * 2^l implicitly; `parity(l)` alternates which half survives
    * the next compaction of level l.
    */
  final class Buffer(val cap: Int) {
    val levels: ArrayBuffer[ArrayBuffer[Long]] =
      ArrayBuffer(new ArrayBuffer[Long])
    val parity: ArrayBuffer[Int] = ArrayBuffer(0)

    def add(v: Long): Unit = {
      levels(0) += v
      if (levels(0).length > cap) compact(0)
    }

    def mergeIn(other: Buffer): Unit = {
      var l = 0
      while (l < other.levels.length) {
        ensureLevel(l)
        levels(l) ++= other.levels(l)
        l += 1
      }
      // Compact bottom-up so promotions cascade once.
      l = 0
      while (l < levels.length) {
        if (levels(l).length > cap) compact(l)
        l += 1
      }
    }

    def restoreLevel(l: Int, values: ArrayBuffer[Long], par: Int)
        : Unit = {
      ensureLevel(l)
      levels(l) = values
      parity(l) = par
    }

    /** (value, weight) pairs across all levels. */
    def items: Seq[(Long, Long)] =
      levels.zipWithIndex.flatMap { case (b, l) =>
        b.map(v => (v, 1L << l))
      }.toSeq

    private def ensureLevel(l: Int): Unit =
      while (levels.length <= l) {
        levels += new ArrayBuffer[Long]
        parity += 0
      }

    /** Sort level l, promote every second item (starting at
      * `parity(l)`, which then flips) to level l+1, clear level l.
      * The kept half's weight doubles implicitly by moving up one
      * level; total weight is preserved exactly when the buffer
      * length is even, and off by one item's weight at most when
      * odd — to keep mass EXACT, an odd buffer leaves its last
      * (largest) item at level l instead of promoting half of an
      * odd count.
      */
    private def compact(l: Int): Unit = {
      ensureLevel(l + 1)
      val sorted = levels(l).sorted
      // Even prefix compacts; an odd tail item stays at level l so
      // total weight stays exactly n.
      val even = sorted.length & ~1
      val keepOffset = parity(l)
      parity(l) = 1 - keepOffset
      var i = keepOffset
      while (i < even) {
        levels(l + 1) += sorted(i)
        i += 2
      }
      val rest = new ArrayBuffer[Long]
      if (even < sorted.length) rest += sorted(sorted.length - 1)
      levels(l) = rest
      if (levels(l + 1).length > cap) compact(l + 1)
    }
  }

  /** Column API: `kll_sketch($"v", 4096)` →
    * sorted array<struct<v:bigint,w:bigint>>.
    */
  def kll_sketch(value: Column, cap: Int): Column =
    ColumnBridge.column(KllSketch(
      ColumnBridge.expression(value), cap).toAggregateExpression())
}
