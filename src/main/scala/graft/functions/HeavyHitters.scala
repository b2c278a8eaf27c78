package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a mergeable aggregate: one
  * pass over N items with a `capacity`-entry buffer per partition
  * yields every item whose true frequency exceeds N / (capacity + 1)
  * — the CANDIDATE set for frequent-item analysis (stopword mining,
  * hot-domain detection, top-token tables) without a full
  * groupBy(item) over the corpus.
  *
  * Guarantees (Misra-Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): reported counts undercount by
  * at most N / (capacity + 1), and any item with true count above
  * that bound IS in the sketch. The sketch CONTENT depends on
  * partitioning/merge order (counts are lower bounds, near-threshold
  * items may come and go), so deterministic pipelines use it as a
  * PRUNER: scan once to get candidates, then exact-count candidates
  * only — the second pass shuffles a candidate-filtered fraction of
  * the corpus instead of every (item) group. That composed result is
  * exact and deterministic regardless of sketch internals.
  *
  * Returns `array<struct<item, lower_bound>>`, highest bound first.
  */
case class HeavyHittersSketch(
    item: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HeavyHittersSketch.Buffer] {

  require(capacity > 0, s"heavy_hitters needs capacity > 0, got $capacity")

  override def children: Seq[Expression] = Seq(item)
  override def checkInputDataTypes(): TypeCheckResult =
    item.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters: item must be string, got ${other.catalogString}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHittersSketch.resultType

  override def createAggregationBuffer(): HeavyHittersSketch.Buffer =
    new HeavyHittersSketch.Buffer(capacity)

  override def update(buf: HeavyHittersSketch.Buffer, input: InternalRow)
      : HeavyHittersSketch.Buffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: HeavyHittersSketch.Buffer,
      other: HeavyHittersSketch.Buffer): HeavyHittersSketch.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: HeavyHittersSketch.Buffer): Any = {
    // (bound DESC, item ASC): deterministic output order for a GIVEN
    // sketch state.
    val entries = buf.entries.toArray.sortBy { case (it, c) => (-c, it) }
    new GenericArrayData(entries.map { case (it, c) =>
      InternalRow(UTF8String.fromString(it), c): Any
    })
  }

  override def serialize(buf: HeavyHittersSketch.Buffer): Array[Byte] = {
    val entries = buf.entries.toArray
    val payload = entries.map { case (it, c) =>
      (it.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(
      4 + payload.map(p => 4 + p._1.length + 8).sum)
    bb.putInt(payload.length)
    payload.foreach { case (bytes, c) =>
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HeavyHittersSketch.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new HeavyHittersSketch.Buffer(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.add(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(item = c(0))
}

object HeavyHittersSketch {

  /** k-entry Misra-Gries state. Both single adds and buffer merges
    * are the same operation — accumulate, then if more than k
    * counters exist, subtract the (k+1)-th largest count from every
    * counter and drop the non-positive (the mergeable-summaries
    * shrink; for a unit-weight add this is exactly the classic
    * decrement-all step). Each shrink removes at least one counter
    * and charges every surviving count equally, which is what bounds
    * the total undercount by N / (k + 1).
    */
  final class Buffer(val k: Int) {
    private val counts = mutable.HashMap.empty[String, Long]

    def entries: Iterator[(String, Long)] = counts.iterator

    def add(item: String, weight: Long): Unit = {
      counts.update(item, counts.getOrElse(item, 0L) + weight)
      if (counts.size > k) {
        if (weight == 1L) decrementAll() else shrink()
      }
    }

    def mergeFrom(other: Buffer): Unit = {
      other.counts.foreach { case (it, c) =>
        counts.update(it, counts.getOrElse(it, 0L) + c)
      }
      if (counts.size > k) shrink()
    }

    /** The classic Misra-Gries step for a unit-weight arrival into a
      * full sketch: decrement every counter by 1 and drop the zeros —
      * the just-inserted item (at count 1) leaves unless re-seen.
      * O(k) with no sort, so the steady-state per-row cost of the
      * one-pass scan stays O(k); the sort-based [[shrink]] is
      * reserved for weighted adds and buffer merges, which are
      * O(partitions), not O(rows). Error accounting is unchanged:
      * each decrement charges all k+1 live counters by 1, bounding
      * the total undercount by N / (k + 1).
      */
    private def decrementAll(): Unit = {
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreach { case (it, c) =>
        if (c <= 1L) dead += it else counts.update(it, c - 1L)
      }
      dead.foreach(counts.remove)
    }

    private def shrink(): Unit = {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse)(k)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreach { case (it, c) =>
        if (c - kth <= 0) dead += it else counts.update(it, c - kth)
      }
      dead.foreach(counts.remove)
    }
  }

  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("lower_bound", LongType, nullable = false))),
    containsNull = false)

  /** Column API: `heavy_hitters($"token", 16)`. */
  def heavy_hitters(item: Column, capacity: Int): Column =
    ColumnBridge.column(HeavyHittersSketch(
      ColumnBridge.expression(item), capacity).toAggregateExpression())
}
