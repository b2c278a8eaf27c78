package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: the scale-safe replacement for
  * `row_number().over(Window.partitionBy(query))` ranking.
  *
  * A window top-k funnels EVERY scored row of a query into a single
  * partition, where one task sorts the full candidate set — Q tasks ×
  * N rows each at corpus scale. This aggregate instead keeps a k-entry
  * heap per partition (map-side partial aggregation under
  * ObjectHashAggregate), so the exchange ships at most
  * `partitions × k` candidates per query and the final merge touches
  * k-sized buffers only. Same result, O(N·log k) work, no full sort,
  * no single-task bottleneck.
  *
  * Ordering is (score DESC, id ASC) — identical to the window
  * formulation it replaces, including NaN-greatest semantics
  * (`java.lang.Double.compare`, matching Spark and DuckDB sort order).
  * Returns `array<struct<cand_id, tag, sim>>` sorted best-first;
  * `posexplode` downstream recovers the dense rank. `tag` is an
  * opaque rider (e.g. an IVF cell label) carried through unordered.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    tag: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByScore.Buffer] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id, tag)
  // Strict input typing: wrong-typed arguments (e.g. an int id from
  // SQL) fail analysis instead of ClassCastException-ing inside
  // executor tasks. Callers cast explicitly — no silent coercion.
  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(
      ("score", score.dataType, DoubleType),
      ("id", id.dataType, LongType),
      ("tag", tag.dataType, LongType))
    expected.find { case (_, got, want) => got != want } match {
      case Some((name, got, want)) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score: $name must be ${want.catalogString}, " +
          s"got ${got.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.resultType

  override def createAggregationBuffer(): TopKByScore.Buffer =
    new TopKByScore.Buffer(k)

  override def update(buf: TopKByScore.Buffer, input: InternalRow)
      : TopKByScore.Buffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      val t = tag.eval(input)
      if (i != null) buf.insert(
        s.asInstanceOf[Double], i.asInstanceOf[Long],
        if (t == null) 0L else t.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKByScore.Buffer, other: TopKByScore.Buffer)
      : TopKByScore.Buffer = { buf.mergeFrom(other); buf }

  override def eval(buf: TopKByScore.Buffer): Any = {
    val best = buf.sortedBestFirst
    new GenericArrayData(best.map(c =>
      InternalRow(c.id, c.tag, c.sim): Any))
  }

  override def serialize(buf: TopKByScore.Buffer): Array[Byte] = {
    val cands = buf.sortedBestFirst
    val bb = ByteBuffer.allocate(4 + cands.length * 24)
    bb.putInt(cands.length)
    cands.foreach { c => bb.putDouble(c.sim); bb.putLong(c.id); bb.putLong(c.tag) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKByScore.Buffer(k)
    var i = 0
    while (i < n) {
      buf.insert(bb.getDouble, bb.getLong, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), tag = newChildren(2))
}

object TopKByScore {

  final case class Cand(sim: Double, id: Long, tag: Long)

  /** Head of the queue is the WORST kept candidate (eviction point):
    * a is "greater" than b when a has lower sim, or equal sim and
    * higher id. Double.compare gives NaN-greatest, the same total
    * order Spark's sort and DuckDB's ORDER BY apply to doubles.
    */
  private val worstFirst: Ordering[Cand] = new Ordering[Cand] {
    override def compare(a: Cand, b: Cand): Int = {
      val c = java.lang.Double.compare(b.sim, a.sim)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  final class Buffer(val k: Int) {
    private val heap = mutable.PriorityQueue.empty[Cand](worstFirst)

    def insert(sim: Double, id: Long, tag: Long): Unit = {
      if (heap.size < k) heap.enqueue(Cand(sim, id, tag))
      else {
        val cand = Cand(sim, id, tag)
        if (worstFirst.compare(cand, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(cand)
        }
      }
    }

    def mergeFrom(other: Buffer): Unit =
      other.heap.foreach(c => insert(c.sim, c.id, c.tag))

    /** Best-first (sim DESC, id ASC). `worstFirst` ranks worse
      * candidates as GREATER, so plain ascending sort by it is
      * best-first already.
      */
    def sortedBestFirst: Array[Cand] =
      heap.toArray.sorted(worstFirst)
  }

  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("cand_id", LongType, nullable = false),
    StructField("tag", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))),
    containsNull = false)

  /** Column API: `top_k_by_score($"sim", $"cand_id", $"label", 5)`.
    * `id` and `tag` must be LongType; `score` DoubleType.
    */
  def top_k_by_score(score: Column, id: Column, tag: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score), ColumnBridge.expression(id),
      ColumnBridge.expression(tag), k).toAggregateExpression())
}
