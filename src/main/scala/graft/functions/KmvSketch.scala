package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) cardinality sketch as a mergeable
  * aggregate: keeps the k smallest DISTINCT values of a (well-mixed)
  * hash column per group — bounded O(k) state under
  * ObjectHashAggregate, so per-group distinct-count estimation never
  * shuffles the group's full distinct value space (the d27 corpus
  * query pays one corpus-wide distinct exchange; per-group
  * cardinalities with a GROUP BY would pay it per group — this
  * aggregate caps the state and the exchange at k longs per group).
  *
  * Estimator (Bar-Yossef et al. 2002): with hashes uniform on
  * [0, M), distinct ≈ (k−1)·M / kth_smallest once k values exist
  * (exact count below that). Deterministic for a given input SET —
  * the k smallest distinct values don't depend on order — so unlike
  * HLL the result is reproducible across engines, partitionings and
  * merge orders, and the estimate itself can be oracle-checked.
  *
  * Returns the sorted `array<bigint>` of the ≤k smallest distinct
  * values; callers derive (count, kth, estimate) — keeping the
  * aggregate generic over the modulus M.
  */
case class KmvSketch(
    hash: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.Buffer] {

  require(k > 0, s"kmv_sketch needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(hash)
  override def checkInputDataTypes(): TypeCheckResult =
    hash.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch: hash must be bigint, got ${other.catalogString}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvSketch.Buffer =
    new KmvSketch.Buffer(k)

  override def update(buf: KmvSketch.Buffer, input: InternalRow)
      : KmvSketch.Buffer = {
    val v = hash.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvSketch.Buffer, other: KmvSketch.Buffer)
      : KmvSketch.Buffer = {
    other.values.foreach(buf.add)
    buf
  }

  override def eval(buf: KmvSketch.Buffer): Any =
    new GenericArrayData(buf.values.toArray)

  override def serialize(buf: KmvSketch.Buffer): Array[Byte] = {
    val vs = buf.values.toArray
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvSketch.Buffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(hash = c(0))
}

object KmvSketch {

  /** Bounded sorted-set of the k smallest distinct longs. Adds are
    * O(log k); values already above the current kth-smallest are
    * rejected in O(log k) without growing the set.
    */
  final class Buffer(val k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def add(v: Long): Unit = {
      if (set.size < k) { set.add(v); () }
      else if (v < set.last) {
        if (set.add(v)) { set.remove(set.last); () }
      }
    }

    /** Ascending iterator over the kept values. */
    def values: Iterator[Long] = {
      val it = set.iterator()
      new Iterator[Long] {
        def hasNext: Boolean = it.hasNext
        def next(): Long = it.next()
      }
    }
  }

  /** Column API: `kmv_sketch($"h", 256)` → sorted array<bigint>. */
  def kmv_sketch(hash: Column, k: Int): Column =
    ColumnBridge.column(KmvSketch(
      ColumnBridge.expression(hash), k).toAggregateExpression())
}
