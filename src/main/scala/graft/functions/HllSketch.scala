package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog registers as a mergeable aggregate (Flajolet et al.
  * 2007): 2^p max-rho registers over a 32-bit well-mixed hash —
  * bounded O(2^p) state under ObjectHashAggregate, merge =
  * element-wise max. The KMV sibling ([[KmvSketch]]) keeps k hash
  * VALUES; HLL keeps only leading-zero maxima, so the state is 2^p
  * bytes regardless of k-vs-cardinality and the relative error is
  * ~1.04/√(2^p) at EVERY scale — the sketch a 100 TB per-group
  * cardinality pass actually wants.
  *
  * Register math (shared contract with the d59 column-level mirror
  * and the DuckDB oracles — all three MUST agree bit-for-bit):
  * the input is masked to its low 32 bits (64-bit hashes fold in
  * rather than erroring), then for h on [0, 2^32) with
  * W = 32 − p payload bits,
  *   register j = h >> W          (top p bits)
  *   w          = h & (2^W − 1)
  *   rho        = W + 1 − bitLength(w)   (w = 0 ⇒ W + 1)
  * and register j keeps max(rho). Unlike raw HLL estimates computed
  * engine-side, the REGISTERS are a pure function of the input set
  * (max is order- and duplicate-insensitive), so downstream estimate
  * arithmetic can be mirrored exactly in SQL and oracle-checked.
  *
  * Returns the full `array<int>` of 2^p registers (0 = never hit);
  * callers derive the harmonic-sum estimate — keeping the aggregate
  * generic over the estimator and correction variants.
  */
case class HllSketch(
    hash: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"hll_sketch needs 4 <= p <= 16, got $p")
  private val m = 1 << p
  private val payloadBits = 32 - p
  private val payloadMask = (1L << payloadBits) - 1

  override def children: Seq[Expression] = Seq(hash)
  override def checkInputDataTypes(): TypeCheckResult =
    hash.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hll_sketch: hash must be bigint, got ${other.catalogString}")
    }
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = hash.eval(input)
    if (v != null) {
      // mask to the declared 32-bit domain: a 64-bit or negative
      // hash (e.g. xxhash64 fed straight in) must contribute its low
      // 32 bits, not kill the job — the totality discipline; the
      // d59/d60 oracles feed pre-mixed 32-bit values so the mask is
      // the identity there
      val h = v.asInstanceOf[Long] & 0xFFFFFFFFL
      val reg = (h >>> payloadBits).toInt
      val w = h & payloadMask
      val rho =
        if (w == 0L) payloadBits + 1
        else payloadBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  // clone: the serialized form may be a view into a reused row buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(n: Int): HllSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(hash = c(0))
}

object HllSketch {

  /** Column API: `hll_sketch($"h", 6)` → array<int> of 64 registers. */
  def hll_sketch(hash: Column, p: Int): Column =
    ColumnBridge.column(HllSketch(
      ColumnBridge.expression(hash), p).toAggregateExpression())
}
