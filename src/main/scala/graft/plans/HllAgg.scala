package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `graft_hll_est(h)` — HyperLogLog distinct estimate as a native
  * MERGEABLE aggregate (`TypedImperativeAggregate`), the DataSketches
  * shape: the buffer is one 64-register byte array, `update` folds a
  * pre-hashed 60-bit value into (register, max rank), `merge` is
  * element-wise MAX, `eval` the exact-int64 harmonic sum.
  *
  * Why it matters at scale: the expression-form sketch (E16) must
  * shuffle one row per (group, register) — 64 rows per group through a
  * two-level aggregation. This aggregate participates in map-side
  * partial aggregation and shuffles ONE 64-byte buffer per
  * (mapper, group); register MAX-merging happens inside the aggregate
  * framework, which is how sketch libraries integrate with engines.
  *
  * The math is bit-for-bit the E16/E31 convention (rank = 55 −
  * length(bin(h div 64)), z accumulated in exact int64, one final IEEE
  * division), so the DuckDB oracle for the expression form validates
  * this aggregate unchanged — and the estimates are spec-asserted
  * identical to the expression form's.
  */
case class HllEstimate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val M = 64
  private val Scale55 = 36028797018963968L // 2^55

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_est expects a bigint hash, got ${other.sql}")
  }

  // registers hold the max rank seen (1..54); 0 = untouched
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val reg = (h % M).toInt
      val q = h / M
      // length(bin(q)): bin() prints no leading zeros, and bin(0) = "0"
      val len = if (q == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(q)
      val rank = 55 - len
      if (rank > buf(reg)) buf(reg) = rank.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    var z = 0L
    var present = 0
    var i = 0
    while (i < M) {
      val m = buf(i)
      if (m > 0) { z += 1L << (55 - m); present += 1 }
      i += 1
    }
    z += (M - present).toLong * Scale55
    0.709 * (M * M).toDouble * Scale55.toDouble / z.toDouble
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllEstimate =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_hll_est"
}
