package graft.plans

import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_kmv(hash, k)` — KMV / theta-style distinct sketch (SURVEY §2
  * G29): the k minimum DISTINCT hash values of the input, as a sorted
  * ascending array<bigint>.
  *
  * Why a fourth sketch alongside G17/G18/G24: HLL (G18) answers distinct
  * counts and unions, but set INTERSECTION is fundamentally outside its
  * algebra — registers of an intersection are not a function of the two
  * register sets. The KMV sketch (Bar-Yossef et al. 2002; the
  * DataSketches theta family) is closed under union (merge k-min lists,
  * keep k smallest) and supports intersection/Jaccard ESTIMATES by set
  * arithmetic on the retained hashes: within the union sketch's sampled
  * region θ = v_k / M, the members present in both input sketches are a
  * uniform sample of the true intersection, so |hits| / θ estimates it.
  * That makes cross-source overlap auditing (train/eval contamination at
  * the user/doc level, source co-occurrence) a sketch-sized problem
  * instead of a distinct-join.
  *
  * Scale contract: state is ≤ k longs per group — mergeable, bounded,
  * commutative (a sorted SET: insertion order can never change the
  * result), so it map-side combines and is streaming-legal like G18/G24.
  * The estimator math stays OUTSIDE the aggregate: the sketch is the
  * portable artifact (exact k-minima, bit-identical in any engine that
  * agrees on the hash — DuckDB parity via the md5-60 hash the E16/E19
  * sketches already share), estimates are plain column arithmetic over
  * it, exact ints until one final IEEE division.
  *
  * Unsaturated sketches (group distinct < k) retain EVERY hash, so
  * consumers switch to exact counting — the standard KMV small-set mode.
  * Null inputs are skipped. */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, "graft_kmv: k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_kmv expects a bigint hash column, got ${other.sql}")
    }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], h: Long): Unit =
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) {
      buf += h
      buf -= buf.last
    }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow)
      : mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long])
      : mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_kmv"
}
