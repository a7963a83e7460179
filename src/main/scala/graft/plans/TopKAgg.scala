package graft.plans

import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_topk(struct(score, id), k)` — exact top-k as a native AGGREGATE
  * (SURVEY §2 G17), the custom-aggregate extension point
  * (`TypedImperativeAggregate`) alongside scalar expressions (G1/G12/G13),
  * the planner strategy (G8), and the optimizer rule (G15).
  *
  * Why it matters at scale: the window form of per-group top-k
  * (`row_number over (partition … order …) <= k`) must SHUFFLE AND SORT
  * every input row. An aggregate keeps only a k-element min-heap per
  * group, participates in map-side partial aggregation, and shuffles just
  * the surviving k rows per (mapper, group) — at 100 TB the difference
  * between sorting the corpus and sorting k·groups rows.
  *
  * Ordering: descending (score, id) — both long; ties deterministic via
  * the id. Output: array<struct<score,id>> sorted descending, so
  * `posexplode` yields ranks directly. Null/malformed inputs are skipped.
  */
case class LongTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0, "graft_topk: k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StructType(Array(a, b))
          if a.dataType == LongType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk expects struct<bigint, bigint>, got ${other.sql}")
    }
  }

  // min-heap: head is the SMALLEST retained (score, id) — evict point
  private def heapOrdering: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long).reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](heapOrdering)

  private def add(buf: mutable.PriorityQueue[(Long, Long)],
      e: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (Ordering.Tuple2(Ordering.Long, Ordering.Long).gt(e, buf.head)) {
      buf.dequeue(); buf.enqueue(e)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        add(buf, (row.getLong(0), row.getLong(1)))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)])
      : mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toArray.sorted(
      Ordering.Tuple2(Ordering.Long, Ordering.Long).reverse)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getLong, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongTopK =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_topk"
}
