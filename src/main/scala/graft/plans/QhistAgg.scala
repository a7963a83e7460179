package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `graft_qhist(value, width, p...)` — fixed-width histogram quantiles as
  * a native MERGEABLE aggregate (`TypedImperativeAggregate`), completing
  * the sketch-aggregate family next to `graft_hll_est` (cardinality,
  * G18) and `graft_topk` (frequency, G17): the buffer is an (edge →
  * count) map over `floor(value/width)*width + width` bucket edges,
  * `update` increments one bucket, `merge` adds maps (commutative and
  * associative, so task/fetch order never changes the result), `eval`
  * walks the sorted edges once and picks, for each requested percentile
  * p, the smallest edge whose cumulative count reaches `ceil(p · n)` —
  * bit-for-bit the E35 composed convention (same IEEE multiply, same
  * ceil), so the DuckDB oracle for the composed form validates this
  * aggregate unchanged.
  *
  * Why it matters at scale: the composed form (E35) shuffles the
  * per-group histogram and then runs TWO windows over it (cumulative
  * sum + total). This aggregate participates in map-side partial
  * aggregation — one edge-count map per (mapper, group) crosses the
  * wire, bounded by the value range over the bucket width, and no
  * window executes at all. State is bounded and mergeable, which also
  * makes it legal inside watermarked streaming aggregations (the F17
  * property). Output: struct of one picked edge per percentile plus
  * `n_events`; rows with NULL value are skipped (the histogram of a
  * metric column, not a null-accounting report).
  */
case class QhistQuantiles(
    child: Expression,
    width: Double,
    percentiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  require(width > 0, "graft_qhist width must be positive")
  // The buffer is keyed by long edges, so a fractional width would silently
  // misbucket (width.toLong below); fail loudly instead of returning wrong
  // quantiles.
  require(width == math.rint(width),
    "graft_qhist width must be a whole number (long-keyed histogram edges)")
  require(percentiles.nonEmpty && percentiles.forall(p => p > 0 && p <= 1),
    "graft_qhist percentiles must be in (0, 1]")
  require(percentiles.distinct.size == percentiles.size,
    "graft_qhist percentiles must be distinct")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  /** Full-precision struct field name: 0.5 → p50_edge, 0.995 → p99_5_edge —
    * distinct percentiles always yield distinct field names.
    */
  private def fieldName(p: Double): String = {
    val pct = BigDecimal(p * 100).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .underlying.stripTrailingZeros.toPlainString
    s"p${pct.replace(".", "_")}_edge"
  }

  override def dataType: DataType = StructType(
    percentiles.map(p => StructField(fieldName(p), LongType, nullable = true))
      :+ StructField("n_events", LongType, nullable = false))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_qhist expects a numeric value, got ${other.sql}")
  }

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long],
      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: Long => x.toDouble
        case x: Int => x.toDouble
      }
      // same IEEE math as the composed form: floor(value/W)*W + W
      val edge = math.floor(d / width).toLong * width.toLong + width.toLong
      buf.merge(edge, 1L, (a, b) => a + b)
    }
    buf
  }

  override def merge(buf: java.util.HashMap[Long, Long],
      other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    other.forEach((k, v) => buf.merge(k, v, (a, b) => a + b))
    buf
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val edges = new Array[Long](buf.size)
    val counts = new Array[Long](buf.size)
    var i = 0
    val sorted = new java.util.TreeMap[Long, Long](buf)
    sorted.forEach { (k, v) => edges(i) = k; counts(i) = v; i += 1 }
    val n = counts.sum
    val out = new Array[Any](percentiles.size + 1)
    var pi = 0
    while (pi < percentiles.size) {
      val threshold = math.ceil(percentiles(pi) * n).toLong
      var cum = 0L
      var j = 0
      var pick: Any = null
      while (j < edges.length && pick == null) {
        cum += counts(j)
        if (cum >= threshold) pick = edges(j)
        j += 1
      }
      out(pi) = pick
      pi += 1
    }
    out(percentiles.size) = n
    InternalRow.fromSeq(out.toIndexedSeq)
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.forEach { (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[Long, Long](n * 2)
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QhistQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QhistQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QhistQuantiles =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_qhist"
}
