package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_isotonic(i, s, n)` — L2 isotonic regression as a native
  * MERGEABLE aggregate (`TypedImperativeAggregate`), the sequential
  * pool-adjacent-violators path E65's doc deferred: the relational
  * minimax form (fitted_i = max_{j≤i} min_{k≥i} mean(y[j..k])) enumerates
  * O(n³) interval triples and is only viable for calendar-bounded series;
  * this aggregate fits a 10⁴+-point series in O(n log n) (one sort of the
  * buffered cells + the linear PAVA stack).
  *
  * Input rows are (index, value-sum, count) cells: feed daily cells
  * (i, ys, yn) to reproduce E65 exactly, or raw rows as (i, cents, 1) —
  * `update`/`merge` sum (s, n) per distinct index, so the buffer is
  * always index-cardinality (days), never row-cardinality, and partial
  * aggregation does the daily reduction map-side. `eval` sorts the cells
  * by index once and runs the PAVA stack: push each cell as a block,
  * pool while the previous block's mean exceeds the current's — the
  * violation test compares block means EXACTLY via BigInt
  * cross-multiplication (s₁·n₂ > s₂·n₁ — no double round-off can pool
  * the wrong blocks), and only the FINAL per-block mean is one IEEE
  * division of exact int64 sums.
  *
  * Bit-parity with the minimax form (Robertson–Wright–Dykstra 1988
  * §1.2): the fitted value of a point is its block's pooled mean, and
  * because equal rational means pool to the same rational, the single
  * division here lands on the same double the minimax max/min chain
  * picks — IsotonicAggSpec pins this bit-for-bit on a 10⁴-point series
  * against a driver replica of the O(n³) formulation.
  *
  * Output: array<struct<i, fitted>> sorted by index (fitted in the
  * input's value units — the caller rescales). Rows with any NULL child
  * are skipped; a count of 0 is the additive identity (skipped — a
  * no-point cell has no mean to fit); a NEGATIVE count fails loud,
  * because it would flip the cross-multiplied violation test's sign
  * assumption (s₁·n₂ > s₂·n₁ presumes n > 0) and divide to ±Infinity. */
case class IsotonicFit(
    indexExpr: Expression,
    sumExpr: Expression,
    cntExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Array[Long]]] {

  override def children: Seq[Expression] = Seq(indexExpr, sumExpr, cntExpr)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("fitted", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.zip(Seq("index", "sum", "count")).collectFirst {
      case (c, name) if !Seq[DataType](LongType, IntegerType)
        .contains(c.dataType) =>
        s"graft_isotonic $name must be integral, got ${c.dataType.sql}"
    }
    bad.fold(TypeCheckResult.TypeCheckSuccess: TypeCheckResult)(
      TypeCheckResult.TypeCheckFailure)
  }

  private def asLong(v: Any): Long = v match {
    case x: Long => x
    case x: Int => x.toLong
  }

  override def createAggregationBuffer(): java.util.HashMap[Long, Array[Long]] =
    new java.util.HashMap[Long, Array[Long]]()

  override def update(buf: java.util.HashMap[Long, Array[Long]],
      input: InternalRow): java.util.HashMap[Long, Array[Long]] = {
    val iv = indexExpr.eval(input)
    val sv = sumExpr.eval(input)
    val nv = cntExpr.eval(input)
    if (iv != null && sv != null && nv != null) {
      // Counts must be positive mass: n = 0 is a no-point cell (skipped
      // as the additive identity — it has no mean and no weight), and
      // n < 0 would flip the sign-sensitive cross-multiplied violation
      // test AND divide to ±Infinity at eval, so it fails loud instead
      // of silently pooling wrong blocks.
      val nl = asLong(nv)
      if (nl < 0) throw new IllegalArgumentException(
        s"graft_isotonic: negative count $nl at index ${asLong(iv)} — " +
          "inputs must be (index, value-sum, count >= 0) cells")
      if (nl > 0) {
        val cell = buf.computeIfAbsent(asLong(iv), _ => new Array[Long](2))
        cell(0) += asLong(sv)
        cell(1) += nl
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[Long, Array[Long]],
      other: java.util.HashMap[Long, Array[Long]])
      : java.util.HashMap[Long, Array[Long]] = {
    other.forEach { (k, v) =>
      val cell = buf.computeIfAbsent(k, _ => new Array[Long](2))
      cell(0) += v(0)
      cell(1) += v(1)
    }
    buf
  }

  override def eval(buf: java.util.HashMap[Long, Array[Long]]): Any = {
    val m = buf.size
    val idx = new Array[Long](m)
    var p = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { idx(p) = it.next(); p += 1 }
    java.util.Arrays.sort(idx)
    // PAVA stack: (s, n, points-in-block); exact mean comparison
    val bs = new Array[Long](m); val bn = new Array[Long](m)
    val bc = new Array[Int](m)
    var top = -1
    var i = 0
    while (i < m) {
      val cell = buf.get(idx(i))
      top += 1; bs(top) = cell(0); bn(top) = cell(1); bc(top) = 1
      while (top > 0 && (BigInt(bs(top - 1)) * bn(top) >
          BigInt(bs(top)) * bn(top - 1))) {
        bs(top - 1) += bs(top); bn(top - 1) += bn(top)
        bc(top - 1) += bc(top); top -= 1
      }
      i += 1
    }
    val out = new Array[Any](m)
    var b = 0; var q = 0
    while (b <= top) {
      val fitted = bs(b).toDouble / bn(b).toDouble
      var c = 0
      while (c < bc(b)) {
        out(q) = InternalRow(idx(q), fitted); q += 1; c += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[Long, Array[Long]])
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    buf.forEach { (k, v) => bb.putLong(k); bb.putLong(v(0)); bb.putLong(v(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[Long, Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[Long, Array[Long]](n * 2)
    var i = 0
    while (i < n) { m.put(bb.getLong, Array(bb.getLong, bb.getLong)); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): IsotonicFit =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): IsotonicFit =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IsotonicFit =
    copy(indexExpr = newChildren(0), sumExpr = newChildren(1),
      cntExpr = newChildren(2))
  override def prettyName: String = "graft_isotonic"
}
