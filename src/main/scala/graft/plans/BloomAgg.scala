package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Bloom bit math for the G30 sketch pair (`graft_bloom` /
  * `graft_bloom_contains`).
  *
  * Hash convention (cross-engine, like every graft sketch): the k bit
  * positions of a STRING key are `(h1 + i·h2) mod m` for i in 0..k-1
  * (Kirsch & Mitzenmacher 2006 double hashing), where
  * h1 = md5-60("b1|" ++ key) and h2 = md5-60("b2|" ++ key) — the same
  * top-60-bits-of-md5 integers DuckDB computes as
  * `('0x'||substr(md5('b1|'||key),1,15))::BIGINT`, so an oracle can
  * restate membership relationally (candidate passes iff all k of its
  * positions are in the DISTINCT position set of the member keys) and
  * match the engine bit-for-bit. Bit layout of the sketch blob: bit b
  * lives at byte `b >>> 3`, mask `1 << (b & 7)`.
  */
object BloomOps {
  /** Hard cap on k: positions are h1 + i·h2 with h1, h2 < 2^60, so the
    * largest index term is (k−1)·h2 — at k = 8 the sum stays below
    * 2^63 − 8 (exact int64, and exact BIGINT in the DuckDB oracle,
    * which ERRORS on overflow rather than wrapping); at k = 9 it wraps
    * negative and the bit index corrupts. k ≤ 8 covers the optimal-k
    * range for ≤ ~11 bits/key; beyond that, widen m instead. */
  val MaxK = 8

  private val Salt1 = "b1|".getBytes("UTF-8")
  private val Salt2 = "b2|".getBytes("UTF-8")

  private def salted60(salt: Array[Byte], key: Array[Byte]): Long = {
    val buf = new Array[Byte](salt.length + key.length)
    System.arraycopy(salt, 0, buf, 0, salt.length)
    System.arraycopy(key, 0, buf, salt.length, key.length)
    TextHash.h60Bytes(buf, 0, buf.length)
  }

  /** Set the k positions of `key` in the m-bit array `bits`. */
  def add(bits: Array[Byte], key: UTF8String, k: Int): Unit = {
    val kb = key.getBytes
    val m = bits.length.toLong * 8L
    val h1 = salted60(Salt1, kb)
    val h2 = salted60(Salt2, kb)
    var i = 0
    while (i < k) {
      val b = ((h1 + i.toLong * h2) % m).toInt
      bits(b >>> 3) = (bits(b >>> 3) | (1 << (b & 7))).toByte
      i += 1
    }
  }

  /** Count of `arr` elements (int64, probed as their decimal strings —
    * exactly `graft_bloom_contains(sketch, cast(h AS string), k)`) the
    * sketch admits. The per-doc probe loop for the C7 Bloom pre-filter;
    * called from generated code. */
  def countContainedLongs(bits: Array[Byte],
      arr: org.apache.spark.sql.catalyst.util.ArrayData, k: Int): Long = {
    var i = 0; var c = 0L
    val n = arr.numElements()
    while (i < n) {
      if (contains(bits,
        UTF8String.fromString(java.lang.Long.toString(arr.getLong(i))), k))
        c += 1
      i += 1
    }
    c
  }

  /** True iff all k positions of `key` are set (no false negatives). */
  def contains(bits: Array[Byte], key: UTF8String, k: Int): Boolean = {
    val kb = key.getBytes
    val m = bits.length.toLong * 8L
    val h1 = salted60(Salt1, kb)
    val h2 = salted60(Salt2, kb)
    var i = 0
    while (i < k) {
      val b = ((h1 + i.toLong * h2) % m).toInt
      if ((bits(b >>> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `graft_bloom(key, m, k)` — mergeable Bloom-filter aggregate (SURVEY §2
  * G30): an m-bit membership sketch of the group's string keys, as a
  * binary blob.
  *
  * Completes the sketch-aggregate family on its fifth axis: frequency
  * (G17 topk), cardinality (G18 HLL), quantiles (G24 qhist), distinct-set
  * algebra (G29 KMV) — and now MEMBERSHIP, the one question the others
  * cannot answer per-row: "is this key plausibly in that set" without
  * shipping or joining the set. The canonical 100 TB use is the semi-join
  * pre-filter E20 composes by hand from exploded hash rows; with a native
  * aggregate the build is one bounded-state aggregation (m/8 bytes per
  * group, map-side combined) and the probe is one scalar expression on a
  * broadcast blob — no explode, no shuffle of the big side.
  *
  * Scale contract: state is exactly m/8 bytes per group regardless of
  * input volume; merge is bytewise OR — commutative and associative, so
  * task order never changes the sketch and it is streaming-legal like
  * G18/G24/G29. One-sided error: a contained key ALWAYS passes
  * (`graft_bloom_contains` has no false negatives); a non-member passes
  * with probability ≈ (set_bits/m)^k. Null keys are skipped.
  */
case class BloomSketch(
    child: Expression,
    m: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(m > 0 && m % 8 == 0, "graft_bloom: m must be a positive multiple of 8 bits")
  require(k > 0 && k <= BloomOps.MaxK,
    s"graft_bloom: k must be in [1, ${BloomOps.MaxK}] " +
      "(position math h1 + i*h2 overflows int64 beyond that)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom expects a string key column, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomOps.add(buf, v.asInstanceOf[UTF8String], k)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_bloom"
}

/** `graft_bloom_contains(sketch, key, k)` — membership probe against a
  * [[BloomSketch]] blob. m is carried by the blob itself (bytes × 8); k
  * must match the build-side k. Codegen'd: the probe stays inside
  * whole-stage codegen as one static call per row, so filtering a 100 TB
  * fact scan against a broadcast sketch costs two md5s per row and no
  * join at all.
  */
case class BloomContains(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k > 0 && k <= BloomOps.MaxK,
    s"graft_bloom_contains: k must be in [1, ${BloomOps.MaxK}] " +
      "(position math h1 + i*h2 overflows int64 beyond that)")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, string key), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(blob: Any, key: Any): Any =
    BloomOps.contains(blob.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, key) =>
      s"${ev.value} = graft.plans.BloomOps.contains($blob, $key, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_bloom_count(sketch, arr, k)` — how many elements of the int64
  * array the sketch admits, each probed as its decimal string (so a
  * per-element `graft_bloom_contains(sketch, cast(h AS string), k)`
  * fold gives the identical count). One codegen'd static call per row —
  * the shape the C7 Bloom pre-filter needs, where the HOF
  * `size(filter(...))` spelling would fall out of whole-stage codegen
  * (higher-order functions are CodegenFallback). */
case class BloomCountContained(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k > 0 && k <= BloomOps.MaxK,
    s"graft_bloom_count: k must be in [1, ${BloomOps.MaxK}] " +
      "(position math h1 + i*h2 overflows int64 beyond that)")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, array<bigint>), " +
          s"got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_bloom_count"

  override protected def nullSafeEval(blob: Any, arr: Any): Any =
    BloomOps.countContainedLongs(blob.asInstanceOf[Array[Byte]],
      arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, arr) =>
      s"${ev.value} = graft.plans.BloomOps.countContainedLongs($blob, $arr, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
