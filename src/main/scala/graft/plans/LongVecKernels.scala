package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared typing for binary array<bigint> → bigint kernels. */
trait LongVecBinaryKernel extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
}

/** Native codegen expression: Σ (a_i − b_i)² over two equal-length int64
  * vectors — the exact-arithmetic verify kernel of the embedding near-dup
  * pair join (Dedup.dedupEmbcos), where it runs once per candidate pair.
  * A tight primitive loop in generated code, vs. one boxed lambda
  * invocation per element for the interpreted `aggregate(zip_with(...))`
  * equivalent. Overflow contract matches the quantizer bound documented
  * at the call site (|x| ≤ ~18 at scale 1e7 for 64 dims). */
case class LongVecSqDist(left: Expression, right: Expression)
    extends LongVecBinaryKernel {

  override def prettyName: String = "graft_sqdist_l"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var s = 0L
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          long $d = $a.getLong($i) - $b.getLong($i);
          $s += $d * $d;
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen expression: Σ a_i·b_i over two equal-length int64
  * vectors — the exact-arithmetic ranking kernel of the brute-force ANN
  * and k-NN-vote operators (Similarity), evaluated once per
  * (query, corpus-row) pair. */
case class LongVecDot(left: Expression, right: Expression)
    extends LongVecBinaryKernel {

  override def prettyName: String = "graft_dot_l"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var s = 0L
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $s = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getLong($i) * $b.getLong($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static helper for [[LongOrderedPairs]] — builds the nested array rows
  * in one compiled double loop. */
object LongVecOps {
  def orderedPairs(a: ArrayData): GenericArrayData = {
    val n = a.numElements()
    // C(n,2) is computed in Int: past 65535 elements it would silently
    // overflow. Callers pass bounded baskets (an order's line count);
    // make the bound loud if the kernel is ever reused on unbounded
    // arrays (r15, ADVICE).
    require(n <= 65535,
      s"graft_ordered_pairs input has $n elements; the C(n,2) fan-out " +
        "is only supported up to 65535 (bounded-basket contract)")
    val m = n * (n - 1) / 2
    val out = new Array[Any](m)
    var w = 0
    var i = 0
    while (i < n - 1) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(w) = new GenericArrayData(Array(x, a.getLong(j)))
        w += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen expression: array<long> → every ordered element pair
  * [aᵢ, aⱼ] with i < j, as array<array<bigint>> — the LOCAL C(n,2)
  * fan-out of the basket-pair generators (E52/E54 co-purchase edges),
  * where n is bounded by the basket (an order's distinct part count).
  * A compiled double loop per row, vs. one interpreted lambda frame per
  * element for the nested transform/slice/flatten chain
  * (CodegenFallback) computing the same thing. Input order is preserved
  * (callers pass sorted distinct arrays, so pair order is (a < b)). */
case class LongOrderedPairs(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_ordered_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    // orderedPairs reads every slot with getLong, which would silently
    // read a null element as 0 while dataType advertises
    // containsNull=false — reject nullable inputs instead (the function
    // is user-callable SQL; current callers pass collect_set output,
    // which is non-nullable) (r15, ADVICE)
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> with non-nullable elements " +
        "(null slots would silently read as 0)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    LongVecOps.orderedPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LongVecOps.orderedPairs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
