package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
