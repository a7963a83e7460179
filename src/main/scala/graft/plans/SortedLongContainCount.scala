package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen expression: gated intersect count for the containment
  * verify — returns |a ∩ b| when `den·|a∩b| ≥ num·|a|` (containment of
  * `a` in `b` at threshold num/den) and -1 otherwise, with EARLY EXIT:
  * the two-pointer walk aborts the moment the number of a-elements
  * proven absent from b exceeds the miss budget ⌊|a|·(den−num)/den⌋.
  *
  * Candidate pairs that fail the gate (the overwhelming majority on a
  * dense corpus — they typically share only the probe shingle) abort
  * after ~budget+1 misses instead of walking both arrays to the end, so
  * the verify cost per REJECTED candidate is O(|a|·(1−τ)) rather than
  * O(|a|+|b|). Gate arithmetic is exact int64; inputs must be sorted
  * ascending and duplicate-free like [[SortedLongIntersectCount]]'s.
  */
case class SortedLongContainCount(left: Expression, right: Expression,
    num: Int, den: Int) extends BinaryExpression {

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

  override def prettyName: String = "graft_contain_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    val budget = n.toLong * (den - num) / den
    var i = 0; var j = 0; var c = 0L; var miss = 0L
    while (i < n && j < m && miss <= budget) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) { miss += 1; i += 1 }
      else j += 1
    }
    miss += n - i // b exhausted: every remaining a-element is a miss
    if (miss <= budget) c else -1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val m = ctx.freshName("m"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val miss = ctx.freshName("miss")
      val budget = ctx.freshName("budget")
      s"""
        int $i = 0; int $j = 0; long $c = 0L; long $miss = 0L;
        int $n = $a.numElements(); int $m = $b.numElements();
        long $budget = (long) $n * ${den - num} / $den;
        while ($i < $n && $j < $m && $miss <= $budget) {
          long $xv = $a.getLong($i); long $yv = $b.getLong($j);
          if ($xv == $yv) { $c++; $i++; $j++; }
          else if ($xv < $yv) { $miss++; $i++; } else { $j++; }
        }
        $miss += $n - $i;
        ${ev.value} = ($miss <= $budget) ? $c : -1L;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
