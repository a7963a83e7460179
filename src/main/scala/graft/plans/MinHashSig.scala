package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen expression: the full k-permutation MinHash signature of
  * a hashed shingle set in ONE pass — `sig[i] = min_j (a_i·h_j + b_i) mod P`
  * with the deterministic coefficients `a_i = 2i+3`, `b_i = 1000003·(i+1)`
  * and `P = 1000000007` (graft.functions.Hashing.perm).
  *
  * Replaces k separate interpreted `array_min(transform(shs, perm_i))`
  * projections (k·|set| boxed lambda invocations per document) with a
  * single fused primitive loop, and keeps the signature projection inside
  * whole-stage codegen. Matches the composed form exactly, including the
  * empty-set case (min over empty = null element). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = graft.functions.Hashing.P

  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      if (n > 0) {
        val a = 2L * i + 3L
        val b = 1000003L * (i + 1)
        var m = Long.MaxValue
        var j = 0
        while (j < n) {
          val v = (a * arr.getLong(j) + b) % P
          if (v < m) m = v
          j += 1
        }
        out(i) = m
      } // else: null element (min over empty set)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      val m = ctx.freshName("m"); val v = ctx.freshName("v")
      s"""
        int $n = $c.numElements();
        Object[] $out = new Object[$numHashes];
        for (int $i = 0; $i < $numHashes; $i++) {
          if ($n > 0) {
            long $a = 2L * $i + 3L;
            long $b = 1000003L * ($i + 1);
            long $m = Long.MAX_VALUE;
            for (int $j = 0; $j < $n; $j++) {
              long $v = ($a * $c.getLong($j) + $b) % ${P}L;
              if ($v < $m) $m = $v;
            }
            $out[$i] = $m;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
