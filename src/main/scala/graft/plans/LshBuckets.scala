package graft.plans

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen expression: ALL hyperplane-LSH bucket ids of a quantized
  * int64 vector in one pass — `bucket[t] = Σ_p (dot(vec, plane(t,p)) > 0)
  * · 2^p` over `tables` independent `bits`-plane tables, with the
  * md5-derived ±1 planes `sign(t,p,d) = (h60("t_p_d") & 1)·2 − 1` that the
  * DuckDB oracle regenerates (Similarity.annLsh's convention, verbatim).
  *
  * Replaces tables×bits separate `graft_dot_l(vec, lit(plane))` calls —
  * 64 expression nodes each dragging a 64-element literal array through
  * codegen, which bloats the generated method far past JIT-friendly size —
  * with one primitive loop over a process-cached plane matrix. The planes
  * depend only on (tables, bits, dim), so the matrix is computed once per
  * JVM and shared by every task. */
case class LshBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val pl = LshBuckets.planeMatrix(tables, bits, n)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var b = 0; var p = 0
      while (p < bits) {
        val base = (t * bits + p) * n
        var s = 0L; var d = 0
        while (d < n) { s += pl(base + d) * x.getLong(d); d += 1 }
        if (s > 0) b |= (1 << p)
        p += 1
      }
      out(t) = b; t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val pl = ctx.freshName("pl")
      val out = ctx.freshName("out"); val t = ctx.freshName("t")
      val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val s = ctx.freshName("s"); val b = ctx.freshName("b")
      val base = ctx.freshName("base")
      s"""
        int $n = $c.numElements();
        long[] $pl = graft.plans.LshBuckets$$.MODULE$$.planeMatrix($tables, $bits, $n);
        int[] $out = new int[$tables];
        for (int $t = 0; $t < $tables; $t++) {
          int $b = 0;
          for (int $p = 0; $p < $bits; $p++) {
            int $base = ($t * $bits + $p) * $n;
            long $s = 0L;
            for (int $d = 0; $d < $n; $d++) {
              $s += $pl[$base + $d] * $c.getLong($d);
            }
            if ($s > 0) $b |= (1 << $p);
          }
          $out[$t] = $b;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBuckets {
  private val cache = new ConcurrentHashMap[(Int, Int, Int), Array[Long]]()

  /** Flattened [t][p][d] ±1 plane matrix for (tables, bits, dim), cached
    * per JVM. Seed string "t_p_d" — identical to Similarity.hyperplanes
    * and to the oracle SQL's md5 regeneration. */
  def planeMatrix(tables: Int, bits: Int, dim: Int): Array[Long] =
    cache.computeIfAbsent((tables, bits, dim), { key =>
      val (t0, b0, d0) = key
      val m = new Array[Long](t0 * b0 * d0)
      var i = 0
      for (t <- 0 until t0; p <- 0 until b0; d <- 0 until d0) {
        val bytes = s"${t}_${p}_$d".getBytes("UTF-8")
        m(i) = (TextHash.h60Bytes(bytes, 0, bytes.length) & 1L) * 2L - 1L
        i += 1
      }
      m
    })
}
