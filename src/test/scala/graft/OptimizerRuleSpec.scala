package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected SelfIntersectRule must fold graft_intersect_count(a, a)
  * to size(a) — and leave distinct-argument calls alone. */
class OptimizerRuleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
    (Seq.empty[Long], Seq(1L, 9L))).toDF("a", "b")

  test("self-intersection folds to size and drops the kernel from the plan") {
    val q = df.select(
      call_function("graft_intersect_count", col("a"), col("a")).as("n"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_intersect_count"),
      s"kernel survived optimization:\n$optimized")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(3L, 0L))
  }

  test("distinct arguments keep the kernel and still compute correctly") {
    val q = df.select(
      call_function("graft_intersect_count", col("a"), col("b")).as("n"))
    // apply the rule directly to the analyzed plan (full optimization
    // would constant-fold this local relation away, kernel and all)
    val rewritten = graft.plans.SelfIntersectRule(q.queryExecution.analyzed)
    assert(rewritten.toString.toLowerCase.contains("intersect"),
      s"rule rewrote distinct-argument call:\n$rewritten")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L, 0L))
  }
}
