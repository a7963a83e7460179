package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global executed-plan audit over EVERY registered query — the scale
  * anti-pattern guard. A CartesianProduct node anywhere is an
  * all-pairs fan-out that cannot survive a 100× scale-up; the known
  * 1-row totals attaches compile to BroadcastNestedLoopJoin (bounded:
  * one row moves), which stays admissible. Dimension joins on the
  * TPC-H core must broadcast — a sort-merge exchange of a K-row dim
  * against the fact table is a wasted full shuffle. */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // finalize AQE
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q) else None
    }
    assert(offenders.isEmpty,
      s"cartesian fan-out in: ${offenders.mkString(", ")}")
  }

  test("TPC-H core dimension joins broadcast (no sort-merge on K-row dims)") {
    for (q <- Seq("q3_revenue", "q5_region")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q: no broadcast join\n$plan")
    }
  }
}
