package graft

import graft.operators.AnalyticsExt
import graft.plans.{AsOfJoin, AsOfJoinExec}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("native as-of join equals the window-composed implementation") {
    val native = AnalyticsExt.qAsofNative(spark, sf).collect().toSeq
    val windowed = AnalyticsExt.qAsofJoin(spark, sf).collect().toSeq
    assert(native.nonEmpty && native == windowed)
  }

  test("the planner strategy produces AsOfJoinExec, not a fallback") {
    val plan = AnalyticsExt.qAsofNative(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"plan was:\n$plan")
  }

  test("left rows without a match get null right side") {
    val l = Seq((1L, 10L, 100L), (2L, 20L, 50L)).toDF("k", "lid", "lts")
    val r = Seq((1L, 7L, 90L), (1L, 8L, 101L), (2L, 9L, 60L)).toDF("rk", "rid", "rts")
    val joined = GraftBridge.ofRows(spark, AsOfJoin(
      l.queryExecution.analyzed, r.queryExecution.analyzed,
      GraftBridge.expr(l("k")), GraftBridge.expr(r("rk")),
      GraftBridge.expr(l("lts")), GraftBridge.expr(r("rts")),
      GraftBridge.expr(r("rid"))))
      .select(col("lid"), col("rid")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // k=1: only rts=90 ≤ 100 matches (101 excluded); k=2: rts=60 > 50 → null
    assert(joined == Map(10L -> 7L, 20L -> -1L))
  }

  private def run(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame, forward: Boolean,
      tol: Option[Long]): Map[Long, Long] =
    GraftBridge.ofRows(spark, AsOfJoin(
      l.queryExecution.analyzed, r.queryExecution.analyzed,
      GraftBridge.expr(l("k")), GraftBridge.expr(r("rk")),
      GraftBridge.expr(l("lts")), GraftBridge.expr(r("rts")),
      GraftBridge.expr(r("rid")), forward, tol))
      .select(col("lid"), col("rid")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap

  test("tolerance nulls out stale matches but keeps fresh ones") {
    val l = Seq((1L, 10L, 100L), (1L, 11L, 500L)).toDF("k", "lid", "lts")
    val r = Seq((1L, 7L, 90L)).toDF("rk", "rid", "rts")
    // lid=10: gap 10 ≤ 50 → match; lid=11: gap 410 > 50 → null-padded
    assert(run(l, r, forward = false, tol = Some(50L)) ==
      Map(10L -> 7L, 11L -> -1L))
  }

  test("forward as-of picks the earliest at-or-after right row") {
    val l = Seq((1L, 10L, 100L), (2L, 20L, 50L)).toDF("k", "lid", "lts")
    val r = Seq((1L, 7L, 90L), (1L, 8L, 100L), (1L, 9L, 150L),
      (2L, 5L, 40L)).toDF("rk", "rid", "rts")
    // k=1: rts=100 (equal counts) beats 150; 90 is in the past.
    // k=2: only rts=40 < 50 → no following row → null-padded
    assert(run(l, r, forward = true, tol = None) ==
      Map(10L -> 8L, 20L -> -1L))
  }

  test("forward + tolerance bounds the look-ahead") {
    val l = Seq((1L, 10L, 100L)).toDF("k", "lid", "lts")
    val r = Seq((1L, 9L, 170L)).toDF("rk", "rid", "rts")
    assert(run(l, r, forward = true, tol = Some(80L)) == Map(10L -> 9L))
    assert(run(l, r, forward = true, tol = Some(60L)) == Map(10L -> -1L))
  }

  test("equal timestamps: latest tie-break wins and ties count as prior") {
    val l = Seq((1L, 10L, 100L)).toDF("k", "lid", "lts")
    val r = Seq((1L, 7L, 100L), (1L, 8L, 100L), (1L, 3L, 40L)).toDF("rk", "rid", "rts")
    val joined = GraftBridge.ofRows(spark, AsOfJoin(
      l.queryExecution.analyzed, r.queryExecution.analyzed,
      GraftBridge.expr(l("k")), GraftBridge.expr(r("rk")),
      GraftBridge.expr(l("lts")), GraftBridge.expr(r("rts")),
      GraftBridge.expr(r("rid"))))
      .select(col("rid")).as[Long].collect().toSeq
    assert(joined == Seq(8L))
  }
}
