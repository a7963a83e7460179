package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_topk (native TypedImperativeAggregate) — correctness against the
  * window form, partial-aggregation plan shape, and heap edge cases. */
class TopKAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("native top-k equals the ranking-window form on real data") {
    val native = Analytics.qTopkNative(spark, TestSpark.sf).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus").orderBy(col("score").desc, col("id").desc)
    val windowed = graft.sources.Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("score"),
        col("o_orderkey").as("id"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("o_orderstatus"), col("rank"), col("id").as("o_orderkey"),
        (col("score").cast("double") / 100).as("o_totalprice"))
      .orderBy("o_orderstatus", "rank").collect().toSeq
    assert(native.nonEmpty && native == windowed)
  }

  test("the aggregate runs with map-side partial aggregation") {
    val df = Analytics.qTopkNative(spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"),
      s"no partial aggregation phase:\n$plan")
  }

  test("heap keeps exactly k with deterministic tie-breaks") {
    val df = Seq(("a", 5L, 1L), ("a", 5L, 2L), ("a", 5L, 3L), ("a", 4L, 9L))
      .toDF("g", "score", "id")
      .groupBy("g")
      .agg(call_function("graft_topk", struct(col("score"), col("id")), lit(2)).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.score"), col("e.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // equal scores: larger id wins; exactly 2 survive, descending
    assert(df == Seq((5L, 3L), (5L, 2L)))
  }

  test("groups smaller than k return all rows, empty input none") {
    val out = Seq(("a", 1L, 1L)).toDF("g", "score", "id")
      .groupBy("g")
      .agg(call_function("graft_topk", struct(col("score"), col("id")), lit(5)).as("top"))
      .select(size(col("top"))).as[Int].collect().toSeq
    assert(out == Seq(1))
  }
}
