package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

/** The bloom pre-filter must be lossless (no true match dropped — that is
  * what the oracle checks end-to-end) AND actually prune: the point of
  * the sketch is that the probe side shrinks BEFORE the shuffle. */
class BloomJoinSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("bloom pre-filter prunes most non-matching lineitem rows, keeps all matches") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloomAgg = GraftBridge.col(
      new BloomFilterAggregate(GraftBridge.expr(col("o_orderkey")), 1000000L)
        .toAggregateExpression())
    val bloom = urgent.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val total = lineitem.count()
    val pruned = lineitem.filter(GraftBridge.col(BloomFilterMightContain(
      Literal(bloom, BinaryType), GraftBridge.expr(col("l_orderkey")))))
    val kept = pruned.count()
    val trueMatches = lineitem.join(urgent,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(kept >= trueMatches, "bloom dropped a true match (false negative)")
    // ~20% of orders are urgent; with 1M-slot bloom the FP rate is tiny,
    // so the kept fraction must be well under half of the fact table
    assert(kept < total / 2, s"bloom pruned nothing: kept $kept of $total")
    // and the exact join on the pruned side equals the join on the full side
    val a = pruned.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
    val b = lineitem.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
    assert(a == b)
  }
}
