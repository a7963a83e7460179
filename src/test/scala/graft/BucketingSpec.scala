package graft

import graft.sources.Bucketing
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("bucketed fact join plans with zero shuffles") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Bucketing.writeBucketed(spark, sf)
      val df = Bucketing.bucketedOrderRevenue(spark)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join, plan:\n$plan")
      // and it still computes the right thing: one row per order that has
      // at least one lineitem
      val expected = spark.table("lineitem_bucketed")
        .select("l_orderkey").distinct().count()
      val n = df.count()
      assert(n == expected, s"expected $expected rows, got $n")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
