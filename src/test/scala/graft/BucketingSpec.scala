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

  test("bucketed as-of merge plans with zero shuffles and matches E11n") {
    Bucketing.writeAsOfBucketed(spark, sf)
    val df = Bucketing.bucketedAsOf(spark)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"),
      s"native as-of operator missing:\n$plan")
    // the two bucketed scans satisfy the merge's ClusteredDistribution
    // compatibly: nothing below the as-of shuffles. The plan string is
    // top-down, so within the AQE final section the operator's subtree
    // is everything after its line; the only Exchange allowed is the
    // presentation orderBy ABOVE it (and AQE repeats the pre-optimized
    // tree under "== Initial Plan ==" — cut that off first).
    val finalSection = plan.split("== Initial Plan ==")(0)
    val subtree = finalSection.substring(finalSection.indexOf("AsOfJoin"))
    assert(!subtree.contains("Exchange"),
      s"expected shuffle-free bucketed as-of below the merge, plan:\n$plan")
    assert(finalSection.contains("Bucketed: true"),
      s"as-of legs not served from the bucketed layout:\n$plan")
    // identical answer to the shuffling native variant on the same data
    val got = df.collect().map(_.toString).toSeq
    val want = SparkEntry.queries("q_asof_native")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want,
      s"bucketed as-of diverged: ${got.size} vs ${want.size} rows")
  }
}
