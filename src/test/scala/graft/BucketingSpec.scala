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

  test("CDC snapshot lands as a lakehouse table: shuffle-free as-of serve") {
    import org.apache.spark.sql.functions._
    Bucketing.writeAsOfBucketed(spark, sf)
    Bucketing.writeCdcSnapshot(spark, sf)
    val df = Bucketing.cdcSnapshotAsOf(spark)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    val finalSection = plan.split("== Initial Plan ==")(0)
    assert(finalSection.contains("AsOfJoin"), s"merge operator missing:\n$plan")
    val subtree = finalSection.substring(finalSection.indexOf("AsOfJoin"))
    assert(!subtree.contains("Exchange"),
      s"snapshot as-of read shuffled below the merge:\n$plan")
    assert(finalSection.contains("Bucketed: true"),
      s"snapshot not served from the bucketed layout:\n$plan")
    // semantics: with one state row per user, the as-of is exactly a
    // left join gated on state-time <= probe-time — verify against the
    // composed spelling
    val probe = spark.table("purchases_bucketed")
    val state = spark.table("cdc_snapshot_bucketed")
      .select(col("user_id").as("s_user"),
        expr("last_us div 1000000").as("s_epoch"),
        col("last_type"), col("last_value"))
    val want = probe.join(state,
        probe("user_id") === state("s_user") &&
          state("s_epoch") <= probe("epoch"), "left")
      .select(col("user_id"), col("purchase_id"), col("epoch"),
        col("s_epoch"), col("last_type"), col("last_value"))
      .orderBy("user_id", "purchase_id")
      .collect().map(_.toString).toSeq
    val got = df.collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want,
      s"snapshot as-of diverged: ${got.size} vs ${want.size} rows")
  }

  test("CDC snapshot: zone-map sidecar prunes a change-time range read") {
    import org.apache.spark.sql.functions._
    import graft.sources.ZoneMaps
    val loc = Bucketing.writeCdcSnapshot(spark, sf)
    val snap = spark.table("cdc_snapshot_bucketed")
    val days = snap.select(expr("last_us div 86400000000").as("d"))
      .distinct().collect().map(_.getLong(0)).sorted
    assert(days.length >= 2,
      s"corpus collapsed to ${days.length} change-day(s) — band test needs >= 2")
    // band = exactly the earliest change-day: only that day's files survive
    val lo = days.head * 86400000000L
    val hi = (days.head + 1) * 86400000000L - 1
    val (kept, total) = ZoneMaps.planFiles(spark, loc, lo, hi)
    assert(kept.nonEmpty && kept.size < total,
      s"day-partitioned snapshot did not prune: ${kept.size}/$total files")
    val got = ZoneMaps.readRange(spark, loc, "last_us", lo, hi)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val want = snap.filter(col("last_us") >= lo && col("last_us") <= hi)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && got == want,
      s"pruned range read diverged: ${got.size} vs ${want.size} rows")
  }
}
