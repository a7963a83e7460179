package graft

import graft.operators.{AnalyticsExt, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_qhist (native mergeable histogram-quantile aggregate, G24) —
  * equality with the composed E35 form, partial-aggregation plan shape,
  * merge-order independence across repartitionings, and edge cases. */
class QhistAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("native histogram quantiles equal the composed window form on real data") {
    val native = Sketches.qQhistNative(spark, TestSpark.sf).collect().toSeq
    val composed = AnalyticsExt.qQuantileHist(spark, TestSpark.sf).collect().toSeq
    assert(native.nonEmpty && native == composed)
  }

  test("the aggregate runs with map-side partial aggregation") {
    val df = Sketches.qQhistNative(spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_qhist"),
      s"no partial aggregation phase:\n$plan")
  }

  test("result is independent of partitioning (merge is commutative)") {
    val base = (1 to 997).map(i => ("g", (i % 83).toDouble + 0.5))
    def run(parts: Int): Seq[org.apache.spark.sql.Row] =
      base.toDF("g", "value").repartition(parts)
        .groupBy("g")
        .agg(call_function("graft_qhist", col("value"), lit(10.0d),
          lit(0.5d), lit(0.9d), lit(0.99d)).as("q"))
        .select(col("q.p50_edge"), col("q.p90_edge"), col("q.p99_edge"),
          col("q.n_events")).collect().toSeq
    assert(run(1) == run(7) && run(7) == run(32))
  }

  test("null values are skipped; a group of a single value picks its bucket") {
    val rows = Seq(("a", Some(12.0)), ("a", None), ("b", Some(0.1)))
      .toDF("g", "value")
      .groupBy("g")
      .agg(call_function("graft_qhist", col("value"), lit(10.0d),
        lit(0.5d)).as("q"))
      .select(col("g"), col("q.p50_edge"), col("q.n_events"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // 12.0 → edge 20; 0.1 → edge 10; the null row never enters the histogram
    assert(rows == Seq(("a", 20L, 1L), ("b", 10L, 1L)))
  }

  test("integer literals are accepted for width and percentile args") {
    // SQL users naturally write graft_qhist(v, 10, ...) — the extension
    // must coerce any numeric literal, not ClassCastException on non-Double
    val rows = spark.sql(
      "SELECT graft_qhist(v, 10, 0.5) AS q FROM VALUES (CAST(5.0 AS DOUBLE)), (CAST(15.0 AS DOUBLE)) t(v)")
      .select(col("q.p50_edge"), col("q.n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((10L, 2L)))
  }

  test("fractional width fails loudly instead of misbucketing") {
    // the buffer keys edges as longs; width 2.5 would silently truncate to
    // 2 — the constructor must reject it by name
    val e = intercept[Exception] {
      spark.sql("SELECT graft_qhist(v, 2.5, 0.5) FROM VALUES (CAST(5.0 AS DOUBLE)) t(v)")
        .collect()
    }
    assert(e.getMessage.contains("whole number"), e.getMessage)
  }

  test("non-foldable width fails with a clear message, not an NPE") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_qhist(v, v, 0.5) FROM VALUES (CAST(5.0 AS DOUBLE)) t(v)")
        .collect()
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }

  test("sub-percent percentiles get distinct full-precision field names") {
    val df = Seq(("a", 1.0)).toDF("g", "value")
      .groupBy("g")
      .agg(call_function("graft_qhist", col("value"), lit(10.0d),
        lit(0.995d), lit(0.999d)).as("q"))
    val names = df.select("q.*").columns.toSeq
    // the old round-to-whole-percent scheme collapsed both to p100_edge
    assert(names == Seq("p99_5_edge", "p99_9_edge", "n_events"))
  }

  test("negative values land on floor-division edges like both engines") {
    val rows = Seq(("a", -0.5), ("a", -12.0))
      .toDF("g", "value")
      .groupBy("g")
      .agg(call_function("graft_qhist", col("value"), lit(10.0d),
        lit(1.0d)).as("q"))
      .select(col("q.p100_edge"), col("q.n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // floor(-0.5/10)=-1 → edge 0; floor(-12/10)=-2 → edge -10; p100 picks the max edge 0
    assert(rows == Seq((0L, 2L)))
  }
}
