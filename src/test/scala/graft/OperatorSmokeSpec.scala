package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared operator runs end-to-end at sf0.001 and the contract
  * maps stay consistent (oracle keys ⊆ query keys; entry non-empty). */
class OperatorSmokeSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("queries and oracleSql cover exactly the same keys") {
    // no rows-only checks remain: every declared query carries a DuckDB
    // oracle, and no oracle exists without its query
    val orphanOracle = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    val uncovered = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(orphanOracle.isEmpty, s"oracle without query: $orphanOracle")
    assert(uncovered.isEmpty, s"query without oracle: $uncovered")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query output is scalar-typed (driver comparator contract)") {
    // the driver's oracle comparator sorts result columns with pandas;
    // array/map/struct/binary cells are unhashable there and broke two
    // queries in round 1 — keep every declared output scalar
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val bad = fn(spark, sf).schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => true
        case _ => false
      })
      assert(bad.isEmpty,
        s"$name has non-scalar output columns: ${bad.map(_.name).mkString(",")}")
    }
  }

  test("merged per-day HLL estimate is bit-identical to the single-pass estimate") {
    // MAX is associative: shard registers merged per type must equal the
    // global registers, so the two estimates match exactly — the property
    // that lets 100 TB sketches build per-partition and merge
    val merged = operators.Sketches.qHllMerge(spark, sf)
      .select("event_type", "hll_estimate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val single = operators.Sketches.qHllUsers(spark, sf)
      .select("event_type", "hll_estimate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(merged == single)
  }

  test("native HLL aggregate matches the expression-form sketch bit-for-bit") {
    val native = operators.Sketches.qHllNative(spark, sf)
      .select("event_type", "hll_estimate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expr = operators.Sketches.qHllUsers(spark, sf)
      .select("event_type", "hll_estimate").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(native == expr)
    // and it must participate in map-side partial aggregation
    val df = operators.Sketches.qHllNative(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_hll_est"),
      s"no partial aggregation in plan:\n$plan")
  }

  test("histogram quantiles are within one bucket width of the exact ranks") {
    val approx = operators.AnalyticsExt.qQuantileHist(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = operators.AnalyticsExt.qPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (t, (p50, p90, p99)) =>
      val (a50, a90, a99) = approx(t)
      // the bucket's upper edge can exceed the exact quantile by at most
      // the bucket width (10), and can never undershoot it
      for ((a, e) <- Seq((a50, p50), (a90, p90), (a99, p99))) {
        assert(a >= e && a - e <= 10.0, s"$t: approx $a vs exact $e")
      }
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // every query must produce rows on the smoke corpus except genuinely
      // selective ones, which may be empty but must still evaluate
      val n = df.count()
      val mayBeEmpty = Set("q_anti_join", "dedup_jaccard", "dedup_minhash",
        "dedup_simhash", "dedup_embcos")
      assert(n > 0 || mayBeEmpty(name), s"$name returned 0 rows")
    }
  }
}
