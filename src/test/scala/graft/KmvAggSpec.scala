package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** G29: the `graft_kmv` mergeable k-minimum-values sketch — exact
  * k-minima semantics, distinctness under merge, partitioning
  * independence (streaming/map-side-combine legality), partial
  * aggregation in the plan, and null skipping. */
class KmvAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("sketch is exactly the k smallest distinct values") {
    val df = Seq(50L, 10L, 40L, 10L, 30L, 20L, 60L, 20L).toDF("h")
    val got = df.agg(call_function("graft_kmv", col("h"), lit(4)).as("kmv"))
      .head().getSeq[Long](0)
    assert(got == Seq(10L, 20L, 30L, 40L))
  }

  test("unsaturated sketch keeps every distinct value, sorted") {
    val df = Seq(5L, 3L, 5L, 9L).toDF("h")
    val got = df.agg(call_function("graft_kmv", col("h"), lit(128)).as("kmv"))
      .head().getSeq[Long](0)
    assert(got == Seq(3L, 5L, 9L))
  }

  test("result is independent of partitioning (mergeable, commutative)") {
    val vals = (0 until 5000).map(i => (i * 2654435761L) % 1000000007L)
    val one = vals.toDF("h").repartition(1)
      .agg(call_function("graft_kmv", col("h"), lit(64))).head().getSeq[Long](0)
    val many = vals.toDF("h").repartition(16)
      .agg(call_function("graft_kmv", col("h"), lit(64))).head().getSeq[Long](0)
    val reversed = vals.reverse.toDF("h").repartition(7)
      .agg(call_function("graft_kmv", col("h"), lit(64))).head().getSeq[Long](0)
    assert(one == many && one == reversed)
    assert(one == vals.distinct.sorted.take(64))
  }

  test("duplicates split across partitions never double-enter the sketch") {
    // every partition carries the same 3 values; a distinctness bug would
    // let copies crowd out the true 4th minimum
    val df = (0 until 8).flatMap(_ => Seq(1L, 2L, 3L)).toDF("h")
      .repartition(8).union(Seq(4L).toDF("h"))
    val got = df.agg(call_function("graft_kmv", col("h"), lit(4)))
      .head().getSeq[Long](0)
    assert(got == Seq(1L, 2L, 3L, 4L))
  }

  test("nulls are skipped") {
    val got = Seq(Some(7L), None, Some(2L)).toDF("h")
      .agg(call_function("graft_kmv", col("h"), lit(8))).head().getSeq[Long](0)
    assert(got == Seq(2L, 7L))
  }

  test("fractional or non-positive k fails loudly instead of truncating") {
    val df = Seq(1L).toDF("h")
    for (bad <- Seq(lit(2.5d), lit(0), lit(-3))) {
      val e = intercept[Exception] {
        df.agg(call_function("graft_kmv", col("h"), bad)).collect()
      }
      assert(e.getMessage.contains("positive whole number"), e.getMessage)
    }
  }

  test("kmvOverlap drops pairs where both sketches are empty (no crash)") {
    // all-null hash input yields an empty sketch; the pair's union is
    // empty and v_k has no element — the pair must drop (matching the
    // relational oracle's inner join), not throw on element_at(u, 0)
    val sk = Seq(("a", Some(1L)), ("b", Option.empty[Long]),
      ("c", Option.empty[Long])).toDF("src", "h")
      .groupBy(col("src"))
      .agg(call_function("graft_kmv", col("h"), lit(8)).as("kmv"))
    val pairs = graft.operators.Sketches.kmvOverlap(sk, "src", 8)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // (b, c) is the both-empty pair and must be absent; pairs that
    // include the non-empty sketch survive
    assert(pairs == Set(("a", "b"), ("a", "c")), s"pairs: $pairs")
  }

  test("plan shows map-side partial aggregation") {
    val df = Seq((1, 10L), (2, 20L)).toDF("g", "h")
    val plan = df.groupBy("g").agg(call_function("graft_kmv", col("h"), lit(8)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmv"), s"no partial agg:\n$plan")
  }
}
