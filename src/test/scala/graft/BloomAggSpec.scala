package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** G30: the `graft_bloom` mergeable membership sketch and its codegen'd
  * `graft_bloom_contains` probe — no false negatives, a measured
  * false-positive rate inside the analytic bound, partitioning
  * independence (bytewise-OR merge is commutative), map-side partial
  * aggregation, null skipping, and loud argument validation. */
class BloomAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sketchOf(keys: Seq[String], m: Int = 4096, k: Int = 3): Array[Byte] =
    keys.toDF("key")
      .agg(call_function("graft_bloom", col("key"), lit(m), lit(k)))
      .head().getAs[Array[Byte]](0)

  test("sketch blob is exactly m/8 bytes") {
    assert(sketchOf(Seq("a", "b"), m = 4096).length == 512)
    assert(sketchOf(Seq("a"), m = 64).length == 8)
  }

  test("no false negatives: every inserted key passes contains") {
    val keys = (0 until 500).map(i => s"key_$i")
    val bf = sketchOf(keys)
    val probed = keys.toDF("key")
      .withColumn("hit", call_function("graft_bloom_contains",
        lit(bf), col("key"), lit(3)))
      .filter(!col("hit")).count()
    assert(probed == 0L, "an inserted key failed the membership probe")
  }

  test("false-positive rate on disjoint probes stays near (bits/m)^k") {
    val members = (0 until 400).map(i => s"m_$i")
    val bf = sketchOf(members)
    val setBits = bf.map(b => java.lang.Integer.bitCount(b & 0xff)).sum
    val expected = math.pow(setBits.toDouble / 4096.0, 3)
    val probes = (0 until 4000).map(i => s"probe_$i")
    val fps = probes.toDF("key")
      .withColumn("hit", call_function("graft_bloom_contains",
        lit(bf), col("key"), lit(3)))
      .filter(col("hit")).count()
    val rate = fps.toDouble / probes.size
    // generous band: the point is "a few percent", not "everything passes"
    assert(rate < expected * 3 + 0.01,
      s"fp rate $rate way above analytic $expected ($setBits bits set)")
  }

  test("sketch is independent of partitioning and input order") {
    val keys = (0 until 2000).map(i => s"k_${i * 37 % 1000}") // dups included
    val one = keys.toDF("key").repartition(1)
      .agg(call_function("graft_bloom", col("key"), lit(1024), lit(3)))
      .head().getAs[Array[Byte]](0)
    val many = keys.reverse.toDF("key").repartition(16)
      .agg(call_function("graft_bloom", col("key"), lit(1024), lit(3)))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many))
  }

  test("merged sketch equals the sketch of the union (bytewise OR)") {
    val a = sketchOf(Seq("x1", "x2", "x3"), m = 256)
    val b = sketchOf(Seq("y1", "y2"), m = 256)
    val union = sketchOf(Seq("x1", "x2", "x3", "y1", "y2"), m = 256)
    val orred = a.zip(b).map { case (p, q) => (p | q).toByte }
    assert(java.util.Arrays.equals(orred, union))
  }

  test("nulls are skipped") {
    val bf = Seq(Some("a"), None, Some("b")).toDF("key")
      .agg(call_function("graft_bloom", col("key"), lit(256), lit(3)))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bf, sketchOf(Seq("a", "b"), m = 256)))
  }

  test("k = 8 (the int64-safe maximum) still has no false negatives") {
    val keys = (0 until 200).map(i => s"k8_$i")
    val bf = sketchOf(keys, m = 8192, k = 8)
    val misses = keys.toDF("key")
      .withColumn("hit", call_function("graft_bloom_contains",
        lit(bf), col("key"), lit(8)))
      .filter(!col("hit")).count()
    assert(misses == 0L)
  }

  test("bad m or k fails loudly") {
    val df = Seq("a").toDF("key")
    for ((m, k) <- Seq((lit(100), lit(3)), (lit(-8), lit(3)),
        (lit(4096.5), lit(3)), (lit(4096), lit(0)), (lit(4096), lit(2.5)),
        (lit(4096), lit(9)))) {
      val e = intercept[Exception] {
        df.agg(call_function("graft_bloom", col("key"), m, k)).collect()
      }
      assert(e.getMessage.contains("graft_bloom"), e.getMessage)
    }
    val e = intercept[Exception] {
      df.withColumn("c", call_function("graft_bloom_contains",
        lit(Array[Byte](0, 0)), col("key"), lit(0))).collect()
    }
    assert(e.getMessage.contains("graft_bloom_contains"), e.getMessage)
  }

  test("plan shows map-side partial aggregation") {
    val plan = Seq(("a", "x")).toDF("g", "key").groupBy("g")
      .agg(call_function("graft_bloom", col("key"), lit(256), lit(3)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_bloom"), s"no partial agg:\n$plan")
  }
}
