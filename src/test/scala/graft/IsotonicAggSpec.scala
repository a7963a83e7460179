package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `graft_isotonic` (plans/IsotonicAgg.scala): the sequential PAVA path
  * must match the O(n³) minimax FORMULATION (fitted_i = max_{j≤i}
  * min_{k≥i} mean(y[j..k]), the E65 oracle) bit-for-bit — verified here
  * on a 10⁴-point series via a driver O(n²) replica of the minimax
  * (same exact int64 prefix sums, same double divisions), a scale at
  * which the relational O(n³) join could never be enumerated. */
class IsotonicAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random series: LCG cents values with a rising
    * trend plus heavy noise — plenty of violations to pool. */
  private def series(n: Int): Array[(Long, Long, Long)] = {
    var state = 88172645463325252L
    def next(): Long = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      math.abs(state % 100000L)
    }
    (0 until n).map { i =>
      (i.toLong, i.toLong * 10L + next(), 1L + (next() % 5L))
    }.toArray
  }

  /** Driver replica of the minimax formulation in O(n²): exact int64
    * prefix sums, interval mean = ONE double division (the oracle's
    * arithmetic shape), suffix-min over k then prefix-max over j. */
  private def minimaxFit(pts: Array[(Long, Long, Long)]): Array[Double] = {
    val n = pts.length
    val cs = new Array[Long](n + 1)
    val cn = new Array[Long](n + 1)
    for (i <- 0 until n) {
      cs(i + 1) = cs(i) + pts(i)._2; cn(i + 1) = cn(i) + pts(i)._3
    }
    def avg(j: Int, k: Int): Double = // mean of points j..k inclusive
      (cs(k + 1) - cs(j)).toDouble / (cn(k + 1) - cn(j)).toDouble
    // minK(j)(i) = min_{k≥i} avg(j..k), built backwards per j
    val fitted = Array.fill(n)(Double.NegativeInfinity)
    for (j <- 0 until n) {
      var runMin = Double.PositiveInfinity
      var i = n - 1
      while (i >= j) {
        runMin = math.min(runMin, avg(j, i))
        // fitted(i) = max over j ≤ i of minK(j)(i)
        if (runMin > fitted(i)) fitted(i) = runMin
        i -= 1
      }
    }
    fitted
  }

  test("PAVA fit matches the minimax formulation bit-for-bit on 10^4 points") {
    val pts = series(10000)
    val expected = minimaxFit(pts)
    val got = pts.toSeq.toDF("i", "s", "n")
      .agg(call_function("graft_isotonic", col("i"), col("s"), col("n")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.size == 10000)
    got.foreach { case (i, f) =>
      assert(f == expected(i.toInt),
        s"point $i: pava=$f minimax=${expected(i.toInt)}")
    }
    // the fit is actually monotone and actually pooled something
    assert(got.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    assert(got.map(_._2).distinct.size < 10000, "no pooling happened")
  }

  test("merge is order-free and duplicate indices pre-aggregate (raw-row feed)") {
    // 500 days, ~4 raw rows per day fed as (i, cents, 1): the aggregate's
    // update/merge must reduce them to the same day cells a groupBy would
    val raw = series(2000).map { case (i, s, m) => (i % 500, s, 1L) }
    val viaRaw = raw.toSeq.toDF("i", "s", "n").repartition(17)
      .agg(call_function("graft_isotonic", col("i"), col("s"), col("n")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getLong(0) -> r.getDouble(1))
    val cells = raw.groupBy(_._1).map { case (i, rs) =>
      (i, rs.map(_._2).sum, rs.map(_._3).sum) }.toArray.sortBy(_._1)
    val viaCells = cells.toSeq.toDF("i", "s", "n").repartition(3)
      .agg(call_function("graft_isotonic", col("i"), col("s"), col("n")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(viaRaw == viaCells, "raw-row feed diverged from day cells")
    assert(viaRaw.size == 500)
  }

  test("exact BigInt pooling: means whose doubles tie are compared exactly") {
    // two blocks whose means differ by ~1e-18 relative — indistinguishable
    // as doubles — must still pool iff the RATIONAL comparison says so:
    // s=3e18,n=3 (mean 1e18) before s=2e18,n=2 (mean 1e18) is NOT a
    // violation (equal rationals), so no pooling; the doubles agree.
    val eq = Seq((0L, 3000000000000000000L, 3L), (1L, 2000000000000000000L, 2L))
      .toDF("i", "s", "n")
      .agg(call_function("graft_isotonic", col("i"), col("s"), col("n")))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(eq.map(_.getDouble(1)).distinct.size == 1)
    // s=3e18+3,n=3 strictly above s=1e18,n=1: a genuine violation even
    // though (3e18+3)/3 and 1e18 round to the same double — int64
    // arithmetic must pool them into (4e18+3)/4
    val viol = Seq((0L, 3000000000000000003L, 3L), (1L, 1000000000000000000L, 1L))
      .toDF("i", "s", "n")
      .agg(call_function("graft_isotonic", col("i"), col("s"), col("n")))
      .head().getSeq[org.apache.spark.sql.Row](0)
    val pooled = (BigInt("4000000000000000003").toDouble / 4.0)
    assert(viol.forall(_.getDouble(1) == pooled),
      s"tie-breaking pooled wrong: ${viol.map(_.getDouble(1))}")
  }

  test("count validation: n = 0 is identity, n < 0 fails loud") {
    // a zero-count cell (an outer join's empty day) contributes nothing —
    // no Infinity/NaN fitted value, no phantom point
    val withZero = Seq((0L, 10L, 2L), (1L, 999L, 0L), (2L, 4L, 1L))
      .toDF("i", "s", "n")
      .agg(call_function("graft_isotonic", col("i"), col("s"), col("n")))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(withZero.map(_.getLong(0)) == Seq(0L, 2L),
      s"zero-count cell leaked a point: $withZero")
    assert(withZero.forall(r => !r.getDouble(1).isNaN &&
      !r.getDouble(1).isInfinite))
    // a negative count would flip the cross-multiplied violation test —
    // reject it instead of silently pooling wrong blocks
    val ex = intercept[Exception] {
      Seq((0L, 10L, 2L), (1L, 5L, -1L)).toDF("i", "s", "n")
        .agg(call_function("graft_isotonic", col("i"), col("s"), col("n")))
        .head()
    }
    assert(ex.getMessage != null)
  }
}
