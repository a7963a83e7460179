package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r13-advice bound closures, planted PAST the old int64 envelopes:
  * E70 `q_trend`'s pairwise cross-multiplication (sign AND tie equality)
  * now runs in DECIMAL(38); E69 `q_gini`'s Σ rank·x folds per distinct
  * value in DECIMAL(38); E12 `q_percentiles`' two-phase rank routes NaN
  * to a sentinel MAX bucket instead of Spark's NaN→long-cast bucket 0.
  * Each test's data would return a WRONG answer (wrapped sign, wrapped
  * sum, shifted ranks) under the pre-r13 arithmetic. */
class IntBoundsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeEvents(rows: Seq[(String, Int, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bounds").toString
    rows.zipWithIndex.map { case ((t, day, v), i) =>
      (i.toLong, t, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), v)
    }.toDF("event_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_trend: daily sums past the int64 cross-multiply envelope still " +
    "rank correctly (ys·yn ≈ 9.2e18 + ε wrapped before the DECIMAL cast)") {
    // two rows/day at ~2.3e16 value → ys ≈ 4.6e18 cents, yn = 2:
    // ys_j·yn_i ≈ 9.2e18 + 4d·10¹⁵ exceeds Long.MaxValue from day 6 on,
    // so the old long multiply wrapped negative and flipped signs
    val rows = (1 to 10).flatMap { d =>
      val v = 2.3e16 + d * 1e13
      Seq(("big", d, v), ("big", d, v))
    }
    val out = SparkEntry.queries("q_trend")(spark, writeEvents(rows))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).head
    // strictly rising: S = C(10,2) = 45, tau = 1, trending
    assert(out == ((10L, 45L, 1.0, true)),
      s"cross-multiply wrapped past int64: $out (expected (10, 45, 1.0, true))")
  }

  test("q_gini: rank·value sums past int64 stay exact; equal mass ⇒ gini 0") {
    // 4 rows of 2.3e16 → c = 2.3e18 cents each; Σ rank·c = 10·2.3e18 =
    // 2.3e19 wrapped int64 before the per-distinct-value DECIMAL fold
    val dir = writeEvents((1 to 4).map(i => ("huge", i, 2.3e16)))
    val out = SparkEntry.queries("q_gini")(spark, dir).collect().head
    assert(out.getLong(1) == 4L)
    assert(out.getDouble(3) == 0.0,
      s"equal-mass gini must be exactly 0: ${out.getDouble(3)}")
  }

  test("q_gini: hand-computed coefficients, with and without ties") {
    // distinct 1,2,3,4 → G = (2·3000 − 5·1000)/(4·1000) = 0.25
    val a = SparkEntry.queries("q_gini")(spark,
      writeEvents(Seq(("d", 1, 1.0), ("d", 2, 2.0), ("d", 3, 3.0),
        ("d", 4, 4.0)))).collect().head
    assert(a.getDouble(3) == 0.25, s"distinct gini: ${a.getDouble(3)}")
    // tied 1,1,2 → s2 = 1·100+2·100+3·200 = 900 (any tie order),
    // G = (1800 − 4·400)/(3·400) = 1/6 — pins the per-distinct-value
    // fold c·m·(2·r0+m+1) ≡ Σ rank·c
    val b = SparkEntry.queries("q_gini")(spark,
      writeEvents(Seq(("t", 1, 1.0), ("t", 2, 1.0), ("t", 3, 2.0))))
      .collect().head
    assert(math.abs(b.getDouble(3) - 1.0 / 6.0) < 1e-15,
      s"tied gini: ${b.getDouble(3)}")
  }

  test("q_percentiles: NaN routes to the top ranks, never bucket 0") {
    // 100 finite values 1..100 + 5 NaN (n = 105). NaN sorts GREATER than
    // everything, so the exact picks are rank 53 → 53.0 (p50), rank 95 →
    // 95.0 (p90), rank 104 → NaN (p99). Pre-fix, floor(NaN*100)→long cast
    // 0 dropped NaN into bucket 0 and every later rank shifted by 5
    // (p50 would read 48.0).
    val rows = (1 to 100).map(i => ("nanny", 1 + (i % 28), i.toDouble)) ++
      (1 to 5).map(_ => ("nanny", 3, Double.NaN))
    val out = SparkEntry.queries("q_percentiles")(spark, writeEvents(rows))
      .collect().head
    assert(out.getDouble(1) == 53.0, s"p50 shifted by NaN rows: $out")
    assert(out.getDouble(2) == 95.0, s"p90 shifted by NaN rows: $out")
    assert(out.getDouble(3).isNaN, s"p99 rank 104 must land on NaN: $out")
  }
}
