package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E70 `q_trend`: hand-computed Mann–Kendall values on planted series —
  * a strictly rising 10-day series (S = C(10,2) = 45, tau = 1.0,
  * trending by the exact integer z² inequality), a flat series (S = 0,
  * not trending), and a rank-robustness pin (one huge outlier day moves
  * S by at most n−1, never flips a strong trend). */
class TrendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def write(rows: Seq[(String, Int, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-trend").toString
    rows.map { case (t, day, v) =>
      (t, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), v)
    }.toDF("event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("rising series: S = 45, tau = 1.0, trending; flat series: S = 0") {
    val rows =
      (1 to 10).map(d => ("up", d, d * 10.0)) ++
        (1 to 10).map(d => ("flat", d, 7.0))
    val out = SparkEntry.queries("q_trend")(spark, write(rows))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out("up") == ((10L, 45L, 1.0, true)), s"rising: ${out("up")}")
    // trending check is the exact inequality: 44^2*180000 = 348,480,000
    // > 38416*10*9*25 = 86,436,000
    assert(out("flat")._2 == 0L && !out("flat")._4, s"flat: ${out("flat")}")
  }

  test("rank robustness: one fat-fingered day cannot flip a strong trend") {
    val rows = (1 to 10).map(d =>
      ("up", d, if (d == 5) 1.0e9 else d * 10.0))
    val (_, s, _, trending) = SparkEntry.queries("q_trend")(spark, write(rows))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).head
    // day 5 wins its 4 earlier pairs (+0 change) and loses its 5 later
    // ones (each flips +1 -> -1): S = 45 - 10 = 35, still trending
    assert(s == 35L && trending, s"outlier day broke the trend: S=$s")
  }

  test("tie correction: equal daily means shrink Var and can flip the verdict") {
    // 11 days: days 1-5 tie at mean 50 (one tie group, t = 5, so
    // T = t(t-1)(2t+5) = 300); day 6 = 40; days 7-11 = 80,70,90,100,60
    // (5 inversions). S = 5*(p-q) + W = 5*(5-1) + (5+0) = 25, sAdj = 24.
    // Tie-corrected: 24^2*180000 = 103,680,000 > 38416*(2970-300)
    // = 102,570,720 -> trending. The UNCORRECTED variance would say
    // 103,680,000 < 38416*2970 = 114,095,520 -> not trending; the exact
    // tie term is what flips it.
    val means = Seq(50.0, 50.0, 50.0, 50.0, 50.0, 40.0,
      80.0, 70.0, 90.0, 100.0, 60.0)
    val rows = means.zipWithIndex.map { case (v, i) => ("tied", i + 1, v) }
    val out = SparkEntry.queries("q_trend")(spark, write(rows))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4))).head
    assert(out == ((11L, 25L, true)),
      s"tie-corrected verdict wrong: $out (expected n=11, S=25, trending)")
  }
}
