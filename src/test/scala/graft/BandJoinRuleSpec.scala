package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** G28: the injected BandJoinRule must rewrite naive band joins into the
  * bin-decomposed equi-join — losslessly (on/off result equality across
  * strictness/offset shapes), upgrading the physical plan (no
  * BroadcastNestedLoopJoin for a band-only join), exactly once
  * (idempotent under the optimizer's fixpoint batch), and never touching
  * hand-binned queries, one-sided inequalities, or interval-overlap
  * joins. */
class BandJoinRuleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def withRuleOff[T](f: => T): T = {
    spark.conf.set("graft.bandjoin.rewrite", "false")
    try f finally spark.conf.unset("graft.bandjoin.rewrite")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def generateCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case g: Generate => g }.size

  private val l = Seq((1L, 100L), (2L, 205L), (3L, -50L), (4L, 7L), (5L, 999L))
    .toDF("lid", "lx")
  private val r = Seq((10L, 95L), (11L, 101L), (12L, 160L), (13L, 200L),
    (14L, -45L), (15L, -300L), (16L, 7L)).toDF("rid", "ry")

  test("band-only join: BNLJ upgraded to an equi join, same rows") {
    val q = l.join(r, col("lx") >= col("ry") - 10L && col("lx") <= col("ry") + 20L)
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct"),
      s"band join not rewritten:\n$phys")
    assert(phys.contains("__graft_bin"), s"no bin key in plan:\n$phys")
    assert(generateCount(q) == 1)
    val expected = withRuleOff {
      sortedRows(l.join(r,
        col("lx") >= col("ry") - 10L && col("lx") <= col("ry") + 20L))
    }
    assert(sortedRows(q) == expected && expected.nonEmpty)
  }

  test("strict bounds, negative offsets and negative values stay lossless") {
    for ((lo, hi) <- Seq((-100L, -1L), (0L, 0L), (-7L, 13L), (5L, 300L))) {
      def build = l.join(r,
        col("lx") - col("ry") > lit(lo) && col("lx") - col("ry") < lit(hi))
      val got = sortedRows(build)
      val want = withRuleOff(sortedRows(build))
      assert(got == want, s"mismatch at band ($lo, $hi)")
    }
  }

  test("band + equi key on an unrelated column still rewrites") {
    val lk = l.withColumn("k", col("lid") % 2)
    val rk = r.withColumn("k", col("rid") % 2)
    val q = lk.join(rk, lk("k") === rk("k") &&
      col("lx") >= col("ry") - 50L && col("lx") < col("ry") + 50L)
    assert(q.queryExecution.executedPlan.toString.contains("__graft_bin"))
    assert(generateCount(q) == 1, "rewrite must apply exactly once")
    val want = withRuleOff(sortedRows(lk.join(rk, lk("k") === rk("k") &&
      col("lx") >= col("ry") - 50L && col("lx") < col("ry") + 50L)))
    assert(sortedRows(q) == want && want.nonEmpty)
  }

  test("null band operands drop out identically on and off") {
    val ln = Seq((1L, Some(10L)), (2L, None)).toDF("lid", "lx")
    val rn = Seq((5L, Some(12L)), (6L, None)).toDF("rid", "ry")
    def build = ln.join(rn,
      col("lx") >= col("ry") - 5L && col("lx") <= col("ry") + 5L)
    assert(sortedRows(build) == withRuleOff(sortedRows(build)))
    assert(sortedRows(build).size == 1)
  }

  test("outer, semi and anti band joins rewrite losslessly (unmatched rows kept)") {
    // lid=5 (999) matches nothing → left_outer pads it, left_anti keeps it;
    // rid=12 (160) and rid=15 (-300) match nothing → right_outer pads them
    for (jt <- Seq("left_outer", "left_semi", "left_anti", "right_outer")) {
      def build = l.join(r,
        col("lx") >= col("ry") - 10L && col("lx") <= col("ry") + 20L, jt)
      val phys = build.queryExecution.executedPlan.toString
      assert(phys.contains("__graft_bin"), s"$jt not rewritten:\n$phys")
      val got = sortedRows(build)
      val want = withRuleOff(sortedRows(build))
      assert(got == want && want.nonEmpty, s"$jt mismatch")
    }
    // full outer cannot keep both sides un-duplicated: never rewritten
    val fo = l.join(r,
      col("lx") >= col("ry") - 10L && col("lx") <= col("ry") + 20L, "full_outer")
    assert(!fo.queryExecution.executedPlan.toString.contains("__graft_bin"))
    assert(sortedRows(fo) == withRuleOff(sortedRows(fo)))
  }

  test("bands wider than 2^31 stay on the naive plan (overflow guard)") {
    // hi - lo and the bin offsets would risk Long overflow; the rule
    // must decline rather than rewrite into silently-dropped matches
    val wide = 5000000000000000000L
    val q = l.join(r,
      col("lx") >= col("ry") - wide && col("lx") <= col("ry") + wide)
    assert(generateCount(q) == 0, "overflow-prone band was rewritten")
    // every pair matches inside the huge band — and none are dropped
    assert(q.count() == l.count() * r.count())
  }

  test("malformed rewrite conf disables leniently instead of throwing") {
    spark.conf.set("graft.bandjoin.rewrite", "off")
    try {
      val q = l.join(r,
        col("lx") >= col("ry") - 10L && col("lx") <= col("ry") + 20L)
      assert(generateCount(q) == 0, "conf 'off' did not disable the rule")
      assert(q.count() > 0) // and queries still run
    } finally spark.conf.unset("graft.bandjoin.rewrite")
  }

  test("unrecognized rewrite conf token falls back to ENABLED (warned)") {
    // a typo ('flase', 'disable') must not throw inside the optimizer;
    // the documented fallback direction is enabled
    spark.conf.set("graft.bandjoin.rewrite", "flase")
    try {
      val q = l.join(r,
        col("lx") >= col("ry") - 10L && col("lx") <= col("ry") + 20L)
      assert(generateCount(q) > 0,
        "unrecognized token did not fall back to enabled")
    } finally spark.conf.unset("graft.bandjoin.rewrite")
  }

  test("hand-binned q_range_join and q_interval_join are left alone") {
    for (key <- Seq("q_range_join", "q_interval_join")) {
      val plan = SparkEntry.queries(key)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bin"), s"$key was re-binned:\n$plan")
    }
  }

  test("one-sided inequality (as-of shape) is not touched") {
    val q = l.join(r, col("lx") <= col("ry"))
    assert(!q.queryExecution.executedPlan.toString.contains("__graft_bin"))
  }

  test("q_band_join_auto rides the rule: binned exactly once") {
    val q = SparkEntry.queries("q_band_join_auto")(spark, TestSpark.sf)
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("__graft_bin"), s"flagship query not rewritten:\n$phys")
    assert(generateCount(q) == 1)
    val want = withRuleOff(
      sortedRows(SparkEntry.queries("q_band_join_auto")(spark, TestSpark.sf)))
    assert(sortedRows(q) == want && want.nonEmpty)
  }
}
