package graft

import graft.operators.{Analytics, Dedup}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-6 performance fixes so a refactor that silently
  * re-derives work goes red instead of just slow:
  *
  *  - E40 PageRank materializes the degree-annotated adjacency ONCE
  *    (Analytics.qPagerank); without the checkpoint every unrolled
  *    iteration re-derives orders⋈lineitem→distinct→union→deg-join
  *    from the parquet scan.
  *  - C6 connectedComponents' driver fast path finishes clustering off
  *    ONE collect from the checkpointed pair list — no further Spark
  *    jobs, and the result is a driver-local relation.
  */
class PerfPinSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  test("E40: q_pagerank's plan reads only the materialized adjacency") {
    val plan = Analytics.qPagerank(s, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // all three iterations + the seed must hang off the checkpointed
    // adjacency (an ExistingRDD scan); a parquet scan in the FINAL plan
    // means an iteration re-derives the edge pipeline from the source
    assert(!plan.contains("FileScan") && !plan.contains("BatchScan"),
      s"pagerank plan re-reads parquet instead of the checkpoint:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"pagerank plan lost the checkpointed adjacency scan:\n$plan")
  }

  /** Runs `body` inside a fresh job group and returns (result, #jobs the
    * group started). Polls until the async listener bus goes quiet so the
    * count is complete; scoping by group keeps concurrent suites out.
    */
  private def countJobs[T](body: => T): (T, Int) = {
    val group = s"perf-pin-${java.util.UUID.randomUUID()}"
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (group == j.properties.getProperty("spark.jobGroup.id"))
          jobs.incrementAndGet()
    }
    s.sparkContext.addSparkListener(listener)
    try {
      s.sparkContext.setJobGroup(group, "perf pin", interruptOnCancel = false)
      val out = try body finally s.sparkContext.clearJobGroup()
      // listener bus is async: wait until the count is stable
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) {
        val c = jobs.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
        Thread.sleep(100); waited += 1
      }
      (out, jobs.get())
    } finally s.sparkContext.removeSparkListener(listener)
  }

  // chain + clique: small enough for the driver gate, multi-round if
  // propagated
  private def pairs: DataFrame =
    ((0L until 30L).map(i => (i + 1, i)) ++ Seq((100L, 101L), (101L, 102L),
      (100L, 102L))).toDF("doc_a", "doc_b")

  test("C6: the driver fast path runs no Spark jobs past the pairs checkpoint") {
    val (df, buildJobs) = countJobs(Dedup.connectedComponents(s, pairs))
    // checkpoint + gate count (AQE runs it as two jobs: shuffle-stage
    // materialization + result) + the single collect — nothing else; the
    // full hook→contract→finish pipeline needs many more (see the
    // differential below), so a regression that re-enters it goes red
    assert(buildJobs <= 4,
      s"driver fast path ran $buildJobs jobs (expected ≤ 4: checkpoint, gate count, collect)")
    // the result is driver-local: consuming it distributes nothing
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"fast-path result is not a local relation:\n$plan")
    val (rows, consumeJobs) = countJobs(df.collect())
    assert(rows.length == 34 && consumeJobs == 0,
      s"collecting the fast-path result launched $consumeJobs jobs")
  }

  test("C6: the job counter itself detects the distributed pipeline") {
    // differential guard: if countJobs under-counted (listener race, group
    // not propagated), this forced-distributed run would ALSO come in ≤ 4
    // and the pin above would be vacuous
    s.conf.set("graft.cc.maxLocalEdges", "0")
    val (df, buildJobs) = try countJobs(Dedup.connectedComponents(s, pairs))
    finally s.conf.unset("graft.cc.maxLocalEdges")
    assert(df.collect().length == 34)
    assert(buildJobs > 4,
      s"distributed pipeline only showed $buildJobs jobs — counter is blind")
  }
}
