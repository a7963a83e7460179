package graft

import org.scalatest.funsuite.AnyFunSuite

/** B29's r14 driver fast path must be bit-identical to the distributed
  * greedy loop it short-circuits — same argmax order (mmr desc, id),
  * same IEEE arithmetic, same handling of short shortlists. The gate is
  * data-driven (`graft.mmr.maxLocalRows`); forcing it to 0 runs the
  * distributed loop on the same corpus for a row-for-row compare. */
class MmrParitySpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("ann_mmr driver fast path == forced-distributed loop, row for row") {
    val fast = operators.Similarity.annMmr(s, TestSpark.sf).collect()
    s.conf.set("graft.mmr.maxLocalRows", "0")
    val dist =
      try operators.Similarity.annMmr(s, TestSpark.sf).collect()
      finally s.conf.unset("graft.mmr.maxLocalRows")
    assert(fast.length == dist.length,
      s"row counts differ: fast=${fast.length} dist=${dist.length}")
    fast.zip(dist).foreach { case (f, d) =>
      assert(f == d, s"row mismatch: fast=$f dist=$d")
    }
  }
}
