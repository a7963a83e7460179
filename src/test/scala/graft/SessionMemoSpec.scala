package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** r15: the single-flight contract the §2.6 rung-build thread pool leans
  * on — concurrent first-callers of one key run ONE build (later callers
  * block on the in-flight promise), distinct keys build independently,
  * a failed build propagates to every waiter and the next caller
  * retries. */
class SessionMemoSpec extends AnyFunSuite {
  import TestSpark.spark

  private def df(n: Int) = {
    import spark.implicits._
    Seq.fill(n)(n).toDF("v")
  }

  test("concurrent same-key callers share one build") {
    val memo = new SessionMemo
    val builds = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[org.apache.spark.sql.DataFrame] {
          override def call(): org.apache.spark.sql.DataFrame = {
            start.await(10, TimeUnit.SECONDS)
            memo.getOrElseUpdate(spark, "same-key") {
              builds.incrementAndGet()
              Thread.sleep(50) // widen the race window
              df(1)
            }
          }
        })
      }
      start.countDown()
      val results = futures.map(_.get(30, TimeUnit.SECONDS))
      assert(builds.get() === 1, "single-flight must run the build once")
      assert(results.forall(_ eq results.head),
        "every caller must receive the same memoized DataFrame")
    } finally pool.shutdown()
  }

  test("distinct keys build independently and serve stable entries") {
    val memo = new SessionMemo
    val a = memo.getOrElseUpdate(spark, "k-a")(df(2))
    val b = memo.getOrElseUpdate(spark, "k-b")(df(3))
    assert(a ne b)
    assert(memo.getOrElseUpdate(spark, "k-a")(fail("must not rebuild")) eq a)
    assert(memo.getOrElseUpdate(spark, "k-b")(fail("must not rebuild")) eq b)
  }

  test("a failed build propagates its own exception and the next caller retries") {
    val memo = new SessionMemo
    val boom = intercept[IllegalStateException] {
      memo.getOrElseUpdate(spark, "flaky")(throw new IllegalStateException("boom"))
    }
    assert(boom.getMessage === "boom")
    // the failure must not poison the key
    val ok = memo.getOrElseUpdate(spark, "flaky")(df(4))
    assert(ok.collect().length === 4)
  }
}
