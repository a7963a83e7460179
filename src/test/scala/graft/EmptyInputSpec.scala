package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Every declared operator must evaluate cleanly on EMPTY tables (schema
  * only, zero rows) — the first day of a new deployment, a fully-filtered
  * partition, an idle stream. Operators that throw on empty input
  * (sequence(0,-1)-style edges, head() on an empty build side) take down
  * whole pipeline runs at 100 TB, where some partition is always empty. */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name evaluates on empty tables") {
      val df = fn(spark, emptyDir)
      assert(df.count() == 0, s"$name returned rows from empty input")
    }
  }

  test("CorpusJob runs on empty tables: zero counts, no crash") {
    val out = Files.createTempDirectory("graft_cj_empty").toString
    val a = CorpusJob.run(spark, emptyDir, out).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a.values.forall(_ == 0L), s"expected all-zero audit: $a")
  }
}
