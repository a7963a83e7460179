package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** G6: the end-to-end incremental ingest job — fresh run exports blocks
  * and builds the index; a second run sees the persisted state and
  * (with no newer events) exports nothing. */
class IngestJobSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("fresh run exports files and indexes chunks; incremental run is a no-op") {
    val out = Files.createTempDirectory("graft_ingest").toString
    val (files1, chunks1, since1) = IngestJob.run(spark, sf, out)
    assert(since1 == 0L, "fresh run must start from epoch 0")
    assert(files1 > 0 && chunks1 > 0)
    assert(new java.io.File(s"$out/state.json").exists)
    // index is partitioned by LSH bucket (partition-pruning layout)
    val bucketDirs = new java.io.File(s"$out/index").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty, "index must be bucket-partitioned")

    val (files2, chunks2, since2) = IngestJob.run(spark, sf, out)
    assert(since2 > 0L, "second run must load the persisted timestamp")
    assert(files2 == 0 && chunks2 == 0,
      "no events newer than last run - look-back => nothing to export")
  }
}
