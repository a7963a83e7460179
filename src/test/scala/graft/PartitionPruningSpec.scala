package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout pruning: a predicate on the partition column must be
  * satisfied from the directory structure (PartitionFilters), not by
  * scanning data — at 100 TB this is the difference between listing one
  * directory and reading the corpus. Complements BucketingSpec (joins)
  * on the storage-layout side. */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val dir: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events"
    Tables.events(spark, sf)
      .write.partitionBy("event_type").parquet(out)
    out
  }

  test("a partition-column predicate becomes a PartitionFilter, not a data filter") {
    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
      .select("event_id")
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") &&
      scan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(event_type"),
      s"predicate not pushed to partition pruning:\n$scan")
    // the data-filter lists must be EMPTY — no per-row re-check
    val flat = scan.replaceAll("\\s", "")
    assert(flat.contains("DataFilters:[]") && flat.contains("PushedFilters:[]"),
      s"partition predicate leaked into data filters:\n$scan")
  }

  test("pruned read returns exactly the partition's rows") {
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    val pruned = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase").count()
    assert(pruned == expected && pruned > 0)
  }
}
