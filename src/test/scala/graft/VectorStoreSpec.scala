package graft

import graft.operators.VectorStore
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class VectorStoreSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val indexDir = {
    val dir = Files.createTempDirectory("graft_vs").toString + "/index"
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select("doc_id", "text")
    val n = VectorStore.ingest(docs, dir)
    assert(n > 100, s"expected >1 chunk per doc, got $n")
    dir
  }

  test("index is partitioned by LSH bucket") {
    val buckets = new java.io.File(indexDir).list().filter(_.startsWith("bucket="))
    assert(buckets.length > 1, "expected multiple bucket partitions")
  }

  test("search returns the source chunk for a verbatim query") {
    // query with an exact chunk text → that chunk must rank #1 (self-dot
    // is the max possible inner product of unit vectors)
    val sample = spark.read.parquet(indexDir)
      .filter(col("doc_id") === 3 && col("chunk_ix") === 1)
      .select("chunk").collect().head.getString(0)
    val hits = VectorStore.search(spark, indexDir, sample, k = 3).collect()
    assert(hits.nonEmpty)
    assert(hits.head.getAs[Long]("doc_id") == 3L &&
      hits.head.getAs[Int]("chunk_ix") == 1,
      s"top hit was ${hits.head}")
    assert(hits.head.getAs[Double]("score") > 0.999)
  }

  test("search scans only the probed buckets") {
    val q = VectorStore.search(spark, indexDir, "spark table merge join", k = 2)
    val scan = q.queryExecution.executedPlan.toString
    assert(q.collect().length <= 2)
    // partition filter on the bucket column must reach the file source
    assert(scan.contains("PartitionFilters") || scan.contains("bucket"),
      "expected bucket partition pruning in the plan")
  }
}
