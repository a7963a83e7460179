package graft

import graft.sources.{KnowledgeFiles, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The DSv2 provider must agree row-for-row with the column-expression
  * reader, prune columns at the scan, and split a directory into
  * balanced multi-file partitions. */
class KbTxtDataSourceSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val dir: String = {
    val out = Files.createTempDirectory("graft_dsv2").toString
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 40)
    KnowledgeFiles.write(docs.select(
      concat(col("source"), lit("_"), col("doc_id"), lit(".txt")).as("fname"),
      KnowledgeFiles.renderContent(Seq(
        "Channel Name" -> col("source"),
        "Language" -> col("lang")), col("text")).as("content")), out)
    Files.write(java.nio.file.Paths.get(out, "bad.txt"),
      "no separator here".getBytes)
    out
  }

  test("DSv2 read matches the expression-based reader row for row") {
    val v2 = spark.read.format("graft-kbtxt").load(dir)
      .select(col("file"), element_at(col("meta"), "Channel Name").as("ch"),
        element_at(col("meta"), "Language").as("lang"), col("body"))
    val v1 = KnowledgeFiles.read(spark, dir)
      .select(col("file"), element_at(col("meta"), "Channel Name").as("ch"),
        element_at(col("meta"), "Language").as("lang"), col("body"))
    assert(v2.count() == 41)
    assert(v2.exceptAll(v1).isEmpty && v1.exceptAll(v2).isEmpty)
  }

  test("missing separator yields a null body through the V2 path too") {
    val bad = spark.read.format("graft-kbtxt").load(dir)
      .filter(col("file") === "bad.txt").select("body").collect()
    assert(bad.length == 1 && bad.head.isNullAt(0))
  }

  test("column pruning reaches the scan") {
    val q = spark.read.format("graft-kbtxt").load(dir).select("file")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema=file"), s"scan not pruned:\n$scan")
    assert(q.count() == 41)
  }

  test("the directory splits into balanced multi-file partitions") {
    val v2 = spark.read.format("graft-kbtxt").load(dir)
    val parts = v2.rdd.getNumPartitions
    assert(parts > 1 && parts <= 32, s"got $parts partitions")
  }

  test("file-name filters prune the file list at planning time") {
    // equality filter → exactly one input partition with one file
    val q = spark.read.format("graft-kbtxt").load(dir)
      .filter(col("file") === "bad.txt")
    assert(q.rdd.getNumPartitions == 1, "file list not pruned to one file")
    assert(q.count() == 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters=[") && plan.contains("bad.txt"),
      s"pushed filter not visible in scan:\n$plan")
    // prefix filter prunes but is also still applied post-scan (residual)
    val pre = spark.read.format("graft-kbtxt").load(dir)
      .filter(col("file").startsWith("src0_"))
    val expected = spark.read.format("graft-kbtxt").load(dir)
      .collect().count(_.getString(0).startsWith("src0_"))
    assert(pre.count() == expected && expected > 0)
    assert(pre.rdd.getNumPartitions < 32)
  }

  test("pruning filters never change results (residual re-evaluation)") {
    // a contains-filter result must equal the unpushed in-memory filter
    val pushed = spark.read.format("graft-kbtxt").load(dir)
      .filter(col("file").contains("_1")).select("file").collect()
      .map(_.getString(0)).sorted
    val plain = spark.read.format("graft-kbtxt").load(dir)
      .select("file").collect().map(_.getString(0))
      .filter(_.contains("_1")).sorted
    assert(pushed.toSeq == plain.toSeq)
  }
}
