package graft

import graft.sources.{KnowledgeFiles, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class KnowledgeFilesSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("export files round-trip through write + read") {
    val out = Files.createTempDirectory("graft_kf").toString
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 20)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
    val rendered = docs.select(
      concat(col("source"), lit("_"), col("doc_id"), lit(".txt")).as("fname"),
      KnowledgeFiles.renderContent(Seq(
        "Channel Name" -> col("source"),
        "Language" -> col("lang"),
        "Empty Field" -> lit("")), col("text")).as("content"),
      col("text"), col("source"))
    val n = KnowledgeFiles.write(rendered, out)
    assert(n == 20)

    val back = KnowledgeFiles.read(spark, out)
    assert(back.count() == 20)
    val joined = back
      .select(col("file"), col("meta"), col("body"))
      .join(rendered.withColumn("fname2", col("fname")),
        col("file") === col("fname2"))
    // body and metadata survive the round trip; empty fields are skipped
    assert(joined.filter(col("body") =!= col("text")).count() == 0)
    assert(joined.filter(element_at(col("meta"), "Channel Name") =!= col("source")).count() == 0)
    assert(joined.filter(map_contains_key(col("meta"), "Empty Field")).count() == 0)
    assert(joined.filter(element_at(col("meta"), "Language").isNull).count() == 0)
  }

  test("a file without a separator yields null body, not a job abort") {
    val out = Files.createTempDirectory("graft_kf_bad")
    Files.write(out.resolve("good.txt"), "K: v\n\n---\n\nbody".getBytes)
    Files.write(out.resolve("bad.txt"), "no separator at all".getBytes)
    val back = KnowledgeFiles.read(spark, out.toString).collect()
      .map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(back("good.txt").contains("body"))
    assert(back("bad.txt").isEmpty)
  }

  test("config resolver prefers secrets over env over defaults") {
    val secrets = Files.createTempDirectory("graft_secrets")
    Files.write(secrets.resolve("graft_chunk_size"), "33".getBytes)
    val env = Map("GRAFT_CHUNK_SIZE" -> "44", "GRAFT_CHUNK_OVERLAP" -> "11")
    val cfg = GraftConfig.load(env, Some(secrets))
    assert(cfg.chunkSize == 33)        // secret wins
    assert(cfg.chunkOverlap == 11)     // env wins over default
    assert(cfg.knowledgeTag == "#KNOWLEDGE") // default
  }

  test("state file degrades to epoch 0 when missing or corrupt") {
    val dir = Files.createTempDirectory("graft_state")
    val f = dir.resolve("state.json").toString
    assert(GraftConfig.loadLastRun(f) == 0L)
    GraftConfig.saveLastRun(f, 1704067798L)
    assert(GraftConfig.loadLastRun(f) == 1704067798L)
    Files.write(java.nio.file.Paths.get(f), "not json".getBytes)
    assert(GraftConfig.loadLastRun(f) == 0L)
  }

  test("comma-list parsing is whitespace-tolerant and drops empties") {
    assert(GraftConfig.parseList(" a, b ,,c ") == Seq("a", "b", "c"))
    assert(GraftConfig.parseList("") == Seq.empty)
    val cfg = GraftConfig.load(
      env = Map("GRAFT_KNOWLEDGE_CHANNELS" -> "general, eng ,ops"))
    assert(cfg.knowledgeChannels == Seq("general", "eng", "ops"))
    assert(cfg.toMap("knowledgeChannels") == "general,eng,ops")
    assert(cfg.toMap("chunkSize") == "20")
  }
}
