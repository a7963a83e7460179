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

  test("#EDIT reply routes its parent through the store edit lifecycle; " +
      "re-export replaces the original file") {
    // the reference's process_channel → _handle_edit_flags loop
    // (KnowledgeBot.py:425-536 → 571-611): a thread reply tagged #EDIT
    // makes the job re-fetch the parent's CURRENT text, replace its
    // export file, and swap its chunks in the store. Driven on a
    // controlled dataDir: run 1 ingests the parent; the documents table
    // then changes under it (the "Slack-side edit"); run 2 sees only the
    // new #EDIT reply and must propagate the changed text everywhere.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val data = Files.createTempDirectory("graft_ij_data").toString
    val out = Files.createTempDirectory("graft_ij_out").toString
    // distinct per-message timestamps: the reference fname scheme keys on
    // the message ts, so same-second messages would collide on disk
    val oldTs = java.sql.Timestamp.valueOf("2024-01-15 10:30:00")
    val oldTs2 = java.sql.Timestamp.valueOf("2024-01-15 10:31:00")
    def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long)]): Unit = {
      rows.toDF("event_id", "ts", "user_id")
        .coalesce(1).write.mode("overwrite").parquet(s"$data/events.parquet")
      spark.catalog.refreshByPath(s"$data/events.parquet")
    }
    def writeDocs(doc30: String): Unit = {
      Seq(
        (12L, (0 until 30).map(i => s"noteA$i").mkString(" "), "en", "s1"),
        (30L, doc30, "en", "s1"),
        (35L, (0 until 30).map(i => s"replyB$i").mkString(" "), "en", "s1"))
        .toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$data/documents.parquet")
      spark.catalog.refreshByPath(s"$data/documents.parquet")
    }
    graft.sources.Tables.customer(spark, sf).limit(10)
      .coalesce(1).write.mode("overwrite").parquet(s"$data/customer.parquet")

    // run 1: two old messages (parent 30 among them), no replies
    writeEvents(Seq((30L, oldTs, 3L), (12L, oldTs2, 4L)))
    val origText = (0 until 30).map(i => s"orig$i").mkString(" ")
    writeDocs(origText)
    val (files1, chunks1, _) = IngestJob.run(spark, data, out)
    assert(files1 == 2 && chunks1 > 0, s"run 1: $files1 files, $chunks1 chunks")
    val exports = new java.io.File(s"$out/knowledge").listFiles().map(_.getName)
    val parentFile = exports.find { n =>
      scala.io.Source.fromFile(s"$out/knowledge/$n").mkString.contains("orig0") }
    assert(parentFile.nonEmpty, s"no export carries the parent text: ${exports.toSeq}")

    // the world changes: doc 30's text is edited, and a thread reply
    // tagged #EDIT lands (id 35: %7==0 ⇒ tagged, %10!=0 ⇒ genuine reply,
    // rounds to parent 30)
    val editedText = (0 until 30).map(i => s"edited$i").mkString(" ")
    writeDocs(editedText)
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    writeEvents(Seq((30L, oldTs, 3L), (12L, oldTs2, 4L), (35L, now, 5L)))
    val (files2, chunks2, _) = IngestJob.run(spark, data, out)
    // reply 35 exports + appends as a normal message; parent 30
    // re-exports through the edit path
    assert(files2 == 2, s"run 2 exported $files2 files (reply + re-export)")
    assert(chunks2 > 0)
    // the re-export REPLACED the original file (same fname, new content)
    val after = scala.io.Source.fromFile(s"$out/knowledge/${parentFile.get}").mkString
    assert(after.contains("edited0") && !after.contains("orig0"),
      s"parent export not replaced:\n$after")
    // the store serves the edited chunks only — old text gone, new at rank 1
    spark.catalog.refreshByPath(s"$out/index")
    val c30 = spark.read.parquet(s"$out/index")
      .filter(col("doc_id") === 30L).select("chunk")
      .collect().map(_.getString(0))
    assert(c30.nonEmpty && c30.forall(_.contains("edited")),
      s"stale chunks survived the edit: ${c30.toSeq}")
    assert(!c30.exists(_.contains("orig")), s"old chunk text leaked: ${c30.toSeq}")
    val hits = graft.operators.VectorStore.search(spark, s"$out/index",
      c30.head, k = 3).collect()
    assert(hits.nonEmpty && hits.head.getAs[Long]("doc_id") == 30L,
      s"edited chunk not served at rank 1: ${hits.headOption}")
    // and the reply itself was ingested as a regular message
    val reply35 = spark.read.parquet(s"$out/index")
      .filter(col("doc_id") === 35L).count()
    assert(reply35 > 0, "reply 35 not ingested")
    val doc30 = spark.read.parquet(s"$out/index")
      .filter(col("doc_id") === 30L).count()

    // run 3: no NEW messages — but the #EDIT reply is still inside the
    // look-back window, so the flag sweep re-handles it (the reference
    // re-runs _handle_edit_flags over every fetched message each run);
    // re-handling must be IDEMPOTENT: no duplicate chunks anywhere, the
    // reply is NOT re-appended, store contents unchanged
    val (files3, chunks3, _) = IngestJob.run(spark, data, out)
    assert(files3 == 1 && chunks3 == doc30,
      s"run 3 should re-handle exactly the edit: $files3 files/$chunks3 chunks")
    spark.catalog.refreshByPath(s"$out/index")
    assert(spark.read.parquet(s"$out/index")
      .filter(col("doc_id") === 35L).count() == reply35,
      "look-back re-appended the reply's chunks (duplicates)")
    assert(spark.read.parquet(s"$out/index")
      .filter(col("doc_id") === 30L).count() == doc30,
      "edit re-handling duplicated the parent's chunks")
  }
}
