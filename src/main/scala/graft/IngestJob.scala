package graft

import graft.functions.Text
import graft.operators.VectorStore
import graft.sources.{KnowledgeFiles, Tables}
import org.apache.spark.sql.functions._

/** The end-to-end batch job a reference user runs: the engine-side
  * equivalent of `KnowledgeBot.main` + `VectorDatabase.ingest_documents`
  * (KnowledgeBot.py:668-706) —
  *
  *  1. load persisted incremental state (last_run_timestamp),
  *  2. scan the message stream for rows newer than last_run − look-back,
  *  3. extract `#KNOWLEDGE … #END` blocks, enrich with author/mention
  *     metadata and deterministic keywords/summary,
  *  4. render header+body export files with the reference filename scheme,
  *  5. chunk + embed + LSH-bucket the blocks into a parquet vector index,
  *  6. persist the new state timestamp.
  *
  * Usage: runMain graft.IngestJob <dataDir> <outDir>
  */
object IngestJob {
  def main(args: Array[String]): Unit = {
    val Array(dataDir, outDir) = args.take(2)
    val spark = GraftSession.build("graft-ingest")
    val (nFiles, nChunks, since) = run(spark, dataDir, outDir)
    println(s"""{"files":$nFiles,"chunks":$nChunks,"since":$since}""")
    spark.stop()
  }

  /** One incremental batch; returns (files exported, chunks indexed,
    * previous last-run timestamp). Separated from `main` so tests drive
    * fresh + incremental runs on a shared session. */
  def run(spark: org.apache.spark.sql.SparkSession, dataDir: String,
      outDir: String): (Long, Long, Long) = {
    val cfg = GraftConfig.load()
    val stateFile = s"$outDir/state.json"
    val lastRun = GraftConfig.loadLastRun(stateFile)
    val lookbackS = cfg.threadMaxAgeDays * 86400L
    val startedAt = System.currentTimeMillis() / 1000

    // message stream = events; text payload synthesized deterministically
    // (the test corpus carries no literal #KNOWLEDGE markers)
    val events = Tables.events(spark, dataDir)
    val msgs = events
      .join(broadcast(Tables.documents(spark, dataDir)),
        events("event_id") % 500 === col("doc_id"))
      .filter(unix_timestamp(col("ts")) > lit(lastRun - lookbackS))
      .select(col("event_id"), col("ts"), col("user_id"),
        concat(lit(cfg.knowledgeTag + " "), col("text"),
          lit(" " + cfg.endTag)).as("msg"))

    val users = Tables.customer(spark, dataDir).select(
      (col("c_custkey") - 1).as("uid"), col("c_name"))
    val blocks = msgs
      .select(col("event_id"), col("ts"), col("user_id"),
        posexplode(Text.knowledgeBlocks(col("msg"))))
      .select(col("event_id"), col("ts"), col("user_id"),
        (col("pos") + 1).as("ordinal"), trim(col("col")).as("block"))
      .join(broadcast(users), col("user_id") === col("uid"), "left")
      .withColumn("summary", Text.leadingWords(col("block"), 25))

    val exported = blocks.select(
      concat(lit("events_"), date_format(col("ts"), "yyyyMMdd"), lit("_"),
        expr("unix_micros(ts) div 1000000"), lit("_"),
        lpad(expr("unix_micros(ts) % 1000000"), 6, "0"), lit("_"),
        lpad(col("ordinal"), 2, "0"), lit(".txt")).as("fname"),
      KnowledgeFiles.renderContent(Seq(
        "Channel Name" -> lit("events"),
        "Message Date" -> date_format(col("ts"), "dd MMMM yyyy"),
        "Message Author" -> col("c_name"),
        "Summary" -> col("summary")), col("block")).as("content"))
    val nFiles = KnowledgeFiles.write(exported, s"$outDir/knowledge")

    // store open: replay any delete journal a crashed prior run left, so
    // this batch appends to a consistent index
    if (new java.io.File(s"$outDir/index").isDirectory)
      VectorStore.recover(spark, s"$outDir/index")
    val nChunks = VectorStore.ingest(
      blocks.select(col("event_id").as("doc_id"), col("block").as("text")),
      s"$outDir/index", cfg.chunkSize, cfg.chunkOverlap, mode = "append")

    GraftConfig.saveLastRun(stateFile, startedAt)
    (nFiles, nChunks, lastRun)
  }
}
