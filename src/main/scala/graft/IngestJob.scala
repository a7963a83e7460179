package graft

import graft.functions.Text
import graft.operators.VectorStore
import graft.sources.{KnowledgeFiles, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end batch job a reference user runs: the engine-side
  * equivalent of `KnowledgeBot.main` + `VectorDatabase.ingest_documents`
  * (KnowledgeBot.py:668-706) —
  *
  *  1. load persisted incremental state (last_run_timestamp),
  *  2. scan the message stream for rows STRICTLY newer than last_run
  *     (the reference's reply filter, KnowledgeBot.py:466-474) — the
  *     look-back widens only the edit-flag sweep,
  *  3. resolve #EDIT-tagged thread replies (over the full look-back
  *     window, re-handled idempotently like the reference's per-run
  *     _handle_edit_flags sweep) to their parent messages and
  *     route those through the store's maintained-index edit lifecycle
  *     (the reference's `process_channel` → `_handle_edit_flags` loop,
  *     KnowledgeBot.py:425-536 → 571-611 — wired end-to-end in r11),
  *  4. extract `#KNOWLEDGE … #END` blocks, enrich with author/mention
  *     metadata and deterministic keywords/summary,
  *  5. render header+body export files with the reference filename scheme
  *     (an edited parent re-renders to the SAME fname — the rewrite
  *     replaces the original export, as the reference's re-export does),
  *  6. chunk + embed + LSH-bucket the blocks into a parquet vector index
  *     (new messages append; edited parents go through
  *     [[VectorStore.edit]] = delete + delete-splice + append +
  *     insert-splice, so a graph sidecar stays rebuild-equal),
  *  7. persist the new state timestamp.
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
    * fresh + edit + incremental runs on a shared session. */
  def run(spark: org.apache.spark.sql.SparkSession, dataDir: String,
      outDir: String): (Long, Long, Long) = {
    val cfg = GraftConfig.load()
    val stateFile = s"$outDir/state.json"
    val indexDir = s"$outDir/index"
    val lastRun = GraftConfig.loadLastRun(stateFile)
    val lookbackS = cfg.threadMaxAgeDays * 86400L
    val startedAt = System.currentTimeMillis() / 1000

    val events = Tables.events(spark, dataDir)
    val users = Tables.customer(spark, dataDir).select(
      (col("c_custkey") - 1).as("uid"), col("c_name"))

    // message stream = events; text payload synthesized deterministically
    // (the test corpus carries no literal #KNOWLEDGE markers); shared by
    // the window batch and the edit-parent re-derivation — the latter is
    // how the reference "re-fetches the parent's CURRENT text" at edit
    // time (a changed documents row flows into the re-export)
    def blocksOf(ev: DataFrame): DataFrame = {
      val msgs = ev
        .join(broadcast(Tables.documents(spark, dataDir)),
          ev("event_id") % 500 === col("doc_id"))
        .select(col("event_id"), col("ts"), col("user_id"),
          concat(lit(cfg.knowledgeTag + " "), col("text"),
            lit(" " + cfg.endTag)).as("msg"))
      msgs
        .select(col("event_id"), col("ts"), col("user_id"),
          posexplode(Text.knowledgeBlocks(col("msg"))))
        .select(col("event_id"), col("ts"), col("user_id"),
          (col("pos") + 1).as("ordinal"), trim(col("col")).as("block"))
        .join(broadcast(users), col("user_id") === col("uid"), "left")
        .withColumn("summary", Text.leadingWords(col("block"), 25))
    }

    def renderExport(blocks: DataFrame): DataFrame = blocks.select(
      concat(lit("events_"), date_format(col("ts"), "yyyyMMdd"), lit("_"),
        expr("unix_micros(ts) div 1000000"), lit("_"),
        lpad(expr("unix_micros(ts) % 1000000"), 6, "0"), lit("_"),
        lpad(col("ordinal"), 2, "0"), lit(".txt")).as("fname"),
      KnowledgeFiles.renderContent(Seq(
        "Channel Name" -> lit("events"),
        "Message Date" -> date_format(col("ts"), "dd MMMM yyyy"),
        "Message Author" -> col("c_name"),
        "Summary" -> col("summary")), col("block")).as("content"))

    // new-message window: STRICTLY newer than last run — the reference
    // filters thread messages by `ts > last_run_timestamp` exactly
    // (KnowledgeBot.py:466-474), so a message is exported and ingested
    // once. (The look-back widens only the EDIT-flag sweep below; using
    // it here would re-append every recent message on every run.)
    val winEv = events
      .filter(unix_timestamp(col("ts")) > lit(lastRun))
      .select(col("event_id"), col("ts"), col("user_id"))

    // #EDIT resolution (the A14 rule, kb_edit_resolve): a tag counts only
    // (volume bound: the resolved parent set is human-generated edit
    // requests per window — the reference handles them one reply at a
    // time — so the collected Seq and the isInCollection literals stay
    // small; a pathological machine-generated flood should be chunked
    // into multiple runs, not widened here)
    // in a genuine thread REPLY (root id = event_id rounded to 10, tag
    // when event_id % 7 == 0), each resolving to its parent message —
    // which must itself exist in the stream. The sweep spans the full
    // look-back window, not just the new batch: the reference re-runs
    // _handle_edit_flags over every fetched message each run
    // (KnowledgeBot.py:446-458) — re-handling is idempotent because the
    // edit lifecycle is delete-then-reingest of the parent's CURRENT
    // text. The resolved set is bounded by the window's reply count (the
    // reference's per-channel edit list), so collecting it is the
    // bounded-sidecar discipline; the parent re-read below is an
    // isInCollection filter the scan pushes down, never a full-stream
    // join.
    val parentIds = events
      .filter(unix_timestamp(col("ts")) > lit(lastRun - lookbackS))
      .filter(pmod(col("event_id"), lit(7)) === 0 &&
        pmod(col("event_id"), lit(10)) =!= 0)
      .select((col("event_id") - pmod(col("event_id"), lit(10)))
        .as("parent_id"))
      .distinct()
      .join(events.select(col("event_id").as("parent_id")),
        Seq("parent_id"), "left_semi")
      .collect().map(_.getLong(0)).toSeq.sorted

    // new-message batch: everything in the window EXCEPT resolved edit
    // parents — those reprocess through the edit lifecycle instead of a
    // plain append (processing both ways would double-ingest them)
    val newEv =
      if (parentIds.isEmpty) winEv
      else winEv.filter(!col("event_id").isInCollection(parentIds))
    val blocks = blocksOf(newEv)
    val nFiles = KnowledgeFiles.write(renderExport(blocks), s"$outDir/knowledge")

    // store open: replay any delete journal a crashed prior run left, so
    // this batch appends to a consistent index
    if (new java.io.File(indexDir).isDirectory)
      VectorStore.recover(spark, indexDir)
    val nChunks = VectorStore.ingest(
      blocks.select(col("event_id").as("doc_id"), col("block").as("text")),
      indexDir, cfg.chunkSize, cfg.chunkOverlap, mode = "append")

    // edit lifecycle: re-derive each resolved parent's CURRENT content,
    // re-export it (same fname ⇒ the file replaces the original), and
    // swap its chunks through the maintained-index edit — delete +
    // delete-splice + append + insert-splice, every frozen sidecar
    // reused. A parent never ingested before (or a still-absent store)
    // degenerates to a plain append, which is what edit() does when
    // delete finds no victims.
    var editFiles = 0L
    var editChunks = 0L
    if (parentIds.nonEmpty) {
      val pBlocks = blocksOf(
        events.filter(col("event_id").isInCollection(parentIds))
          .select(col("event_id"), col("ts"), col("user_id")))
      editFiles = KnowledgeFiles.write(renderExport(pBlocks),
        s"$outDir/knowledge")
      val pDocs = pBlocks.select(col("event_id").as("doc_id"),
        col("block").as("text"))
      editChunks =
        if (new java.io.File(indexDir).isDirectory)
          VectorStore.edit(spark, indexDir, parentIds, pDocs,
            cfg.chunkSize, cfg.chunkOverlap)._2
        else // fresh store: nothing to edit, the parents simply ingest
          VectorStore.ingest(pDocs, indexDir, cfg.chunkSize,
            cfg.chunkOverlap, mode = "append")
    }

    GraftConfig.saveLastRun(stateFile, startedAt)
    (nFiles + editFiles, nChunks + editChunks, lastRun)
  }
}
