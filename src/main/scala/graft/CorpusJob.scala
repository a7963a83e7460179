package graft

import graft.functions.Text
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G19: end-to-end corpus curation — the full training-data build a
  * pretraining team runs, composed from this library's oracle-verified
  * operators in their production order:
  *
  *   quality gate (D9) → exact dedup (C1) → near-dup keep-best (C6+C10)
  *   → benchmark decontamination (C7) → perplexity tail drop (D17)
  *   → mixture sampling (D15's exact recipe) → chunking (A10 semantics)
  *   → source-partitioned parquet shards
  *
  * Stage decisions are computed corpus-wide (the artifacts the
  * oracle-checked queries emit) and applied as doc_id joins/anti-joins —
  * exactly how a real pipeline consumes precomputed keep/drop lists. The
  * whole job is deterministic: md5-derived sampling and tie-broken
  * rankings mean a rerun produces bit-identical shards and audit counts.
  *
  * Returns the per-stage audit (stage, docs_remaining) — the artifact a
  * data-governance review asks for first.
  */
object CorpusJob {

  def run(s: SparkSession, dir: String, outDir: String,
      chunkSize: Int = 64, overlap: Int = 8): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select("doc_id", "text", "lang", "source")

    // D9: rule-based quality gate (length → symbols → repetition)
    val qualityKeep = TextAnalysis.textFilter(s, dir)
      .filter(col("keep")).select("doc_id")
    val afterQuality = docs.join(qualityKeep, "doc_id")

    // C1: exact dedup — survivors are each hash's min doc_id
    val exactKeep = Dedup.dedupExact(s, dir)
      .select(col("keep_doc_id").as("doc_id"))
    val afterExact = afterQuality.join(exactKeep, "doc_id")

    // C6+C10: near-dup clusters, keep the best-quality member
    val nearDupDrops = Dedup.dedupKeepBest(s, dir)
      .filter(!col("keep")).select("doc_id")
    val afterNearDup = afterExact.join(nearDupDrops, Seq("doc_id"), "left_anti")

    // C7: drop anything sharing >= 5 shingles with the benchmark set
    val contaminated = Dedup.dedupContamination(s, dir)
      .select("doc_id").distinct()
    val afterDecontam = afterNearDup.join(contaminated, Seq("doc_id"), "left_anti")

    // D17: drop the per-language perplexity tail
    val pplTail = TextAnalysis.textPplBucket(s, dir)
      .filter(col("bucket") === "tail").select("doc_id")
    val afterPpl = afterDecontam.join(pplTail, Seq("doc_id"), "left_anti")

    // D15: per-source mixture rates, the exact audited recipe
    val afterMix = afterPpl.filter(TextAnalysis.mixKeep)

    // A10 chunking semantics -> source-partitioned shards
    val chunks = afterMix
      .select(col("doc_id"), col("source"),
        posexplode(Text.chunks(Text.tokens(col("text")), chunkSize, overlap)))
      .select(col("doc_id"), col("source"),
        (col("pos") + 1).as("chunk_ix"), col("col").as("chunk"))
    chunks.write.mode("overwrite").partitionBy("source").parquet(outDir)
    // a fully-filtered corpus writes no part files, and parquet schema
    // inference on an empty directory throws — count from the plan then
    val nChunks =
      try s.read.parquet(outDir).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }

    Seq(
      ("0_load", docs.count()),
      ("1_quality", afterQuality.count()),
      ("2_exact_dedup", afterExact.count()),
      ("3_near_dedup", afterNearDup.count()),
      ("4_decontam", afterDecontam.count()),
      ("5_ppl_gate", afterPpl.count()),
      ("6_mixture", afterMix.count()),
      ("7_chunks_written", nChunks))
      .toDF("stage", "n")
  }

  /** CLI: CorpusJob <sfDir> <outDir> — prints the audit. */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_corpus").toString)
    val spark = GraftSession.build("graft-corpus")
    run(spark, dir, out).collect()
      .foreach(r => println(f"${r.getString(0)}%-18s ${r.getLong(1)}%8d"))
    spark.stop()
  }
}
