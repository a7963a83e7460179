package graft

/** Ad-hoc profiler for the G19 corpus build: times each stage subtree
  * in isolation (eager count) and then the composed job, so composition
  * overhead is visible next to intrinsic stage cost. Run with:
  * `sbt "Test/runMain graft.CorpusProfile /root/testdata/sf0.1"`. */
object CorpusProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // JIT/codegen warmup pass
    operators.Dedup.clusterArtifact(spark, "/root/testdata/sf0.001").count()
    t("quality")(operators.TextAnalysis.textFilter(spark, dir).count())
    t("exact")(operators.Dedup.dedupExact(spark, dir).count())
    t("cluster_artifact")(operators.Dedup.clusterArtifact(spark, dir).count())
    t("keep_best")(operators.Dedup.dedupKeepBest(spark, dir).count())
    t("contamination")(operators.Dedup.dedupContamination(spark, dir).count())
    t("ppl")(operators.TextAnalysis.textPplBucket(spark, dir).count())
    // cumulative chain, replicated from CorpusJob.run without observations
    locally {
      import org.apache.spark.sql.functions._
      val docs = sources.Tables.documents(spark, dir)
        .select("doc_id", "text", "lang", "source")
      val qualityKeep = operators.TextAnalysis.textFilter(spark, dir)
        .filter(col("keep")).select("doc_id")
      val afterQuality = docs.join(qualityKeep, "doc_id")
      val exactKeep = operators.Dedup.dedupExact(spark, dir)
        .select(col("keep_doc_id").as("doc_id"))
      val afterExact = afterQuality.join(exactKeep, "doc_id")
      val nearDupDrops = operators.Dedup.dedupKeepBest(spark, dir)
        .filter(!col("keep")).select("doc_id")
      val afterNearDup = afterExact.join(nearDupDrops, Seq("doc_id"), "left_anti")
      val contaminated = operators.Dedup.dedupContamination(spark, dir)
        .select("doc_id").distinct()
      val afterDecontam = afterNearDup.join(contaminated, Seq("doc_id"), "left_anti")
      val pplTail = operators.TextAnalysis.textPplBucket(spark, dir)
        .filter(col("bucket") === "tail").select("doc_id")
      val afterPpl = afterDecontam.join(pplTail, Seq("doc_id"), "left_anti")
      val afterMix = afterPpl.filter(operators.TextAnalysis.mixKeep)
      val chunks = afterMix
        .select(col("doc_id"), col("source"),
          posexplode(functions.Text.chunks(col("text"), 64, 8)))
      t("chain_afterQuality")(afterQuality.count())
      t("chain_afterExact")(afterExact.count())
      t("chain_afterNearDup")(afterNearDup.count())
      t("chain_afterDecontam")(afterDecontam.count())
      t("chain_afterPpl")(afterPpl.count())
      t("chain_afterMix")(afterMix.count())
      t("chain_chunks")(chunks.count())
      val outw = java.nio.file.Files.createTempDirectory("graft_prof").toString
      t("chain_write")(chunks
        .select(col("doc_id"), col("source"),
          (col("pos") + 1).as("chunk_ix"), col("col").as("chunk"))
        .write.mode("overwrite").partitionBy("source").parquet(outw))
    }
    val out1 = java.nio.file.Files.createTempDirectory("graft_prof").toString
    t("corpus_job_1")(CorpusJob.run(spark, dir, out1).collect())
    val out2 = java.nio.file.Files.createTempDirectory("graft_prof").toString
    t("corpus_job_2")(CorpusJob.run(spark, dir, out2).collect())
  }
}
