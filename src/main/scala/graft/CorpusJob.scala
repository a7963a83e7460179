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
  *   → mixture sampling (D15's exact recipe) → leakage-safe
  *   train/val/test assignment (D29's family rule) → chunking (A10
  *   semantics) → source-partitioned parquet shards
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
    import org.apache.spark.sql.Observation
    import s.implicits._
    // Stage counts ride the SINGLE write action via the Observation API:
    // a per-stage count() would re-run the whole upstream pipeline once
    // per stage (the near-dup keep-list alone is a clustering job), 8×
    // the work for the same numbers.
    val obs = Seq("0_load", "1_quality", "2_exact_dedup", "3_near_dedup",
      "4_decontam", "5_ppl_gate", "6_mixture").map(n => n -> new Observation(n))
    def observed(df: DataFrame, stage: Int): DataFrame =
      df.observe(obs(stage)._2, count(lit(1)).as("n"))

    val docs = observed(Tables.documents(s, dir)
      .select("doc_id", "text", "lang", "source"), 0)

    // D9: rule-based quality gate (length → symbols → repetition)
    val qualityKeep = TextAnalysis.textFilter(s, dir)
      .filter(col("keep")).select("doc_id")
    val afterQuality = observed(docs.join(qualityKeep, "doc_id"), 1)

    // C1: exact dedup — survivors are each hash's min doc_id
    val exactKeep = Dedup.dedupExact(s, dir)
      .select(col("keep_doc_id").as("doc_id"))
    val afterExact = observed(afterQuality.join(exactKeep, "doc_id"), 2)

    // C6+C10: near-dup clusters, keep the best-quality member
    val nearDupDrops = Dedup.dedupKeepBest(s, dir)
      .filter(!col("keep")).select("doc_id")
    val afterNearDup = observed(
      afterExact.join(nearDupDrops, Seq("doc_id"), "left_anti"), 3)

    // C7: drop anything sharing >= 5 shingles with the benchmark set
    val contaminated = Dedup.dedupContamination(s, dir)
      .select("doc_id").distinct()
    val afterDecontam = observed(
      afterNearDup.join(contaminated, Seq("doc_id"), "left_anti"), 4)

    // D17: drop the per-language perplexity tail. The bucket table is
    // computed ONCE per job run and persisted — the frozen-threshold
    // sidecar below reads it again, and without the persist each
    // consumer re-derived the full corpus LM + scoring pass (r14; this
    // is within-invocation reuse, not cross-run caching — a rerun still
    // recomputes from parquet).
    val pplBuckets = TextAnalysis.textPplBucket(s, dir).persist()
    val pplTail = pplBuckets
      .filter(col("bucket") === "tail").select("doc_id")
    val afterPpl = observed(
      afterDecontam.join(pplTail, Seq("doc_id"), "left_anti"), 5)

    // D15: per-source mixture rates, the exact audited recipe
    val afterMix = observed(afterPpl.filter(TextAnalysis.mixKeep), 6)

    // D29 composed: leakage-safe train/val/test assignment rides the
    // shards. The family key is a pure per-row function of the text, so
    // this stage adds ZERO shuffle — and near-dup family members land in
    // one split by construction, closing the leak the C7 stage doesn't
    // cover: train→eval contamination through the split boundary itself.
    val famH = graft.functions.Hashing.h60p(
      md5(substring(col("text"), 1, 60))) % 100
    val withSplit = afterMix.withColumn("split",
      when(famH < 80, "train").when(famH < 90, "val").otherwise("test"))

    // A10 chunking semantics -> source-partitioned shards
    val chunks = withSplit
      .select(col("doc_id"), col("source"), col("split"),
        posexplode(Text.chunks(col("text"), chunkSize, overlap)))
      .select(col("doc_id"), col("source"), col("split"),
        (col("pos") + 1).as("chunk_ix"), col("col").as("chunk"))
    // doc-contiguous file layout (range partition on doc_id) so the G34
    // zone-map sidecar written below prunes files for doc-range reads —
    // the incremental-consumer pattern: re-reading one delivery window's
    // docs touches only its files, not the whole shard tree.
    // The eager localCheckpoint is LOAD-BEARING for the audit: a range
    // partitioner first runs a boundary-SAMPLING job over its child, and
    // Observation metrics latch onto whichever action completes first —
    // the sample pass would report sampled (wrong) stage counts. The
    // checkpoint is a full-data action (exact counts) and freezes the
    // lineage, so the sampling below re-reads blocks, not the pipeline.
    // It does materialize the chunk set once in executor storage; the
    // 100 TB spelling of the same contract is write-once + out-of-band
    // clustering compaction (a table format's OPTIMIZE ZORDER), with the
    // audit counts riding the first write — one materialization either
    // way, this one keeps the job single-pass and self-contained.
    val chunksStable = chunks.localCheckpoint(true)
    chunksStable.repartitionByRange(8, col("doc_id"))
      .write.mode("overwrite").partitionBy("source").parquet(outDir)
    // a fully-filtered corpus writes no part files, and parquet schema
    // inference on an empty directory throws — count from the plan then
    val nChunks =
      try s.read.parquet(outDir).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }

    // Per-shard manifest — (source, n_chunks, n_docs, content_hash): the
    // integrity artifact an incremental consumer checks before trusting a
    // shard. content_hash is an order-independent exact-int64 SUM of
    // per-row MOD-P hashes (h60p, ≤ ~1e9 each — a raw h60 sum would
    // overflow Spark 4's ANSI-checked long addition once a source holds
    // a few dozen chunks; the r9 append spec caught exactly that), so it
    // is invariant to partitioning and task order, and a rerun of this
    // deterministic job reproduces it bit-for-bit (spec-checked).
    // Written under an underscore dir, which Spark's parquet reader
    // ignores — shard reads stay untouched.
    if (nChunks > 0) {
      s.read.parquet(outDir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct("doc_id").as("n_docs"),
          sum(graft.functions.Hashing.h60p(concat_ws("\u0001",
            col("doc_id"), col("chunk_ix"), md5(col("chunk")))))
            .as("content_hash"))
        .write.mode("overwrite").parquet(s"$outDir/_graft_manifest")
    }

    // G29 composed: per-source KMV content sketches → pairwise overlap
    // estimates over the INPUT corpus (exact-content hashes, BEFORE any
    // dedup ran) — the redundancy-budget audit a curation review reads
    // next to the stage counts: how much identical content two sources
    // share predicts what cross-source dedup will remove. Bounded work:
    // one sketch aggregation (≤ k longs per source) + pair arithmetic
    // over the sketch rows only. Fresh scan, not `docs` — an Observation
    // node is tied to the job's single write action.
    operators.Sketches.kmvOverlap(
      Tables.documents(s, dir).select(col("source"), col("text"))
        .groupBy("source")
        .agg(call_function("graft_kmv",
          graft.functions.Hashing.h60(md5(col("text"))),
          lit(operators.Sketches.KmvK)).as("kmv")),
      "source", operators.Sketches.KmvK)
      .withColumnRenamed("key_a", "source_a")
      .withColumnRenamed("key_b", "source_b")
      .write.mode("overwrite").parquet(s"$outDir/_graft_overlap")

    // G34 composed: the doc_id zone-map sidecar over the range-clustered
    // shards — ZoneMaps.planFiles/readRange then serve doc-range reads
    // touching only overlapping files (underscore dir: invisible to
    // plain shard reads, like the manifest)
    if (nChunks > 0)
      graft.sources.ZoneMaps.writeSidecar(s, outDir, "doc_id")

    // Standing-state sidecars for the INCREMENTAL path ([[append]]): the
    // artifacts a production pipeline freezes so later batches face the
    // same gates without rescanning the corpus. All live under a `_` dir
    // (invisible to shard reads):
    //  - seen content hashes of EVERY input doc (exact dedup across
    //    batches — a new copy of a previously-dropped dup must drop too);
    //  - MinHash band rows of the ADMITTED docs (the F21 convention: the
    //    near-dup screen side grows with admissions);
    //  - the corpus bigram-count LM and the per-language avg_freq floor
    //    the D17 tail gate implied (batches score against the FROZEN LM —
    //    thresholds don't drift batch-to-batch);
    //  - the eval suite's shingle sets (r10): decontamination's benchmark
    //    side, frozen HERE so appends face the exact suite this build
    //    faced with no corpus-dir dependence left at append time.
    val stateDir = s"$outDir/_graft_state"
    Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(md5(col("text")).as("content_hash")).distinct()
      .write.mode("overwrite").parquet(s"$stateDir/seen.parquet")
    import s.implicits._
    Dedup.benchShingleSets(s, dir)
      .toDF("bench_id", "shs").coalesce(1)
      .write.mode("overwrite").parquet(s"$stateDir/eval.parquet")
    // admitted ids come from the WRITTEN shards, not `withSplit` — the
    // funnel plan carries Observation nodes that already latched onto
    // the shard write, and re-running it would both redo the clustering
    // work and touch observed subtrees with a second action
    if (nChunks > 0) {
      val admittedIds = s.read.parquet(outDir).select("doc_id").distinct()
      Dedup.bandRows(Tables.documents(s, dir).join(admittedIds, "doc_id")
          .select("doc_id", "text"))
        .write.mode("overwrite").parquet(s"$stateDir/bands.parquet")
      // D32 composed: the training-export address book over the shards
      writeShuffleSidecar(s, outDir)
    }
    // The standing bigram LM lands RANGE-CLUSTERED on the bigram's 60-bit
    // hash with a G34 zone-map sidecar: [[append]]'s frozen-LM gate then
    // reads only the files whose hash zone holds one of the batch's own
    // bigrams — a bounded probe against a table that grows with the
    // corpus (file count scales with LM rows via graft.corpus.lmRowsPerFile,
    // so per-file bytes stay bounded and kept-files ≈ batch vocabulary,
    // flat in standing-LM size). The one extra cost here is an LM-sized
    // count to size the file tree — cheap next to the bigram aggregation
    // that precedes it (a table format's target-file-size would replace
    // both at a real deployment).
    val lmCounts = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(explode(call_function("graft_word_bigrams", col("text")))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .withColumn("bh", graft.functions.Hashing.h60(col("bigram")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowsPerFile = s.conf.getOption("graft.corpus.lmRowsPerFile")
      .map(_.toLong).getOrElse(1L << 18)
    val nLmFiles = math.max(1L, (lmCounts.count() + rowsPerFile - 1) / rowsPerFile)
      .min(1L << 20).toInt
    graft.sources.ZoneMaps.writeClustered(s, lmCounts,
      s"$stateDir/lm.parquet", "bh", nLmFiles)
    lmCounts.unpersist()
    pplBuckets
      .filter(col("bucket") =!= "tail")
      .groupBy("lang").agg(min("avg_freq").as("min_keep_freq"))
      .write.mode("overwrite").parquet(s"$stateDir/ppl.parquet")
    pplBuckets.unpersist()

    // split audit rows from the written shards (fresh scan — bounded:
    // one 3-group aggregate); absent splits read as zero
    val splitCounts: Seq[(String, Long)] =
      if (nChunks == 0) Nil
      else {
        val got = s.read.parquet(outDir).groupBy("split")
          .agg(countDistinct("doc_id").as("n")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        Seq("train", "val", "test").map(sp =>
          s"8_${sp}_docs" -> got.getOrElse(sp, 0L))
      }

    // a zero-task action (fully-empty corpus) collects no observation
    // metrics at all — read absent as zero
    (obs.map { case (n, o) =>
      (n, o.get.get("n").map(_.asInstanceOf[Long]).getOrElse(0L)) } ++
      (("7_chunks_written", nChunks) +: splitCounts))
      .toDF("stage", "n")
  }

  /** G40: incremental corpus append — curate ONE new batch of documents
    * against the STANDING corpus state (the sidecars [[run]] froze) and
    * extend the shards, without rescanning the standing corpus:
    *
    *   D9 gate (same verdict expressions) → exact dedup vs the seen-hash
    *   state + intra-batch min-id → near-dup screen vs the standing band
    *   index (standing corpus wins) + intra-batch first-id screen (the
    *   F20 arrival rule) → decontamination vs the FROZEN eval-suite
    *   sidecar (r10: run() persists the benchmark shingle sets, so a
    *   batch faces the exact suite the standing corpus faced — append
    *   takes no corpus-dir argument at all) → FROZEN-LM perplexity floor
    *   (batches score against run()'s bigram counts and per-language
    *   thresholds — gates don't drift batch-to-batch) → the identical
    *   mixture recipe and leakage-safe split (pure per-row functions) →
    *   chunk → shards APPEND.
    *
    * After the write: the G34 zone-map sidecar refreshes incrementally
    * (only the batch's files are scanned), the manifest recomputes
    * exactly, the seen-hash state gains EVERY batch input's hash (a
    * future copy of a doc this batch dropped must drop too), and the
    * band index gains the ADMITTED docs' rows (F21: later batches screen
    * against earlier admissions). Each batch is one bounded job whose
    * cost tracks the batch, not the corpus — the lakehouse-ingest
    * spelling of the F14–F23 streaming admission stack. Measured flat
    * across a 100× standing-corpus span AND a 100× standing-LM span
    * (bench/append_r10.json): the frozen-LM join serves through run()'s
    * hash-range-clustered LM layout + zone-map sidecar, reading only the
    * files whose hash zone holds one of the batch's own bigrams — kept
    * files ≤ min(LM files, batch vocabulary), the r9 verdict's one
    * remaining O(standing-corpus) touch, closed.
    *
    * Returns the same (stage, n) audit shape as [[run]]; counts here are
    * plain counts over checkpointed batch-sized steps (the Observation
    * trick exists to avoid re-running a CORPUS-sized funnel — a batch
    * re-count is cheap and exact). */
  def append(s: SparkSession, batch: DataFrame, outDir: String,
      chunkSize: Int = 64, overlap: Int = 8): DataFrame = {
    import graft.streaming.Streams
    import s.implicits._
    val stateDir = s"$outDir/_graft_state"
    def state(name: String) = s"$stateDir/$name"
    // standing-state existence goes through the Hadoop FileSystem API
    // (like VectorStore.ingest): java.io.File would report every
    // hdfs:///s3a:// state path as missing even after run() wrote it
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    def stateExists(name: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(state(name)))
    require(stateExists("seen.parquet"),
      s"append needs the standing state run() writes under $stateDir")

    val b0 = batch.select("doc_id", "text", "lang", "source")
      .localCheckpoint(true)

    // D9 — the exact gate the standing corpus was built with
    val qualityKeep = TextAnalysis.filterVerdict(b0)
      .filter(col("keep")).select("doc_id")
    val afterQuality = b0.join(qualityKeep, "doc_id").localCheckpoint(true)

    // exact dedup: cross-batch vs the seen-hash state, then intra-batch
    // min-id per hash (the C1 rule applied batch-locally)
    val seen = s.read.parquet(state("seen.parquet"))
    val hashed = afterQuality.withColumn("content_hash", md5(col("text")))
    val crossNew = hashed.join(seen, Seq("content_hash"), "left_anti")
    val intraKeep = crossNew.groupBy("content_hash")
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val afterExact = crossNew.join(intraKeep, Seq("doc_id"))
      .drop("content_hash").localCheckpoint(true)

    // near-dup: standing corpus wins; within the batch the first id wins
    // (the F20 arrival rule — cross-batch "keep best" would need the
    // standing docs rescored, exactly what an append must not do)
    val asDocs = afterExact.select("doc_id", "text")
    val bandsExist = stateExists("bands.parquet")
    val dupsVsState =
      if (!bandsExist) asDocs.select("doc_id").limit(0)
      else Streams.nearDupScreen(asDocs, s.read.parquet(state("bands.parquet")))
        .select("doc_id")
    val dupsIntra = Streams.nearDupScreen(asDocs, Dedup.bandRows(asDocs))
      .filter(col("idx_id") < col("doc_id"))
      .select("doc_id")
    val afterNearDup = afterExact.join(
      dupsVsState.union(dupsIntra).distinct(), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    // C7 vs the FROZEN eval-suite sidecar (r10): run() persisted the
    // benchmark docs' shingle sets, so a batch decontaminates against
    // the exact suite the standing corpus faced — no corpus-dir read,
    // no drift if the source dir later changes or vanishes
    require(stateExists("eval.parquet"),
      s"append needs run()'s frozen eval-suite sidecar under $stateDir " +
        "(a standing state from an older build must be refreshed by run())")
    val benchSets = s.read.parquet(state("eval.parquet"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    val probe = afterNearDup.select(col("doc_id"),
      call_function("graft_shingle_hashes", col("text")).as("shs"))
    val contaminated = Dedup.contaminationAgainst(s, benchSets, probe)
      .select("doc_id").distinct()
    val afterDecontam = afterNearDup
      .join(contaminated, Seq("doc_id"), "left_anti").localCheckpoint(true)

    // frozen-LM perplexity floor: batch bigrams score against run()'s
    // counts (unseen bigram = count 0, the OOV-is-rare convention); a
    // language with no standing floor passes (nothing to compare to).
    // The standing table is NOT scanned whole: run() lands it
    // range-clustered on the bigram hash with a zone-map sidecar, so the
    // probe reads only the files whose hash zone holds one of THIS
    // batch's bigrams — kept files ≤ min(LM files, batch vocabulary),
    // flat in standing-LM size, closing append's last O(corpus) touch.
    // A state written before the sidecar existed full-scans as before.
    val batchBigrams = afterDecontam
      .select(col("doc_id"),
        explode(call_function("graft_word_bigrams", col("text"))).as("bigram"))
      .localCheckpoint(true)
    val lmPath = state("lm.parquet")
    val lm =
      if (stateExists("lm.parquet/_graft_zonemap"))
        graft.sources.ZoneMaps.readForKeys(s, lmPath,
          batchBigrams.select(graft.functions.Hashing.h60(col("bigram"))))
          .select("bigram", "cnt")
      else s.read.parquet(lmPath).select("bigram", "cnt")
    val scores = batchBigrams
      .join(lm, Seq("bigram"), "left")
      .groupBy("doc_id")
      .agg((sum(coalesce(col("cnt"), lit(0L))).cast("double")
        / count(lit(1))).as("avg_freq"))
    val pplDrops = afterDecontam.select("doc_id", "lang")
      .join(scores, "doc_id")
      .join(s.read.parquet(state("ppl.parquet")), Seq("lang"))
      .filter(col("avg_freq") < col("min_keep_freq"))
      .select("doc_id")
    val afterPpl = afterDecontam.join(pplDrops, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    // identical mixture recipe + leakage-safe split (pure per-row)
    val famH = graft.functions.Hashing.h60p(
      md5(substring(col("text"), 1, 60))) % 100
    val withSplit = afterPpl.filter(TextAnalysis.mixKeep)
      .withColumn("split",
        when(famH < 80, "train").when(famH < 90, "val").otherwise("test"))
      .localCheckpoint(true)

    val chunks = withSplit
      .select(col("doc_id"), col("source"), col("split"),
        posexplode(Text.chunks(col("text"), chunkSize, overlap)))
      .select(col("doc_id"), col("source"), col("split"),
        (col("pos") + 1).as("chunk_ix"), col("col").as("chunk"))
      .localCheckpoint(true)
    val nChunks = chunks.count()
    if (nChunks > 0) {
      // batch-local doc-range clustering: the appended files stay
      // doc-contiguous, so the incremental sidecar refresh below keeps
      // doc-range reads prunable across the whole grown shard tree
      chunks.repartitionByRange(2, col("doc_id"))
        .write.mode("append").partitionBy("source").parquet(outDir)
      graft.sources.ZoneMaps.appendSidecar(s, outDir, "doc_id")
      // manifest: exact recompute over the grown shards (O(shards) scan,
      // same arithmetic as run() — order-independent, rerun-stable)
      s.catalog.refreshByPath(outDir)
      s.read.parquet(outDir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct("doc_id").as("n_docs"),
          sum(graft.functions.Hashing.h60p(concat_ws("\u0001",
            col("doc_id"), col("chunk_ix"), md5(col("chunk")))))
            .as("content_hash"))
        .write.mode("overwrite").parquet(s"$outDir/_graft_manifest")
    }
    // state: EVERY batch input's hash joins `seen` (dropped docs too);
    // the delta is checkpointed so the append never races its own read
    val seenDelta = b0.filter(col("text").isNotNull)
      .select(md5(col("text")).as("content_hash")).distinct()
      .join(seen, Seq("content_hash"), "left_anti")
      .localCheckpoint(true)
    if (!seenDelta.isEmpty)
      seenDelta.write.mode("append").parquet(state("seen.parquet"))
    // band index grows by the ADMITTED docs (F21)
    if (nChunks > 0) {
      Dedup.bandRows(withSplit.select("doc_id", "text"))
        .write.mode("append").parquet(state("bands.parquet"))
      // the shuffle address book re-deals over the GROWN corpus: a global
      // permutation is a per-snapshot artifact by design (any membership
      // change moves addresses), and the rewrite is one column-pruned
      // distinct scan of (doc_id, split) + the bounded two-phase rank —
      // narrow in the shard tree, no text read
      writeShuffleSidecar(s, outDir)
    }

    val splitCounts: Seq[(String, Long)] =
      if (nChunks == 0) Seq("train", "val", "test").map(sp => s"8_${sp}_docs" -> 0L)
      else {
        val got = chunks.groupBy("split")
          .agg(countDistinct("doc_id").as("n")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        Seq("train", "val", "test").map(sp =>
          s"8_${sp}_docs" -> got.getOrElse(sp, 0L))
      }
    (Seq(
      "0_load" -> b0.count(),
      "1_quality" -> afterQuality.count(),
      "2_exact_dedup" -> afterExact.count(),
      "3_near_dedup" -> afterNearDup.count(),
      "4_decontam" -> afterDecontam.count(),
      "5_ppl_gate" -> afterPpl.count(),
      "6_mixture" -> withSplit.count(),
      "7_chunks_written" -> nChunks) ++ splitCounts)
      .toDF("stage", "n")
  }

  /** D32 composed (r13): the training-export address book — per split,
    * the deterministic md5('shuf42:'||doc_id) permutation of the WRITTEN
    * shard tree's documents cut into 50-doc shards, landed under
    * `_graft_shuffle` (underscore dir: invisible to plain shard reads,
    * like the manifest). The reproducible global shuffle every
    * dataloader needs, derived from the shards rather than the funnel
    * plan (the Observation-latch rule run() follows for bands/manifest).
    * Two-phase rank, never a one-partition window: the md5 PREFIX is the
    * range bucket (prefix order ≡ full-hash order), per-(split, bucket)
    * counts shuffle once, the ≤3·256-row offset window is bounded, and
    * every per-bucket rank window runs in parallel — the D32 oracle
    * query's shape with `split` joined into every key. */
  private def writeShuffleSidecar(s: SparkSession, outDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val S = 50L
    s.catalog.refreshByPath(outDir)
    val docs = s.read.parquet(outDir).select("doc_id", "split").distinct()
      .withColumn("h",
        md5(concat(lit("shuf42:"), col("doc_id").cast("string"))))
      .withColumn("bucket", substring(col("h"), 1, 2))
    val wB = Window.partitionBy("split").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy("split", "bucket")
      .agg(count(lit(1)).as("b_n"))
      .withColumn("b_off", coalesce(sum("b_n").over(wB), lit(0L)))
      .select("split", "bucket", "b_off")
    val wIn = Window.partitionBy("split", "bucket")
      .orderBy(col("h"), col("doc_id"))
    docs.join(broadcast(offsets), Seq("split", "bucket"))
      .withColumn("rk",
        col("b_off") + row_number().over(wIn).cast("long") - 1L)
      .select(col("split"),
        ((col("rk") - pmod(col("rk"), lit(S))) / S).cast("long").as("shard"),
        pmod(col("rk"), lit(S)).as("pos"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$outDir/_graft_shuffle")
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
