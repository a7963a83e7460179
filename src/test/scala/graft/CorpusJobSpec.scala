package graft

import org.scalatest.funsuite.AnyFunSuite

/** The end-to-end corpus build must funnel monotonically, write readable
  * source-partitioned shards, and be deterministic across reruns. */
class CorpusJobSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def audit(out: String): Seq[(String, Long)] =
    CorpusJob.run(spark, sf, out).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  test("stage counts funnel monotonically and chunks are written") {
    val out = java.nio.file.Files.createTempDirectory("graft_cj").toString
    val a = audit(out)
    val byStage = a.toMap
    val docStages = a.filter(_._1.head <= '6').map(_._2)
    assert(docStages == docStages.sorted.reverse,
      s"doc counts not monotonically non-increasing: $a")
    assert(byStage("0_load") > 0 && byStage("6_mixture") > 0)
    assert(byStage("6_mixture") < byStage("0_load"),
      "pipeline dropped nothing — gates not applied")
    assert(byStage("7_chunks_written") >= byStage("6_mixture"),
      "every kept doc must contribute at least one chunk")
    // the D29 split stage: every mixture survivor lands in exactly one
    // split, and assignment is by FAMILY key — a doc's split never
    // depends on which other docs survived, so counts reconcile exactly
    assert(byStage("8_train_docs") + byStage("8_val_docs") +
      byStage("8_test_docs") == byStage("6_mixture"),
      s"split docs don't sum to mixture survivors: $a")
    assert(byStage("8_train_docs") > 0, "empty train split")
    // shards are source-partitioned and re-readable
    val shards = spark.read.parquet(out)
    assert(shards.columns.sorted.toSeq ==
      Seq("chunk", "chunk_ix", "doc_id", "source", "split"))
    assert(shards.select("source").distinct().count() >= 1)
    // leakage-safety: recompute the family key from the source corpus
    // for every sharded doc — no family may span two splits
    import org.apache.spark.sql.functions._
    val fam = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(substring(col("text"), 1, 60)).as("fk"))
    val spanning = shards.select("doc_id", "split").distinct()
      .join(fam, "doc_id")
      .groupBy("fk").agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count()
    assert(spanning == 0, s"$spanning families span a split boundary")
    // D32 composed: the shuffle address book covers every written doc
    // exactly once, per split, in 50-doc shards filled contiguously
    val shuffle = spark.read.parquet(s"$out/_graft_shuffle").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val writtenDocs = shards.select("doc_id", "split").distinct().collect()
      .map(r => (r.getString(1), r.getLong(0))).toSet
    assert(shuffle.map(t => (t._1, t._4)).toSet == writtenDocs,
      "shuffle sidecar doesn't cover exactly the written (split, doc) set")
    shuffle.groupBy(_._1).foreach { case (sp, g) =>
      val byShard = g.groupBy(_._2).toSeq.sortBy(_._1)
      assert(byShard.map(_._1) == byShard.indices.map(_.toLong),
        s"$sp shard ids not contiguous")
      byShard.zipWithIndex.foreach { case ((sh, rows), i) =>
        assert(rows.map(_._3).sorted.toSeq == rows.indices.map(_.toLong),
          s"$sp shard $sh positions not contiguous")
        if (i < byShard.length - 1)
          assert(rows.length == 50, s"$sp non-final shard $sh size")
      }
    }
  }

  test("incremental append: a batch curates against the standing state") {
    import org.apache.spark.sql.functions._
    import graft.sources.{Tables, ZoneMaps}
    import spark.implicits._
    // sf0.1: the only test corpus whose funnel keeps survivors (the
    // sf0.01 ppl tail keeps zero — standing state would be empty)
    val dir = "/root/testdata/sf0.1"
    val out = java.nio.file.Files.createTempDirectory("graft_cj_app").toString
    CorpusJob.run(spark, dir, out).collect()
    val beforeChunks = spark.read.parquet(out).count()

    // batch = 10 exact re-sends of standing docs under NEW ids (must die
    // at the exact stage: their hashes live in the seen state whether or
    // not the original was admitted) + 20 novel-vocab docs (unique alnum
    // words → pass quality, share zero shingles with the corpus and the
    // eval suite, unseen lang → no frozen ppl floor applies)
    val resent = Tables.documents(spark, dir)
      .filter(col("doc_id") >= 100 && col("doc_id") < 110 &&
        col("text").isNotNull)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
        col("lang"), col("source"))
    val nResent = resent.count()
    assert(nResent > 0)
    val fresh = (0 until 20).map { i =>
      (2000000L + i, (0 until 60).map(j => s"zq${i}x$j").mkString(" "),
        "xx", "srcX")
    }.toDF("doc_id", "text", "lang", "source")
    val batch1 = resent.unionByName(fresh)

    val a1 = CorpusJob.append(spark, batch1, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a1("0_load") == nResent + 20, s"$a1")
    // every re-send dies no later than the exact stage; every fresh doc
    // survives through ppl (novel vocab, floorless lang), so the funnel
    // narrows exactly at mixture
    assert(a1("2_exact_dedup") == 20, s"$a1")
    assert(a1("5_ppl_gate") == 20, s"$a1")
    val expectedMix = fresh
      .filter(graft.operators.TextAnalysis.mixKeep).count()
    assert(expectedMix > 0 && a1("6_mixture") == expectedMix, s"$a1")
    assert(spark.read.parquet(out)
      .filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
      .count() == 0, "a re-sent duplicate reached the shards")
    val afterChunks = spark.read.parquet(out).count()
    assert(a1("7_chunks_written") > 0 &&
      afterChunks == beforeChunks + a1("7_chunks_written"))
    // the shuffle address book re-dealt over the GROWN corpus: it covers
    // exactly the grown (split, doc) set — appended docs included
    val shuffledDocs = spark.read.parquet(s"$out/_graft_shuffle")
      .select("split", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val grownDocs = spark.read.parquet(out)
      .select("split", "doc_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(shuffledDocs == grownDocs,
      "shuffle sidecar stale after append: doc sets diverge")

    // the appended docs serve through the INCREMENTALLY refreshed
    // sidecar: an id-range read over the fresh band prunes files and
    // returns exactly the admitted ids
    val (kept, total) = ZoneMaps.planFiles(spark, out, 2000000L, 2000019L)
    assert(kept.nonEmpty && kept.size < total,
      s"append's zone rows did not prune: ${kept.size}/$total")
    val served = ZoneMaps.readRange(spark, out, "doc_id", 2000000L, 2000019L)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val admitted = spark.read.parquet(out)
      .filter(col("doc_id") >= 2000000L)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(admitted.nonEmpty && served == admitted)
    // manifest equals an exact recompute over the grown shards
    val manifest = spark.read.parquet(s"$out/_graft_manifest")
      .collect().map(_.toString).sorted.toSeq
    val recomputed = spark.read.parquet(out)
      .groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct("doc_id").as("n_docs"),
        sum(graft.functions.Hashing.h60p(concat_ws("\u0001",
          col("doc_id"), col("chunk_ix"), md5(col("chunk")))))
          .as("content_hash"))
      .collect().map(_.toString).sorted.toSeq
    assert(manifest == recomputed, "append left a stale manifest")

    // idempotence: the SAME batch again is all seen-hash duplicates
    val a2 = CorpusJob.append(spark, batch1, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a2("2_exact_dedup") == 0 && a2("7_chunks_written") == 0, s"$a2")
    assert(spark.read.parquet(out).count() == afterChunks,
      "an idempotent re-append changed the shards")

    // F21 cross-batch screen: near-variants of the ADMITTED fresh docs
    // (new hashes — they pass exact) are caught by the band rows the
    // FIRST append wrote
    val variants = admitted.toSeq.sorted.map { id =>
      val i = (id - 2000000L).toInt
      // only the LAST word mutates: one changed shingle, J ≈ 58/60 —
      // high enough that every 4-hash band agreeing somewhere is the
      // overwhelmingly likely (and, being md5-derived, fixed) outcome
      val words = (0 until 59).map(j => s"zq${i}x$j") :+ s"mut$i"
      (id + 1000000L, words.mkString(" "), "xx", "srcX")
    }.toDF("doc_id", "text", "lang", "source")
    val a3 = CorpusJob.append(spark, variants, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a3("2_exact_dedup") == admitted.size, s"$a3")
    assert(a3("3_near_dedup") == 0,
      s"near-dup variants slipped past the standing band index: $a3")
  }

  test("append's frozen-LM gate prunes to the batch's bigram files and " +
      "matches the full scan") {
    import org.apache.spark.sql.functions._
    import graft.sources.ZoneMaps
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    // force many small LM files so the bounded-probe shape is visible at
    // test scale (production sizing comes from graft.corpus.lmRowsPerFile)
    spark.conf.set("graft.corpus.lmRowsPerFile", "64")
    val (out, outLegacy) = try {
      val a = java.nio.file.Files.createTempDirectory("graft_cj_lm").toString
      val b = java.nio.file.Files.createTempDirectory("graft_cj_lm2").toString
      CorpusJob.run(spark, dir, a).collect()
      CorpusJob.run(spark, dir, b).collect()
      (a, b)
    } finally spark.conf.unset("graft.corpus.lmRowsPerFile")
    val lmPath = s"$out/_graft_state/lm.parquet"

    // the pruning decision is bounded by the batch's OWN vocabulary:
    // a 4-word batch (3 bigrams) touches at most 3 of the many LM files
    val tiny = Seq("alpha beta gamma delta").toDF("text")
      .select(explode(call_function("graft_word_bigrams", col("text")))
        .as("bigram"))
    val keys = tiny.select(graft.functions.Hashing.h60(col("bigram")))
    val (kept, total) = ZoneMaps.planFilesForKeys(spark, lmPath, keys)
    assert(total > 8, s"LM landed in only $total files — sizing knob inert")
    assert(kept.size <= 3 && kept.size < total,
      s"probe not bounded by batch vocabulary: ${kept.size}/$total files")

    // the pruned probe loses NO matching row: for bigrams that exist in
    // the standing LM, pruned and full scans agree count-for-count
    val someLm = spark.read.parquet(lmPath).select("bigram", "cnt")
      .orderBy("bigram").limit(5)
    val probeKeys = someLm.select(graft.functions.Hashing.h60(col("bigram")))
    val prunedHits = ZoneMaps.readForKeys(spark, lmPath, probeKeys)
      .join(someLm.select("bigram"), "bigram")
      .select("bigram", "cnt").collect().map(_.toString).sorted.toSeq
    assert(prunedHits == someLm.collect().map(_.toString).sorted.toSeq,
      "zone pruning dropped a matching LM row")

    // end-to-end: the same batch appended against a pruning state and a
    // legacy (sidecar-less, full-scan) state produces identical audits
    // and identical shards — the prune is a pure scan optimization
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$outLegacy/_graft_state/lm.parquet/_graft_zonemap"), true))
    def batch = (0 until 12).map { i =>
      (3000000L + i, (0 until 60).map(j => s"lmp${i}w$j").mkString(" "),
        "xx", "srcX")
    }.toDF("doc_id", "text", "lang", "source")
    val aPruned = CorpusJob.append(spark, batch, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    val aLegacy = CorpusJob.append(spark, batch, outLegacy)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    assert(aPruned == aLegacy,
      s"pruned vs full-scan LM gate diverged: $aPruned vs $aLegacy")
    def shardRows(p: String) = spark.read.parquet(p)
      .filter(col("doc_id") >= 3000000L)
      .collect().map(_.toString).sorted.toSeq
    assert(shardRows(out) == shardRows(outLegacy),
      "pruned LM gate admitted different docs than the full scan")
  }

  test("append decontaminates against the frozen eval-suite sidecar") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val out = java.nio.file.Files.createTempDirectory("graft_cj_ev").toString
    CorpusJob.run(spark, dir, out).collect()
    // the sidecar run() froze IS the suite a fresh derivation produces
    val sidecar = spark.read.parquet(s"$out/_graft_state/eval.parquet")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    val derived = graft.operators.Dedup.benchShingleSets(spark, dir)
    assert(sidecar == derived,
      "frozen eval sidecar diverged from a fresh derivation")
    // behavioral: a batch doc carrying a 25-word run of a bench doc
    // (>= 24 shared shingles, new hash, low overall Jaccard) dies at the
    // DECONTAM stage — proving append probes the sidecar with no corpus
    // dir in sight (its signature no longer takes one)
    val benchWords = Tables.documents(spark, dir)
      .filter(col("doc_id") < 20 && col("text").isNotNull)
      .orderBy("doc_id").select("text").collect()
      .map(_.getString(0).split("\\s+").toSeq).find(_.size >= 25).get
    val leaked = (benchWords.take(25) ++
      (0 until 60).map(j => s"evq$j")).mkString(" ")
    val clean = (0 until 60).map(j => s"evclean$j").mkString(" ")
    val batch = Seq((4000000L, leaked, "xx", "srcX"),
      (4000001L, clean, "xx", "srcX"))
      .toDF("doc_id", "text", "lang", "source")
    val a = CorpusJob.append(spark, batch, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a("3_near_dedup") == 2,
      s"the leaked doc died before decontamination: $a")
    assert(a("4_decontam") == 1,
      s"the bench-contaminated doc slipped the frozen suite: $a")
  }

  test("doc-range reads serve through the zone-map sidecar") {
    import org.apache.spark.sql.functions._
    import graft.sources.ZoneMaps
    val out = java.nio.file.Files.createTempDirectory("graft_cjz").toString
    // sf0.1: the funnel keeps ONE doc at sf0.001 (one shard file — a
    // vacuous pruning test) and ZERO at sf0.01 (that corpus's ppl tail
    // swallows the mixture); the 5000-doc corpus keeps enough docs to
    // spread across the 8 range partitions
    CorpusJob.run(spark, "/root/testdata/sf0.1", out).collect()
    val docs = spark.read.parquet(out).select("doc_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val (lo, hi) = (docs(docs.length / 4), docs(docs.length / 2))
    val (files, total) = ZoneMaps.planFiles(spark, out, lo, hi)
    assert(total > 1 && files.nonEmpty && files.size < total,
      s"doc-range pruning kept ${files.size}/$total shard files")
    val pruned = ZoneMaps.readRange(spark, out, "doc_id", lo, hi)
    // the source partition column survives the file-list read (basePath)
    assert(pruned.columns.contains("source"), pruned.columns.mkString(","))
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select(concat_ws(":", col("doc_id"), col("chunk_ix"), col("source")))
      .collect().map(_.getString(0)).toSet
    val want = spark.read.parquet(out)
      .filter(col("doc_id") >= lo && col("doc_id") <= hi)
    assert(key(pruned) == key(want) && key(want).nonEmpty,
      "pruned doc-range read diverged from the full-scan filter")
  }

  test("a rerun is bit-identical (deterministic pipeline)") {
    val out1 = java.nio.file.Files.createTempDirectory("graft_cj1").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_cj2").toString
    assert(audit(out1) == audit(out2))
    val a = spark.read.parquet(out1)
    val b = spark.read.parquet(out2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // the shard manifests of the two runs are identical too
    val m1 = spark.read.parquet(s"$out1/_graft_manifest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val m2 = spark.read.parquet(s"$out2/_graft_manifest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(m1 == m2 && m1.nonEmpty)
  }

  test("the source-overlap audit matches exact set arithmetic when unsaturated") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_cjo").toString
    audit(out)
    val overlap = spark.read.parquet(s"$out/_graft_overlap").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(5), r.getDouble(6)))
      .toMap
    // every unordered source pair appears exactly once
    val nSrc = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count().toInt
    assert(overlap.size == nSrc * (nSrc - 1) / 2 && overlap.nonEmpty)
    // sf0.001 sources are far below k=128 distinct texts, so the sketch
    // holds the whole set and every estimate must be EXACT
    val sets = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"),
        graft.functions.Hashing.h60(md5(col("text"))).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    overlap.foreach { case ((a, b), (ea, eb, ei, jac)) =>
      val (sa, sb) = (sets(a), sets(b))
      assert(ea == sa.size.toDouble && eb == sb.size.toDouble, s"($a,$b) sizes")
      assert(ei == sa.intersect(sb).size.toDouble, s"($a,$b) intersection")
      assert(jac == sa.intersect(sb).size.toDouble / sa.union(sb).size,
        s"($a,$b) jaccard")
    }
  }

  test("the shard manifest matches stats recomputed from the shards") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_cjm").toString
    audit(out)
    val manifest = spark.read.parquet(s"$out/_graft_manifest").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // the underscore dir must be invisible to plain shard reads
    val shards = spark.read.parquet(out)
    assert(shards.columns.sorted.toSeq ==
      Seq("chunk", "chunk_ix", "doc_id", "source", "split"))
    val recomputed = shards
      .groupBy("source")
      .agg(count(lit(1)).as("n"), countDistinct("doc_id").as("d"),
        sum(graft.functions.Hashing.h60p(concat_ws("\u0001",
          col("doc_id"), col("chunk_ix"), md5(col("chunk"))))).as("h"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(manifest == recomputed && manifest.nonEmpty)
  }

  test("bloom decontamination pre-filter: identical audit, codegen'd probe") {
    import org.apache.spark.sql.functions.col
    // zero false negatives: the G30 pre-filter may only ADD candidates
    // the exact kernel then rejects, so the full audit (and the C7
    // oracle) is byte-identical with the pre-filter on or off
    val outOn = java.nio.file.Files.createTempDirectory("graft_cjb1").toString
    val outOff = java.nio.file.Files.createTempDirectory("graft_cjb2").toString
    val withBloom = audit(outOn)
    spark.conf.set("graft.contam.bloomPrefilter", "false")
    val without =
      try audit(outOff)
      finally spark.conf.unset("graft.contam.bloomPrefilter")
    assert(withBloom == without && withBloom.nonEmpty)
    val rowsOn = operators.Dedup.dedupContamination(spark, sf)
      .collect().map(_.toString).toSeq
    spark.conf.set("graft.contam.bloomPrefilter", "false")
    val rowsOff =
      try operators.Dedup.dedupContamination(spark, sf)
        .collect().map(_.toString).toSeq
      finally spark.conf.unset("graft.contam.bloomPrefilter")
    assert(rowsOn == rowsOff)
    // the probe must sit inside whole-stage codegen on the corpus scan —
    // a filter, not a join or a fallback-interpreted expression
    // the probe must be the native graft_bloom_count kernel, sitting in
    // a codegen'd Filter over the corpus scan — not a join, not a
    // CodegenFallback HOF
    val df = operators.Dedup.dedupContamination(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stars print
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_count"),
      s"bloom probe missing from the default plan:\n${plan.take(1500)}")
    val wscgProbe = plan.linesIterator.exists(l =>
      l.contains("graft_bloom_count") &&
        (l.contains("Filter") || l.contains("DataFilters")))
    assert(wscgProbe, s"probe not in the scan-side filter:\n${plan.take(3000)}")
    val starredFilter = plan.linesIterator.exists(l =>
      l.contains("graft_bloom_count") && l.trim.matches("""[+:\-\s]*\*\(\d+\).*"""))
    assert(starredFilter,
      s"bloom probe fell out of WholeStageCodegen:\n${plan.take(3000)}")
  }
}
