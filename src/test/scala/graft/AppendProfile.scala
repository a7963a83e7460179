package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiler for G40's "append cost tracks the batch, not the
  * corpus" claim, two axes:
  *
  *  1. corpus scale (r9): standing state at two SFs 100× apart, append
  *     the SAME synthetic batch to each, compare min-of-3 walls.
  *  2. standing-LM scale (r10): synthetic standing corpora whose bigram
  *     VOCABULARY grows 1× → 10× → 100× (file count scaling with rows via
  *     graft.corpus.lmRowsPerFile, so per-file bytes stay bounded — the
  *     100 TB regime), append the same fixed batch, and report both the
  *     wall and the LM files the frozen-LM gate actually read
  *     (ZoneMaps.planFilesForKeys over the batch's own bigrams). Before
  *     r10 this gate scanned the whole standing LM per batch — the one
  *     residual O(corpus) touch; now kept files are bounded by the
  *     batch's vocabulary.
  *
  * Run: `sbt "Test/runMain graft.AppendProfile"`. Numbers land in
  * bench/append_r10.json. Remaining corpus-size couplings (by design,
  * all pruned/bounded): decontamination probes the FROZEN eval-suite
  * sidecar (r10 — no corpus-dir read at append time); the seen
  * anti-join's right side is one narrow hash per standing INPUT doc; the
  * band screen's right side is O(admitted docs × 4 bands). */
object AppendProfile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    // fresh ids AND fresh text per rep: the seen state keeps every
    // input's content hash, so re-sent text would die at the exact
    // stage and later reps would measure an empty post-exact funnel
    def batch(repIx: Int) = (0 until 30).map { i =>
      (9000000L + repIx * 1000000L + i,
        (0 until 60).map(j => s"ap${i}r${repIx}q$j").mkString(" "),
        "xx", "srcX")
    }.toDF("doc_id", "text", "lang", "source")
    def appendWalls(dir: String, out: String): Double =
      (1 to 3).map { repIx =>
        val rep = batch(repIx)
        val t0 = System.nanoTime()
        CorpusJob.append(spark, rep, out).collect()
        (System.nanoTime() - t0) / 1e9
      }.min

    // ---- axis 1: standing corpus 100× (r9's measurement, re-run) ----
    val results = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1").map { dir =>
      val out = java.nio.file.Files
        .createTempDirectory("graft_ap").toString
      CorpusJob.run(spark, dir, out).collect()
      dir -> appendWalls(dir, out)
    }
    val r = results.toMap
    val small = r("/root/testdata/sf0.001")
    val big = r("/root/testdata/sf0.1")
    println(f"""{"metric":"corpus_append_scale","batch_docs":30,"standing_sf0001_sec":$small%.3f,"standing_sf01_sec":$big%.3f,"ratio_100x_corpus":${big / small}%.3f}""")

    // ---- axis 2: standing-LM vocabulary 100×, fixed SMALL batch ----
    // synthetic corpora of unique-vocab docs: doc i carries 60 words
    // found nowhere else, so vocab (≈ LM rows) scales with doc count
    // while the appended batch stays identical. The probe batch is 5
    // docs (295 distinct bigrams): once the LM file count passes the
    // batch vocabulary, lm_files_read must SATURATE near that
    // vocabulary while lm_files_total keeps growing — the bounded-probe
    // signature (pre-r10 the gate read every file at every size).
    def smallBatch(repIx: Int) = (0 until 5).map { i =>
      (9500000L + repIx * 1000000L + i,
        (0 until 60).map(j => s"ap${i}r${repIx}q$j").mkString(" "),
        "xx", "srcX")
    }.toDF("doc_id", "text", "lang", "source")
    spark.conf.set("graft.corpus.lmRowsPerFile", "256")
    val lmAxis = Seq(1, 10, 100).map { scale =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_lm_src$scale").toString
      (0 until 60 * scale).map { i =>
        (i.toLong, (0 until 60).map(j => s"v${i}u$j").mkString(" "),
          "xx", "srcX")
      }.toDF("doc_id", "text", "lang", "source")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_lm_out$scale").toString
      CorpusJob.run(spark, dir, out).collect()
      val lmPath = s"$out/_graft_state/lm.parquet"
      val lmRows = spark.read.parquet(lmPath).count()
      val (kept, total) = graft.sources.ZoneMaps.planFilesForKeys(
        spark, lmPath, smallBatch(0)
          .select(explode(call_function("graft_word_bigrams", col("text"))))
          .select(graft.functions.Hashing.h60(col("col"))))
      val wall = (1 to 3).map { repIx =>
        val t0 = System.nanoTime()
        CorpusJob.append(spark, smallBatch(repIx), out).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      (scale, lmRows, kept.size, total, wall)
    }
    spark.conf.unset("graft.corpus.lmRowsPerFile")
    val parts = lmAxis.map { case (sc, rows, kept, total, wall) =>
      f""""x$sc":{"lm_rows":$rows,"lm_files_read":$kept,"lm_files_total":$total,"append_sec":$wall%.3f}"""
    }
    val flat = lmAxis.last._5 / lmAxis.head._5
    println(s"""{"metric":"append_lm_scale","batch_docs":5,"batch_bigrams":295,${parts.mkString(",")},"ratio_100x_lm":${f"$flat%.3f"}}""")

    // ---- axis 3 (r11): PLANNING cost of the zone probe itself as the
    // mapped-file count grows 100×, fixed 10⁵-key batch. The r10 probe
    // was a keys×zones broadcast nested loop — O(|keys|·files) range
    // predicates of pure planning overhead per append (the G40b `weak`);
    // the r11 bin decomposition is O(|keys| + files). Zones are
    // synthesized directly: planning reads only the sidecar, never data.
    val keyN = 100000
    val keys = spark.range(keyN.toLong)
      .select((col("id") * 7919L % 100000000L).as("k"))
      .localCheckpoint(true)
    val planAxis = Seq(100, 1000, 10000).map { files =>
      val p = java.nio.file.Files
        .createTempDirectory(s"graft_zplan$files").toString
      val width = 100000000L / files
      (0 until files).map(i =>
        (s"f$i", i * width, (i + 1) * width - 1, width))
        .toDF("file", "zmin", "zmax", "n_rows")
        .coalesce(1).write.parquet(s"$p/_graft_zonemap")
      val wall = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val (kept, total) = graft.sources.ZoneMaps.planFilesForKeys(
          spark, p, keys)
        require(total == files && kept.nonEmpty)
        (System.nanoTime() - t0) / 1e9
      }.min
      (files, wall)
    }
    val pparts = planAxis.map { case (f, w) =>
      f""""files$f":{"plan_sec":$w%.3f}""" }
    println(s"""{"metric":"zone_plan_scale","batch_keys":$keyN,${pparts.mkString(",")},""" +
      f""""ratio_100x_files":${planAxis.last._2 / planAxis.head._2}%.3f}""")
    spark.stop()
  }
}
