package graft

import graft.sources.{Tables, ZoneMaps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** G34: the zone-map sidecar prunes files on a range-clustered layout,
  * prunes nothing on a hash-shuffled one (same data, same query), and the
  * pruned scan returns exactly the full-scan answer. */
class ZoneMapSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val docs =
    Tables.documents(spark, sf).select("doc_id", "n_chars")

  private lazy val base = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zonemap").toString
    ZoneMaps.writeClustered(spark, docs, s"$dir/clustered", "n_chars", 8)
    ZoneMaps.writeClustered(spark, docs, s"$dir/shuffled", "n_chars", 8,
      clustered = false)
    dir
  }

  // a narrow band around the median: ~central slice of the domain, so a
  // range-clustered layout keeps only the middle file(s)
  private lazy val (lo, hi) = {
    val m = docs.stat.approxQuantile("n_chars", Array(0.45, 0.55), 0.0)
    (m(0).toLong, m(1).toLong)
  }

  test("clustered layout: most files pruned, answer exact") {
    val (files, total) = ZoneMaps.planFiles(spark, s"$base/clustered", lo, hi)
    assert(total == 8, s"expected 8 files, sidecar lists $total")
    assert(files.nonEmpty && files.size <= total / 2,
      s"zone map kept ${files.size}/$total files for a ~10% band")
    val got = ZoneMaps.readRange(spark, s"$base/clustered", "n_chars", lo, hi)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.filter(col("n_chars") >= lo && col("n_chars") <= hi)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && got == want,
      s"pruned scan diverged: ${got.size} vs ${want.size} rows")
  }

  test("shuffled layout: every zone spans the band, nothing prunes") {
    val (files, total) = ZoneMaps.planFiles(spark, s"$base/shuffled", lo, hi)
    assert(files.size == total,
      s"hash-shuffled files should all overlap the band: ${files.size}/$total")
    // same exact answer — skipping is a layout optimization, not semantics
    val got = ZoneMaps.readRange(spark, s"$base/shuffled", "n_chars", lo, hi)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.filter(col("n_chars") >= lo && col("n_chars") <= hi)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("in-session rewrite refreshes both table and sidecar file indexes") {
    val p = s"$base/rewrite"
    ZoneMaps.writeClustered(spark, docs, p, "n_chars", 4)
    val (_, t1) = ZoneMaps.planFiles(spark, p, lo, hi)
    assert(t1 == 4)
    // overwrite the SAME path with half the data in 2 files — a stale
    // cached FileIndex would still list 4 files / serve old rows
    val half = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    ZoneMaps.writeClustered(spark, half, p, "n_chars", 2)
    val (_, t2) = ZoneMaps.planFiles(spark, p, lo, hi)
    assert(t2 == 2, s"sidecar served a stale file list: $t2 files")
    val got = ZoneMaps.readRange(spark, p, "n_chars", lo, hi)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = half.filter(col("n_chars") >= lo && col("n_chars") <= hi)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want, "rewritten table served stale rows")
  }

  test("appendSidecar: an append scans only the new files; result equals a full rebuild") {
    val p = s"$base/append"
    val older = docs.filter(col("doc_id") % 2 === 0)
    val newer = docs.filter(col("doc_id") % 2 =!= 0)
    ZoneMaps.writeClustered(spark, older, p, "n_chars", 4)
    // the append cadence: new files land, the sidecar is stale
    newer.repartitionByRange(2, col("n_chars"))
      .write.mode("append").parquet(p)
    val (scanned, dropped) = ZoneMaps.appendSidecar(spark, p, "n_chars")
    assert(scanned == 2 && dropped == 0,
      s"expected to scan exactly the 2 appended files: ($scanned, $dropped)")
    val (keptInc, totalInc) = ZoneMaps.planFiles(spark, p, lo, hi)
    assert(totalInc == 6, s"sidecar lists $totalInc files after append")
    // the incrementally-maintained sidecar must equal a full rebuild
    val incRows = spark.read.parquet(s"$p/_graft_zonemap")
      .collect().map(_.toString).sorted.toSeq
    ZoneMaps.writeSidecar(spark, p, "n_chars")
    val fullRows = spark.read.parquet(s"$p/_graft_zonemap")
      .collect().map(_.toString).sorted.toSeq
    assert(incRows == fullRows,
      "incremental sidecar diverged from a full rebuild")
    val (keptFull, totalFull) = ZoneMaps.planFiles(spark, p, lo, hi)
    assert((keptInc.sorted, totalInc) == (keptFull.sorted, totalFull))
    // pruned scan still exact across the mixed old+new file set
    val got = ZoneMaps.readRange(spark, p, "n_chars", lo, hi)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.filter(col("n_chars") >= lo && col("n_chars") <= hi)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("appendSidecar: no-op when current; drops rows for compacted-away files") {
    val p = s"$base/compact"
    ZoneMaps.writeClustered(spark, docs, p, "n_chars", 4)
    assert(ZoneMaps.appendSidecar(spark, p, "n_chars") == ((0, 0)),
      "a current sidecar should not be rewritten")
    // compaction/delete: one data file disappears out-of-band
    val victim = spark.read.parquet(p).inputFiles.sorted.head
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(new java.net.URI(victim).getPath))
    spark.catalog.refreshByPath(p)
    val (scanned, dropped) = ZoneMaps.appendSidecar(spark, p, "n_chars")
    assert(scanned == 0 && dropped == 1, s"($scanned, $dropped)")
    val (_, total) = ZoneMaps.planFiles(spark, p, lo, hi)
    assert(total == 3, s"sidecar still lists $total files")
    // and the maintained sidecar equals a rebuild on the shrunken tree
    val incRows = spark.read.parquet(s"$p/_graft_zonemap")
      .collect().map(_.toString).sorted.toSeq
    ZoneMaps.writeSidecar(spark, p, "n_chars")
    val fullRows = spark.read.parquet(s"$p/_graft_zonemap")
      .collect().map(_.toString).sorted.toSeq
    assert(incRows == fullRows)
  }

  test("planFilesForKeys: bin-decomposed equi probe, no nested-loop join, exact kept set") {
    // probe keys: a mix of present values and misses straddling the domain
    val present = docs.select("n_chars").orderBy("n_chars")
      .collect().map(_.getLong(0))
    val probe = Seq(present.head, present(present.length / 2), present.last,
      present.last + 7777L, -5L)
    import spark.implicits._
    val keys = probe.toDF("k")
    for (layout <- Seq("clustered", "shuffled")) {
      val (kept, total) = ZoneMaps.planFilesForKeys(spark, s"$base/$layout", keys)
      assert(total == 8)
      // brute-force truth from the collected sidecar
      val zones = spark.read.parquet(s"$base/$layout/_graft_zonemap")
        .collect().filter(!_.isNullAt(1))
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val want = zones.filter { case (_, zmin, zmax) =>
        probe.exists(k => k >= zmin && k <= zmax) }.map(_._1).toSet
      assert(kept.toSet == want,
        s"$layout: bin probe kept ${kept.size} files, brute force ${want.size}")
      // the plan is a broadcast HASH join on the bin — never a nested loop
      // (the r10 keys×zones shape was O(|keys|·files) planning work)
      val plan = ZoneMaps.keyProbeMatches(spark, keys, zones.toSeq)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$layout: zone probe regressed to a nested-loop join:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"$layout: expected a broadcast hash join on the bin key:\n$plan")
    }
  }

  test("keyProbeMatches: floor-shift binning exact on negative and full-span domains") {
    import spark.implicits._
    // zones straddling zero and sitting deep in the negative range — an
    // arithmetic shift floors correctly where (k - lo) rebasing or `div`
    // truncation toward zero would mis-bin boundary keys
    val zones = Seq(
      ("fneg", -1000L, -901L), ("fstraddle", -3L, 4L), ("fpos", 900L, 999L),
      ("fwide", Long.MinValue / 2, Long.MaxValue / 2))
    val keys = Seq(-1000L, -901L, -900L, -4L, -3L, 0L, 4L, 5L, 899L, 900L,
      999L, 1000L, Long.MinValue / 2, Long.MaxValue / 2, Long.MaxValue)
    val got = ZoneMaps.keyProbeMatches(spark, keys.toDF("k"), zones)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (for {
      k <- keys; (f, zmin, zmax) <- zones; if k >= zmin && k <= zmax
    } yield (k, f)).toSet
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("empty band short-circuits to an empty scan with the table schema") {
    val ceiling = docs.agg(max("n_chars")).collect()(0).getLong(0)
    val df = ZoneMaps.readRange(spark, s"$base/clustered", "n_chars",
      ceiling + 1, ceiling + 100)
    assert(df.columns.toSeq == Seq("doc_id", "n_chars"))
    assert(df.count() == 0)
  }
}
