package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G34: min/max zone-map data skipping — the file-pruning layer a table
  * format keeps in its manifests (Delta/Iceberg per-file column stats),
  * built here as a parquet sidecar so a plain-directory layout gets the
  * same scan avoidance. Composes with the E37 layout story: stats only
  * prune when the write CLUSTERED the column (range partition here, the
  * 1-D analogue of Z-order; on a shuffled layout every file's [min, max]
  * spans the domain and nothing prunes — the spec measures exactly that
  * contrast).
  *
  * Scale shape: the sidecar is O(files), not O(rows) — pruning reads the
  * sidecar (KiB) and hands the surviving file list to the parquet reader,
  * so a selective range query on 100 TB touches only the overlapping
  * files, before row-group-level parquet min/max statistics prune
  * further WITHIN each file. The sidecar lives in a `_`-prefixed child
  * dir (`_graft_zonemap`), which Spark's file index ignores on normal
  * reads of the table path — same convention as the streaming seen-ID
  * sketch sidecar (Streams.scala).
  *
  * Null discipline: min/max ignore nulls, so an all-null file carries a
  * null zone and is always pruned — consistent, because the skipping
  * reader only serves RANGE predicates and SQL comparison semantics
  * exclude null rows from any range result.
  */
object ZoneMaps {
  private def zonemapDir(path: String) = s"$path/_graft_zonemap"

  /** Land `df` range-clustered on `byCol` (≤ `nFiles` contiguous files)
    * and write the per-file (file, min, max, rows) sidecar. The sidecar
    * is computed by re-scanning footer-cheap columns of the files just
    * written — one narrow pass grouped on `input_file_name()`, output
    * bounded by the file count. `clustered = false` lands the same data
    * hash-shuffled instead — the control layout whose zones all span the
    * domain (nothing prunes), for measuring what clustering buys. */
  def writeClustered(spark: SparkSession, df: DataFrame, path: String,
      byCol: String, nFiles: Int, clustered: Boolean = true): Unit = {
    val laid =
      if (clustered) df.repartitionByRange(nFiles, col(byCol))
      else df.repartition(nFiles)
    laid.write.mode("overwrite").parquet(path)
    writeSidecar(spark, path, byCol)
  }

  /** The sidecar alone, over an ALREADY-WRITTEN parquet tree at `path`
    * (flat or partitioned — `input_file_name()` keys each physical file
    * either way). Lets a job that controls its own write (e.g. the
    * CorpusJob shards) add file-skipping without rewriting data. */
  def writeSidecar(spark: SparkSession, path: String, byCol: String): Unit = {
    // an in-session overwrite of a previously-read path leaves a cached
    // FileIndex serving the OLD file list — refresh before the sidecar
    // scan (same discipline as the streaming seen-sketch sidecar)
    spark.catalog.refreshByPath(path)
    spark.read.parquet(path)
      .select(input_file_name().as("file"), col(byCol))
      .groupBy("file")
      .agg(min(byCol).as("zmin"), max(byCol).as("zmax"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(zonemapDir(path))
  }

  /** Incrementally refresh the sidecar after files were APPENDED to (or
    * removed from — compaction, deletes) an already-mapped table: stats
    * are computed for the files NOT yet in the sidecar only, so the scan
    * cost is O(new files' rows), not O(table) — the difference between a
    * streaming/CDC append cadence (F26, F10) being able to keep zone maps
    * fresh and the sidecar rotting after the first append. Sidecar rows
    * for files that disappeared are dropped, so the refreshed sidecar
    * always equals what a full [[writeSidecar]] rebuild would produce on
    * the current tree (spec-pinned). Returns (files scanned, files
    * dropped); (0, 0) means the sidecar was already current and nothing
    * was rewritten. A table never mapped before degenerates to the full
    * build (every file is new). */
  def appendSidecar(spark: SparkSession, path: String, byCol: String): (Int, Int) = {
    // `inputFiles` and `input_file_name()` render the same file with
    // different URI spellings (file:/ vs file:///) — compare on paths
    def norm(f: String): String =
      try new java.net.URI(f).getPath catch { case _: Exception => f }
    spark.catalog.refreshByPath(path)
    // a table whose every file was deleted (full compaction, delete-all)
    // no longer infers a schema — treat it as zero current files and let
    // the merge drop every stale sidecar row
    val current =
      try spark.read.parquet(path).inputFiles.toSeq
      catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty[String] }
    val currentNorm = current.map(norm).toSet
    val zdir = zonemapDir(path)
    // the old sidecar is O(files) rows — small enough to hold on the
    // driver, which also sidesteps overwrite-while-reading on zdir
    val (oldSchema, old) =
      try {
        spark.catalog.refreshByPath(zdir)
        val df = spark.read.parquet(zdir).select("file", "zmin", "zmax", "n_rows")
        (Some(df.schema), df.collect())
      } catch {
        case _: org.apache.spark.sql.AnalysisException =>
          (None, Array.empty[org.apache.spark.sql.Row])
      }
    val oldNorm = old.map(r => norm(r.getString(0))).toSet
    val newFiles = current.filterNot(f => oldNorm.contains(norm(f))).sorted
    val kept = old.filter(r => currentNorm.contains(norm(r.getString(0))))
    val dropped = old.length - kept.length
    if (newFiles.isEmpty && dropped == 0) return (0, 0)
    val newStats =
      if (newFiles.isEmpty) None
      else Some(spark.read.option("basePath", path).parquet(newFiles: _*)
        .select(input_file_name().as("file"), col(byCol))
        .groupBy("file")
        .agg(min(byCol).as("zmin"), max(byCol).as("zmax"),
          count(lit(1)).as("n_rows")))
    val keptDf = oldSchema.map(sc => spark.createDataFrame(
      java.util.Arrays.asList(kept: _*), sc))
    val merged = (newStats, keptDf) match {
      case (Some(n), Some(k)) => n.unionByName(k)
      case (Some(n), None) => n
      case (None, Some(k)) => k
      case (None, None) => return (0, 0) // unreachable: guarded above
    }
    merged.coalesce(1).write.mode("overwrite").parquet(zdir)
    (newFiles.size, dropped)
  }

  /** The files whose [zmin, zmax] zone intersects [lo, hi], plus the
    * total file count — the pruning decision itself, exposed for specs
    * and scan planning. O(files) work, no data read. */
  def planFiles(spark: SparkSession, path: String,
      lo: Long, hi: Long): (Seq[String], Int) = {
    spark.catalog.refreshByPath(zonemapDir(path)) // sidecar may be rewritten
    val zmDf = spark.read.parquet(zonemapDir(path))
      .select("file", "zmin", "zmax")
    // the long-range API needs long zones — a sidecar built on another
    // type would otherwise surface as a bare ClassCastException per row
    require(zmDf.schema("zmin").dataType ==
        org.apache.spark.sql.types.LongType,
      s"zone map at $path is keyed by ${zmDf.schema("zmin").dataType.sql}, " +
        "not BIGINT — planFiles/readRange serve long ranges only")
    val zm = zmDf.collect() // O(files) sidecar rows
    val keep = zm.filter(r => !r.isNullAt(1) &&
      r.getLong(2) >= lo && r.getLong(1) <= hi)
    (keep.map(_.getString(0)).toSeq, zm.length)
  }

  /** Key-SET pruning (r10; join shape bin-decomposed r11): the files
    * whose [zmin, zmax] zone contains at least one of `keys` — the
    * point-lookup sibling of [[planFiles]]'s single interval, for
    * probe-style reads (a batch's bigram hashes against a standing LM
    * table, a CDC batch's keys against a snapshot). The containment join
    * is NOT a keys×zones nested loop (O(|batch| × |mapped files|) range
    * predicates — the planning join itself would become the append
    * bottleneck once the standing table maps 10⁴⁺ files): it is the
    * E17/G28 bin decomposition. Both sides land in power-of-two bins via
    * an arithmetic right shift sized to the WIDEST zone — so every zone
    * covers at most two bins, the exploded broadcast is ≤ 2·files rows,
    * and each key equi-joins only the zones sharing its bin, with the
    * exact [zmin, zmax] check as the residual. Planning cost is
    * O(|keys| + files), whole-stage-codegen hash join throughout
    * (plan-pinned in ZoneMapSpec). On a range-clustered layout the kept
    * file count is ≤ min(files, distinct keys): a bounded probe stays
    * bounded no matter how large the standing table grows, which is the
    * difference between an incremental job's cost tracking its batch and
    * tracking the corpus. Returns (kept files, total mapped files). */
  def planFilesForKeys(spark: SparkSession, path: String,
      keys: DataFrame): (Seq[String], Int) = {
    spark.catalog.refreshByPath(zonemapDir(path))
    val zmDf = spark.read.parquet(zonemapDir(path))
      .select("file", "zmin", "zmax")
    require(zmDf.schema("zmin").dataType ==
        org.apache.spark.sql.types.LongType,
      s"zone map at $path is keyed by ${zmDf.schema("zmin").dataType.sql}, " +
        "not BIGINT — planFilesForKeys serves long keys only")
    // O(files) sidecar rows on the driver — the planFiles discipline
    val zm = zmDf.collect()
    val zones = zm.filter(!_.isNullAt(1))
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    if (zones.isEmpty) return (Seq.empty, zm.length)
    val kept = keyProbeMatches(spark, keys, zones)
      .select("file").distinct()
      .collect().map(_.getString(0)).toSeq
    (kept, zm.length)
  }

  /** The bin-decomposed containment join behind [[planFilesForKeys]],
    * exposed (package-private) so the spec can pin its plan shape and
    * its floor-division semantics on negative domains. Returns the
    * matched (k, file) pairs (pre-distinct). The shift is the smallest s
    * with 2^s ≥ the widest zone: an arithmetic right shift is exact
    * floor division by 2^s for ANY signed long — no subtraction, so no
    * overflow on domains spanning the full int64 range (where a
    * (k − lo) rebasing would wrap). Degenerate layouts stay correct:
    * one zone spanning ~the whole domain forces s → 63, collapsing to
    * ≤ 2 bins — the broadcast-everything cost the legacy nested loop
    * paid always, now paid only when pruning is hopeless anyway. */
  private[graft] def keyProbeMatches(spark: SparkSession, keys: DataFrame,
      zones: Seq[(String, Long, Long)]): DataFrame = {
    import spark.implicits._
    val widest = zones.map(z => BigInt(z._3) - BigInt(z._2) + 1).max
    val shift = (0 to 62).find(s => (BigInt(1) << s) >= widest).getOrElse(63)
    val binned = zones.flatMap { case (f, zmin, zmax) =>
      ((zmin >> shift) to (zmax >> shift)).map(b => (b, f, zmin, zmax))
    }.toDF("bin", "file", "zmin", "zmax")
    keys.toDF("k").distinct()
      .withColumn("bin", shiftright(col("k"), shift))
      .join(broadcast(binned), "bin")
      .filter(col("k") >= col("zmin") && col("k") <= col("zmax"))
      .select("k", "file")
  }

  /** Probe read served through the zone map: only files whose zone holds
    * at least one key reach the parquet reader. The caller's own
    * equi-join supplies the residual row filter (zones admit whole
    * files). An empty kept list reads nothing but keeps the schema. */
  def readForKeys(spark: SparkSession, path: String,
      keys: DataFrame): DataFrame = {
    val (files, _) = planFilesForKeys(spark, path, keys)
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.option("basePath", path).parquet(files: _*)
  }

  /** Range scan served through the zone map: only overlapping files are
    * handed to the parquet reader; the residual row filter still applies
    * (zones admit whole files, rows inside still need the predicate). */
  def readRange(spark: SparkSession, path: String, byCol: String,
      lo: Long, hi: Long): DataFrame = {
    val (files, _) = planFiles(spark, path, lo, hi)
    if (files.isEmpty) {
      spark.read.parquet(path).filter(lit(false))
    } else {
      // basePath keeps directory-partition columns (e.g. source=…) in
      // the schema when individual files are handed to the reader
      spark.read.option("basePath", path).parquet(files: _*)
        .filter(col(byCol) >= lo && col(byCol) <= hi)
    }
  }
}
