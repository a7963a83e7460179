package graft

import graft.operators.{VectorStore, VectorStoreLex}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** G51 (r16): dense-plane maintenance — retrainCells re-derives every
  * learned artifact over the CURRENT corpus through the creation code
  * path itself, so the contract is exact: a churned store (appends +
  * edit + delete) retrained is BIT-FOR-BIT the store a fresh ingest of
  * the surviving docs produces — index rows, PQ codebook, OPQ perm,
  * cell centroids, residual codebook, and the recreated lexical sidecar
  * (batch_tag preservation is exercised separately). Crash windows
  * follow the G42/compactLex discipline: every injected kill point
  * recovers to exactly pre- or post-retrain serving state. */
class RetrainSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)
  private def p(s: String) = new org.apache.hadoop.fs.Path(s)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def sortedRows(dir: String): Seq[String] = {
    spark.catalog.refreshByPath(dir)
    rows(spark.read.parquet(dir))
  }

  /** Build a churned store: create on docs < 40, append 40–60, edit doc
    * 7 (new content = doc 107's text), delete doc 9. Returns (dir, the
    * surviving final docs frame). */
  private def churned(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("graft_rt").toString + "/index"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    assert(VectorStore.ingest(docs.filter(col("doc_id") < 40), dir) > 0)
    assert(VectorStore.ingest(docs.filter(
      col("doc_id") >= 40 && col("doc_id") < 60), dir, mode = "append") > 0)
    val newDoc = docs.filter(col("doc_id") === 107)
      .select(lit(7L).as("doc_id"), col("text"))
    VectorStore.edit(spark, dir, Seq(7L), newDoc)
    VectorStore.delete(spark, dir, Seq(9L))
    val finalDocs = docs.filter(col("doc_id") < 60 &&
        col("doc_id") =!= 7 && col("doc_id") =!= 9)
      .unionByName(newDoc)
    (dir, finalDocs)
  }

  test("retrained churned store == fresh ingest, bit for bit on every plane") {
    val (dir, finalDocs) = churned()
    val freshDir = Files.createTempDirectory("graft_rt_f").toString + "/index"
    assert(VectorStore.ingest(finalDocs, freshDir) > 0)
    // sanity: BEFORE retrain the artifact planes differ (frozen on the
    // creation batch) — otherwise this test proves nothing
    assert(rows(spark.read.parquet(s"$dir/_graft_cells/centroids.parquet"))
      != rows(spark.read.parquet(s"$freshDir/_graft_cells/centroids.parquet")),
      "churned store's frozen cells already match fresh — test degenerate")

    val n = VectorStore.retrainCells(spark, dir)
    assert(n > 0)
    assert(sortedRows(dir) == sortedRows(freshDir),
      "index rows diverged from fresh creation")
    for (sc <- Seq("_graft_pq/codebook.parquet", "_graft_pq/perm.parquet",
        "_graft_pq/rescb.parquet", "_graft_cells/centroids.parquet",
        "_graft_lex/postings", "_graft_lex/doclog")) {
      assert(rows(spark.read.parquet(s"$dir/$sc"))
        == rows(spark.read.parquet(s"$freshDir/$sc")),
        s"$sc diverged from fresh creation")
    }
    // ...and the staged dir + manifest are gone, zone maps rebuilt
    assert(!fs.exists(p(s"$dir/_graft_retrain")))
    assert(!fs.exists(p(s"$dir/_graft_manifest/retrain.json")))
    assert(fs.exists(p(s"$dir/_graft_zonemap")))
    // serving agreement end to end (cells + hybrid)
    val q = spark.read.parquet(freshDir)
      .filter(col("doc_id") === 21 && col("chunk_ix") === 1)
      .select("chunk").collect().head.getString(0)
    assert(rows(VectorStore.searchCells(spark, dir, q))
      == rows(VectorStore.searchCells(spark, freshDir, q)))
    assert(rows(VectorStoreLex.searchHybrid(spark, dir, q))
      == rows(VectorStoreLex.searchHybrid(spark, freshDir, q)))
  }

  test("retrain preserves per-row batch_tags (the time axis survives)") {
    val dir = Files.createTempDirectory("graft_rt_t").toString + "/index"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    assert(VectorStore.ingest(docs.filter(col("doc_id") < 20), dir,
      batchTag = 1L) > 0)
    assert(VectorStore.ingest(docs.filter(
      col("doc_id") >= 20 && col("doc_id") < 30), dir,
      mode = "append", batchTag = 2L) > 0)
    val before = spark.read.parquet(dir)
      .select("doc_id", "chunk_ix", "batch_tag")
      .collect().map(_.toString).sorted.toSeq
    VectorStore.retrainCells(spark, dir)
    val after = spark.read.parquet(dir)
      .select("doc_id", "chunk_ix", "batch_tag")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "retrain moved batch_tags")
    // and the rebuilt zone maps still prune by tag
    val tagged = VectorStore.searchTagRange(spark, dir,
      spark.read.parquet(dir).filter(col("doc_id") === 25 &&
        col("chunk_ix") === 1).select("chunk").collect().head.getString(0),
      lo = 2L, hi = 2L, k = 3)
    assert(tagged.collect().forall(_.getAs[Long]("doc_id") >= 20L),
      "zone-map tag pruning broken after retrain")
  }

  test("crash windows: every kill point recovers to pre- or post-retrain state") {
    val (dir, finalDocs) = churned()
    val freshDir = Files.createTempDirectory("graft_rt_c").toString + "/index"
    assert(VectorStore.ingest(finalDocs, freshDir) > 0)
    val preRows = sortedRows(dir)
    val postRows = sortedRows(freshDir)

    // window 1: crash DURING staging (stage dir exists, no manifest) —
    // recover sweeps the orphan, store bit-unchanged
    VectorStore.stageRetrain(spark, dir)
    fs.delete(p(s"$dir/_graft_manifest/retrain.json"), false)
    VectorStore.recover(spark, dir)
    assert(!fs.exists(p(s"$dir/_graft_retrain")), "orphan stage not swept")
    assert(sortedRows(dir) == preRows, "pre-commit crash changed the store")

    // window 2: manifest committed, nothing swapped — recover completes
    // the retrain to exactly the fresh-creation state
    VectorStore.stageRetrain(spark, dir)
    VectorStore.recover(spark, dir)
    assert(sortedRows(dir) == postRows, "post-commit recovery != retrained")
    assert(!fs.exists(p(s"$dir/_graft_manifest/retrain.json")))

    // window 3: crash MID-swap (one plane moved, others staged) — replay
    // finishes the rest; final state identical
    val (dir2, _) = churned()
    VectorStore.stageRetrain(spark, dir2)
    val stagedPq = p(s"${dir2}/_graft_retrain/store/_graft_pq")
    fs.delete(p(s"$dir2/_graft_pq"), true)
    assert(fs.rename(stagedPq, p(s"$dir2/_graft_pq")))
    VectorStore.recover(spark, dir2)
    assert(sortedRows(dir2) == postRows, "mid-swap recovery != retrained")

    // window 4: swap complete, manifest not retired — replay is a no-op
    // rebuild that retires the manifest and changes nothing
    val tmp = p(s"$dir2/_graft_manifest/retrain.tmp")
    val out = fs.create(tmp, true)
    try out.write("{}".getBytes("UTF-8")) finally out.close()
    fs.rename(tmp, p(s"$dir2/_graft_manifest/retrain.json"))
    VectorStore.recover(spark, dir2)
    assert(sortedRows(dir2) == postRows)
    assert(!fs.exists(p(s"$dir2/_graft_manifest/retrain.json")))
  }

  test("graph sidecar stays valid across retrain (edges reference raw vectors)") {
    val dir = Files.createTempDirectory("graft_rt_g").toString + "/index"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    assert(VectorStore.ingest(docs.filter(col("doc_id") < 30), dir) > 0)
    assert(VectorStore.buildGraph(spark, dir) > 0)
    val edgesBefore = rows(spark.read.parquet(s"$dir/_graft_graph/edges.parquet"))
    val q = spark.read.parquet(dir)
      .filter(col("doc_id") === 11 && col("chunk_ix") === 1)
      .select("chunk").collect().head.getString(0)
    val servedBefore = rows(VectorStore.searchGraph(spark, dir, q))
    VectorStore.retrainCells(spark, dir)
    assert(rows(spark.read.parquet(s"$dir/_graft_graph/edges.parquet"))
      == edgesBefore, "retrain touched the graph sidecar")
    assert(rows(VectorStore.searchGraph(spark, dir, q)) == servedBefore,
      "graph serving changed across retrain")
  }
}
