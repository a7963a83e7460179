package graft

import graft.operators.{VectorStore, VectorStoreLex}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}

/** F34/G42 crash-window atomicity (the r12 verdict's item #4): a kill at
  * ANY point of `edit()` must recover — via `recover()` — to the
  * pre-edit state (crash before the intent manifest commits) or the
  * post-edit state (after), NEVER a partial splice. Each injected crash
  * point replays edit's real sub-steps up to the cut on a byte-copied
  * clone of the pre-edit store, then recovers and compares the full
  * SERVING state (index rows, graph edges, hybrid/lexical reads)
  * against an uninterrupted reference edit. The lexical doclog is a log
  * by design — superseded history rows may differ across crash
  * replays; its keep-latest DERIVED state is what must (and does)
  * match, which the hybrid/lex reads pin. */
class EditCrashSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def copyDir(src: String, dst: String): Unit = {
    val s = Paths.get(src); val d = Paths.get(dst)
    Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
  }

  private def freshClone(pre: String): String = {
    val dir = Files.createTempDirectory("graft_ecr").toString + "/index"
    copyDir(pre, dir)
    spark.catalog.refreshByPath(dir)
    dir
  }

  // the full serving state: index rows (column-name-sorted, row-sorted),
  // graph edge rows, and the hybrid + lexical reads for probe queries
  private def servingState(dir: String, probes: Seq[String]): Seq[Any] = {
    spark.catalog.refreshByPath(dir)
    val idx = spark.read.parquet(dir)
    val rows = idx.select(idx.columns.sorted.map(col).toIndexedSeq: _*)
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    val edges = spark.read.parquet(s"$dir/_graft_graph/edges.parquet")
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    val reads = probes.flatMap { q =>
      VectorStoreLex.searchHybrid(spark, dir, q, k = 5).collect()
        .map(_.toSeq).toSeq ++
        VectorStoreLex.searchLex(spark, dir, q, k = 5).collect()
          .map(_.toSeq).toSeq
    }
    Seq(rows, edges, reads)
  }

  test("edit recovers to pre- or post-edit state from every crash window") {
    val pre = Files.createTempDirectory("graft_ecr_pre").toString + "/index"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    assert(VectorStore.ingest(docs.filter(col("doc_id") < 25), pre) > 0)
    assert(VectorStore.buildGraph(spark, pre) > 0)
    val victim = 7L
    val newDoc = docs.filter(col("doc_id") === 107)
      .select(lit(victim).as("doc_id"), col("text"))
    val probes = Seq(
      spark.read.parquet(pre).filter(col("doc_id") === victim
        && col("chunk_ix") === 1).select("chunk").head().getString(0),
      spark.read.parquet(pre).filter(col("doc_id") === 3
        && col("chunk_ix") === 1).select("chunk").head().getString(0))
    val preState = servingState(pre, probes)

    // reference: the same edit, uninterrupted
    val ref = freshClone(pre)
    val (r, a) = VectorStore.edit(spark, ref, Seq(victim), newDoc)
    assert(r > 0 && a > 0)
    val postState = servingState(ref, probes)
    assert(postState != preState)

    def stage(dir: String): String = {
      val staged = s"$dir/_graft_edit/staged_spec"
      newDoc.write.mode("overwrite").parquet(staged)
      staged
    }
    def commitManifest(dir: String, staged: String): Unit = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val p = new org.apache.hadoop.fs.Path(
        s"$dir/_graft_manifest/edit_spec.json")
      val out = fs.create(p, true)
      try out.write(
        (s"""{"docIds":[$victim],"staged":"$staged",""" +
          """"knobs":[20,5,0]}""").getBytes("UTF-8"))
      finally out.close()
    }

    // P0: crash after staging, BEFORE the manifest commits → pre-edit,
    // and the orphaned staging dir is swept
    {
      val dir = freshClone(pre)
      stage(dir)
      VectorStore.recover(spark, dir)
      assert(servingState(dir, probes) == preState, "P0 not pre-edit")
      assert(!new java.io.File(s"$dir/_graft_edit/staged_spec").exists(),
        "P0 orphan stage not swept")
    }
    // P1: manifest committed, nothing else ran → post-edit
    {
      val dir = freshClone(pre)
      commitManifest(dir, stage(dir))
      assert(VectorStore.recover(spark, dir) == 1)
      assert(servingState(dir, probes) == postState, "P1 not post-edit")
    }
    // P2: crash between the delete sub-step and the graph splice-out
    {
      val dir = freshClone(pre)
      commitManifest(dir, stage(dir))
      VectorStore.delete(spark, dir, Seq(victim))
      VectorStore.recover(spark, dir)
      assert(servingState(dir, probes) == postState, "P2 not post-edit")
    }
    // P3: crash between the graph splice-out and the append
    {
      val dir = freshClone(pre)
      commitManifest(dir, stage(dir))
      VectorStore.delete(spark, dir, Seq(victim))
      VectorStore.spliceGraphDelete(spark, dir, Seq(victim))
      VectorStore.recover(spark, dir)
      assert(servingState(dir, probes) == postState, "P3 not post-edit")
    }
    // P4: crash after the append, before the graph splice-in — the
    // replay's delete removes the half-spliced new rows, then redoes
    // the append + splice
    {
      val dir = freshClone(pre)
      val staged = stage(dir)
      commitManifest(dir, staged)
      VectorStore.delete(spark, dir, Seq(victim))
      VectorStore.spliceGraphDelete(spark, dir, Seq(victim))
      VectorStore.ingest(spark.read.parquet(staged), dir, mode = "append")
      VectorStore.recover(spark, dir)
      assert(servingState(dir, probes) == postState, "P4 not post-edit")
    }
  }
}
