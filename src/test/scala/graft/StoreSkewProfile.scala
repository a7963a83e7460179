package graft

import graft.operators.VectorStore
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** r11: the store's OWN lifecycle under the hot-cell twin, across a 10×
  * corpus span (sf0.01 → sf0.1 documents twins) — the two measurements
  * the r10 verdict left open:
  *
  *  1. **Ingest/serve/splice under a 30% hot cell** (SkewCorpus
  *     .writeDocSkew: one near-dup family = one Voronoi cell swallowing
  *     ~a third of all chunks, one LSH bucket flooding). skew_r10's
  *     label-skew twin covered the QUERY-side IVF-PQ operators; this
  *     rehearses `ingest` (creation: codebook + perm + cells + residual
  *     training all see the hot family), `searchCellsBatch` (a probed
  *     hot cell's candidate fan is ~30% of the index), and
  *     `spliceGraph` (the hot BUCKET's candidate pairs are quadratic in
  *     its membership — the measured cap question).
  *
  *  2. **edit() vs delete + re-ingest + full rebuild**: the whole point
  *     of the splice composition is O(touched buckets) — the edit wall
  *     should track the edited docs' bucket footprint while the rebuild
  *     wall tracks the index, so the 10× span separates them.
  *
  * Protocol: min-of-2 per measurement (fresh store per ingest rep),
  * serialized on an idle box, SPARK_GRAFT_CPUS=8. Run:
  * `sbt "Test/runMain graft.StoreSkewProfile"`; numbers land in
  * bench/store_skew_r11.json. */
object StoreSkewProfile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark

    def time[A](body: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = body
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def minOf2(body: => Unit): Double =
      (1 to 2).map(_ => time(body)._1).min

    val out = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").map { src =>
      val twin = java.nio.file.Files
        .createTempDirectory("graft_ssp_twin").toString
      SkewCorpus.writeDocSkew(spark, src, twin)
      val docs = spark.read.parquet(s"$twin/documents.parquet")
        .select("doc_id", "text").localCheckpoint(true)
      val nDocs = docs.count()

      // --- 1a: creation ingest under the hot family (fresh dir per rep)
      var dir = ""
      val tIngest = (1 to 2).map { _ =>
        dir = java.nio.file.Files
          .createTempDirectory("graft_ssp").toString + "/index"
        time(VectorStore.ingest(docs, dir))._1
      }.min
      // hot-cell evidence: the biggest cell's share of all chunks
      val byCell = spark.read.parquet(dir).groupBy("cell").count()
        .collect().map(_.getLong(1))
      val hotShare = byCell.max.toDouble / byCell.sum
      val byBucket = spark.read.parquet(dir).groupBy("bucket").count()
        .collect().map(_.getLong(1))
      val hotBucketShare = byBucket.max.toDouble / byBucket.sum

      // --- 1b: hot-cell serving (10 verbatim-chunk queries; some land in
      // the family, so probes include the hot cell)
      val queries = spark.read.parquet(dir)
        .filter(col("chunk_ix") === 1 && col("doc_id") % 40 === 0)
        .orderBy("doc_id").limit(10)
        .select("chunk").collect().map(_.getString(0)).toSeq
      val tServe = minOf2 {
        VectorStore.searchCellsBatch(spark, dir, queries, k = 5)
          .foreach((_: org.apache.spark.sql.Row) => ())
      }

      // --- 1c: graph build + INSERT splice of a 10-doc append whose text
      // belongs to the hot family (worst-case: the splice re-solves the
      // flooded bucket)
      val (tBuild, _) = time(VectorStore.buildGraph(spark, dir))
      val hotTpl = spark.read.parquet(s"$twin/documents.parquet")
        .filter(col("doc_id") === 20).select("text")
        .collect().head.getString(0)
      import spark.implicits._
      val appendDocs = (0 until 10).map { i =>
        (9000000L + i, s"fam$i " + hotTpl) }.toDF("doc_id", "text")
      require(VectorStore.ingest(appendDocs, dir, mode = "append") > 0)
      val (tSplice, _) = time(
        VectorStore.spliceGraph(spark, dir, (0 until 10).map(9000000L + _)))

      // --- 2: edit() (splice-maintained) vs delete + append + FULL
      // rebuild, 5 docs each, disjoint victim sets so both run on a
      // same-sized store. Measured on the PLAIN corpus: splice cost is
      // O(touched buckets' pair count) BY DESIGN, so on the hot twin an
      // edit inside the flooded bucket pays ~the whole graph's cost
      // either way (the hot bucket's pairs dominate quadratically) —
      // the footprint-bounded claim is a balanced-layout property.
      val pdocs = Tables.documents(spark, src).select("doc_id", "text")
      val pdir = java.nio.file.Files
        .createTempDirectory("graft_ssp_plain").toString + "/index"
      require(VectorStore.ingest(pdocs, pdir) > 0)
      val (tBuildPlain, _) = time(VectorStore.buildGraph(spark, pdir))
      val editIdsA = Seq(30L, 31L, 32L, 33L, 34L)
      val editedA = pdocs
        .filter(col("doc_id").isin(editIdsA.map(Long.box): _*))
        .select(col("doc_id"), concat(lit("edited "), col("text")).as("text"))
      val (tEdit, _) = time(
        VectorStore.edit(spark, pdir, editIdsA, editedA))
      val editIdsB = Seq(40L, 41L, 42L, 43L, 44L)
      val editedB = pdocs
        .filter(col("doc_id").isin(editIdsB.map(Long.box): _*))
        .select(col("doc_id"), concat(lit("edited "), col("text")).as("text"))
      val (tRebuild, _) = time {
        VectorStore.delete(spark, pdir, editIdsB)
        VectorStore.ingest(editedB, pdir, mode = "append")
        VectorStore.buildGraph(spark, pdir)
      }

      (src, nDocs, tIngest, hotShare, hotBucketShare, tServe, tBuild,
        tSplice, tEdit, tRebuild, tBuildPlain)
    }

    val parts = out.map {
      case (src, n, ing, hs, hb, srv, bld, spl, ed, rb, bldP) =>
        val sf = src.split("/").last
        f""""$sf":{"docs":$n,"hot":{"ingest_sec":$ing%.3f,""" +
          f""""hot_cell_share":$hs%.3f,"hot_bucket_share":$hb%.3f,""" +
          f""""serve_cells_sec":$srv%.3f,"graph_build_sec":$bld%.3f,""" +
          f""""splice_append10_sec":$spl%.3f},""" +
          f""""plain":{"graph_build_sec":$bldP%.3f,""" +
          f""""edit5_splice_sec":$ed%.3f,"edit5_rebuild_sec":$rb%.3f}}"""
    }
    val a = out(0); val b = out(1)
    println(s"""{"metric":"store_skew_r11",${parts.mkString(",")},""" +
      f""""ratio_10x_ingest":${b._3 / a._3}%.3f,""" +
      f""""ratio_10x_serve":${b._6 / a._6}%.3f,""" +
      f""""ratio_10x_splice":${b._8 / a._8}%.3f,""" +
      f""""ratio_10x_edit_splice":${b._9 / a._9}%.3f,""" +
      f""""ratio_10x_edit_rebuild":${b._10 / a._10}%.3f}""")
    spark.stop()
  }
}
