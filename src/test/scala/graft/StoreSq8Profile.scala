package graft

import graft.operators.VectorStore
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** G44/G45 cost evidence: the sq8 rung's recall sits in
  * bench/store_recall_r12.json; this main publishes the COST axis — the
  * on-disk bytes each serving read's candidate scan touches (parquet
  * footer column-chunk sizes: `raw` for the exact paths, `scodes`+
  * `sscale` for sq8, `rcodes` for residual-PQ) and min-of-3 serve walls
  * for the three cell-probed reads plus both graph walks at identical
  * knobs, on a sf0.1 store. Run: `sbt "Test/runMain
  * graft.StoreSq8Profile"`; lands in bench/store_sq8_r12.json. */
object StoreSq8Profile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sq8p").toString + "/index"
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    require(VectorStore.ingest(docs, dir) > 0)
    require(VectorStore.buildGraph(spark, dir) > 0)
    // on-disk column bytes across every index file (sidecar dirs under
    // `_...` are not index columns; walk only bucket=/cell= data files)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(conf)
    val files = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet") && !f.toString.contains("/_graft"))
          buf += f
      }
      buf.toSeq
    }
    val colBytes = scala.collection.mutable.Map.empty[String, Long]
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.forEach { b =>
          b.getColumns.forEach { c =>
            val top = c.getPath.toArray.head
            colBytes(top) = colBytes.getOrElse(top, 0L) + c.getTotalSize
          }
        }
      } finally reader.close()
    }
    val queries = spark.read.parquet(dir)
      .filter(col("chunk_ix") === 1 && col("doc_id") % 400 === 0)
      .orderBy("doc_id").limit(10)
      .select("chunk").collect().map(_.getString(0)).toSeq
    def minOf3(run: () => Unit): Double =
      (1 to 3).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val walls = Seq(
      "search_cells" ->
        minOf3(() => mat(VectorStore.searchCellsBatch(spark, dir, queries))),
      "search_sq8_cells" ->
        minOf3(() => mat(VectorStore.searchSq8CellsBatch(spark, dir, queries))),
      "search_compressed_cells" ->
        minOf3(() => mat(VectorStore.searchCompressedCellsBatch(spark, dir, queries))),
      "search_graph" ->
        minOf3(() => mat(VectorStore.searchGraphBatch(spark, dir, queries))),
      "search_graph_sq8" ->
        minOf3(() => mat(VectorStore.searchGraphSq8Batch(spark, dir, queries))))
    val wallsJson = walls.map { case (n, s) => f""""$n":$s%.3f""" }.mkString(",")
    val keep = Seq("raw", "scodes", "sscale", "rcodes", "codes", "embedding")
    val bytesJson = keep.flatMap(k => colBytes.get(k).map(v => s""""$k":$v"""))
      .mkString(",")
    println(s"""{"metric":"store_sq8_cost","sf":"0.1","queries":${queries.size},""" +
      s""""serve_wall_s":{$wallsJson},"column_disk_bytes":{$bytesJson}}""")
    spark.stop()
  }
}
