package graft

import graft.operators.VectorStore
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G51's measurement (the r13 verdict's item #4): recall AND scan
  * fraction under CHURN for the cell-geometry rungs, before/after
  * [[VectorStore.retrainCells]] (== fresh-created, by RetrainSpec's
  * bit-for-bit pin). Two drift shapes:
  *
  *   - `lang_drift`: store created on the English slice, the other four
  *     languages appended — the mild real-world shape (different token
  *     universes, spread mass).
  *   - `aniso_family`: store created on the non-family docs, then
  *     writeDocSkew's 30% near-dup family appended — one tight embedding
  *     region the frozen creation-time cells never saw, the adversarial
  *     shape that swells ONE frozen cell (every probe of it scans that
  *     fraction of the corpus).
  *
  * Scan fraction is the cost axis frozen-cell drift actually degrades;
  * recall@5 is measured against the exact full-scan truth over the
  * final corpus with half the queries drawn from the drifted slice.
  * Run: `sbt "Test/runMain graft.StoreChurnProfile"`; lands in
  * bench/store_recall_churn_r16.json (one JSON line per phase). */
object StoreChurnProfile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.01"

    def phase(name: String, createDocs: DataFrame, appendDocs: DataFrame,
        driftedIds: Set[Long]): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_churn_$name").toString + "/index"
      require(VectorStore.ingest(createDocs, dir) > 0)
      require(VectorStore.ingest(appendDocs, dir, mode = "append") > 0)

      val index = spark.read.parquet(dir)
        .select(col("doc_id"), col("chunk_ix"), col("chunk"), col("embedding"))
        .localCheckpoint(true)
      val firstChunks = index.filter(col("chunk_ix") === 1)
        .select(col("doc_id"), col("chunk").as("qtext"),
          col("embedding").as("qemb"))
        .collect().sortBy(_.getLong(0))
      def spread(rows: Array[org.apache.spark.sql.Row], n: Int) =
        if (rows.isEmpty) rows
        else rows.grouped(math.max(1, rows.length / n)).map(_.head)
          .take(n).toArray
      val drifted = spread(firstChunks.filter(r => driftedIds(r.getLong(0))), 6)
      val anchors = spread(firstChunks.filterNot(r => driftedIds(r.getLong(0))), 6)
      val qrows = drifted ++ anchors
      val queries = qrows.map(_.getString(1)).toSeq
      val qdf = { import spark.implicits._
        qrows.zipWithIndex.map { case (r, i) =>
          (i.toLong, r.getSeq[Double](2)) }.toSeq.toDF("query_id", "qemb") }
      val dot = aggregate(zip_with(col("embedding"), col("qemb"),
        (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("dot").desc, col("doc_id"), col("chunk_ix"))
      val truth = index.crossJoin(broadcast(qdf))
        .select(col("query_id"), col("doc_id"), col("chunk_ix"), dot.as("dot"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "doc_id", "chunk_ix")
        .collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSet).toMap
      def recallOf(res: DataFrame): Double = {
        val got = res.select("query_id", "doc_id", "chunk_ix").collect()
          .groupBy(_.getLong(0)).view
          .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSet).toMap
        truth.keys.toSeq.map { q =>
          truth(q).intersect(got.getOrElse(q, Set.empty)).size.toDouble / 5
        }.sum / truth.size
      }
      def rungs(): Seq[(String, Double)] = Seq(
        "search_cells" -> recallOf(
          VectorStore.searchCellsBatch(spark, dir, queries, k = 5)),
        "search_sq8_cells" -> recallOf(
          VectorStore.searchSq8CellsBatch(spark, dir, queries, k = 5)),
        "search_compressed_cells" -> recallOf(
          VectorStore.searchCompressedCellsBatch(spark, dir, queries, k = 5)))
      def scanFraction(nprobe: Int): Double = {
        spark.catalog.refreshByPath(dir)
        val sizes = spark.read.parquet(dir).groupBy("cell").count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val total = sizes.values.sum.toDouble
        val probes = VectorStore.probedCells(spark, dir, queries, nprobe)
        probes.values.map(cells =>
          cells.map(c => sizes.getOrElse(c, 0L)).sum / total).sum / probes.size
      }
      val before = rungs()
      val scanB1 = scanFraction(1); val scanB2 = scanFraction(2)
      val t0 = System.nanoTime()
      val n = VectorStore.retrainCells(spark, dir)
      val retrainSec = (System.nanoTime() - t0) / 1e9
      val after = rungs()
      val scanA1 = scanFraction(1); val scanA2 = scanFraction(2)
      val parts = before.map { case (k, v) => f""""${k}_churned":$v%.3f""" } ++
        after.map { case (k, v) => f""""${k}_retrained":$v%.3f""" }
      s"""{"metric":"store_recall_churn","phase":"$name","k":5,""" +
        s""""queries":${truth.size},"drifted_queries":${drifted.length},""" +
        f""""chunks":$n,"retrain_sec":$retrainSec%.1f,""" +
        f""""scan_frac_np1_churned":$scanB1%.3f,"scan_frac_np1_retrained":$scanA1%.3f,""" +
        f""""scan_frac_np2_churned":$scanB2%.3f,"scan_frac_np2_retrained":$scanA2%.3f,""" +
        s"${parts.mkString(",")}}"
    }

    // phase 1: language drift — mild, spread mass
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "lang")
    val nonEn = docs.filter(col("lang") =!= "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val p1 = phase("lang_drift",
      docs.filter(col("lang") === "en").select("doc_id", "text"),
      docs.filter(col("lang") =!= "en").select("doc_id", "text"),
      nonEn)

    // phase 2: the aniso near-dup family — one tight region appended
    // after creation (writeDocSkew's 30% family, the adversarial shape)
    val twin = java.nio.file.Files
      .createTempDirectory("graft_churn_twin").toString
    SkewCorpus.writeDocSkew(spark, sf, twin)
    val sdocs = spark.read.parquet(s"$twin/documents.parquet")
      .select("doc_id", "text").filter(col("text").isNotNull)
    val famPred = col("doc_id") >= 20 &&
      pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(10)) < 3
    val famIds = sdocs.filter(famPred)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val p2 = phase("aniso_family",
      sdocs.filter(!famPred), sdocs.filter(famPred), famIds)

    println(p1)
    println(p2)
    spark.stop()
  }
}
