package graft

import graft.operators.VectorStore
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** B13's recall-table discipline applied to the G20 store: every serving
  * rung measured against the EXACT full-scan truth on one index, so the
  * store's speed/recall ladder is a published number, not scaladoc
  * prose. Truth: queries are verbatim stored chunks, whose embedding IS
  * the stored row's embedding — the exact top-5 by unit-vector dot needs
  * only the index itself (one 10-query broadcast scan). Rungs: bucket
  * multiprobe (`search`), learned cells (`searchCells`), bucket ADC +
  * re-rank (`searchCompressed`), the composed IVFPQ read
  * (`searchCompressedCells`), graph walk (`searchGraph`), MRL prefix
  * (`searchTruncated` dims=16). Run: `sbt "Test/runMain
  * graft.StoreRecallProfile"`; lands in bench/store_recall_r11.json. */
object StoreRecallProfile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft_srp").toString + "/index"
    // meta rides the ingest so the r16 filtered rungs are measurable:
    // channel = ch{doc_id % 4}
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
      .withColumn("meta", map(lit("channel"),
        concat(lit("ch"), pmod(col("doc_id"), lit(4)).cast("string"))))
    require(VectorStore.ingest(docs, dir) > 0)
    require(VectorStore.buildGraph(spark, dir) > 0)
    val index = spark.read.parquet(dir)
      .select(col("doc_id"), col("chunk_ix"), col("chunk"), col("embedding"))
      .cache()
    // 10 query chunks spread across the corpus (every 40th doc's first)
    val qrows = index.filter(col("chunk_ix") === 1 && col("doc_id") % 40 === 0)
      .orderBy("doc_id").limit(10)
      .select(col("doc_id").as("q_doc"), col("chunk").as("qtext"),
        col("embedding").as("qemb"))
      .collect()
    val queries = qrows.map(_.getString(1)).toSeq
    val qdf = { import spark.implicits._
      qrows.zipWithIndex.map { case (r, i) =>
        (i.toLong, r.getSeq[Double](2)) }.toSeq.toDF("query_id", "qemb") }
    // exact truth: unit-vector dot over the WHOLE index (10-query
    // broadcast — profile-only, the brute baseline a rung table needs)
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
    // filtered truth: exact top-5 among rows matching the ch1 predicate —
    // the honest axis for the filtered rungs (truth restricted the same
    // way the read is, so the number isolates shortlist quality, not the
    // filter's selectivity)
    val truthF = index.filter(pmod(col("doc_id"), lit(4)) === 1)
      .crossJoin(broadcast(qdf))
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), dot.as("dot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "doc_id", "chunk_ix")
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSet).toMap
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select("query_id", "doc_id", "chunk_ix").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSet).toMap
      truth.keys.toSeq.map { q =>
        truth(q).intersect(got.getOrElse(q, Set.empty)).size.toDouble / 5
      }.sum / truth.size
    }
    val rungs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "search_bucket" ->
        (() => VectorStore.searchBatch(spark, dir, queries, k = 5)),
      "search_cells" ->
        (() => VectorStore.searchCellsBatch(spark, dir, queries, k = 5)),
      "search_compressed" ->
        (() => VectorStore.searchCompressedBatch(spark, dir, queries, k = 5)),
      "search_compressed_cells" ->
        (() => VectorStore.searchCompressedCellsBatch(spark, dir, queries, k = 5)),
      // G44 (r12): the int8 rung between the raw cell scan and PQ ADC —
      // same probe budget as search_cells, ~1/8 the candidate-scan bytes
      "search_sq8_cells" ->
        (() => VectorStore.searchSq8CellsBatch(spark, dir, queries, k = 5)),
      // G47 (r13): the dim-count rung — 16-coordinate JL shortlist at
      // search_cells' probe budget, exact full-width re-rank tail
      "search_rp_cells" ->
        (() => VectorStore.searchRpCellsBatch(spark, dir, queries, k = 5)),
      // default = the graph_tune_r11 operating point: bucket-seeded
      // 32/32/4 over cosine-metric edges, sub-bucket cost (spec-pinned
      // >= 0.5); the r10 fixed-global-entry config published as contrast
      "search_graph" ->
        (() => VectorStore.searchGraphBatch(spark, dir, queries, k = 5)),
      // G45 (r12): the DiskANN walk — same knobs as search_graph, hops
      // score from int8 codes (~1/8 bytes/touch), exact final re-rank
      "search_graph_sq8" ->
        (() => VectorStore.searchGraphSq8Batch(spark, dir, queries, k = 5)),
      "search_graph_global_entries" ->
        (() => VectorStore.searchGraphBatch(spark, dir, queries, k = 5,
          entries = 8, beam = 8, hops = 4, seedFromBuckets = false)),
      "search_truncated_d16" ->
        (() => VectorStore.searchTruncatedBatch(spark, dir, queries, k = 5,
          dims = 16)),
      // G49 (r13): Weaviate's read pair over the maintained store — pure
      // BM25 postings and the RRF hybrid. Recall stays measured vs the
      // DENSE exact truth (the table's fixed axis), so the lexical rung
      // reads as the cross-modal baseline and the hybrid rung as how
      // much dense recall the RRF fusion retains while adding a leg.
      "search_lex_bm25" ->
        (() => graft.operators.VectorStoreLex.searchLexBatch(
          spark, dir, queries, k = 5)),
      "search_hybrid" ->
        (() => graft.operators.VectorStoreLex.searchHybridBatch(
          spark, dir, queries, k = 5)))
    val chan1 = element_at(col("meta"), "channel") === "ch1"
    // G50 (r16): the where-filtered rungs, measured against the FILTERED
    // exact truth (same 10 queries; candidates restricted to ch1 both in
    // truth and read, so this is pre-filter shortlist recall)
    val rungsF: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "search_cells_filtered" ->
        (() => VectorStore.searchCellsFilteredBatch(
          spark, dir, queries, chan1, k = 5)),
      "search_hybrid_filtered" ->
        (() => graft.operators.VectorStoreLex.searchHybridFilteredBatch(
          spark, dir, queries, chan1, k = 5)))
    def recallVs(t: Map[Long, Set[(Long, Int)]])(
        res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select("query_id", "doc_id", "chunk_ix").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSet).toMap
      t.keys.toSeq.map { q =>
        t(q).intersect(got.getOrElse(q, Set.empty)).size.toDouble / 5
      }.sum / t.size
    }
    val parts = rungs.map { case (name, build) =>
      f""""$name":${recallOf(build())}%.3f"""
    } ++ rungsF.map { case (name, build) =>
      f""""$name":${recallVs(truthF)(build())}%.3f"""
    }
    println(s"""{"metric":"store_recall","k":5,"queries":${truth.size},${parts.mkString(",")}}""")
    spark.stop()
  }
}
