package graft

import graft.operators.VectorStore
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** G46's published tradeoff: the λ sweep of the diversified cell read —
  * recall@5 vs the exact full-scan truth AND the served set's redundancy
  * (mean pairwise cosine of the 5 picks, averaged over queries) at each
  * λ ∈ {1.0, 0.7, 0.5, 0.3}. λ=1.0 is the plain cell read (spec-pinned
  * identical), so its row doubles as the reference point; the sweep
  * shows what recall each unit of de-duplication costs on THIS corpus.
  * Run: `sbt "Test/runMain graft.MmrProfile"`; lands in
  * bench/mmr_r13.json. */
object MmrProfile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mmr").toString + "/index"
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
    require(VectorStore.ingest(docs, dir) > 0)
    val index = spark.read.parquet(dir)
      .select(col("doc_id"), col("chunk_ix"), col("chunk"),
        col("embedding"), col("raw"))
      .cache()
    val qrows = index.filter(col("chunk_ix") === 1 && col("doc_id") % 40 === 0)
      .orderBy("doc_id").limit(10)
      .select(col("chunk").as("qtext"), col("embedding").as("qemb"))
      .collect()
    val queries = qrows.map(_.getString(0)).toSeq
    val qdf = { import spark.implicits._
      qrows.zipWithIndex.map { case (r, i) =>
        (i.toLong, r.getSeq[Double](1)) }.toSeq.toDF("query_id", "qemb") }
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
    val raws = index.select("doc_id", "chunk_ix", "raw").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Long](2).toArray)
      .toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var d = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0
      else d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    def grade(res: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val got = res.select("query_id", "doc_id", "chunk_ix").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSeq).toMap
      val recall = truth.keys.toSeq.map { q =>
        truth(q).intersect(got.getOrElse(q, Seq.empty).toSet)
          .size.toDouble / 5
      }.sum / truth.size
      val redundancy = got.values.map { keys =>
        val vs = keys.flatMap(raws.get)
        val ps = for (i <- vs.indices; j <- vs.indices if i < j)
          yield cos(vs(i), vs(j))
        if (ps.isEmpty) 0.0 else ps.sum / ps.size
      }.sum / got.size
      (recall, redundancy)
    }
    val sweep = Seq(1.0, 0.7, 0.5, 0.3).map { lam =>
      val (rec, red) = grade(VectorStore.searchDiverseBatch(
        spark, dir, queries, k = 5, shortlist = 20, lambda = lam))
      f""""lambda_$lam":{"recall":$rec%.3f,"redundancy":$red%.3f}"""
    }
    println(s"""{"metric":"mmr_tradeoff","k":5,"shortlist":20,""" +
      s""""queries":${truth.size},${sweep.mkString(",")}}""")
    spark.stop()
  }
}
