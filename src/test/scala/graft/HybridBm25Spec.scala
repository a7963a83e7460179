package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B18b: the BM25 lexical leg must actually change the shortlist — the
  * saturating, length-normalized scorer prefers a short exact-match doc
  * over a long term-stuffed one, where plain tf·idf does the opposite.
  * Both hybrids run on one planted corpus; the assertion is on the legs'
  * relative order of the two planted docs. */
class HybridBm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-bm25-hybrid").toString
    val filler = (7L to 20L).map(i => (i, s"pad$i " * 5))
    val docs = Seq(
      (0L, "foo"),                            // the query doc
      (5L, ("foo " * 3) + ("stuff " * 27)),   // long, term-stuffed: tf=3, dl=30
      (6L, "foo tail")                        // short exact hit: tf=1, dl=2
    ) ++ filler
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def lexRanks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.filter(col("query_id") === 0L && col("lex_rank").isNotNull)
      .select("doc_id", "lex_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("tf*idf leg ranks the stuffed doc first; BM25 leg inverts it") {
    val tfidf = lexRanks(Similarity.annHybrid(spark, dir))
    val bm25 = lexRanks(Similarity.annHybridBm25(spark, dir))
    assert(tfidf(5L) < tfidf(6L),
      s"plain tf*idf should reward raw tf: $tfidf")
    assert(bm25(6L) < bm25(5L),
      s"BM25 should length-normalize the stuffed doc below the short hit: $bm25")
  }

  test("both hybrids emit the same contract: 5 fused rows, same schema") {
    val a = Similarity.annHybrid(spark, dir)
    val b = Similarity.annHybridBm25(spark, dir)
    assert(a.schema == b.schema, "hybrid twins diverged in schema")
    assert(b.filter(col("query_id") === 0L).count() == 5)
  }
}
