package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B17: graph-navigating beam search over the B11 k-NN graph — shape and
  * search-quality invariants beyond the DuckDB oracle (which pins the
  * exact result): monotone per-query rankings over corpus-only nodes,
  * improvement over the entry points, and boundedness of the walk. */
class GraphSearchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val result =
    Similarity.annGraphSearch(spark, TestSpark.sf).collect()

  test("every query returns a full, monotone, corpus-only top-5") {
    val byQ = result.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to 5L), s"query $q ranks")
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q scores not non-increasing")
      val nbrs = sorted.map(_.getLong(2))
      assert(nbrs.distinct.length == nbrs.length, s"query $q repeated neighbor")
      assert(nbrs.forall(_ >= 10L), s"query $q returned a query node")
    }
  }

  test("the walk improves on its entry points") {
    // rank-1 of every query must score at least as well as the best entry
    // node does for that query — the beam keeps entries unless it finds
    // better, so a regression here means the expansion is broken.
    // must mirror GraphEntries (8) — reconstructing fewer would weaken
    // the bound this test enforces
    val entries = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .filter(col("vec_id") >= 10)
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy(col("h"), col("vec_id")).limit(8)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(entries.size == 8)
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        math.floor(x * 1e8 + 0.5) * math.floor(y * 1e8 + 0.5) }.sum / 1e16
    result.filter(_.getLong(1) == 1L).foreach { r =>
      val q = r.getLong(0)
      val bestEntry = entries.map(e => dot(emb(q), emb(e))).max
      assert(r.getDouble(3) >= bestEntry - 1e-12,
        s"query $q rank-1 ${r.getDouble(3)} worse than entry $bestEntry")
    }
  }

  test("search is deterministic across runs") {
    val again = Similarity.annGraphSearch(spark, TestSpark.sf).collect()
    assert(result.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
