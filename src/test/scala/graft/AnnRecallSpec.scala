package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** B13 behavioral checks: the recall table covers every (method, query)
  * cell, stays inside [0, 1], and the hit counts agree with an
  * independent set-intersection over the public rung outputs (a
  * differential on the join/count plumbing — the full math is
  * oracle-checked in CORRECTNESS). */
class AnnRecallSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val rows = Similarity.annRecall(spark, sf)
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)))

  test("one row per (method, query): 4 methods x 10 queries") {
    assert(rows.length === 40)
    assert(rows.map(_._1).distinct.sorted ===
      Array("ann_ivf", "ann_ivf_km", "ann_lsh", "ann_pq_rerank"))
    rows.groupBy(_._1).foreach { case (m, g) =>
      assert(g.map(_._2).distinct.length === 10, s"method $m query coverage")
    }
  }

  test("recall is hits/k and bounded by [0, 1]") {
    rows.foreach { case (m, q, hits, k, recall) =>
      assert(hits >= 0 && hits <= k, s"$m/$q hits=$hits k=$k")
      assert(recall === hits.toDouble / k, s"$m/$q recall!=hits/k")
    }
  }

  test("hit counts match an independent intersection of the rung outputs") {
    def retrieved(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = Similarity.annBrute(spark, sf)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def truthAt(k: Int): Map[Long, Set[Long]] = truth.filter(_._2 <= k)
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val expected: Map[(String, Long), Long] = Seq(
      ("ann_ivf", retrieved(Similarity.annIvf(spark, sf)), 5),
      ("ann_ivf_km", retrieved(Similarity.annIvfKm(spark, sf)), 5),
      ("ann_lsh", retrieved(Similarity.annLsh(spark, sf)), 3),
      ("ann_pq_rerank", retrieved(Similarity.annPqRerank(spark, sf)), 5))
      .flatMap { case (m, got, k) =>
        truthAt(k).map { case (q, ts) =>
          (m, q) -> got.getOrElse(q, Set.empty).intersect(ts).size.toLong }
      }.toMap
    rows.foreach { case (m, q, hits, _, _) =>
      assert(hits === expected((m, q)), s"$m/$q")
    }
  }
}
