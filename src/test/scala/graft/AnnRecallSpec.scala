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

  test("one row per (method, query): 14 methods x 10 queries") {
    assert(rows.length === 140)
    assert(rows.map(_._1).distinct.sorted ===
      Array("ann_graph_search", "ann_ivf", "ann_ivf_km", "ann_ivfpq",
        "ann_ivfpq_lloyd", "ann_ivfpq_opq", "ann_ivfpq_res", "ann_lsh",
        "ann_pq_rerank", "ann_rp", "ann_sq8", "vec_opq", "vec_pq",
        "vec_pq_lloyd"))
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

  test("ann_tune curve is structurally sound (monotone in nprobe, bounded)") {
    val curve = Similarity.annTune(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(curve.length === 8) // 2 cell maps x 4 probe budgets
    curve.groupBy(_._1).foreach { case (cells, rows) =>
      val byProbe = rows.sortBy(_._2)
      assert(byProbe.map(_._2) === Array(1L, 2L, 3L, 4L), s"$cells budgets")
      // candidate sets grow with the budget, so hits and scanned are
      // monotone nondecreasing by construction
      assert(byProbe.map(_._3).sliding(2).forall(p => p(0) <= p(1)),
        s"$cells hits not monotone")
      assert(byProbe.map(_._4).sliding(2).forall(p => p(0) <= p(1)),
        s"$cells scanned not monotone")
      byProbe.foreach { case (_, np, hits, _, recall, frac) =>
        assert(hits <= 50, s"$cells/$np hits cap")
        assert(recall >= 0.0 && recall <= 1.0, s"$cells/$np recall bound")
        assert(frac >= 0.0 && frac <= 1.0, s"$cells/$np scan_frac bound")
      }
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
      ("ann_graph_search", retrieved(Similarity.annGraphSearch(spark, sf)), 5),
      ("ann_ivf", retrieved(Similarity.annIvf(spark, sf)), 5),
      ("ann_ivf_km", retrieved(Similarity.annIvfKm(spark, sf)), 5),
      ("ann_lsh", retrieved(Similarity.annLsh(spark, sf)), 3),
      ("ann_pq_rerank", retrieved(Similarity.annPqRerank(spark, sf)), 5),
      ("ann_sq8", retrieved(Similarity.annSq8(spark, sf)), 5),
      ("vec_pq", retrieved(Similarity.vecPq(spark, sf)), 5),
      ("vec_pq_lloyd", retrieved(Similarity.vecPqLloyd(spark, sf)), 5),
      ("vec_opq", retrieved(Similarity.vecOpq(spark, sf)), 5),
      ("ann_ivfpq", retrieved(Similarity.annIvfPq(spark, sf)), 5),
      ("ann_ivfpq_opq", retrieved(Similarity.annIvfPqOpq(spark, sf)), 5),
      ("ann_ivfpq_res", retrieved(Similarity.annIvfPqRes(spark, sf)), 5),
      ("ann_ivfpq_lloyd", retrieved(Similarity.annIvfPqLloyd(spark, sf)), 5),
      ("ann_rp", retrieved(Similarity.annRp(spark, sf)), 5))
      .flatMap { case (m, got, k) =>
        truthAt(k).map { case (q, ts) =>
          (m, q) -> got.getOrElse(q, Set.empty).intersect(ts).size.toLong }
      }.toMap
    rows.foreach { case (m, q, hits, _, _) =>
      assert(hits === expected((m, q)), s"$m/$q")
    }
  }

  test("ann_filtered honors the predicate and its ranking invariants") {
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val res = Similarity.annFiltered(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(res.nonEmpty)
    // the predicate HOLDS: every neighbor carries the query's label,
    // cross-checked against the source table (not the operator's own
    // label column)
    res.foreach { case (q, lbl, _, n, _) =>
      assert(labels(q) == lbl && labels(n) == lbl,
        s"query $q (label ${labels(q)}) got neighbor $n (label ${labels(n)})")
    }
    // per query: ranks contiguous from 1, scores non-increasing, ≤ 3 rows
    res.groupBy(_._1).foreach { case (q, g) =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq,
        s"query $q ranks not contiguous")
      assert(sorted.length <= 3, s"query $q returned ${sorted.length} rows")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._5 >= b._5; case _ => true },
        s"query $q scores not non-increasing")
    }
  }
}
