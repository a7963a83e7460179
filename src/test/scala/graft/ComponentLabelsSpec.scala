package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential coverage of dedupClusters phase 3: the local union-find
  * finish and the distributed min-label-propagation fallback must agree
  * on any graph. The chain graph is the adversarial case — diameter
  * equals edge count, so propagation needs multiple rounds while
  * union-find path-compresses it in one pass. */
class ComponentLabelsSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private def labelsOf(edges: Seq[(Long, Long)], maxLocal: Long): Map[Long, Long] = {
    // componentLabels requires an undirected edge list (both directions),
    // matching what dedupClusters' symmetrized pair graph guarantees
    val g = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.toDF("v")
    Dedup.componentLabels(s, g, verts, maxLocal)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val chain: Seq[(Long, Long)] =
    (0L until 40L).map(i => (i + 1, i)) // 41-vertex path, min label 0
  private val twoComps: Seq[(Long, Long)] =
    Seq((5L, 3L), (3L, 9L), (20L, 21L)) // {3,5,9} and {20,21}

  test("local union-find labels a long chain with the component min") {
    val m = labelsOf(chain, maxLocal = 1000000L)
    assert(m.size == 41 && m.values.forall(_ == 0L))
  }

  test("distributed fallback agrees with union-find on the chain") {
    val local = labelsOf(chain, maxLocal = 1000000L)
    val dist = labelsOf(chain, maxLocal = 0L) // force the propagation path
    assert(dist == local)
  }

  test("both paths separate disconnected components identically") {
    val local = labelsOf(twoComps, maxLocal = 1000000L)
    val dist = labelsOf(twoComps, maxLocal = 0L)
    assert(local == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
    assert(dist == local)
  }

  test("both paths match brute-force components on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val nV = 30 + trial * 20
      val edges = Seq.fill(nV)((rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
        .filter(e => e._1 != e._2)
      // brute-force reference: repeated relabeling until fixpoint
      val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var lbl = verts.map(v => v -> v).toMap
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(lbl(a), lbl(b))
          if (lbl(a) != m) { lbl += a -> m; changed = true }
          if (lbl(b) != m) { lbl += b -> m; changed = true }
        }
        // propagate through label chains
        verts.foreach { v =>
          val m = math.min(lbl(v), lbl(lbl(v)))
          if (lbl(v) != m) { lbl += v -> m; changed = true }
        }
      }
      val local = labelsOf(edges, maxLocal = 1000000L)
      val dist = labelsOf(edges, maxLocal = 0L)
      assert(local == lbl, s"trial $trial: union-find diverged from brute force")
      assert(dist == lbl, s"trial $trial: propagation diverged from brute force")
    }
  }

  test("driver fast path agrees with the full distributed pipeline") {
    // chain + clique + isolated pair: exercises multi-round merging
    val pairs = (chain ++ twoComps ++ Seq((100L, 101L), (101L, 102L), (100L, 102L)))
      .toDF("doc_a", "doc_b")
    def run(): Map[Long, (Long, Long)] =
      Dedup.connectedComponents(s, pairs)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fast = run() // default gate: pairs fit the driver → union-find fast path
    s.conf.set("graft.cc.maxLocalEdges", "0")
    val dist = try run() finally s.conf.unset("graft.cc.maxLocalEdges")
    assert(fast == dist)
    assert(fast(40L) == (0L, 41L) && fast(102L) == (100L, 3L))
  }

  test("connectedComponents on an empty pair list returns an empty typed result") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(s, empty)
    assert(out.columns.toSeq == Seq("doc_id", "cluster_rep", "cluster_size"))
    assert(out.count() == 0)
  }

  test("isolated vertices keep their own label on both paths") {
    val g = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 77L).toDF("v") // 77 has no edges
    Seq(1000000L, 0L).foreach { maxLocal =>
      val m = Dedup.componentLabels(s, g, verts, maxLocal)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m == Map(1L -> 1L, 2L -> 1L, 77L -> 77L))
    }
  }
}
