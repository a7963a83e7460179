package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global executed-plan audit over EVERY registered query — the scale
  * anti-pattern guard. A CartesianProduct node anywhere is an
  * all-pairs fan-out that cannot survive a 100× scale-up; the known
  * 1-row totals attaches compile to BroadcastNestedLoopJoin (bounded:
  * one row moves), which stays admissible. Dimension joins on the
  * TPC-H core must broadcast — a sort-merge exchange of a K-row dim
  * against the fact table is a wasted full shuffle. And `Exchange
  * SinglePartition` — a global funnel — is admissible ONLY where the
  * funneled set is bounded by construction; the allowlist below is
  * asserted EXACTLY, so a new data-sized funnel cannot sneak in and a
  * stale entry prompts shrinking the list. */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  // every query executed once (finalizing AQE), plans shared by all audits
  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (q, fn) =>
      val df = fn(spark, sf)
      df.collect()
      q -> df.queryExecution.executedPlan.toString
    }

  test("no registered query plans a CartesianProduct") {
    val offenders = plans.collect {
      case (q, plan) if plan.contains("CartesianProduct") => q }.toSeq.sorted
    assert(offenders.isEmpty,
      s"cartesian fan-out in: ${offenders.mkString(", ")}")
  }

  test("TPC-H core dimension joins broadcast (no sort-merge on K-row dims)") {
    for (q <- Seq("q3_revenue", "q5_region")) {
      assert(plans(q).contains("BroadcastHashJoin"),
        s"$q: no broadcast join\n${plans(q)}")
    }
  }

  // Each allowed funnel is bounded by construction: 1-row totals attaches
  // (q_attribution, text_collocations, text_source_weights, ann_tune's
  // corpus-count denominator, ann_hybrid's idf N numerator, q_rfm's
  // global max-day anchor, text_domain_gate's corpus-total share
  // denominator over the ≤domain-universe stats table), the 5-row
  // priority window (q_top_movers), text_pack's bucket-count offset pass,
  // q_decile_lift's cumulative windows over its 10-row decile table,
  // q_benford's total attach over its 9-row digit table, q_profile's
  // global-aggregate merge (each task emits ONE partial row — and the
  // exact-distinct columns pre-aggregate per key through Spark's expand
  // before the final merge — so the funnel input is O(tasks), never
  // data-sized).
  private val allowedSinglePartition = Set(
    "q_attribution", "text_collocations", "text_source_weights",
    "q_top_movers", "text_pack", "ann_tune", "ann_hybrid", "q_rfm",
    "q_market_basket", "dedup_lsh_tune", "q_ab_test", "q_triangles",
    "text_domain_gate", "q_decile_lift", "q_decay_score", "q_benford",
    "q_profile", "q_profile_docs", // E61d: same bounded global-agg funnel as q_profile
    "text_bm25",     // D30: 1-row corpus-totals aggregate (the ann_hybrid N funnel)
    "ann_hybrid_bm25", // B18b: the same 1-row BM25 totals funnel as text_bm25
    "ann_hybrid_filtered", // B30: ann_hybrid's idf N funnel, filtered legs
    "mm_shard_pack", // F30: text_pack's bucket-count offset pass over byte sums
    "q_hilbert",     // E63: adjacency lag over the 16-row file table (q_top_movers shape)
    "q_recursive",   // E34: prefix-sum window over the 25-row month table (q_top_movers shape)
    "q_unpivot",     // E23u: global-aggregate merge, one partial row per task (q_profile shape)
    "text_shuffle_shard") // D32: text_pack's 256-row bucket-offset pass
  // (q_profile_hll needs no entry: its one global merge is a partial
  // SKETCH aggregate — the partial_graft_ rule below exempts it, the
  // stronger property than an allowlisted exact funnel.)

  /** SinglePartition exchanges whose child is a partial SKETCH aggregate
    * are a bounded merge, not a data-sized funnel: each mapper emits one
    * fixed-size state blob regardless of input volume. That covers
    * Spark's own runtime join-pruning bloom build
    * (partial_bloom_filter_agg, one bitmap per mapper) and graft's
    * native sketch family (partial_graft_* — bounded mergeable state is
    * the family's defining contract: G17 topk, G18 hll, G24 qhist, G29
    * kmv, G30 bloom). Skip those; flag everything else. */
  private def dataFunnels(plan: String): Boolean = {
    val lines = plan.linesIterator.toArray
    lines.zipWithIndex.exists { case (l, ix) =>
      l.contains("Exchange SinglePartition") &&
        !lines.lift(ix + 1).exists(n =>
          n.contains("partial_bloom_filter_agg") || n.contains("partial_graft_"))
    }
  }

  // Each allowed BroadcastNestedLoopJoin is bounded by construction: the
  // ANN family's deliberate broadcast of the ≤10-row query set (or the
  // K-row seed/centroid summaries) against the corpus scan — the
  // standard vector-search shape where the nested-loop side is a
  // handful of broadcast rows — and q_kmv_overlap's non-equi pairing of
  // two SKETCH-sized relations (rows = #sources, never data-sized).
  // Asserted exactly, like the SinglePartition audit: a new BNLJ over
  // data-sized inputs cannot sneak in unnoticed.
  // ...plus the 1-row totals attaches (crossJoin(broadcast) of a single
  // aggregate row: ann_tune's corpus count, text_collocations' and
  // text_source_weights' corpus totals).
  // (vec_kmeans and vec_cluster_sample serve the memoized checkpointed
  // assignment, so their registered plans are artifact scans — the Lloyd
  // build's broadcast shape is audited in PlanShapeSpec instead.
  // ann_graph_search's queries x entries crossJoin likewise lives inside
  // its eager frontier checkpoints, not the registered final plan, and
  // ann_recall's rung BNLJs moved inside its memoized rung-result
  // checkpoints in r8 — the recall plan itself is joins over bounded
  // checkpointed artifacts.)
  // text_domain_gate: 1-row corpus-total attach (crossJoin(broadcast) of
  // the single aggregate row over the bounded domain-stats table).
  // q_decile_lift: 1-row qhist decile-edge attach (crossJoin(broadcast)
  // of the single sketch row), the q_rfm shape.
  private val allowedBnlj = Set(
    "ann_brute", "ann_hybrid", "ann_ivf", "ann_ivf_km",
    "ann_ivfpq", "ann_sq8", "knn_vote", "knn_vote_pq",
    "ann_ivfpq_lloyd", // B26: same <=10-row query-set coarse probe as B8
    "ann_ivfpq_opq", // B23: same <=10-row query-set coarse probe as B8
    "ann_ivfpq_res", // B24: same <=10-row query-set coarse probe as B8
    "q_bloom_native", "q_kmv_overlap", "q_market_basket", "q_rfm",
    "ann_tune", "dedup_lsh_tune", "q_triangles", "text_collocations",
    "text_source_weights", "text_domain_gate", "q_decile_lift",
    "vec_mrl_recall", // B20: same broadcast <=10-row query-set scan as ann_brute
    "q_decay_score",  // E59: 1-row max-day anchor attach, the q_rfm shape
    "text_bm25",      // D30: 1-row (N, T, avgdl) totals attach, the ann_hybrid shape
    "ann_rp",         // B28: same broadcast <=10-row query-set scan as ann_brute
    "ann_hybrid_bm25", // B18b: ann_hybrid's dense-leg broadcast + text_bm25's 1-row totals attach
    "ann_hybrid_filtered", // B30: ann_hybrid's dense-leg broadcast, corpus side pre-filtered
    "ann_recall") // B13 (r15): 14-method × ≤10-query grading frame — both sides bounded

  test("BroadcastNestedLoopJoin appears ONLY in the allowlisted bounded joins") {
    val observed = plans.collect {
      case (q, plan) if plan.contains("BroadcastNestedLoopJoin") => q }.toSet
    val intruders = observed -- allowedBnlj
    val stale = allowedBnlj -- observed
    assert(intruders.isEmpty,
      s"new nested-loop join(s): ${intruders.toSeq.sorted.mkString(", ")} — " +
        "justify boundedness and extend the allowlist, or give the join an equi key")
    assert(stale.isEmpty,
      s"BNLJ allowlist entries no longer present (shrink the list): " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("Exchange SinglePartition appears ONLY in the allowlisted bounded funnels") {
    val observed = plans.collect {
      case (q, plan) if dataFunnels(plan) => q }.toSet
    val intruders = observed -- allowedSinglePartition
    val stale = allowedSinglePartition -- observed
    assert(intruders.isEmpty,
      s"new global funnel(s): ${intruders.toSeq.sorted.mkString(", ")} — " +
        "justify boundedness and extend the allowlist, or repartition the window")
    assert(stale.isEmpty,
      s"allowlist entries no longer funneling (shrink the list): " +
        stale.toSeq.sorted.mkString(", "))
  }
}
