package graft

import graft.operators.{Dedup, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** The demo-pinned parameters (seed source + gate in text_seed_classify,
  * bench/train split in dedup_contamination) are session-configurable;
  * the defaults keep the oracle rows bit-identical.
  */
class ConfigKnobsSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    kv.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally kv.foreach { case (k, _) => s.conf.unset(k) }
  }

  test("seed classifier: explicit defaults reproduce the default run") {
    val default = TextAnalysis.textSeedClassify(s, TestSpark.sf).collect().toSeq
    val explicit = withConf("graft.seed.source" -> "src0",
      "graft.seed.thresholdPpm" -> "500000") {
      TextAnalysis.textSeedClassify(s, TestSpark.sf).collect().toSeq
    }
    assert(default.nonEmpty && default == explicit)
  }

  test("seed classifier: a different seed source changes the scores") {
    val default = TextAnalysis.textSeedClassify(s, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val other = withConf("graft.seed.source" -> "src1") {
      TextAnalysis.textSeedClassify(s, TestSpark.sf)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    assert(other.keySet == default.keySet)
    assert(other.exists { case (id, score) => default(id) != score },
      "re-seeding on src1 left every score identical — knob has no effect")
  }

  test("seed classifier: an unreachable threshold gates every doc out") {
    val rows = withConf("graft.seed.thresholdPpm" -> "1000001") {
      TextAnalysis.textSeedClassify(s, TestSpark.sf).collect()
    }
    assert(rows.nonEmpty && rows.forall(!_.getBoolean(3)))
  }

  test("contamination: the bench/train split follows the configured gate") {
    val moved = withConf("graft.contam.benchMaxDocId" -> "10") {
      Dedup.dedupContamination(s, TestSpark.sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    // bench ids come only from below the gate; train ids only from above —
    // and docs 10..19, bench under the default split, now appear as train
    assert(moved.forall { case (docId, benchId) =>
      benchId < 10L && docId >= 10L })
    val defaults = Dedup.dedupContamination(s, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(defaults.forall { case (docId, benchId) =>
      benchId < 20L && docId >= 20L })
    assert(moved.toSet != defaults.toSet,
      "moving the split changed nothing — knob has no effect")
  }

  test("semantic threshold: explicit default reproduces the default run") {
    val default = Dedup.dedupSemantic(s, TestSpark.sf).collect()
      .map(_.toString).toSeq
    val explicit = withConf("graft.semantic.minCos" -> "0.4") {
      Dedup.dedupSemantic(s, TestSpark.sf).collect().map(_.toString).toSeq
    }
    assert(default.nonEmpty && default == explicit)
  }

  test("semantic threshold: a production threshold collapses the clusters") {
    val default = Dedup.dedupSemantic(s, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val strict = withConf("graft.semantic.minCos" -> "0.9") {
      Dedup.dedupSemantic(s, TestSpark.sf).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    assert(strict.keySet == default.keySet)
    // the loose test corpus has no cos >= 0.9 pairs: everything singles out
    assert(strict.values.forall(_ == 1L),
      "cos >= 0.9 left multi-vector clusters on the synthetic corpus")
    assert(default.values.exists(_ > 1L))
    val bad = intercept[IllegalArgumentException] {
      withConf("graft.semantic.minCos" -> "big") {
        Dedup.dedupSemantic(s, TestSpark.sf).collect()
      }
    }
    assert(bad.getMessage.contains("graft.semantic.minCos"), bad.getMessage)
  }

  test("semantic blocking: explicit default bits reproduce; harder bits contract candidates") {
    val default = Dedup.dedupEmbcos(s, TestSpark.sf).collect().map(_.toString).toSeq
    val explicit = withConf("graft.semantic.lshBits" -> "6") {
      Dedup.dedupEmbcos(s, TestSpark.sf).collect().map(_.toString).toSeq
    }
    assert(default == explicit)
    // harder blocking can only LOSE candidate collisions, never invent
    // pairs: the 12-bit verified pair set is a subset of the 6-bit one
    val hard = withConf("graft.semantic.lshBits" -> "12") {
      Dedup.dedupEmbcos(s, TestSpark.sf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val defaultPairs = Dedup.dedupEmbcos(s, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hard.subsetOf(defaultPairs),
      s"12-bit blocking invented pairs: ${hard -- defaultPairs}")
    val bad = intercept[IllegalArgumentException] {
      withConf("graft.semantic.lshBits" -> "many") {
        Dedup.dedupEmbcos(s, TestSpark.sf).collect()
      }
    }
    assert(bad.getMessage.contains("graft.semantic.lshBits"), bad.getMessage)
  }

  test("graph search: explicit defaults reproduce the default run") {
    val default = operators.Similarity.annGraphSearch(s, TestSpark.sf)
      .collect().map(_.toString).toSeq
    val explicit = withConf("graft.graph.hops" -> "4",
      "graft.graph.beam" -> "8", "graft.graph.entries" -> "8") {
      operators.Similarity.annGraphSearch(s, TestSpark.sf)
        .collect().map(_.toString).toSeq
    }
    assert(default.nonEmpty && default == explicit)
  }

  test("graph search: a starved budget changes the answer set") {
    // one hop from a single entry explores only that entry's own
    // out-neighborhood — the result must differ from the 4-hop default
    val starved = withConf("graft.graph.hops" -> "1",
      "graft.graph.beam" -> "2", "graft.graph.entries" -> "1") {
      operators.Similarity.annGraphSearch(s, TestSpark.sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val default = operators.Similarity.annGraphSearch(s, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(starved != default, "budget knobs had no effect on the walk")
    val bad = intercept[Exception] {
      withConf("graft.graph.hops" -> "0") {
        operators.Similarity.annGraphSearch(s, TestSpark.sf).collect()
      }
    }
    assert(bad.getMessage.contains("graft.graph.hops"), bad.getMessage)
    // a NON-NUMERIC value must also name the offending key, not surface
    // as a bare NumberFormatException("For input string: ...")
    val nonNum = intercept[Exception] {
      withConf("graft.graph.beam" -> "four") {
        operators.Similarity.annGraphSearch(s, TestSpark.sf).collect()
      }
    }
    assert(nonNum.getMessage.contains("graft.graph.beam") &&
      nonNum.getMessage.contains("four"), nonNum.getMessage)
  }
}
