package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the round-12 operators: BM25 retrieval (D30),
  * lexical-diversity gate (D31), two-sample KS drift (E62), and shard
  * packing (F30). The oracle gate pins hash equality; these pin the
  * PROPERTIES the numbers must satisfy on any corpus. */
class RetrievalDriftSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  // ---- D30 text_bm25 ------------------------------------------------------

  test("bm25: ranks are contiguous from 1, scores non-increasing per query") {
    val rows = operators.TextAnalysis.textBm25(spark, sf)
      .select("query_id", "rank", "score").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"$q ranks not contiguous")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }, s"$q scores increase down the ranking")
    }
  }

  test("bm25: every returned doc contains at least one of its query's terms") {
    val terms = Map(
      "q1" -> Set("vector", "scan"),
      "q2" -> Set("fast", "join", "table"),
      "q3" -> Set("stream", "window", "group"))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSet)
      .toMap
    operators.TextAnalysis.textBm25(spark, sf)
      .select("query_id", "doc_id", "n_terms").collect().foreach { r =>
        val (q, d, nt) = (r.getString(0), r.getLong(1), r.getLong(2))
        val hit = terms(q).intersect(docs(d))
        assert(hit.nonEmpty, s"doc $d returned for $q but contains no query term")
        assert(hit.size == nt, s"doc $d n_terms=$nt but ${hit.size} terms present")
      }
  }

  test("bm25: rarer term outranks commoner term at equal tf (idf ordering)") {
    // compare two singleton-term sub-scores on the same doc-length profile:
    // the rational idf (2N-2df+1)/(2df+1) must be strictly decreasing in df
    def idf(n: Long, df: Long): Double = (2.0 * n - 2 * df + 1) / (2 * df + 1)
    assert(idf(1000, 10) > idf(1000, 100))
    assert(idf(1000, 100) > idf(1000, 999))
  }

  // ---- D31 text_diversity --------------------------------------------------

  test("diversity: ttr and simpson respect their exact bounds per doc") {
    operators.TextAnalysis.textDiversity(spark, sf).collect().foreach { r =>
      val n = r.getAs[Long]("n_tok"); val k = r.getAs[Long]("n_types")
      val ttr = r.getAs[Double]("ttr"); val sim = r.getAs[Double]("simpson")
      assert(k >= 1 && k <= n)
      assert(math.abs(ttr - k.toDouble / n) < 1e-12)
      // Cauchy–Schwarz lower bound and the all-one-type upper bound
      assert(sim >= 1.0 / k - 1e-12 && sim <= 1.0 + 1e-12)
      assert(r.getAs[Boolean]("keep") == (sim <= 0.08))
    }
  }

  test("diversity: a maximally repetitive doc concentrates to simpson == 1") {
    // direct formula check at the degenerate point the gate exists for
    // (one type, n tokens): c2 = n^2 -> simpson exactly 1
    val n = 37L
    assert((n * n).toDouble / (n * n) == 1.0)
  }

  // ---- E62 q_ks_drift ------------------------------------------------------

  test("ks drift: statistic in [0,1] and populations partition each type") {
    val totals = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = operators.AnalyticsExt.qKsDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val ks = r.getAs[Double]("ks")
      assert(na + nb == totals(t), s"$t: A+B != total")
      assert(ks >= 0.0 && ks <= 1.0, s"$t: ks=$ks out of range")
    }
  }

  test("ks drift: identical populations give D == 0, disjoint give D == 1") {
    // exact-arithmetic identity on the numerator max|cumA*nB - cumB*nA|
    // identical ECDFs: cumA/nA == cumB/nB at every value -> numerator 0
    val same = Seq((5L, 5L, 10L, 10L), (10L, 10L, 10L, 10L))
      .map { case (ca, cb, na, nb) => math.abs(ca * nb - cb * na) }.max
    assert(same == 0L)
    // disjoint supports: at the last A value cumA=nA, cumB=0
    val disj = math.abs(10L * 10L - 0L * 10L)
    assert(disj.toDouble / (10L * 10L) == 1.0)
  }

  // ---- E63 q_hilbert -------------------------------------------------------

  test("hilbert: boxes tile the plane, every consecutive file edge-adjacent") {
    // sf0.001's supplier universe doesn't reach all 16 sk buckets, so the
    // 16x16 plane is only fully populated from sf0.01 up — the tiling
    // property needs the full plane
    val sfFull = "/root/testdata/sf0.01"
    val rows = operators.Analytics.qHilbert(spark, sfFull)
      .orderBy("file_id").collect()
    assert(rows.length == 16)
    // same skipping win as z-order: every file's box is one 4x4 tile
    rows.foreach(r => assert(r.getAs[Long]("box_area") == 16L,
      s"file ${r.getAs[Long]("file_id")} box not 4x4"))
    // the 16 tiles are DISTINCT (a partition of the 16x16 plane)
    assert(rows.map(r => (r.getAs[Long]("pk_lo"), r.getAs[Long]("sk_lo")))
      .distinct.length == 16)
    // Hilbert's edge-continuity: corner displacement constant at ONE box
    // width; the Morton curve on the identical plane jumps 3 widths at
    // its z-seams (computed from the same audit's boxes below)
    rows.drop(1).foreach(r => assert(r.getAs[Long]("step_cheb") == 4L,
      s"file ${r.getAs[Long]("file_id")} not adjacent to its predecessor"))
    val zrows = operators.Analytics.qZorder(spark, sfFull)
      .orderBy("file_id").collect()
      .map(r => (r.getAs[Long]("pk_lo"), r.getAs[Long]("sk_lo")))
    val zmax = zrows.sliding(2).map { case Array(a, b) =>
      math.max(math.abs(b._1 - a._1), math.abs(b._2 - a._2))
    }.max
    assert(zmax == 12L, s"expected the Morton seam to jump 3 box widths, got $zmax")
  }

  // ---- F30 mm_shard_pack ---------------------------------------------------

  test("shard pack: shards partition the corpus into contiguous id ranges") {
    val shards = operators.Multimodal.mmShardPack(spark, sf)
      .orderBy("shard_id").collect()
    assert(shards.nonEmpty)
    val totalBytes = graft.sources.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .agg(sum(length(col("text").cast("binary")))).collect()(0).getLong(0)
    val totalBlobs = graft.sources.Tables.documents(spark, sf)
      .filter(col("text").isNotNull).count()
    assert(shards.map(_.getAs[Long]("shard_bytes")).sum == totalBytes)
    assert(shards.map(_.getAs[Long]("n_blobs")).sum == totalBlobs)
    shards.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("shard_id") < b.getAs[Long]("shard_id"))
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
          "shard id ranges overlap")
      case _ => ()
    }
    shards.foreach { r =>
      assert(r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc"))
    }
  }
}
