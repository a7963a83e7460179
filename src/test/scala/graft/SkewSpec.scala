package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-key / saturated-bucket behavior: the `graft.dedup.maxBucketFan`
  * star cap (bucketCandidates) and AQE's skew-join split — the two
  * mitigations the skew rehearsal (SkewCorpus + bench/skew_r8.json)
  * measures. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withConf[T](kv: (String, String)*)(f: => T): T = {
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally kv.foreach { case (k, _) => spark.conf.unset(k) }
  }

  // one saturated bucket (20 ids in bucket 0) + two small buckets
  private lazy val buckets = (
    (1L to 20L).map(i => (i, 0, "hot")) ++
      Seq((100L, 1, "s1"), (101L, 1, "s1"), (200L, 2, "s2"), (201L, 2, "s2"),
        (202L, 2, "s2"))
  ).toDF("doc_id", "band_ix", "bkey")

  test("cap off: all in-bucket pairs, distinct, id_a < id_b") {
    val out = Dedup.bucketCandidates(spark, buckets,
      Seq("band_ix", "bkey"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 190 + 1 + 3) // C(20,2) + C(2,2) + C(3,2)
    assert(out.forall { case (a, b) => a < b })
    assert(out.distinct.length == out.length)
  }

  test("cap on: saturated bucket emits star edges to the hub only") {
    val out = withConf("graft.dedup.maxBucketFan" -> "5") {
      Dedup.bucketCandidates(spark, buckets, Seq("band_ix", "bkey"), "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // hot bucket: 19 hub edges (1, i); small buckets: unchanged all-pairs
    val expected = (2L to 20L).map(i => (1L, i)).toSet ++
      Set((100L, 101L), (200L, 201L), (200L, 202L), (201L, 202L))
    assert(out == expected)
  }

  test("cap on: every member still appears; components match uncapped") {
    val edges = withConf("graft.dedup.maxBucketFan" -> "5") {
      Dedup.bucketCandidates(spark, buckets, Seq("band_ix", "bkey"), "doc_id")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    }
    val capped = Dedup.connectedComponents(spark, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Dedup.connectedComponents(spark,
        Dedup.bucketCandidates(spark, buckets, Seq("band_ix", "bkey"), "doc_id")
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(capped == full, "star edges changed the connected components")
  }

  test("payload columns ride both pair and star paths") {
    val withSim = buckets.withColumn("simhash", col("doc_id") * 10)
    val out = withConf("graft.dedup.maxBucketFan" -> "5") {
      Dedup.bucketCandidates(spark, withSim, Seq("band_ix", "bkey"), "doc_id",
          Seq("simhash"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
    }
    assert(out.contains((1L, 20L, 10L, 200L)), s"star payload wrong: $out")
    assert(out.contains((200L, 201L, 2000L, 2010L)), s"pair payload wrong: $out")
  }

  test("a cap above every bucket size reproduces the uncapped output") {
    val base = Dedup.bucketCandidates(spark, buckets,
      Seq("band_ix", "bkey"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val high = withConf("graft.dedup.maxBucketFan" -> "1000") {
      Dedup.bucketCandidates(spark, buckets, Seq("band_ix", "bkey"), "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(base == high)
  }

  test("the three capped operators run end-to-end with the cap set") {
    // cap high enough that the tiny sf0.001 corpus has no saturated
    // bucket: results must be bit-identical to the default run
    for (q <- Seq("dedup_minhash", "dedup_simhash", "dedup_embcos")) {
      val default = SparkEntry.queries(q)(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq
      val capped = withConf("graft.dedup.maxBucketFan" -> "100000") {
        SparkEntry.queries(q)(spark, TestSpark.sf)
          .collect().map(_.toString).toSeq
      }
      assert(default == capped, s"$q drifted under a non-binding cap")
    }
  }

  // ---- C9 prefix-index posting cap (graft.dedup.maxPostingFan) ----------

  // one saturated posting family: 20 docs sharing shingles 1..10, each
  // with one doc-unique high shingle (so the sorted 6-token prefix is
  // [1..6] for every member — postings of size 20); plus two small docs
  // sharing a 2-element prefix
  private lazy val prefixSets = (
    (1L to 20L).map(i => (i, (1L to 10L) :+ (1000L + i))) ++
      Seq((100L, Seq(50L, 51L, 52L)), (101L, Seq(50L, 51L, 52L, 53L)))
  ).toDF("doc_id", "shs")

  private def prefixPairs(conf: (String, String)*): Set[(Long, Long)] =
    withConf(conf: _*) {
      Dedup.prefixCandidates(spark, prefixSets)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }

  test("posting cap off: lossless AllPairs candidates — the full family clique") {
    val out = prefixPairs()
    val family = (for (a <- 1L to 20L; b <- (a + 1) to 20L) yield (a, b)).toSet
    assert(out == family + ((100L, 101L)))
  }

  test("posting cap on: saturated posting emits star edges to its min-id hub") {
    val out = prefixPairs("graft.dedup.maxPostingFan" -> "5")
    assert(out == (2L to 20L).map(i => (1L, i)).toSet + ((100L, 101L)))
  }

  test("posting cap: every family member still appears in a candidate edge") {
    val out = prefixPairs("graft.dedup.maxPostingFan" -> "5")
    val covered = out.flatMap { case (a, b) => Seq(a, b) }
    assert((1L to 20L).forall(covered.contains),
      s"a saturated-family member vanished from the candidates: $covered")
  }

  test("a posting cap above every posting size reproduces the lossless output") {
    assert(prefixPairs() == prefixPairs("graft.dedup.maxPostingFan" -> "1000"))
  }

  test("dedup_prefix end-to-end: non-binding posting cap is bit-identical") {
    val default = SparkEntry.queries("dedup_prefix")(spark, TestSpark.sf)
      .collect().map(_.toString).toSeq
    val capped = withConf("graft.dedup.maxPostingFan" -> "100000") {
      SparkEntry.queries("dedup_prefix")(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq
    }
    assert(default.nonEmpty && default == capped,
      "dedup_prefix drifted under a non-binding posting cap")
  }

  test("posting-cap knob hygiene: non-numeric names the key; cap < 2 rejected") {
    val nonNum = intercept[IllegalArgumentException] {
      withConf("graft.dedup.maxPostingFan" -> "many") {
        Dedup.prefixCandidates(spark, prefixSets).collect()
      }
    }
    assert(nonNum.getMessage.contains("graft.dedup.maxPostingFan") &&
      nonNum.getMessage.contains("many"), nonNum.getMessage)
    val tooSmall = intercept[IllegalArgumentException] {
      withConf("graft.dedup.maxPostingFan" -> "1") {
        Dedup.prefixCandidates(spark, prefixSets).collect()
      }
    }
    assert(tooSmall.getMessage.contains("maxPostingFan"), tooSmall.getMessage)
  }

  test("knob hygiene: non-numeric names the key; cap < 2 rejected") {
    val nonNum = intercept[IllegalArgumentException] {
      withConf("graft.dedup.maxBucketFan" -> "lots") {
        Dedup.bucketCandidates(spark, buckets, Seq("band_ix", "bkey"),
          "doc_id").collect()
      }
    }
    assert(nonNum.getMessage.contains("graft.dedup.maxBucketFan") &&
      nonNum.getMessage.contains("lots"), nonNum.getMessage)
    val tooSmall = intercept[IllegalArgumentException] {
      withConf("graft.dedup.maxBucketFan" -> "1") {
        Dedup.bucketCandidates(spark, buckets, Seq("band_ix", "bkey"),
          "doc_id").collect()
      }
    }
    assert(tooSmall.getMessage.contains("maxBucketFan"), tooSmall.getMessage)
  }

  test("q_window_range_part: identical results, hot key split across time chunks") {
    import graft.operators.AnalyticsExt
    val plain = AnalyticsExt.qWindowRange(spark, TestSpark.sf)
      .collect().map(_.toString).toSeq
    val part = AnalyticsExt.qWindowRangePart(spark, TestSpark.sf)
      .collect().map(_.toString).toSeq
    assert(plain.nonEmpty && plain == part,
      "chunked decomposition changed the window results")
    // the decomposition's point: the widest window partition shrinks
    // from the hottest USER to the hottest (user, hour-chunk) — the
    // bound that keeps one viral account from serializing a task
    val hourUs = 3600L * 1000000L
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val maxUser = ev.groupBy("user_id").count()
      .agg(max("count")).collect()(0).getLong(0)
    val maxChunk = ev
      .groupBy(col("user_id"), expr(s"ts_us div $hourUs").as("c"))
      .count().agg(max("count")).collect()(0).getLong(0)
    assert(maxChunk * 2 < maxUser, // 2x: each chunk also holds replicas
      s"chunking did not split the hot key: maxUser=$maxUser maxChunk=$maxChunk")
    // and the executed window really is keyed by (user, chunk)
    val plan = AnalyticsExt.qWindowRangePart(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    val winLine = plan.linesIterator.find(_.contains("Window")).get
    assert(winLine.contains("user_id") && winLine.contains("chunk"),
      s"window not partitioned by (user_id, chunk): $winLine")
  }

  test("q_sessionize_part: identical sessions, lag decomposed over time chunks") {
    import graft.operators.Analytics
    val plain = Analytics.qSessionize(spark, TestSpark.sf)
      .collect().map(_.toString).toSeq
    val part = Analytics.qSessionizePart(spark, TestSpark.sf)
      .collect().map(_.toString).toSeq
    assert(plain.nonEmpty && plain == part,
      "chunked sessionization changed the sessions")
    // every per-event window in the decomposed plan is keyed by
    // (user_id, chunk); the only per-user window runs over the bounded
    // chunk summaries (the D13 two-phase cumsum offsets)
    val plan = Analytics.qSessionizePart(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter(l =>
      l.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty)
    val perUserOnly = winLines.filterNot(_.contains("chunk"))
    assert(perUserOnly.isEmpty,
      s"a data-sized window is keyed by user alone:\n${perUserOnly.mkString("\n")}")
  }

  test("AQE splits a skewed shuffle join when thresholds are crossed") {
    // a hot key holding half the fact side, joined to a small-but-not-
    // broadcast dim; thresholds lowered so local-scale data crosses them
    // the way a 100 TB hot key crosses the defaults
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    withConf(conf: _*) {
      val facts = spark.range(0, 200000)
        .select(when(col("id") % 2 === 0, lit(7L)).otherwise(col("id"))
          .as("k"), col("id").as("payload"))
      val dim = spark.range(0, 5000)
        .select(col("id").as("k"), (col("id") * 2).as("dval"))
      val joined = facts.join(dim, "k")
      // even ids (100k) all hit hot key 7; odd ids match iff id < 5000.
      // execute THIS df — count() would plan a different query and leave
      // the adaptive plan unfinalized
      assert(joined.collect().length == 100000 + 2500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(2000)}")
    }
  }

  test("winsorize/gini: one planted hot event_type stays bucket-bounded") {
    // r11 verdict weak-grade closure: a hot type with 400× the rows of
    // its siblings must (a) still answer exactly, (b) never concentrate
    // its rank work — the largest (type, bucket) rank cell stays a small
    // fraction of the hot type's row count, because the two-phase rank
    // buckets on the VALUE axis, which skewing the type axis cannot
    // collapse.
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-wins").toString
    val hot = (1 to 20000).map(i => ("hot", i / 100.0 + 0.001))
    val cold = (1 to 50).map(i => ("cold", i / 10.0 + 0.001))
    (hot ++ cold).toDF("event_type", "value")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // driver truth: exact order statistics + gini over sorted cents
    def truth(vals: Seq[Double]): (Long, Long, Double, Double) = {
      val c = vals.map(v => math.floor(v * 100.0).toLong).sorted
      val n = c.length
      val lo = c(math.ceil(0.05 * n).toInt - 1)
      val hi = c(math.ceil(0.95 * n).toInt - 1)
      val wsum = c.map(x => math.max(lo, math.min(hi, x))).sum
      val s1 = c.sum
      val s2 = c.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
      val wmean = wsum.toDouble / n.toDouble / 100.0
      val gini = (2L * s2 - (n + 1L) * s1).toDouble / (n.toLong * s1).toDouble
      (lo, hi, wmean, gini)
    }
    val (hLo, hHi, hMean, hGini) = truth(hot.map(_._2))

    val w = SparkEntry.queries("q_winsorize")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(w("hot").getDouble(2) == hLo / 100.0 &&
      w("hot").getDouble(3) == hHi / 100.0 &&
      w("hot").getDouble(4) == hMean,
      s"hot winsorize mismatch: ${w("hot")} vs ($hLo, $hHi, $hMean)")
    val g = SparkEntry.queries("q_gini")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(g("hot") == hGini, s"hot gini mismatch: ${g("hot")} vs $hGini")

    // the per-partition bound: 20k hot rows spread across ~20 value
    // buckets of ≤1024 cents each — no cell holds more than ~5% of the
    // hot type
    val cells = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"),
        shiftright(floor(col("value") * 100.0).cast("long"), 10).as("bkt"))
      .filter(col("event_type") === "hot")
      .groupBy("event_type", "bkt").count()
      .collect().map(_.getLong(2))
    assert(cells.length > 15 && cells.max <= 1100,
      s"hot type not bucket-bounded: ${cells.length} cells, max ${cells.max}")
  }

  test("percentiles/mad: one planted hot event_type stays bucket-bounded") {
    // r12 verdict weak-grade closure, same discipline as winsorize/gini:
    // a 400×-hot type must answer exactly AND spread its rank work over
    // VALUE buckets the type-axis skew cannot collapse.
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-pct").toString
    val hot = (1 to 20000).map(i =>
      (i.toLong, "hot", if (i <= 10000) i / 100.0 else i / 100.0 + 400.0))
    val cold = (1 to 50).map(i => (100000L + i, "cold", i / 10.0))
    (hot ++ cold).toDF("event_id", "event_type", "value")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // driver truth over the hot type: exact (value, event_id) rank picks
    val hv = hot.map(_._3).sorted // values strictly increasing in i
    val n = hv.length
    def pick(p: Double) = hv(math.ceil(p * n).toInt - 1)
    val med = hv((n + 1) / 2 - 1)
    val dSorted = hv.map(v => math.abs(v - med)).sorted
    val madTruth = dSorted((n + 1) / 2 - 1)

    val pr = SparkEntry.queries("q_percentiles")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(pr("hot").getDouble(1) == pick(0.5) &&
      pr("hot").getDouble(2) == pick(0.9) &&
      pr("hot").getDouble(3) == pick(0.99),
      s"hot percentiles mismatch: ${pr("hot")}")
    val md = SparkEntry.queries("q_anomaly_mad")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(md("hot").getDouble(2) == med && md("hot").getDouble(3) == madTruth,
      s"hot mad mismatch: ${md("hot")} vs ($med, $madTruth)")

    // per-cell bound on BOTH rank axes: the raw-value buckets and the
    // |v − med| deviation buckets each hold ≤1024 cents of range, so no
    // cell exceeds ~5% of the hot type
    val cells = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "hot")
      .select(shiftright(floor(col("value") * 100.0).cast("long"), 10).as("bkt"))
      .groupBy("bkt").count().collect().map(_.getLong(1))
    assert(cells.length > 15 && cells.max <= 1100,
      s"hot type not bucket-bounded: ${cells.length} cells, max ${cells.max}")
  }

  test("changepoint: one planted hot event_type prefix-sums over day cells") {
    // the hot type's 20k rows spread over 40 day buckets (≤500 rows per
    // (type, day) cell — the windows that remain are per-cell), and the
    // planted level shift is still found exactly at its boundary.
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-cpt").toString
    val hot = (1 to 20000).map { i =>
      val day = (i - 1) / 500
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
          .plusDays(day).plusSeconds((i - 1) % 500))
      val v = (if (i <= 10000) 50.0 else 550.0) + (i % 7) / 100.0
      (i.toLong, "hot", v, ts)
    }
    val cold = (1 to 50).map(i => (100000L + i, "cold", i / 10.0,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    (hot ++ cold).toDF("event_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val cp = SparkEntry.queries("q_changepoint")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(cp("hot").getLong(1) == 20000L && cp("hot").getLong(2) == 10000L,
      s"hot changepoint missed the planted shift: ${cp("hot")}")
    assert(math.abs(cp("hot").getDouble(4) - 50.03) < 0.01 &&
      math.abs(cp("hot").getDouble(5) - 550.03) < 0.01,
      s"hot changepoint means off: ${cp("hot")}")

    val dayCells = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "hot")
      .select(expr("unix_timestamp(ts) div 86400").as("bkt"))
      .groupBy("bkt").count().collect().map(_.getLong(1))
    assert(dayCells.length == 40 && dayCells.max <= 500,
      s"hot type not day-bounded: ${dayCells.length} cells, max ${dayCells.max}")
  }
}
