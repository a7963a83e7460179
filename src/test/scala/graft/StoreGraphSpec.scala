package graft

import graft.operators.VectorStore
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** G31: the store's DiskANN-style graph index — sidecar shape (bounded
  * out-degree, endpoints are stored chunks), beam-search serving read
  * (full deterministic top-k, improvement over the entry nodes), and the
  * rebuild-after-append contract. */
class StoreGraphSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val indexDir = {
    val dir = Files.createTempDirectory("graft_vsg").toString + "/index"
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select("doc_id", "text")
    assert(VectorStore.ingest(docs, dir) > 0)
    assert(VectorStore.buildGraph(spark, dir) > 0)
    dir
  }

  test("graph sidecar: out-degree <= 8, every endpoint is a stored chunk") {
    val edges = spark.read.parquet(s"$indexDir/_graft_graph/edges.parquet")
    val deg = edges.groupBy("src_doc", "src_ix").count()
      .agg(max("count")).head().getLong(0)
    assert(deg <= 8, s"out-degree $deg")
    val chunks = spark.read.parquet(indexDir)
      .select(col("doc_id"), col("chunk_ix"))
    val dangling = edges
      .join(chunks, edges("dst_doc") === chunks("doc_id") &&
        edges("dst_ix") === chunks("chunk_ix"), "left_anti").count()
    assert(dangling == 0, s"$dangling edges point at unstored chunks")
  }

  test("searchGraph returns a deterministic monotone top-k in [-1, 1]") {
    val query = spark.read.parquet(indexDir)
      .filter(col("doc_id") === 3 && col("chunk_ix") === 1)
      .select("chunk").collect().head.getString(0)
    val hits = VectorStore.searchGraph(spark, indexDir, query, k = 5).collect()
    assert(hits.length == 5)
    assert(hits.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
    val again = VectorStore.searchGraph(spark, indexDir, query, k = 5).collect()
    assert(hits.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("the walk improves on its entry nodes") {
    import org.apache.spark.sql.functions.{call_function, lit}
    val query = spark.read.parquet(indexDir)
      .filter(col("doc_id") === 7 && col("chunk_ix") === 1)
      .select("chunk").collect().head.getString(0)
    // score every entry exactly the way the store does: cosine over the
    // raw int64 hashing-trick weights — the beam keeps an entry unless
    // it finds better, so rank-1 must be >= the best entry score.
    // Entries replicate the DEFAULT seeding (r11): the query's own
    // multiprobe buckets' members, md5-ranked, capped at 32
    import spark.implicits._
    val qraw = Seq(query).toDF("t")
      .select(call_function("graft_hash_embed", col("t"),
        lit(VectorStore.Dim)).as("qraw"))
      .collect().head.getSeq[Long](0).toArray
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val sa = a.map(x => x * x).sum
      val sb = b.map(x => x * x).sum
      if (sa > 0 && sb > 0) dot.toDouble / (math.sqrt(sa.toDouble) * math.sqrt(sb.toDouble))
      else 0.0
    }
    val qbucket = Seq(query).toDF("t")
      .select(element_at(call_function("graft_lsh_buckets",
        call_function("graft_hash_embed", col("t"), lit(VectorStore.Dim)),
        lit(1), lit(8)), 1).as("b"))
      .collect().head.getInt(0)
    val probeSet = (qbucket +: (0 until 8).map(p => qbucket ^ (1 << p))).toSet
    val entryScores = spark.read.parquet(indexDir)
      .filter(col("bucket").isInCollection(probeSet.toSeq))
      .select(col("doc_id"), col("chunk_ix"), col("raw"))
      .withColumn("h", md5(concat_ws(":",
        col("doc_id").cast("string"), col("chunk_ix").cast("string"))))
      .orderBy(col("h"), col("doc_id"), col("chunk_ix")).limit(32)
      .collect().map(r => cos(qraw, r.getSeq[Long](2).toArray))
    assert(entryScores.nonEmpty)
    val top = VectorStore.searchGraph(spark, indexDir, query, k = 1)
      .collect().head.getAs[Double]("score")
    assert(top >= entryScores.max - 1e-9,
      s"walk top $top below best entry ${entryScores.max}")
  }

  test("k above the default beam widens the walk instead of silently capping") {
    val query = spark.read.parquet(indexDir)
      .filter(col("doc_id") === 3 && col("chunk_ix") === 1)
      .select("chunk").collect().head.getString(0)
    val hits = VectorStore.searchGraph(spark, indexDir, query, k = 12).collect()
    assert(hits.length == 12, s"asked k=12, got ${hits.length}")
    assert(hits.map(_.getAs[Int]("rank")).toSeq == (1 to 12))
  }

  test("searchGraphBatch matches the single-query walk rank-for-rank") {
    val samples = spark.read.parquet(indexDir)
      .orderBy("doc_id", "chunk_ix").select("chunk")
      .limit(3).collect().map(_.getString(0)).distinct.toSeq
    assert(samples.size >= 2)
    val batch = VectorStore.searchGraphBatch(spark, indexDir, samples, k = 5)
      .collect()
      .groupBy(_.getAs[Long]("query_id")).view
      .mapValues(_.toSeq.sortBy(_.getAs[Int]("rank"))).toMap
    samples.zipWithIndex.foreach { case (qt, i) =>
      val single = VectorStore.searchGraph(spark, indexDir, qt, k = 5).collect()
      val got = batch(i.toLong)
      assert(got.length == single.length, s"query $i row count")
      single.zip(got).foreach { case (s1, b1) =>
        assert(s1.getAs[Long]("doc_id") == b1.getAs[Long]("doc_id") &&
          s1.getAs[Int]("chunk_ix") == b1.getAs[Int]("chunk_ix") &&
          s1.getAs[Double]("score") == b1.getAs[Double]("score"),
          s"query $i diverged: single=$s1 batch=$b1")
      }
    }
  }

  test("spliceGraph equals a full rebuild and rewrites only the touched buckets") {
    val dir = Files.createTempDirectory("graft_vsg3").toString + "/index"
    val first = Tables.documents(spark, sf).filter(col("doc_id") < 50)
      .select("doc_id", "text")
    assert(VectorStore.ingest(first, dir) > 0)
    assert(VectorStore.buildGraph(spark, dir) > 0)
    val more = Tables.documents(spark, sf)
      .filter(col("doc_id") >= 50 && col("doc_id") < 80)
      .select("doc_id", "text")
    assert(VectorStore.ingest(more, dir, mode = "append") > 0)
    // which sbucket partitions the append touches, from the index itself
    val touched = spark.read.parquet(dir).filter(col("doc_id") >= 50)
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    val edgeDir = new java.io.File(s"$dir/_graft_graph/edges.parquet")
    val untouchedMtimes = edgeDir.listFiles()
      .filter(f => f.getName.startsWith("sbucket=") &&
        !touched.contains(f.getName.stripPrefix("sbucket=").toInt))
      .map(f => f.getName -> f.lastModified).toMap
    assert(untouchedMtimes.nonEmpty, "append touched every bucket — widen the corpus")

    val n = VectorStore.spliceGraph(spark, dir, (50L until 80L).toSeq)
    assert(n > 0)
    def edgeRows = spark.read.parquet(s"$dir/_graft_graph/edges.parquet")
      .select("src_doc", "src_ix", "dst_doc", "dst_ix")
      .collect().map(_.toString).sorted.toSeq
    val spliced = edgeRows
    // untouched bucket partitions were not rewritten
    untouchedMtimes.foreach { case (name, mtime) =>
      val f = new java.io.File(s"$dir/_graft_graph/edges.parquet/$name")
      assert(f.exists && f.lastModified == mtime,
        s"untouched edge partition $name was rewritten")
    }
    // appended chunks are wired in (src side)
    assert(spark.read.parquet(s"$dir/_graft_graph/edges.parquet")
      .filter(col("src_doc") >= 50).count() > 0)
    // and the splice reproduces the full rebuild bit-for-bit
    assert(VectorStore.buildGraph(spark, dir) > 0)
    assert(edgeRows == spliced, "splice diverged from a full rebuild")
  }

  test("spliceGraph refuses a degree wider than the sidecar's build degree") {
    // the merge lemma top-d(old∪new) = top-d(top-d(old)∪new) only holds
    // for d <= build degree: a wider splice would need old peers the
    // stored lists never kept, silently diverging from a rebuild
    val dir = Files.createTempDirectory("graft_vsg4").toString + "/index"
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 60)
      .select("doc_id", "text")
    assert(VectorStore.ingest(docs, dir) > 0)
    assert(VectorStore.buildGraph(spark, dir) > 0) // build degree 8
    val e = intercept[IllegalArgumentException] {
      VectorStore.spliceGraph(spark, dir, Seq(3L), degree = 9)
    }
    assert(e.getMessage.contains("build degree"), e.getMessage)
    // legacy sidecar (no degree file): the bound is inferred from the
    // stored lists (<= 8 here), so a degree-9 splice is still refused
    val degFile = new java.io.File(s"$dir/_graft_graph/degree.parquet")
    assert(degFile.isDirectory, "buildGraph did not persist its degree")
    degFile.listFiles().foreach(_.delete()); degFile.delete()
    val e2 = intercept[IllegalArgumentException] {
      VectorStore.spliceGraph(spark, dir, Seq(3L), degree = 9)
    }
    assert(e2.getMessage.contains("build degree"), e2.getMessage)
    // the refusals mutated nothing: a within-degree splice still works
    // (degree 1 is <= any inferred legacy bound — edges exist, so >= 1)
    assert(VectorStore.spliceGraph(spark, dir, Seq(3L), degree = 1) > 0)
  }

  test("spliceGraphDelete equals a full rebuild, keeps untouched mtimes, " +
      "drops emptied partitions") {
    val dir = Files.createTempDirectory("graft_vsg5").toString + "/index"
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 80)
      .select("doc_id", "text")
    assert(VectorStore.ingest(docs, dir) > 0)
    assert(VectorStore.buildGraph(spark, dir) > 0)
    // victims: a couple of docs plus EVERY member of one bucket except
    // at most one, so that bucket's edge partition must vanish outright
    val idx = spark.read.parquet(dir)
    // >= 2 chunks, so the bucket HAS an edge partition to be dropped
    val someBucket = idx.groupBy("bucket").count()
      .filter(col("count") >= 2)
      .orderBy(col("count"), col("bucket"))
      .collect().head.getInt(0)
    val bucketDocs = idx.filter(col("bucket") === someBucket)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSeq
    val victims = (bucketDocs ++ Seq(3L, 7L)).distinct
    val touched = idx
      .filter(col("doc_id").isInCollection(victims))
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    val edgeDir = new java.io.File(s"$dir/_graft_graph/edges.parquet")
    val untouchedMtimes = edgeDir.listFiles()
      .filter(f => f.getName.startsWith("sbucket=") &&
        !touched.contains(f.getName.stripPrefix("sbucket=").toInt))
      .map(f => f.getName -> f.lastModified).toMap
    assert(untouchedMtimes.nonEmpty, "delete touched every bucket")

    assert(VectorStore.delete(spark, dir, victims) > 0)
    VectorStore.spliceGraphDelete(spark, dir, victims)
    def edgeRows = spark.read.parquet(s"$dir/_graft_graph/edges.parquet")
      .select("src_doc", "src_ix", "dst_doc", "dst_ix")
      .collect().map(_.toString).sorted.toSeq
    val spliced = edgeRows
    // no stored list cites a victim anywhere
    assert(spark.read.parquet(s"$dir/_graft_graph/edges.parquet")
      .filter(col("src_doc").isInCollection(victims) ||
        col("dst_doc").isInCollection(victims)).count() == 0,
      "zombie edges citing deleted nodes survived the delete splice")
    // the fully-emptied bucket's edge partition is GONE, not stale
    // (dynamic overwrite alone would have left it untouched)
    assert(!new java.io.File(
      s"$dir/_graft_graph/edges.parquet/sbucket=$someBucket").exists,
      s"emptied bucket $someBucket kept a stale edge partition")
    // untouched bucket partitions were not rewritten
    untouchedMtimes.foreach { case (name, mtime) =>
      val f = new java.io.File(s"$dir/_graft_graph/edges.parquet/$name")
      assert(f.exists && f.lastModified == mtime,
        s"untouched edge partition $name was rewritten by a delete splice")
    }
    // and the splice reproduces the full rebuild bit-for-bit
    VectorStore.buildGraph(spark, dir)
    assert(edgeRows == spliced, "delete splice diverged from a full rebuild")
    // the width guard: a delete splice at a non-build degree refuses
    val e = intercept[IllegalArgumentException] {
      VectorStore.spliceGraphDelete(spark, dir, Seq(11L), degree = 4)
    }
    assert(e.getMessage.contains("build degree"), e.getMessage)
  }

  test("edit() re-exports docs through both splices; sidecar ends " +
      "rebuild-equal") {
    // the #EDIT lifecycle: delete old chunks -> delete-splice -> append
    // re-exported text under the SAME ids -> insert-splice; the edge
    // sidecar must end bit-equal to a rebuild of the final index.
    // Built at a NON-default degree: edit() must forward the sidecar's
    // own build degree to both splices (a hardcoded default would make
    // spliceGraphDelete's degree == built guard throw here)
    val dir = Files.createTempDirectory("graft_vsg6").toString + "/index"
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 80)
      .select("doc_id", "text")
    assert(VectorStore.ingest(docs, dir) > 0)
    assert(VectorStore.buildGraph(spark, dir, degree = 4) > 0)
    val edited = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(30L, 31L))
      .select(col("doc_id"),
        concat(lit("edited version "), col("text")).as("text"))
    val (removed, added) = VectorStore.edit(spark, dir, Seq(30L, 31L), edited)
    assert(removed > 0 && added > 0)
    spark.catalog.refreshByPath(dir)
    // the doc's chunks are the NEW text only
    val c30 = spark.read.parquet(dir)
      .filter(col("doc_id") === 30 && col("chunk_ix") === 1)
      .select("chunk").collect().map(_.getString(0))
    assert(c30.length == 1 && c30.head.startsWith("edited version"),
      s"doc 30 chunk 1 after edit: ${c30.toSeq}")
    // the edited chunk serves verbatim through the exact path
    val hits = VectorStore.search(spark, dir, c30.head, k = 3).collect()
    assert(hits.nonEmpty && hits.head.getAs[Long]("doc_id") == 30L,
      s"edited chunk not served: ${hits.headOption}")
    // the sidecar after the two splices equals a full rebuild AT THE
    // STORED DEGREE
    def edgeRows = spark.read.parquet(s"$dir/_graft_graph/edges.parquet")
      .select("src_doc", "src_ix", "dst_doc", "dst_ix")
      .collect().map(_.toString).sorted.toSeq
    val spliced = edgeRows
    assert(VectorStore.buildGraph(spark, dir, degree = 4) > 0)
    assert(edgeRows == spliced, "edit's splices diverged from a rebuild")
  }

  test("entry sidecar: per-bucket md5 heads, splice-maintained ≡ recompute, " +
      "serving ≡ scan fallback") {
    val dir = Files.createTempDirectory("graft_vsg8").toString + "/index"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    assert(VectorStore.ingest(docs.filter(col("doc_id") < 80), dir) > 0)
    assert(VectorStore.buildGraph(spark, dir) > 0)
    val entPath = s"$dir/_graft_graph/entries.parquet"
    def sidecarRows = spark.read.parquet(entPath)
      .select("bucket", "doc_id", "chunk_ix")
      .collect().map(_.toString).sorted.toSeq
    // shape: ≤ 32 heads per bucket, every head a stored chunk of that bucket
    val ent = spark.read.parquet(entPath)
    assert(ent.groupBy("bucket").count()
      .agg(max("count")).head().getLong(0) <= 32)
    val stored = spark.read.parquet(dir)
      .select("bucket", "doc_id", "chunk_ix")
    assert(ent.select("bucket", "doc_id", "chunk_ix")
      .join(stored, Seq("bucket", "doc_id", "chunk_ix"), "left_anti")
      .count() == 0, "entry sidecar cites a chunk outside its bucket")
    // recompute truth: per-bucket md5-top-32 over the index
    def recompute: Seq[String] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("bucket").orderBy(col("h"),
        col("doc_id"), col("chunk_ix"))
      spark.read.parquet(dir)
        .select(col("bucket"), col("doc_id"), col("chunk_ix"))
        .withColumn("h", md5(concat_ws(":",
          col("doc_id").cast("string"), col("chunk_ix").cast("string"))))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 32)
        .select("bucket", "doc_id", "chunk_ix")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(sidecarRows == recompute, "fresh sidecar != recompute")
    // append + insert splice: maintained sidecar ≡ recompute
    val more = docs.filter(col("doc_id") >= 80 && col("doc_id") < 95)
    assert(VectorStore.ingest(more, dir, mode = "append") > 0)
    VectorStore.spliceGraph(spark, dir,
      (80L until 95L).toSeq)
    assert(sidecarRows == recompute, "post-insert-splice sidecar diverged")
    // delete + delete splice: maintained sidecar ≡ recompute
    assert(VectorStore.delete(spark, dir, Seq(80L, 30L)) > 0)
    VectorStore.spliceGraphDelete(spark, dir, Seq(80L, 30L))
    assert(sidecarRows == recompute, "post-delete-splice sidecar diverged")
    // serving: sidecar-seeded walk ≡ the scan-fallback derivation
    val q = spark.read.parquet(dir).orderBy("doc_id", "chunk_ix")
      .select("chunk").limit(1).collect().head.getString(0)
    val withSidecar = VectorStore.searchGraph(spark, dir, q, k = 5)
      .collect().map(_.toString).toSeq
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(entPath), true))
    val fallback = VectorStore.searchGraph(spark, dir, q, k = 5)
      .collect().map(_.toString).toSeq
    assert(withSidecar == fallback,
      "sidecar seeding diverged from the scan derivation")
  }

  test("tuned seeded walk: >= 0.5 recall@5 vs full-scan truth at sub-bucket cost") {
    // the published graph_tune_r11 operating point (bucket-seeded
    // entries=32, beam=32, hops=4 over cosine-metric edges), pinned:
    // recall@5 against the EXACT full-scan truth clears 0.5 while the
    // walk touches fewer (query, vector) scores than the bucket
    // multiprobe's own candidate count — the sub-bucket-cost bar. Full
    // sf corpus (not the 100-doc fixture) so buckets hold real members.
    val dir = Files.createTempDirectory("graft_vsg7").toString + "/index"
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    assert(VectorStore.ingest(docs, dir) > 0)
    assert(VectorStore.buildGraph(spark, dir) > 0)
    val index = spark.read.parquet(dir)
      .select(col("doc_id"), col("chunk_ix"), col("chunk"), col("bucket"),
        col("embedding")).cache()
    val qrows = index.filter(col("chunk_ix") === 1 && col("doc_id") % 40 === 0)
      .orderBy("doc_id").limit(10)
      .select(col("chunk"), col("embedding")).collect()
    val queries = qrows.map(_.getString(0)).toSeq
    val qdf = { import spark.implicits._
      qrows.zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }
        .toSeq.toDF("query_id", "qemb") }
    val dotE = aggregate(zip_with(col("embedding"), col("qemb"),
      (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)
    val wT = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("doc_id"), col("chunk_ix"))
    val truth = index.crossJoin(broadcast(qdf))
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), dotE.as("dot"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(wT))
      .filter(col("rank") <= 5)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSet).toMap
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select("query_id", "doc_id", "chunk_ix").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSet).toMap
      truth.keys.toSeq.map { q =>
        truth(q).intersect(got.getOrElse(q, Set.empty)).size.toDouble / 5
      }.sum / truth.size
    }
    val (seededDf, touched) = VectorStore.graphWalk(spark, dir, queries, 5,
      32, 32, 4, seedFromBuckets = true, countTouched = true)
    val seeded = recallOf(seededDf)
    // the r10 fixed-global-entry config, for contrast (the serving
    // DEFAULT is now the seeded operating point itself)
    val default = recallOf(VectorStore.searchGraphBatch(spark, dir,
      queries, k = 5, entries = 8, beam = 8, hops = 4,
      seedFromBuckets = false))
    // the bucket probe's own candidate count = the cost bar
    val qb = { import spark.implicits._
      queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("query_id", "qtext") }
      .select(col("query_id"),
        element_at(call_function("graft_lsh_buckets",
          call_function("graft_hash_embed", col("qtext"),
            lit(VectorStore.Dim)), lit(1), lit(8)), 1).as("qbucket"))
    val probes = qb.select(col("query_id"), explode(array(
      col("qbucket") +: (0 until 8).map(p =>
        col("qbucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"))
    val bucketScored = index.select("bucket")
      .join(broadcast(probes), "bucket").count()
    assert(seeded >= 0.5,
      f"seeded walk recall $seeded%.3f below the pinned 0.5 operating point")
    assert(seeded > default,
      f"seeded walk ($seeded%.3f) did not beat fixed global entries ($default%.3f)")
    assert(touched < bucketScored,
      s"walk touched $touched scores, not sub-bucket (probe scores $bucketScored)")
    index.unpersist()
  }

  test("rebuild after append covers the appended chunks") {
    val dir = Files.createTempDirectory("graft_vsg2").toString + "/index"
    val first = Tables.documents(spark, sf).filter(col("doc_id") < 50)
      .select("doc_id", "text")
    assert(VectorStore.ingest(first, dir) > 0)
    assert(VectorStore.buildGraph(spark, dir) > 0)
    val more = Tables.documents(spark, sf)
      .filter(col("doc_id") >= 50 && col("doc_id") < 80)
      .select("doc_id", "text")
    assert(VectorStore.ingest(more, dir, mode = "append") > 0)
    VectorStore.buildGraph(spark, dir)
    val edges = spark.read.parquet(s"$dir/_graft_graph/edges.parquet")
    val newSrc = edges.filter(col("src_doc") >= 50).count()
    assert(newSrc > 0, "rebuilt graph has no edges from appended chunks")
  }
}
