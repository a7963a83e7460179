package graft

import graft.operators.VectorStore
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** G31 serving-knob tuning table (r11): the B14 sweep discipline applied
  * to the graph walk's knobs — entry seeding (fixed md5 global vs
  * per-query multiprobe-bucket), entries, beam, hops — each graded by
  * recall@5 against the EXACT full-scan truth (the StoreRecallProfile
  * standard) and by VECTORS TOUCHED (score evaluations the walk
  * performed, the DiskANN cost axis). The context the table answers:
  * the edge sidecar's candidates are same-bucket pairs, so the graph is
  * a union of per-bucket components and a walk can never leave its
  * entries' buckets — global entries reach ~9 arbitrary buckets and
  * starve against full-scan truth (store_recall_r10: 0.18); seeding
  * from the query's own probed buckets puts every hop inside the only
  * components that can contain true neighbors. The "sub-bucket cost"
  * baseline is the bucket multiprobe's own candidate count (what
  * search() scores). Run: `sbt "Test/runMain graft.GraphTuneProfile"`;
  * lands in bench/graph_tune_r11.json. */
object GraphTuneProfile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft_gtp").toString + "/index"
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
    require(VectorStore.ingest(docs, dir) > 0)
    require(VectorStore.buildGraph(spark, dir) > 0)
    val index = spark.read.parquet(dir)
      .select(col("doc_id"), col("chunk_ix"), col("chunk"),
        col("bucket"), col("embedding"))
      .cache()
    // 10 query chunks spread across the corpus (the recall-profile draw)
    val qrows = index.filter(col("chunk_ix") === 1 && col("doc_id") % 40 === 0)
      .orderBy("doc_id").limit(10)
      .select(col("doc_id").as("q_doc"), col("chunk").as("qtext"),
        col("embedding").as("qemb"))
      .collect()
    val queries = qrows.map(_.getString(1)).toSeq
    val qdf = { import spark.implicits._
      qrows.zipWithIndex.map { case (r, i) =>
        (i.toLong, r.getSeq[Double](2)) }.toSeq.toDF("query_id", "qemb") }
    val dot = aggregate(zip_with(col("embedding"), col("qemb"),
      (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("doc_id"), col("chunk_ix"))
    val truth = index.crossJoin(broadcast(qdf))
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), dot.as("dot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "doc_id", "chunk_ix")
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSet).toMap
    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select("query_id", "doc_id", "chunk_ix").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getInt(2))).toSet).toMap
      truth.keys.toSeq.map { q =>
        truth(q).intersect(got.getOrElse(q, Set.empty)).size.toDouble / 5
      }.sum / truth.size
    }
    // the bucket multiprobe's own cost: candidates search() scores — the
    // bar a "sub-bucket cost" walk must come in under
    val qb = { import spark.implicits._
      queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("query_id", "qtext") }
      .select(col("query_id"),
        call_function("graft_hash_embed", col("qtext"),
          lit(VectorStore.Dim)).as("qraw"))
    val qprobes = qb.select(col("query_id"),
      element_at(call_function("graft_lsh_buckets", col("qraw"),
        lit(1), lit(8)), 1).as("qbucket"))
    val bucketScored = {
      // replicate search()'s probe fan: own bucket + 8 Hamming-1 flips
      val probes = qprobes.select(col("query_id"), explode(array(
        col("qbucket") +: (0 until 8).map(p =>
          col("qbucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"))
      index.select("bucket").join(broadcast(probes), "bucket").count()
    }
    val points = Seq(
      ("global", 8, 8, 4), ("global", 32, 16, 4), ("global", 64, 16, 6),
      ("bucket", 4, 8, 2), ("bucket", 8, 8, 2), ("bucket", 8, 8, 4),
      ("bucket", 16, 16, 4), ("bucket", 16, 16, 6), ("bucket", 32, 32, 4),
      ("bucket", 32, 32, 6))
    val rows = points.map { case (seed, e, b, h) =>
      val (res, touched) = VectorStore.graphWalk(spark, dir, queries, 5,
        e, b, h, seedFromBuckets = seed == "bucket", countTouched = true)
      val r = recallOf(res)
      println(f"[graphtune] seed=$seed entries=$e beam=$b hops=$h " +
        f"recall=$r%.3f touched=$touched")
      f"""{"seed":"$seed","entries":$e,"beam":$b,"hops":$h,"recall":$r%.3f,"touched":$touched}"""
    }
    println(s"""{"metric":"graph_tune","k":5,"queries":${truth.size},"bucket_probe_scored":$bucketScored,"points":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
