package graft

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential recall check of the custom deterministic kernels against
  * MLlib's LSH implementations (BASELINE's stated "MLlib" approach).
  *
  * The repo ships md5-derived MinHash/hyperplane kernels instead of
  * `org.apache.spark.ml.feature.{MinHashLSH, BucketedRandomProjectionLSH}`
  * because the correctness gate hash-compares every query against DuckDB:
  * MLlib's hash families are seeded JVM-private randomness a second engine
  * cannot replicate, while the md5 convention reproduces bit-identically
  * in any engine (SURVEY §4). This spec closes the loop the other way —
  * it measures that the custom kernels' RECALL is in the same band as the
  * MLlib operators they stand in for, on the same embeddings/documents
  * tables, against exact ground truth. Both sides run the same FIXED-probe
  * candidate discipline (bucket-equality OR across the same number of
  * tables) so the numbers compare candidate schemes, not search policies;
  * MLlib's adaptive `approxNearestNeighbors` (which keeps widening its
  * probe set until k are found) is reported for context only.
  *
  * The embeddings are unit-L2 (synthetic corpus), so max-inner-product and
  * min-Euclidean ground truth coincide and BRP-LSH (a Euclidean family)
  * competes on the same truth as the dot-product kernels. Uniform synthetic
  * vectors are LSH's worst case — real clustered embeddings concentrate
  * neighbors in-bucket — so these recalls are floors, not typical values.
  */
class MLlibDifferentialSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf
  import spark.implicits._

  private def recall(found: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    if (truth.isEmpty) 1.0 else (found & truth).size.toDouble / truth.size

  private def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a).cast("long"), col(b).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ann_lsh recall tracks MLlib BucketedRandomProjectionLSH at the " +
       "same fixed-probe table budget, against exact top-3 ground truth") {
    // exact inner-product top-3 per query — annBrute IS the exact scan
    val truth = pairSet(
      Similarity.annBrute(spark, sf).filter(col("rank") <= 3),
      "query_id", "neighbor_id")
    val customRecall = recall(
      pairSet(Similarity.annLsh(spark, sf), "query_id", "neighbor_id"), truth)

    // driver-side exact dot for the tiny test corpus (500 x 64)
    val emb: Map[Long, Array[Double]] = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.iterator.map(i => a(i) * b(i)).sum

    val toVec = udf((xs: Seq[Float]) =>
      Vectors.dense(xs.map(_.toDouble).toArray))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toVec(col("embedding")).as("features"))
    val queries = vecs.filter(col("vec_id") < 10)
    val corpus = vecs.filter(col("vec_id") >= 10).cache()
    corpus.count()
    // 8 hash tables = the custom kernel's 8. Bucket length calibrated so
    // BRP spends the same candidate budget as the kernel: projections of
    // unit vectors have sigma ~ 1/sqrt(64) ~ 0.125, and measured coverage
    // on this table is 0.992 @ bl=0.5, 0.853 @ 0.1, 0.297 @ 0.02 — the
    // last matching the kernel's ~0.27 scan fraction. (bl=1.0 would put
    // the whole corpus in one bucket = a disguised brute scan.)
    val brp = new BucketedRandomProjectionLSH()
      .setBucketLength(0.02).setNumHashTables(8).setSeed(42)
      .setInputCol("features").setOutputCol("hashes")
    val brpModel = brp.fit(corpus)
    // fixed-probe candidate join: collide in ANY table (same OR discipline
    // as the custom kernel), then exact top-3 re-rank inside candidates
    val h0 = udf((v: Vector) => v(0))
    def hashed(df: DataFrame, idAs: String): DataFrame = brpModel
      .transform(df)
      .select(col("vec_id").as(idAs), posexplode(col("hashes")))
      .select(col(idAs), col("pos").as("tbl"), h0(col("col")).as("h"))
    val cands = hashed(queries, "query_id")
      .join(hashed(corpus, "neighbor_id"), Seq("tbl", "h"))
      .select("query_id", "neighbor_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2) }
    val mllibFound = cands.iterator.flatMap { case (qid, ns) =>
      ns.map(n => (n, dot(emb(qid), emb(n)))).sortBy(t => (-t._2, t._1))
        .take(3).map(t => (qid, t._1))
    }.toSet
    val mllibRecall = recall(mllibFound, truth)

    // context: MLlib's adaptive kNN search (unbounded probe widening)
    val adaptiveFound = queries.collect().flatMap { qrow =>
      brpModel.approxNearestNeighbors(corpus, qrow.getAs[Vector](1), 3)
        .select("vec_id").collect().map(r => (qrow.getLong(0), r.getLong(0)))
    }.toSet
    corpus.unpersist()

    info(f"ann_lsh recall@3=$customRecall%.3f  BRP-LSH(8 tables, fixed probe)=$mllibRecall%.3f  BRP adaptive kNN=${recall(adaptiveFound, truth)}%.3f  (truth=${truth.size} pairs)")
    assert(customRecall >= 0.5,
      s"custom hyperplane LSH recall collapsed: $customRecall")
    // at the same candidate budget the multi-table hyperplane kernel
    // should not trail MLlib's scalar-quantized BRP family
    assert(customRecall >= mllibRecall - 0.05,
      s"custom $customRecall vs MLlib fixed-probe $mllibRecall")
  }

  test("dedup_minhash recall is in MLlib MinHashLSH's band against " +
       "exact all-pairs Jaccard ground truth") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text")).as("shs"))
      .filter(size(col("shs")) > 0).cache()
    sets.count()

    // exact ground truth: all-pairs Jaccard >= 0.3 (500 docs — fine here;
    // this brute force is precisely what the banded join avoids at scale)
    val a = sets.select(col("doc_id").as("doc_a"), col("shs").as("sa"))
    val b = sets.select(col("doc_id").as("doc_b"), col("shs").as("sb"))
    val truth = pairSet(
      a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
        .filter(lit(13) * call_function("graft_intersect_count", col("sa"), col("sb"))
          >= lit(3) * (size(col("sa")) + size(col("sb")))),
      "doc_a", "doc_b")

    val customRecall = recall(
      pairSet(Dedup.dedupMinhash(spark, sf), "doc_a", "doc_b"), truth)

    // MLlib path: shingle-hash sets as sparse binary vectors (index =
    // hash mod 2^20 — collision probability negligible at these set sizes)
    val dim = 1 << 20
    val toSparse = udf((hs: Seq[Long]) => {
      val idx = hs.map(h => (((h % dim) + dim) % dim).toInt).distinct.sorted
      Vectors.sparse(dim, idx.toArray, Array.fill(idx.size)(1.0))
    })
    val docs = sets.select(col("doc_id"), toSparse(col("shs")).as("features"))
      .cache()
    docs.count()
    // 16 tables = the custom kernel's 16 permutations (its banding is 4x4;
    // MLlib ORs 16 single-hash tables — a more permissive candidate stage)
    val mh = new MinHashLSH().setNumHashTables(16).setSeed(42)
      .setInputCol("features").setOutputCol("hashes")
    val mhModel = mh.fit(docs)
    val mllibPairs = mhModel
      .approxSimilarityJoin(docs, docs, 0.7, "jd")
      .select(col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
    val mllibRecall = recall(pairSet(mllibPairs, "doc_a", "doc_b"), truth)
    docs.unpersist(); sets.unpersist()

    info(f"dedup_minhash recall=$customRecall%.3f  MinHashLSH recall=$mllibRecall%.3f  (truth=${truth.size} pairs)")
    assert(customRecall >= 0.9,
      s"custom MinHash banding recall collapsed: $customRecall")
    assert(customRecall >= mllibRecall - 0.1,
      s"custom $customRecall vs MLlib $mllibRecall")
  }

  test("knn_vote_lsh: every query classified, vote bounds hold, agreement tracked") {
    val exact = Similarity.knnVote(spark, sf).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val lsh = Similarity.knnVoteLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.get(1), r.getLong(2)))
    // the OR-amplified multi-probe always yields candidates on this
    // corpus: every query must come back with a prediction and a sane
    // vote count (1..5 voters)
    assert(lsh.map(_._1).toSet == exact.keySet,
      "LSH vote lost a query entirely")
    lsh.foreach { case (q, _, votes) =>
      assert(votes >= 1 && votes <= 5, s"query $q vote count $votes")
    }
    val agree = lsh.count { case (q, l, _) => exact(q) == l }
    info(s"prediction agreement vs exact knn_vote: $agree/${lsh.length}")
    // uniform synthetic embeddings are LSH's worst case; on real
    // clustered data agreement tracks the candidate recall. Fixed plane
    // seeds + fixed corpus make this deterministic — a drop means the
    // bucket math changed.
    assert(agree >= lsh.length / 3,
      s"agreement collapsed: $agree/${lsh.length}")
  }

  test("ann_knn_graph: contiguous ranks, exact scores, edges only between bucket-mates") {
    val edges = Similarity.annKnnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(edges.nonEmpty)
    // per-source ranks are 1..m contiguous and scores non-increasing
    edges.groupBy(_._1).foreach { case (src, es) =>
      val sorted = es.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"src $src ranks")
      assert(sorted.sliding(2).forall(w => w.length < 2 || w(0)._4 >= w(1)._4),
        s"src $src scores not descending")
    }
    // no self-edges, and every edge score equals the exact quantized dot
    val vecs = graft.sources.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def qdot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * 1e8 + 0.5).toLong * math.floor(y.toDouble * 1e8 + 0.5).toLong
      }.sum.toDouble / 1e16
    edges.foreach { case (s0, _, n, score) =>
      assert(s0 != n, "self edge")
      assert(score == qdot(vecs(s0), vecs(n)), s"score mismatch on ($s0,$n)")
    }
  }
}
