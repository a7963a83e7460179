package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Known-answer tests on a crafted corpus: doc 0 ≡ doc 1 (exact dup),
  * doc 2 = doc 0 with one word changed (near dup), doc 3 unrelated. */
class DedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_dedup").toString
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again until the quick brown fox is tired of jumping over dogs"
    Seq(
      (0L, base, "en", "s", base.length.toLong),
      (1L, base, "en", "s", base.length.toLong),
      (2L, base.replace("lazy", "sleepy"), "en", "s", base.length.toLong),
      (3L, "completely different words about databases and distributed systems engineering work", "en", "s", 80L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("substring spans: cross-doc 10-token run reported with exact boundaries") {
    val d = Files.createTempDirectory("graft_substr").toString
    val run = (1 to 10).map(i => s"s$i").mkString(" ") // shared 10-token run
    val a = (1 to 5).map(i => s"a$i").mkString(" ") + " " + run + " " +
      (6 to 10).map(i => s"a$i").mkString(" ")
    val b = (1 to 7).map(i => s"b$i").mkString(" ") + " " + run + " " +
      (8 to 9).map(i => s"b$i").mkString(" ")
    val c = (1 to 12).map(i => s"c$i").mkString(" ") // no overlap anywhere
    Seq((0L, a, "en", "s", a.length.toLong), (1L, b, "en", "s", b.length.toLong),
      (2L, c, "en", "s", c.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = Dedup.dedupSubstring(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the run begins at token 6 of doc 0 and token 8 of doc 1 (1-based);
    // windows straddling the run edge contain doc-unique tokens, so the
    // island closes exactly at the 10-token run — boundaries are exact
    assert(rows.toSeq == Seq((0L, 6L, 10L), (1L, 8L, 10L)))
  }

  test("substring spans: run shorter than K invisible; exact dups span whole doc") {
    val d = Files.createTempDirectory("graft_substr2").toString
    val short7 = (1 to 7).map(i => s"r$i").mkString(" ") // 7 < K=8
    val a = short7 + " " + (1 to 6).map(i => s"x$i").mkString(" ")
    val b = short7 + " " + (1 to 6).map(i => s"y$i").mkString(" ")
    val dup = (1 to 15).map(i => s"d$i").mkString(" ")
    Seq((0L, a, "en", "s", a.length.toLong), (1L, b, "en", "s", b.length.toLong),
      (2L, dup, "en", "s", dup.length.toLong),
      (3L, dup, "en", "s", dup.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = Dedup.dedupSubstring(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 0/1 share only 7 consecutive tokens — below span resolution;
    // exact dups 2/3 are one full-document island each
    assert(rows.toSeq == Seq((2L, 1L, 15L), (3L, 1L, 15L)))
  }

  test("exact dedup groups identical texts under the min id") {
    val rows = Dedup.dedupExact(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(rows(0L) == 2L) // docs 0+1 collapse to keep_doc_id=0, 2 copies
    assert(rows(2L) == 1L && rows(3L) == 1L)
  }

  test("jaccard finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.dedupJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)) && keys.contains((0L, 2L)) && keys.contains((1L, 2L)))
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
  }

  test("minhash LSH recovers the same pair set as exhaustive jaccard here") {
    val mh = Dedup.dedupMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("minhash-estimated jaccard: exact dup estimates 1.0, grid-valued, no unrelated pair") {
    val est = Dedup.dedupMinhashEst(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical texts → identical signatures → all 16 components agree
    assert(est.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
    assert(!est.exists(p => p._1 == 3L || p._2 == 3L))
    // every estimate is k/16 for integral k (signature agreement fraction)
    assert(est.forall(p => (p._3 * 16) == (p._3 * 16).round.toDouble))
    // estimator consistency on the shared candidate set: where C3 verified
    // a pair exactly, the C3e estimate for that pair is also >= its 0.5 gate
    val exact = Dedup.dedupMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(est.map(p => (p._1, p._2)).toSet))
  }

  test("prefix join finds exact + near dup (J>=1/2), not unrelated docs") {
    val pairs = Dedup.dedupPrefix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)) && keys.contains((0L, 2L)) && keys.contains((1L, 2L)))
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
  }

  test("prefix candidate scheme is lossless vs brute force on generated docs") {
    // 40 docs over a tiny vocabulary — adversarially high shingle df, so
    // the prefix index is dense and any unsound prune would show up
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0 until 40).map { i =>
      val rnd = new scala.util.Random(i / 2) // consecutive ids share a seed
      val n = 4 + rnd.nextInt(8)
      val toks = Vector.fill(n)(words(rnd.nextInt(words.size))) ++
        (if (i % 2 == 1) Vector(words(i % words.size)) else Vector.empty)
      (i.toLong, toks.mkString(" "), "en", "s", 1L)
    }
    val d = Files.createTempDirectory("graft_prefix").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = Dedup.dedupPrefix(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: every pair with Jaccard >= 1/2 over word-bigram sets
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.length < 2) Set.empty
      else toks.sliding(2).map(_.mkString(" ")).toSet
    }
    val want = (for {
      x <- docs; y <- docs if x._1 < y._1
      sx = shingles(x._2); sy = shingles(y._2)
      if sx.nonEmpty && sy.nonEmpty
      i = (sx & sy).size
      if 3 * i >= sx.size + sy.size
    } yield (x._1, y._1)).toSet
    assert(got == want)
  }

  test("containment: exact dups mutually contained, unrelated doc excluded") {
    val pairs = Dedup.dedupContainment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0 && pairs((1L, 0L)) == 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containment pigeonhole filter is lossless vs brute force on generated docs") {
    // same adversarial tiny-vocabulary corpus shape as the prefix spec:
    // dense posting lists + a short doc appended inside a longer one, so
    // asymmetric (containment-only) pairs exist that Jaccard would miss
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0 until 40).map { i =>
      val rnd = new scala.util.Random(i / 3) // triples share a seed
      val n = 4 + rnd.nextInt(8)
      val base = Vector.fill(n)(words(rnd.nextInt(words.size)))
      val toks =
        if (i % 3 == 2) base ++ base.reverse ++ Vector.fill(6)(words(rnd.nextInt(words.size)))
        else base // i%3==2 is a strict superset-ish expansion of its pair
      (i.toLong, toks.mkString(" "), "en", "s", 1L)
    }
    val d = Files.createTempDirectory("graft_containment").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = Dedup.dedupContainment(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.length < 2) Set.empty
      else toks.sliding(2).map(_.mkString(" ")).toSet
    }
    val want = (for {
      x <- docs; y <- docs if x._1 != y._1
      sx = shingles(x._2); sy = shingles(y._2)
      if sx.nonEmpty && sy.nonEmpty
      i = (sx & sy).size
      if 10 * i >= 9 * sx.size
    } yield (x._1, y._1)).toSet
    assert(got == want)
    // the corpus construction must actually exercise asymmetry: at least
    // one directed pair whose reverse is absent
    assert(want.exists(p => !want.contains(p.swap)))
  }

  test("simhash: identical docs at hamming 0, near dup within threshold") {
    val pairs = Dedup.dedupSimhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 1L)) == 0L)
    assert(pairs.get((0L, 2L)).forall(_ <= 6L))
  }

  test("embcos: exact/near dups always collide in a bucket; distant vectors dropped") {
    import org.apache.spark.sql.functions.col
    val d = Files.createTempDirectory("graft_embcos").toString
    val dim = 64
    def unit(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(dim)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val v0 = unit(1)
    val v2 = { // small perturbation of v0, renormalized: a true near-dup
      val w = v0.map(_.toDouble); w(0) += 0.05
      val n = math.sqrt(w.map(x => x * x).sum)
      w.map(x => (x / n).toFloat)
    }
    Seq((0L, v0.toSeq, "a"), (1L, v0.toSeq, "b"),
        (2L, v2.toSeq, "a"), (3L, unit(99).toSeq, "b"))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val pairs = Dedup.dedupEmbcos(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    // identical vectors share every bucket deterministically; a tiny-angle
    // near-dup splits a given plane with prob θ/π ≈ 0.016, so missing all
    // 16 tables has probability ~1e-16 under the FIXED md5 planes
    assert(keys == Set((0L, 1L), (0L, 2L), (1L, 2L)), s"got $keys")
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 0.0)
  }

  test("embcos LSH pair set: sound subset of brute force, recall tracked vs label blocking") {
    import org.apache.spark.sql.functions.{call_function, col, floor, lit, transform}
    val sfDir = TestSpark.sf
    val qe = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1.0e7) + lit(0.5))).as("qe"),
        col("label"))
    val a = qe.select(col("vec_id").as("vec_a"), col("qe").as("ea"), col("label").as("la"))
    val b = qe.select(col("vec_id").as("vec_b"), col("qe").as("eb"), col("label").as("lb"))
    val brute = a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        call_function("graft_sqdist_l", col("ea"), col("eb")).as("d2x"),
        col("la"), col("lb"))
      .filter(col("d2x") <= lit(120000000000000L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.get(3) == r.get(4))).toMap
    val lsh = Dedup.dedupEmbcos(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // soundness: every emitted pair is a true in-threshold pair with the
    // exact brute-force distance (LSH affects candidates, never scores)
    lsh.foreach { case (k, d) =>
      assert(brute.contains(k), s"unsound pair $k")
      assert(d == brute(k)._1.toDouble / 1.0e14, s"distance drift for $k")
    }
    // recall floor on the loosest-possible pairs this corpus has
    // (cos ∈ [0.4, 0.51] — see operator comment); the legacy label-blocked
    // form is the differential baseline the LSH blocking replaced
    val labelBlocked = brute.filter(_._2._2).keySet
    val recallAll = lsh.size.toDouble / brute.size
    val recallLabel = labelBlocked.count(lsh.contains).toDouble /
      math.max(labelBlocked.size, 1)
    info(f"recall vs brute force: $recallAll%.2f (${lsh.size}/${brute.size}); " +
      f"vs label-blocked subset: $recallLabel%.2f (of ${labelBlocked.size})")
    assert(recallAll >= 0.5, f"LSH recall $recallAll%.2f below floor")
  }

  test("semantic: SemDeDup keep rule — one keep per cluster, the min-centroid-dot member") {
    val sfDir = TestSpark.sf
    val rows = Dedup.dedupSemantic(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
    // covers the whole corpus, ids unique
    assert(rows.map(_._1).distinct.length == rows.length)
    val (single, clustered) = rows.partition(_._3 == 1L)
    assert(clustered.nonEmpty, "corpus has no semantic clusters — spec vacuous")
    // singletons keep themselves with no centroid score
    single.foreach { r => assert(r._5 && r._2 == r._1 && r._4.isEmpty) }
    clustered.groupBy(_._2).foreach { case (rep, ms) =>
      assert(ms.length == ms.head._3.toInt, s"cluster_size mismatch for $rep")
      val keeps = ms.filter(_._5)
      assert(keeps.length == 1, s"cluster $rep keeps ${keeps.length} members")
      // the paper's rule: kept member is LEAST similar to the centroid
      val kept = keeps.head
      val best = ms.map(m => (m._4.get, m._1)).min
      assert((kept._4.get, kept._1) == best,
        s"cluster $rep kept $kept, expected min-centroid-dot $best")
    }
    // edges come from C5: every C5 pair lands in one cluster together
    Dedup.dedupEmbcos(spark, sfDir).collect().foreach { p =>
      val (a, b) = (p.getLong(0), p.getLong(1))
      val byId = rows.map(r => r._1 -> r._2).toMap
      assert(byId(a) == byId(b), s"C5 pair ($a,$b) split across clusters")
    }
  }
}
