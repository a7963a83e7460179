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

  test("simhash: identical docs at hamming 0, near dup within threshold") {
    val pairs = Dedup.dedupSimhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 1L)) == 0L)
    assert(pairs.get((0L, 2L)).forall(_ <= 6L))
  }
}
