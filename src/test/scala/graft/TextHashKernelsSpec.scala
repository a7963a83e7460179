package graft

import graft.functions.{Hashing, Text}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential specs: each fused native kernel must equal the composed
  * column-expression form it replaced, on the real corpus and on edge
  * cases (empty text, single token, repeated tokens, multi-space). */
class TextHashKernelsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private val edges = Seq(
    "",                      // no tokens
    "one",                   // single token → no shingles
    "a b",                   // exactly one shingle
    "a  b   c",              // multi-space (empty splits dropped)
    "x y x y x y",           // repeated shingles → distinct collapses
    "the quick brown fox jumps over the lazy dog")
    .toDF("text").withColumn("doc_id", monotonically_increasing_id())

  private def corpus = spark.read.parquet(s"$sf/documents.parquet")

  private val composedShingles = {
    val toks = Text.tokens(col("text"))
    val shingleArr = when(size(toks) >= 2,
      array_sort(array_distinct(transform(
        sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))))
      .otherwise(array().cast("array<string>"))
    array_sort(array_distinct(transform(shingleArr, sh => Hashing.h60p(sh))))
  }

  test("graft_shingle_hashes equals the composed HOF form on the corpus") {
    for (df <- Seq(corpus, edges)) {
      val rows = df.select(
        call_function("graft_shingle_hashes", col("text")).as("native"),
        composedShingles.as("composed")).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch: $r")
      }
    }
  }

  test("graft_simhash32 equals the exploded sign-vote aggregation") {
    val native = corpus
      .filter(regexp_count(col("text"), lit("[^ ]+")) > 0)
      .select(col("doc_id"), call_function("graft_simhash32", col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    val th = corpus
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("t"))
      .select(col("doc_id"), Hashing.h60(col("t")).as("h"))
    val votes = (0 until 32).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$j"))
    val sim = (0 until 32)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val composed = th.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sim.as("s")).as[(Long, Long)].collect().toMap
    assert(native == composed && native.nonEmpty)
  }

  test("graft_minhash_sig equals 16 array_min(transform(perm_i)) columns") {
    val sets = corpus.select(col("doc_id"),
      call_function("graft_shingle_hashes", col("text")).as("shs"))
      .filter(size(col("shs")) > 0)
    val native = sets.select(col("doc_id"),
      call_function("graft_minhash_sig", col("shs"), lit(16)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val composed = sets.select(col("doc_id"), array(
      (0 until 16).map(i =>
        array_min(transform(col("shs"), x => Hashing.perm(i, x)))): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == composed && native.nonEmpty)
  }

  test("graft_minhash_sig of an empty set is k nulls (min over empty)") {
    val out = Seq(Tuple1(Array.empty[Long])).toDF("shs")
      .select(call_function("graft_minhash_sig", col("shs"), lit(4)))
      .collect().head.getSeq[Any](0)
    assert(out == Seq(null, null, null, null))
  }

  test("kernels are SQL-callable and reject wrong input types") {
    assert(spark.sql("SELECT graft_simhash32('a b c')").collect().length == 1)
    val e = intercept[Exception] {
      Seq(Tuple1(1)).toDF("x")
        .select(call_function("graft_shingle_hashes", col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
