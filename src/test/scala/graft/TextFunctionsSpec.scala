package graft

import graft.functions.{Hashing, Text}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class TextFunctionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("collocations: min support holds, lift matches an independent recompute") {
    val rows = graft.operators.TextAnalysis.textCollocations(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty && rows.forall(_._2 >= 5))
    // descending by lift with bigram tie-break
    assert(rows.sliding(2).forall(w => w.length < 2 ||
      w(0)._3 > w(1)._3 || (w(0)._3 == w(1)._3 && w(0)._1 < w(1)._1)))
    // recompute lift from first principles on the collected corpus
    val texts = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select("text").collect().map(_.getString(0))
    val toks = texts.flatMap(_.split(" ").filter(_.nonEmpty))
    val uni = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bis = texts.flatMap { t =>
      val ts = t.split(" ").filter(_.nonEmpty)
      ts.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    val bc = bis.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nu = toks.length.toLong; val nb = bis.length.toLong
    rows.foreach { case (bg, cnt, lift) =>
      assert(bc(bg) == cnt, s"count mismatch for $bg")
      val Array(x, y) = bg.split(" ")
      val expect = (cnt * nu * nu).toDouble / (nb * uni(x) * uni(y)).toDouble
      assert(lift == expect, s"lift mismatch for $bg: $lift vs $expect")
    }
  }

  test("adaptive filter drops exactly each language's bottom score quartile") {
    val all = graft.operators.TextAnalysis.textLmScore(spark, TestSpark.sf)
      .join(graft.sources.Tables.documents(spark, TestSpark.sf).select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val kept = graft.operators.TextAnalysis.textAdaptiveFilter(spark, TestSpark.sf)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val nByLang = all.groupBy(_._2).view.mapValues(_.length).toMap
    val keptByLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(nByLang.keySet == keptByLang.keySet) // no language filtered away entirely
    nByLang.foreach { case (lang, n) =>
      // (score, doc_id) order has no rank ties, so the gate keeps exactly
      // the docs with rank-1 >= 0.25*(n-1)
      val expectDropped = math.ceil(0.25 * (n - 1)).toInt
      assert(keptByLang(lang) == n - expectDropped,
        s"lang=$lang n=$n kept=${keptByLang(lang)} expectDropped=$expectDropped")
    }
  }

  /** Reference chunker reimplemented verbatim from
    * TextProcessor.chunk_text (tokens stand in for tiktoken ids). */
  private def referenceChunks(tokens: Vector[String], size: Int, overlap: Int): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    while (start < tokens.length) {
      out += tokens.slice(start, start + size).mkString(" ")
      start += size - overlap
    }
    out.result()
  }

  private def sparkChunks(text: String, size: Int, overlap: Int): Seq[String] =
    Seq(text).toDF("text")
      .select(Text.chunks(col("text"), size, overlap).as("c"))
      .as[Seq[String]].head()

  test("graft_chunks kernel matches the composed HOF form") {
    val gen = for {
      n <- Gen.choose(0, 80)
      toks <- Gen.listOfN(n, Gen.oneOf(Gen.alphaLowerStr.map(_.take(4)),
        Gen.const(""))) // empty tokens → runs of spaces exercise tokenize
      size <- Gen.choose(2, 25)
      overlap <- Gen.choose(0, size - 1)
    } yield (toks.mkString(" "), size, overlap)
    val cases = Gen.listOfN(10, gen).sample.get :+ (("", 20, 5))
    cases.foreach { case (text, size, overlap) =>
      val df = Seq(text).toDF("text")
      val fused = df.select(Text.chunks(col("text"), size, overlap).as("c"))
        .as[Seq[String]].head()
      val composed = df.select(
        Text.chunksComposed(Text.tokens(col("text")), size, overlap).as("c"))
        .as[Seq[String]].head()
      assert(fused == composed, s"for (${text.take(40)}, $size, $overlap)")
    }
  }

  test("chunks matches the reference sliding-window loop") {
    for ((text, size, overlap) <- Seq(
      ("a b c d e f g h i j k l m n o p q r s t u v w", 20, 5),
      ("a b c", 20, 5),
      ("a b c d e f", 4, 1),
      ("one", 2, 1),
      ("a b c d e f g h", 4, 2))) {
      val toks = text.split(" ").toVector
      assert(sparkChunks(text, size, overlap) == referenceChunks(toks, size, overlap),
        s"for ($text, $size, $overlap)")
    }
  }

  test("chunks matches reference loop on random inputs") {
    val gen = for {
      n <- Gen.choose(1, 60)
      toks <- Gen.listOfN(n, Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(3)))
      size <- Gen.choose(2, 25)
      overlap <- Gen.choose(0, size - 1)
    } yield (toks.mkString(" "), size, overlap)
    // a modest sample keeps the suite fast; each case is a Spark job
    Gen.listOfN(8, gen).sample.get.foreach { case (text, size, overlap) =>
      val toks = text.split(" ").filter(_.nonEmpty).toVector
      assert(sparkChunks(text, size, overlap) == referenceChunks(toks, size, overlap))
    }
  }

  test("knowledgeBlocks extracts all tagged blocks in order") {
    val out = Seq("#KNOWLEDGE one #END noise #KNOWLEDGE two three #END tail")
      .toDF("t").select(Text.knowledgeBlocks(col("t")).as("b"))
      .as[Seq[String]].head()
    assert(out.map(_.trim) == Seq("one", "two three"))
  }

  test("dsir: target-vocab docs outrank off-target; affinity exact on a crafted corpus") {
    val d = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    // src0 is the DSIR target: its vocab is {alpha beta}; others use
    // {gamma delta}; doc 4 mixes. Every token of doc 0/1 is target-pure.
    Seq(
      (0L, "alpha beta alpha", "en", "src0", 15L),
      (1L, "beta alpha", "en", "src0", 10L),
      (2L, "gamma delta gamma delta", "en", "src1", 23L),
      (3L, "delta gamma", "en", "src2", 11L),
      (4L, "alpha gamma", "en", "src3", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = graft.operators.TextAnalysis.textDsir(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    // doc 1 (5/6) noses out doc 0 (8/10): beta is rarer corpus-wide and
    // fully target-owned, and doc 1's mass tilts toward it
    assert(rows.map(_._1).toSeq == Seq(1L, 0L, 4L, 2L, 3L)) // rank order
    // doc 0: alpha×2 + beta — alpha: target 3 raw 4; beta: target 2 raw 2
    val d0 = rows.find(_._1 == 0L).get
    assert(d0._2 == 3L && d0._3 == 8L && d0._4 == 10L && d0._5 == 0.8)
    // doc 2 is pure off-target: t_sum 0, affinity 0
    val d2 = rows.find(_._1 == 2L).get
    assert(d2._3 == 0L && d2._5 == 0.0)
    // mixed doc sits strictly between pure-target and pure-off-target
    val d4 = rows.find(_._1 == 4L).get
    assert(d4._5 > 0.0 && d4._5 < rows.find(_._1 == 1L).get._5)
  }

  test("gopher rules: each published threshold trips on a crafted violator") {
    val d = java.nio.file.Files.createTempDirectory("graft_gopher").toString
    val good = (("the of " * 3) + "word " * 44).trim // 50 words, letters, 2 stops
    val tooShort = "the of words"                    // < 50 words
    val longWords = (("the of " * 3) + "abcdefghijklmno " * 44).trim // mean len > 10
    val symbols = (("the of " * 3) + "#tag " * 44).trim // symbol ratio > 0.1
    val bullets = Seq.fill(10)("- the of item").mkString("\n") +
      "\n" + good // 10/11 bullet lines > 90%
    val numeric = (("the of " * 3) + "12345 " * 44).trim // alpha words < 80%
    val noStops = ("word " * 50).trim                // 0 distinct stop words
    val ellipsis = Seq.fill(4)("the of word...").mkString("\n") +
      "\n" + good                                    // 4/5 ellipsis lines > 30%
    val rows = Seq(good, tooShort, longWords, symbols, bullets, numeric,
      noStops, ellipsis)
      .zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val out = graft.operators.TextAnalysis.textGopherRules(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    def rule(id: Long, col: String): Boolean =
      out(id).getBoolean(out(id).fieldIndex(col))
    assert(rule(0, "keep"))
    assert(!rule(1, "r_wordcount") && !rule(1, "keep"))
    assert(!rule(2, "r_mean_len") && rule(2, "r_wordcount") && !rule(2, "keep"))
    assert(!rule(3, "r_symbol") && !rule(3, "keep"))
    assert(!rule(4, "r_bullet") && !rule(4, "keep"))
    assert(!rule(5, "r_alpha") && !rule(5, "keep"))
    assert(!rule(6, "r_stop") && rule(6, "r_wordcount") && !rule(6, "keep"))
    assert(!rule(7, "r_ellipsis") && rule(7, "r_symbol") && !rule(7, "keep"))
    // mean_word_len is the counters' ratio exactly
    val g0 = out(0L)
    assert(g0.getDouble(g0.fieldIndex("mean_word_len")) ==
      (("the of " * 3) + "word " * 44).trim.replace(" ", "").length.toDouble / 50)
  }

  test("line dedup strips corpus-wide boilerplate lines, keeps order, counts drops") {
    val d = java.nio.file.Files.createTempDirectory("graft_linededup").toString
    val banner = "accept cookies to continue"
    val footer = "copyright example corp"
    val a = s"$banner\nunique first line\n$footer\nunique last line"
    val b = s"$banner\ndifferent content here\n$footer"
    val c = "totally original document\nwith original lines only"
    Seq((0L, a, "en", "s", a.length.toLong), (1L, b, "en", "s", b.length.toLong),
      (2L, c, "en", "s", c.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = graft.operators.TextAnalysis.textLineDedup(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    // banner+footer appear in 2 docs -> stripped everywhere; order kept
    assert(rows(0L) == (("unique first line\nunique last line", 4L, 2L)))
    assert(rows(1L) == (("different content here", 3L, 2L)))
    assert(rows(2L) == (("totally original document\nwith original lines only", 2L, 0L)))
  }

  test("mentionIds parses <@U…> ids") {
    val out = Seq("hi <@U42> and <@U7>!").toDF("t")
      .select(Text.mentionIds(col("t")).as("m")).as[Seq[Long]].head()
    assert(out == Seq(42L, 7L))
  }

  test("h60p matches the DuckDB oracle formula value") {
    // DuckDB: ('0x'||substr(md5('tok'),1,15))::BIGINT % 1000000007 = 847219197
    val v = Seq("tok").toDF("t").select(Hashing.h60p(col("t")).as("h")).as[Long].head()
    assert(v == 847219197L)
  }

  test("leadingWords truncates at n tokens") {
    val out = Seq("a b c d e").toDF("t")
      .select(Text.leadingWords(col("t"), 3).as("s")).as[String].head()
    assert(out == "a b c")
  }
}
