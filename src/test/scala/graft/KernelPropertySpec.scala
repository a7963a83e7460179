package graft

import graft.functions.Hashing
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the fused native kernels must agree with the composed
  * Spark-expression forms on arbitrary generated inputs — not just the
  * corpus. Inputs stress tokenizer edges (runs of spaces, empty strings,
  * unicode, repeated tokens) and quantized-vector ranges. */
class KernelPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("a", "b", "ab", "λ", "é", "🙂", "x-y", "0"),
    Gen.const(""))

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 30)
    toks <- Gen.listOfN(n, token)
    sep <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  ", "   "))
  } yield toks.zipAll(sep, "", "").map { case (t, s) => t + s }.mkString

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("graft_shingle_hashes == composed form on 200 generated strings") {
    val texts = sample(textGen, 200)
    val df = texts.toDF("text")
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val shingleArr = when(size(toks) >= 2,
      array_sort(array_distinct(transform(
        sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))))
      .otherwise(array().cast("array<string>"))
    val rows = df.select(
      call_function("graft_shingle_hashes", col("text")).as("native"),
      array_sort(array_distinct(transform(shingleArr, sh => Hashing.h60p(sh))))
        .as("composed"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch for text=${r.getString(2)}")
    }
  }

  test("graft_winnow == composed window-minima form on 200 generated strings") {
    val k = 3; val w = 4
    val texts = sample(textGen, 200)
    val df = texts.toDF("text")
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val n = size(toks)
    val grams = when(n >= k,
      transform(sequence(lit(1), n - (k - 1)),
        i => Hashing.h60p(concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<bigint>"))
    val mins = when(size(grams) >= w,
      transform(sequence(lit(1), size(grams) - (w - 1)),
        j => array_min(slice(grams, j, lit(w)))))
      .otherwise(array().cast("array<bigint>"))
    val rows = df.select(
      call_function("graft_winnow", col("text"), lit(k), lit(w)).as("native"),
      array_sort(array_distinct(mins)).as("composed"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"winnow mismatch for text=${r.getString(2)}")
    }
  }

  test("graft_pos_grams == composed positional-gram form on 200 generated strings") {
    val k = 8
    val texts = sample(textGen, 200)
    val df = texts.toDF("text")
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val n = size(toks)
    val grams = when(n >= k,
      transform(sequence(lit(1), n - (k - 1)),
        i => Hashing.h60p(concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<bigint>"))
    val rows = df.select(
      call_function("graft_pos_grams", col("text"), lit(k)).as("native"),
      grams.as("composed"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"pos_grams mismatch for text=${r.getString(2)}")
    }
  }

  test("graft_gopher_stats == composed counters on 200 generated multi-line strings") {
    val gopherToken: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.const(""),
      Gen.oneOf("the", "of", "and", "with", "#tag", "so...", "12345", "é"))
    val lineGen: Gen[String] = for {
      n <- Gen.chooseNum(0, 8)
      toks <- Gen.listOfN(n, gopherToken)
      pre <- Gen.oneOf("", "- ", "* ", "• ")
      suf <- Gen.oneOf("", "...", ".")
    } yield pre + toks.mkString(" ") + suf
    val docGen: Gen[String] = for {
      n <- Gen.chooseNum(1, 5)
      ls <- Gen.listOfN(n, lineGen)
    } yield ls.mkString("\n")
    val texts = sample(docGen, 200)
    val df = texts.toDF("text")
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val lines = split(col("text"), "\n", -1)
    val stops = array(graft.plans.TextHash.GopherStops.map(lit): _*)
    val rows = df.select(
      call_function("graft_gopher_stats", col("text")).as("native"),
      array(
        size(toks).cast("long"),
        coalesce(aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (a, v) => a + v), lit(0L)),
        size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("long"),
        size(filter(toks, t => t.contains("#") || t.contains("..."))).cast("long"),
        size(lines).cast("long"),
        size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ")))
          .cast("long"),
        size(filter(lines, l => l.endsWith("..."))).cast("long"),
        size(filter(stops, s => array_contains(toks, s))).cast("long")
      ).as("composed"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"gopher_stats mismatch for text=${r.getString(2).replace("\n", "\\n")}")
    }
  }

  test("winnow guarantee: docs sharing a w+k-1 token run share a fingerprint") {
    // Schleimer et al. theorem: with k-gram hashing and window w, any
    // shared token run of length >= w+k-1 guarantees a common fingerprint
    val k = 3; val w = 4
    val word: Gen[String] = Gen.choose('a', 'z').map(_.toString)
    val docPair = for {
      run <- Gen.listOfN(w + k - 1, word)       // the shared run
      preA <- Gen.listOfN(10, word); sufA <- Gen.listOfN(10, word)
      preB <- Gen.listOfN(7, word); sufB <- Gen.listOfN(13, word)
    } yield ((preA ++ run ++ sufA).mkString(" "),
             (preB ++ run ++ sufB).mkString(" "))
    val pairs = sample(docPair, 100)
    val rows = pairs.toDF("a", "b").select(
      call_function("graft_winnow", col("a"), lit(k), lit(w)).as("fa"),
      call_function("graft_winnow", col("b"), lit(k), lit(w)).as("fb"),
      col("a"), col("b")).collect()
    rows.foreach { r =>
      val shared = r.getSeq[Long](0).toSet intersect r.getSeq[Long](1).toSet
      assert(shared.nonEmpty,
        s"no shared fingerprint for docs sharing a ${w + k - 1}-token run:\n" +
          s"${r.getString(2)}\n${r.getString(3)}")
    }
  }

  test("graft_simhash32 == composed sign-vote on generated strings") {
    val texts = sample(textGen, 200).filter(_.exists(_ != ' '))
    val df = texts.toDF("text").withColumn("id", monotonically_increasing_id())
    val native = df.select(col("id"),
      call_function("graft_simhash32", col("text"))).as[(Long, Long)]
      .collect().toMap
    val th = df.select(col("id"),
      explode(filter(split(col("text"), " "), t => length(t) > 0)).as("t"))
      .select(col("id"), Hashing.h60(col("t")).as("h"))
    val votes = (0 until 32).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$j"))
    val sim = (0 until 32)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val composed = th.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"), sim).as[(Long, Long)].collect().toMap
    composed.foreach { case (id, s) =>
      assert(native(id) == s, s"simhash mismatch for id=$id")
    }
  }

  test("int64 vector kernels == composed folds on generated vectors") {
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-200000000L, 200000000L))
    val pairs = sample(Gen.zip(vecGen, vecGen), 100)
      .map { case (a, b) => (a.toArray, b.toArray) }
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      call_function("graft_dot_l", col("a"), col("b")).as("ndot"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("cdot"),
      call_function("graft_sqdist_l", col("a"), col("b")).as("nsq"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v).as("csq")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getLong(2) == r.getLong(3))
    }
  }

  test("graft_contain_count == composed gate+intersect on generated sorted sets") {
    // sorted-distinct sets with heavy overlap (small value domain) so both
    // gate outcomes appear, including exact-boundary 10·i == 9·|a| cases
    val setGen = for {
      n <- Gen.chooseNum(0, 40)
      vs <- Gen.listOfN(n, Gen.chooseNum(0L, 60L))
    } yield vs.distinct.sorted.toArray
    val pairs = sample(Gen.zip(setGen, setGen), 300)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      call_function("graft_contain_count", col("a"), col("b"), lit(9), lit(10)).as("native"),
      call_function("graft_intersect_count", col("a"), col("b")).as("i"),
      size(col("a")).as("na")).collect()
    rows.foreach { r =>
      val (native, i, na) = (r.getLong(0), r.getLong(1), r.getInt(2))
      val expect = if (10 * i >= 9 * na) i else -1L
      assert(native == expect, s"i=$i na=$na native=$native")
    }
  }

  test("graft_hash_embed == composed slot/sign aggregation on generated strings") {
    val texts = sample(textGen, 200)
    val df = texts.toDF("text").withColumn("id", monotonically_increasing_id())
    val native = df.select(col("id"),
      call_function("graft_hash_embed", col("text"), lit(16)))
      .as[(Long, Seq[Long])].collect().toMap
    val th = df.select(col("id"),
      explode(filter(split(col("text"), " "), t => length(t) > 0)).as("t"))
      .select(col("id"),
        (Hashing.h60(col("t")) % 16).cast("int").as("slot"),
        (shiftright(Hashing.h60(col("t")), 5).bitwiseAND(lit(1L)) * 2 - 1).as("sign"))
    val composed = th.groupBy("id", "slot").agg(sum("sign").as("w"))
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("slot"), col("w")))).as("m"))
      .select(col("id"), transform(sequence(lit(0), lit(15)),
        i => coalesce(element_at(col("m"), i.cast("int")), lit(0L))).as("raw"))
      .as[(Long, Seq[Long])].collect().toMap
    composed.foreach { case (id, w) => assert(native(id) == w, s"id=$id") }
    // zero-token docs (absent from composed) must be the all-zero vector
    (native.keySet -- composed.keySet).foreach { id =>
      assert(native(id).forall(_ == 0L))
    }
  }

  test("graft_minhash_sig == composed permutation minima on generated sets") {
    val setGen = for {
      n <- Gen.chooseNum(0, 50)
      xs <- Gen.listOfN(n, Gen.chooseNum(0L, Hashing.P - 1))
    } yield xs.distinct.sorted.toArray
    val df = sample(setGen, 100).map(Tuple1(_)).toDF("shs")
    val rows = df.select(
      call_function("graft_minhash_sig", col("shs"), lit(16)).as("native"),
      array((0 until 16).map(i =>
        array_min(transform(col("shs"), x => Hashing.perm(i, x)))): _*)
        .as("composed")).collect()
    rows.foreach { r => assert(r.getSeq[Any](0) == r.getSeq[Any](1)) }
  }

  test("graft_hll_est == composed register math on generated hash groups") {
    // arbitrary 60-bit hashes across groups with very different sizes —
    // partial/merge/serialize all exercised through a real shuffle
    val rows = sample(Gen.zip(Gen.chooseNum(0, 7), Gen.chooseNum(0L, (1L << 60) - 1)), 2000)
    val df = rows.toDF("g", "h").repartition(8)
    val native = df.groupBy("g")
      .agg(call_function("graft_hll_est", col("h")).as("est"))
      .as[(Int, Double)].collect().toMap
    val composed = df
      .select(col("g"), (col("h") % 64).cast("int").as("reg"),
        (lit(55) - length(bin(expr("h div 64")))).as("rank"))
      .groupBy("g", "reg").agg(max("rank").as("m"))
      .withColumn("w", expr("shiftleft(cast(1 as bigint), cast(55 - m as int))"))
      .groupBy("g")
      .agg(sum("w").as("zp"), count(lit(1)).as("np"))
      .select(col("g"), (lit(0.709) * lit(4096.0) * lit(36028797018963968.0) /
        (col("zp") + (lit(64) - col("np")) * lit(36028797018963968L)).cast("double"))
        .as("est"))
      .as[(Int, Double)].collect().toMap
    composed.foreach { case (g, e) =>
      assert(native(g) == e, s"hll mismatch for group $g")
    }
  }

  test("graft_char_trigrams == composed substr form on generated strings") {
    val texts = sample(textGen, 200)
    val df = texts.toDF("text")
    val composed = when(length(col("text")) >= 3,
      transform(sequence(lit(1), length(col("text")) - 2),
        i => col("text").substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
    val rows = df.select(
      call_function("graft_char_trigrams", col("text"), lit(false)).as("no"),
      composed.as("co"),
      call_function("graft_char_trigrams", col("text"), lit(true)).as("nd"),
      array_sort(array_distinct(composed)).as("cd"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"positional mismatch for ${r.getString(4)}")
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"distinct mismatch for ${r.getString(4)}")
    }
  }

  test("graft_word_tri_stats == composed trigram counts on generated strings") {
    val texts = sample(textGen, 200)
    val df = texts.toDF("text")
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val tri = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i => concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    val rows = df.select(
      call_function("graft_word_tri_stats", col("text")).as("k"),
      size(tri).cast("long").as("n"),
      size(array_distinct(tri)).cast("long").as("u"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == Seq(r.getLong(1), r.getLong(2)),
        s"mismatch for '${r.getString(3)}'")
    }
  }

  test("graft_word_bigrams == composed zip_with form on generated strings") {
    val texts = sample(textGen, 200)
    val df = texts.toDF("text")
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val composed = when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1), (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val rows = df.select(
      call_function("graft_word_bigrams", col("text")).as("k"),
      composed.as("c"), col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch for '${r.getString(2)}'")
    }
  }

  test("graft_fingerprint == composed rolling fold on generated strings") {
    val texts = sample(textGen, 200)
    val df = texts.toDF("text")
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val composed = aggregate(transform(toks, t => Hashing.h60p(t)), lit(0L),
      (acc, x) => pmod(acc * 31 + x, lit(Hashing.P)))
    val rows = df.select(
      call_function("graft_fingerprint", col("text")).as("k"),
      composed.as("c"), col("text")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for '${r.getString(2)}'")
    }
  }

  test("graft_token_set_hits == composed size(filter(...)) on generated strings") {
    val sets = Seq(Seq("the", "a", "ab"), Seq("λ", "é"), Seq("x-y", "0", "b"))
    val spec = sets.map(_.mkString(",")).mkString(";")
    val texts = sample(textGen, 200)
    val df = texts.toDF("text")
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val composed = sets.map(ms =>
      size(filter(toks, t => t.isInCollection(ms))).cast("long"))
    val rows = df.select(
      call_function("graft_token_set_hits", col("text"), lit(spec)).as("k"),
      array(composed: _*).as("c"), col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch for '${r.getString(2)}'")
    }
  }

  test("graft_lsh_buckets == composed per-plane sign dots on generated vectors") {
    val tables = 8; val bits = 8; val dim = 64
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-200000000L, 200000000L))
      .map(_.toArray)
    val df = sample(vecGen, 60).map(Tuple1(_)).toDF("v")
    // the composed form the kernel replaced: one graft_dot_l per (t, p)
    // against the md5-derived plane regenerated here from the same seed
    def plane(t: Int, p: Int): Array[Long] = Array.tabulate(dim) { d =>
      val b = s"${t}_${p}_$d".getBytes("UTF-8")
      (graft.plans.TextHash.h60Bytes(b, 0, b.length) & 1L) * 2L - 1L
    }
    val composed = array((0 until tables).map(t =>
      (0 until bits).map { p =>
        when(call_function("graft_dot_l", col("v"), lit(plane(t, p))) > 0,
          lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)): _*)
    val rows = df.select(
      call_function("graft_lsh_buckets", col("v"), lit(tables), lit(bits))
        .as("native"),
      composed.as("composed")).collect()
    rows.foreach { r => assert(r.getSeq[Any](0) == r.getSeq[Any](1)) }
  }

  test("graft_bpe_encode == the r13 window pipeline on 200 generated strings") {
    // merge inventory with tokenizer/codepoint edges: ASCII pairs, a
    // combining-free BMP pair, and an astral (surrogate-pair) bigram
    val merges = Seq("ab", "xy", "0a", "λé", "🙂🙂").sorted
    val texts = sample(textGen, 200)
    val df = texts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    // the exact pre-r14 formulation: per-char checksum fold + mergeable
    // bigram explode + the two-window greedy-run decomposition
    import org.apache.spark.sql.expressions.Window
    val mod = lit(1000000L)
    def hmod(c: org.apache.spark.sql.Column) = pmod(Hashing.h60(c), mod)
    val toks = df.select(col("doc_id"),
      posexplode(filter(split(col("text"), " "), t => length(t) > 0)))
      .withColumnRenamed("pos", "tok_ix").withColumnRenamed("col", "tok")
    val charSum = aggregate(
      transform(sequence(lit(1), length(col("tok"))),
        i => hmod(col("tok").substr(i, lit(1)))),
      lit(0L), (acc, x) => acc + x)
    val perTok = toks.select(col("doc_id"), col("tok_ix"),
      length(col("tok")).cast("long").as("len"), charSum.as("csum"))
    val bigs = toks.filter(length(col("tok")) >= 2)
      .select(col("doc_id"), col("tok_ix"),
        posexplode(transform(sequence(lit(1), length(col("tok")) - 1),
          i => col("tok").substr(i, lit(2)))))
      .withColumnRenamed("pos", "bpos").withColumnRenamed("col", "bg")
    val wTok = Window.partitionBy("doc_id", "tok_ix").orderBy("bpos")
    val wRun = Window.partitionBy("doc_id", "tok_ix", "run_id").orderBy("bpos")
    val starts = bigs
      .filter(col("bg").isInCollection(merges))
      .withColumn("run_id", col("bpos") - row_number().over(wTok))
      .withColumn("rk", row_number().over(wRun))
      .filter(pmod(col("rk"), lit(2)) === 1)
    val delta = hmod(col("bg")) -
      hmod(col("bg").substr(1, 1)) - hmod(col("bg").substr(2, 1))
    val mergeAgg = starts.groupBy("doc_id", "tok_ix")
      .agg(count(lit(1)).as("n_merges"), sum(delta).as("mdelta"))
    val composed = perTok
      .join(mergeAgg, Seq("doc_id", "tok_ix"), "left")
      .select(col("doc_id"), col("len"), col("csum"),
        coalesce(col("n_merges"), lit(0L)).as("nm"),
        coalesce(col("mdelta"), lit(0L)).as("md"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("len").as("n_chars"),
        sum(col("len") - col("nm")).as("n_symbols"),
        sum(col("csum") + col("md")).as("symsum"))
      .collect().map(r => r.getInt(0) ->
        Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val native = df.select(col("doc_id"),
        call_function("graft_bpe_encode", col("text"),
          lit(merges.mkString(" "))).as("st"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    native.foreach { case (id, st) =>
      if (st.head == 0L)
        assert(!composed.contains(id), s"doc $id: composed had tokens, kernel none")
      else assert(composed(id) == st,
        s"doc $id: composed=${composed.get(id)} native=$st text='${texts(id)}'")
    }
  }

  test("graft_token_bigrams == the explode(tokens)+substr chain on 200 generated strings") {
    val texts = sample(textGen, 200)
    val df = texts.toDF("text")
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val composed = flatten(transform(toks, tok =>
      when(length(tok) >= 2,
        transform(sequence(lit(1), length(tok) - 1), i => tok.substr(i, lit(2))))
        .otherwise(array().cast("array<string>"))))
    val rows = df.select(
      call_function("graft_token_bigrams", col("text")).as("native"),
      composed.as("composed"), col("text")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"bigram mismatch for '${r.getString(2)}'")
    }
  }

  test("graft_ordered_pairs == the nested transform/slice/flatten chain") {
    val arrGen = for {
      n <- Gen.chooseNum(0, 12)
      xs <- Gen.listOfN(n, Gen.chooseNum(-1000000L, 1000000L))
    } yield xs.distinct.sorted.toArray
    val df = sample(arrGen, 120).map(Tuple1(_)).toDF("pks")
    val composed = flatten(transform(col("pks"), (x, i) =>
      transform(slice(col("pks"), i + lit(2), size(col("pks"))),
        y => array(x, y))))
    val rows = df.select(
      call_function("graft_ordered_pairs", col("pks")).as("native"),
      composed.as("composed")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Seq[Long]](0) == r.getSeq[Seq[Long]](1))
    }
  }
}
