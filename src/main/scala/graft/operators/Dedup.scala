package graft.operators

import graft.functions.{Hashing, Text}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication suite (SURVEY §2 C1–C5).
  *
  * Scale design: no operator ever forms the full O(n²) pair space. Exact
  * dedup is a hash groupBy; Jaccard uses length-bucket blocking (equi-join
  * on bucket keys, adjacent buckets covered by emitting two keys per doc);
  * MinHash/SimHash block on LSH band/byte signatures; embedding near-dup
  * blocks on the label (cluster) column. Each candidate join is an
  * equi-join Spark shuffles on the blocking key — at 100 TB the candidate
  * space stays near-linear in true-duplicate density.
  *
  * All hashes are md5-derived ([[Hashing.h60p]]) so the DuckDB oracle
  * reproduces results bit-for-bit; Jaccard/dot arithmetic is exact
  * (integers / decimals) until a final deterministic cast to double.
  */
object Dedup {

  // ---- shared shingling -------------------------------------------------

  /** Word-bigram shingle array (distinct, sorted) of `text`. */
  private def shingleArr: Column = {
    val toks = Text.tokens(col("text"))
    when(size(toks) >= 2,
      array_sort(array_distinct(transform(
        sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  private val toksSqlCte =
    "toks AS (SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS toks FROM documents)"

  private val shingleSqlCte =
    """sh AS (SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1])) AS sh
       FROM toks)"""

  /** Append `jaccard` for (sa, sb) sorted-distinct hashed shingle arrays.
    * The intersection count runs through the native two-pointer
    * graft_intersect_count expression (no per-pair hash set), evaluated
    * once via a named column. */
  private def withJaccard(df: DataFrame): DataFrame =
    df.withColumn("inter",
        call_function("graft_intersect_count", col("sa"), col("sb")))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")))

  /** C1: exact content dedup — one hash-shuffle, keep-min-id. */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")
  }

  val dedupExactSql: String = """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY keep_doc_id"""

  /** C2: n-gram Jaccard near-dup pairs with length-bucket blocking.
    * Each doc emits buckets {⌊n/10⌋, ⌊n/10⌋+1}; an equi-join on the bucket
    * key covers same + adjacent buckets (near-dups have near-equal
    * length), avoiding the O(n²) cross join.
    *
    * Hot-path engineering: shingles are md5-hashed to int64 up front (one
    * narrow pass per doc), the candidate join shuffles only (id, bucket)
    * ints, and the heavy shingle arrays are joined back to the distinct
    * pair set — so the verify stage intersects sorted long arrays, not
    * string arrays, exactly once per candidate pair. */
  def dedupJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(shingleArr, sh => Hashing.h60p(sh))))
          .as("shs"),
        floor(size(Text.tokens(col("text"))) / 10).cast("long").as("bucket"))
      .persist() // feeds both join sides + the verify attach — one md5 pass
    // Duplicate-free candidate generation: the a-side emits only its own
    // bucket; the b-side emits {bucket-1, bucket, bucket+1}. A pair with
    // |bucket_a - bucket_b| <= 1 then matches on exactly ONE key (b's
    // emission equal to a's bucket) — same candidate set as the symmetric
    // two-key scheme, with no pair duplicates and no distinct() shuffle.
    val a = docs.select(col("doc_id").as("doc_a"), col("bucket").as("bkey"))
    val b = docs.select(col("doc_id").as("doc_b"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bkey"))
    val cand = a.join(b, Seq("bkey")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val sets = docs.select(col("doc_id"), col("shs"))
    withJaccard(cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b"))
      .filter(col("jaccard") >= 0.3)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val dedupJaccardSql: String = s"""
    WITH $toksSqlCte,
    d AS (SELECT doc_id,
        list_sort(list_distinct(list_transform(
          list_transform(generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1]),
          sh -> ${Hashing.h60pSql("sh")}))) AS shs,
        len(toks) // 10 AS bucket
      FROM toks),
    blocked AS (
      SELECT doc_id, bucket AS bkey FROM d
      UNION ALL SELECT doc_id, bucket + 1 AS bkey FROM d),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM blocked a JOIN blocked b ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
    sets AS (SELECT doc_id, shs FROM d)
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT doc_a, doc_b,
        CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
          / (len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs))) AS jaccard
      FROM cand JOIN sets x ON doc_a = x.doc_id JOIN sets y ON doc_b = y.doc_id)
    WHERE jaccard >= 0.3
    ORDER BY doc_a, doc_b"""

  // ---- C3 MinHash + LSH -------------------------------------------------

  private val NumHashes = 16
  private val Bands = 4
  private val RowsPerBand = NumHashes / Bands

  /** C3: MinHash signatures (16 md5-derived permutations), 4-band LSH
    * bucketing, candidate equi-join on (band, key), exact Jaccard verify.
    * The scale path for near-dup detection: candidate volume tracks true
    * duplicate density, not n². */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    // Single shuffle: one groupBy materializes each doc's hashed shingle
    // set; the 16 MinHash signatures are then per-row array folds over
    // that set (min over a set ≡ min over the multiset), so the signature
    // branch adds no second aggregation and no cache.
    val h = Tables.documents(s, dir)
      .select(col("doc_id"), explode(shingleArr).as("sh"))
      .select(col("doc_id"), Hashing.h60p(col("sh")).as("h"))
    val sets = h.groupBy("doc_id")
      .agg(array_sort(collect_set(col("h"))).as("shs"))
      .persist() // feeds signatures + both verify attaches — one md5 pass
    val mins = sets.select(col("doc_id") +:
      (0 until NumHashes).map(i =>
        array_min(transform(col("shs"), x => Hashing.perm(i, x))).as(s"mh$i")): _*)
    val bandKeys = (0 until Bands).map { bnd =>
      concat_ws("_", (0 until RowsPerBand).map(r => col(s"mh${bnd * RowsPerBand + r}")): _*)
    }
    val bands = mins.select(col("doc_id"), posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band_ix").withColumnRenamed("col", "bkey")
    val cand = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band_ix") === col("b.band_ix") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    withJaccard(cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b"))
      .filter(col("jaccard") >= 0.3)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val dedupMinhashSql: String = {
    val minExprs = (0 until NumHashes)
      .map(i => s"MIN(${Hashing.permSql(i, "h")}) AS mh$i").mkString(",\n        ")
    val bandSelects = (0 until Bands).map { bnd =>
      val key = (0 until RowsPerBand).map(r => s"mh${bnd * RowsPerBand + r}")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $bnd AS band_ix, $key AS bkey FROM mh"
    }.mkString("\n      UNION ALL ")
    s"""
    WITH $toksSqlCte,
    $shingleSqlCte,
    h AS (SELECT doc_id, ${Hashing.h60pSql("sh")} AS h FROM sh),
    mh AS (SELECT doc_id,
        $minExprs
      FROM h GROUP BY doc_id),
    bands AS (
      $bandSelects),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band_ix = b.band_ix AND a.bkey = b.bkey
        AND a.doc_id < b.doc_id),
    sets AS (SELECT doc_id, list_sort(list_distinct(list(h))) AS shs FROM h GROUP BY doc_id)
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT doc_a, doc_b,
        CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
          / (len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs))) AS jaccard
      FROM cand JOIN sets x ON doc_a = x.doc_id JOIN sets y ON doc_b = y.doc_id)
    WHERE jaccard >= 0.3
    ORDER BY doc_a, doc_b"""
  }

  // ---- C4 SimHash -------------------------------------------------------

  private val SimBits = 32

  /** C4: 32-bit SimHash (sign-vote over md5 token hashes, term frequency
    * as weight), byte-block LSH candidates, Hamming ≤ 6 verify. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val th = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("t"))
      .select(col("doc_id"), Hashing.h60(col("t")).as("h"))
    val votes = (0 until SimBits).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$j"))
    val voted = th.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val simhash = (0 until SimBits)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sims = voted.select(col("doc_id"), simhash.as("simhash"))
      .persist() // both block-join sides — one token-hash + vote pass
    val blocks = sims.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), 8 * i).bitwiseAND(lit(255L))): _*)))
      .withColumnRenamed("pos", "block_ix").withColumnRenamed("col", "bval")
    val cand = blocks.alias("a")
      .join(blocks.alias("b"),
        col("a.block_ix") === col("b.block_ix") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.simhash").as("sim_a"),
        col("b.doc_id").as("doc_b"), col("b.simhash").as("sim_b"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 6)
      .orderBy("doc_a", "doc_b")
  }

  val dedupSimhashSql: String = {
    val voteExprs = (0 until SimBits)
      .map(j => s"SUM(2 * ((h >> $j) & 1) - 1) AS v$j").mkString(",\n        ")
    val simExpr = (0 until SimBits)
      .map(j => s"CASE WHEN v$j > 0 THEN (CAST(1 AS BIGINT) << $j) ELSE 0 END")
      .mkString(" + ")
    s"""
    WITH $toksSqlCte,
    tok AS (SELECT doc_id, unnest(toks) AS t FROM toks),
    th AS (SELECT doc_id, ('0x'||substr(md5(t),1,15))::BIGINT AS h FROM tok),
    votes AS (SELECT doc_id,
        $voteExprs
      FROM th GROUP BY doc_id),
    sims AS (SELECT doc_id, $simExpr AS simhash FROM votes),
    blocks AS (
      SELECT doc_id, simhash, 0 AS block_ix, (simhash >> 0) & 255 AS bval FROM sims
      UNION ALL SELECT doc_id, simhash, 1, (simhash >> 8) & 255 FROM sims
      UNION ALL SELECT doc_id, simhash, 2, (simhash >> 16) & 255 FROM sims
      UNION ALL SELECT doc_id, simhash, 3, (simhash >> 24) & 255 FROM sims),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
        b.doc_id AS doc_b, b.simhash AS sim_b
      FROM blocks a JOIN blocks b ON a.block_ix = b.block_ix AND a.bval = b.bval
        AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= 6
    ORDER BY doc_a, doc_b"""
  }

  // ---- C5 embedding near-dup -------------------------------------------

  /** Fixed-point quantizer at scale 1e7: floor(x·1e7 + 0.5) — exact int64
    * and bit-identical across engines (their float→decimal casts are not).
    * Overflow bound: a per-dim diff is ≤ 2|x|·1e7, its square ≤ 4x²·1e14,
    * and the 64-dim sum ≤ 2.56e16·x² — within Long.MaxValue (9.2e18) iff
    * |x| ≤ ~18. The embeddings table is L2-normalized (|x| ≤ 1), far
    * inside that bound; inputs beyond it would need a smaller scale. */
  private def q7(x: Column): Column =
    floor(x.cast("double") * lit(1.0e7) + lit(0.5))

  /** Exact scaled-integer squared-L2 distance (scale 1e14) over
    * pre-quantized int64 vectors — runs through the native codegen'd
    * [[graft.plans.LongVecSqDist]] kernel (one primitive loop per pair,
    * vs. a boxed lambda invocation per element for the interpreted
    * aggregate/zip_with form). */
  private[operators] def sqDistExact(a: Column, b: Column): Column =
    call_function("graft_sqdist_l", a, b)

  /** C5: embedding-cosine/L2 near-dup pairs, blocked on the cluster label
    * column (at 100 TB: a coarse quantizer / IVF cell id). Vectors are
    * quantized once per row before the pair join — the join evaluates
    * pure int64 math. */
  def dedupEmbcos(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), x => q7(x)).as("qe"),
        col("label"))
      .persist() // both pair-join sides — quantize once
    val a = e.select(col("vec_id").as("vec_a"), col("qe").as("ea"), col("label"))
    val b = e.select(col("vec_id").as("vec_b"), col("qe").as("eb"),
      col("label").as("label_b"))
    a.join(b, col("label") === col("label_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("label"),
        sqDistExact(col("ea"), col("eb")).as("d2x"))
      .filter(col("d2x") <= lit(120000000000000L)) // 1.2 at scale 1e14
      .select(col("vec_a"), col("vec_b"), col("label"),
        (col("d2x").cast("double") / lit(1.0e14)).as("sq_dist"))
      .orderBy("vec_a", "vec_b")
  }

  val dedupEmbcosSql: String = """
    WITH p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
        CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
          s -> (CAST(floor(CAST(s[1] AS DOUBLE) * 10000000 + 0.5) AS BIGINT)
              - CAST(floor(CAST(s[2] AS DOUBLE) * 10000000 + 0.5) AS BIGINT))
             * (CAST(floor(CAST(s[1] AS DOUBLE) * 10000000 + 0.5) AS BIGINT)
              - CAST(floor(CAST(s[2] AS DOUBLE) * 10000000 + 0.5) AS BIGINT)))) AS BIGINT) AS d2x
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, label, CAST(d2x AS DOUBLE) / 1.0e14 AS sq_dist
    FROM p WHERE d2x <= 120000000000000
    ORDER BY vec_a, vec_b"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"   -> (dedupExact _),
    "dedup_jaccard" -> (dedupJaccard _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embcos"  -> (dedupEmbcos _))

  val oracle: Map[String, String] = Map(
    "dedup_exact"   -> dedupExactSql,
    "dedup_jaccard" -> dedupJaccardSql,
    "dedup_minhash" -> dedupMinhashSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_embcos"  -> dedupEmbcosSql)
}
