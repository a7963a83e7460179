package graft.operators

import graft.functions.{Hashing, Text}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // ---- saturated-bucket candidate cap (hot-key mitigation) --------------

  /** Candidate pairs from an exploded blocking-bucket table, with an
    * optional saturated-bucket cap (`graft.dedup.maxBucketFan`, default
    * off — the oracle-pinned exact behavior).
    *
    * The all-pairs self-join inside one bucket is C(s,2): a corpus where
    * one boilerplate family holds a constant FRACTION of documents grows
    * its bucket quadratically with corpus size — the one shape that
    * breaks blocked dedup's "candidates track duplicate density" scale
    * argument (measured: bench/skew_r8.json). With the cap set, buckets
    * larger than `cap` emit STAR edges to the bucket's min-id hub
    * (s−1 rows) instead of all pairs:
    *
    *  - for clustering consumers (C6/C12 components) a saturated bucket
    *    stays one connected component IN THE CANDIDATE GRAPH — hub edges
    *    carry the same transitive closure the full clique would. That
    *    guarantee is pre-verification only: consumers that re-check each
    *    candidate edge exactly (hamming/jaccard/cosine) keep only hub
    *    edges whose hub really is near the member, so if a chance block
    *    collision lands a non-dup as the bucket's min-id hub, its edges
    *    fail verification and the family can split into several
    *    components. The cap trades that (duplicate-family members are
    *    near ANY member, so the hub usually verifies) for the quadratic
    *    pair fan; callers needing post-verification connectivity must
    *    leave the cap off;
    *  - for pair-emitting consumers the saturated bucket reports its
    *    hub pairs only — the duplicate FAMILY is still fully identified
    *    (every member appears), the exhaustive within-family pair list
    *    (quadratic by contract) is not.
    *
    * `buckets` must carry `keys` (the blocking key), long `idCol`, and
    * any `payload` columns to surface on both sides. Output columns:
    * `id_a`, `id_b` (id_a < id_b) + `${p}_a`/`${p}_b` per payload,
    * distinct across buckets. */
  /** Parse a star-cap knob: 0 = off, ≥2 = cap; anything else rejected
    * with the key and raw value in the message. */
  private def fanCap(s: SparkSession, key: String): Long = {
    val cap = s.conf.getOption(key).map { raw =>
      try raw.trim.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$key must be an integer, got '$raw'")
      }
    }.getOrElse(0L)
    require(cap <= 0L || cap >= 2L, s"$key must be >= 2, got $cap")
    cap
  }

  private[graft] def bucketCandidates(s: SparkSession, buckets: DataFrame,
      keys: Seq[String], idCol: String, payload: Seq[String] = Nil): DataFrame = {
    val cap = fanCap(s, "graft.dedup.maxBucketFan")
    def cond = keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
      col(s"a.$idCol") < col(s"b.$idCol")
    def outCols = col(s"a.$idCol").as("id_a") +: col(s"b.$idCol").as("id_b") +:
      payload.flatMap(p => Seq(col(s"a.$p").as(s"${p}_a"),
        col(s"b.$p").as(s"${p}_b")))
    if (cap <= 0L)
      buckets.alias("a").join(buckets.alias("b"), cond)
        .select(outCols: _*).distinct()
    else {
      // per-bucket hub (min id, payload rides the struct min) + size;
      // one extra keyed aggregation co-partitioned with the pair join
      val stats = buckets.groupBy(keys.map(col): _*)
        .agg(min(struct((idCol +: payload).map(col): _*)).as("hub"),
          count(lit(1)).as("bsz"))
      val joined = buckets.join(stats, keys)
      val small = joined.filter(col("bsz") <= cap)
      val pairs = small.alias("a").join(small.alias("b"), cond)
        .select(outCols: _*)
      val star = joined
        .filter(col("bsz") > cap && col(idCol) =!= col("hub").getField(idCol))
        .select(col("hub").getField(idCol).as("id_a") +:
          col(idCol).as("id_b") +:
          payload.flatMap(p => Seq(col("hub").getField(p).as(s"${p}_a"),
            col(p).as(s"${p}_b"))): _*)
      pairs.union(star).distinct()
    }
  }

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

  /** C16: URL canonicalization dedup — the crawl-frontier stage BEFORE
    * any content is fetched: the same page surfaces under scheme / host-
    * case / www / tracking-param / trailing-slash variants, and deduping
    * on the canonical URL collapses them without touching document
    * bytes (RefinedWeb runs exactly this ahead of content dedup).
    * The corpus has no URL column, so deterministic messy variants are
    * synthesized per doc (the D28 Zipf-shaped host/path plus a
    * doc_id-keyed decoration); the CANONICALIZATION CHAIN is the
    * operator — lowercase, scheme fold, www-strip, utm-param strip,
    * trailing-slash strip — and is what a real crawl table reuses.
    * Scale shape: pure per-row string rewrite in the scan, one keyed
    * aggregation on the canonical URL. */
  def dedupUrl(s: SparkSession, dir: String): DataFrame = {
    val tlds = array(lit("com"), lit("org"), lit("net"), lit("info"), lit("biz"))
    val base = Tables.documents(s, dir)
      .select(col("doc_id"),
        Hashing.h60(concat(lit("url_"), col("doc_id").cast("string"))).as("h"))
      .select(col("doc_id"),
        concat(lit("site"),
          floor(sqrt(pmod(col("h"), lit(400)).cast("double"))).cast("long"),
          lit("."),
          element_at(tlds, (pmod(expr("h div 400"), lit(5)) + 1).cast("int")))
          .as("host"),
        concat(lit("/p"), pmod(expr("h div 2048"), lit(1000))).as("path"))
    val v = pmod(col("doc_id"), lit(4))
    val url = when(v === 0, concat(lit("https://"), col("host"), col("path")))
      .when(v === 1,
        concat(lit("HTTP://"), upper(col("host")), col("path"), lit("/")))
      .when(v === 2, concat(lit("https://"), col("host"), col("path"),
        lit("?utm_source=feed&utm_campaign=x")))
      .otherwise(concat(lit("http://www."), col("host"), col("path")))
    val canonical =
      regexp_replace( // 4: trailing slash
        regexp_replace( // 3: tracking params
          regexp_replace( // 2: scheme + www fold (post-lowercase)
            lower(url), "^https?://(www\\.)?", ""), // 1: case fold
          "\\?utm_[^#]*$", ""),
        "/$", "")
    base.select(col("doc_id"), url.as("url"), canonical.as("canonical"))
      .groupBy("canonical")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_variants"),
        countDistinct("url").as("n_distinct_raw"))
      .orderBy("keep_doc_id")
  }

  val dedupUrlSql: String = """
    WITH u AS (
      SELECT doc_id,
        ('0x'||substr(md5('url_'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS h
      FROM documents),
    hp AS (
      SELECT doc_id,
        'site' || CAST(CAST(floor(sqrt(CAST(h % 400 AS DOUBLE))) AS BIGINT) AS VARCHAR)
          || '.' || (['com','org','net','info','biz'])[CAST((h // 400) % 5 AS INT) + 1]
          AS host,
        '/p' || CAST((h // 2048) % 1000 AS VARCHAR) AS path
      FROM u),
    urls AS (
      SELECT doc_id,
        CASE doc_id % 4
          WHEN 0 THEN 'https://' || host || path
          WHEN 1 THEN 'HTTP://' || upper(host) || path || '/'
          WHEN 2 THEN 'https://' || host || path || '?utm_source=feed&utm_campaign=x'
          ELSE 'http://www.' || host || path END AS url
      FROM hp),
    canon AS (
      SELECT doc_id, url,
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(url), '^https?://(www\.)?', ''),
            '\?utm_[^#]*$', ''),
          '/$', '') AS canonical
      FROM urls)
    SELECT canonical, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_variants,
      COUNT(DISTINCT url) AS n_distinct_raw
    FROM canon GROUP BY canonical ORDER BY keep_doc_id"""

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
    // bucket via regexp_count, not size(filter(split(...))): higher-order
    // functions are CodegenFallback, and this projection sits on the
    // STREAMED side of the candidate join — an HOF here would drop the
    // entire multi-million-pair join cascade out of whole-stage codegen
    val nTokens = regexp_count(col("text"), lit("[^ ]+"))
    // Repartition the raw docs BEFORE the md5-heavy shingle projection and
    // the pair fan-out, with an EXPLICIT partition count: a column-only
    // repartition is an AQE-coalescible exchange, and AQE sizes partitions
    // by the tiny MAP-side output — it cannot see the multi-million-row
    // join explosion downstream, so it would coalesce the whole pair loop
    // onto one core (measured 6x slower). An explicit count pins the
    // exchange (REPARTITION_BY_NUM is exempt from coalescing).
    // graft_shingle_hashes fuses tokenize + 2-gram + md5 + distinct + sort
    // into one codegen'd kernel — the interpreted HOF chain it replaces
    // was the dominant scan-side cost of this operator
    val docs = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text")).as("shs"),
        floor(nTokens / 10).cast("long").as("bucket"))
    // Duplicate-free candidate generation: the a-side emits only its own
    // bucket; the b-side emits {bucket-1, bucket, bucket+1}. A pair with
    // |bucket_a - bucket_b| <= 1 then matches on exactly ONE key (b's
    // emission equal to a's bucket) — same candidate set as the symmetric
    // two-key scheme, with no pair duplicates and no distinct() shuffle.
    // The streamed a-side drives the pair fan-out; it inherits the 32-way
    // partitioning from the repartition above, so the multi-million-pair
    // join loop parallelizes too.
    val a = docs.select(col("doc_id").as("doc_a"), col("bucket").as("bkey"))
    val b = docs.select(col("doc_id").as("doc_b"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bkey"))
    val cand = a.join(b, Seq("bkey")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    // Persist ONLY the shingle sets (the md5-heavy projection): they feed
    // two broadcast builds, so the hashing runs once, while the streamed
    // 4M-pair pipeline reads straight from parquet and stays inside
    // whole-stage codegen (a deserialized cache scan on the stream side
    // would drop the whole pair loop out of codegen). The candidate sides
    // are column-pruned to (doc_id, bucket) — no shingle work there.
    val sets = Analytics.unpersistAfterUse(
      docs.select(col("doc_id"), col("shs")))
    // Threshold as exact integer math with a SINGLE intersect occurrence:
    // i/(a+b-i) >= 0.3  <=>  13*i >= 3*(a+b). Catalyst pushes this filter
    // into the attach-join's condition; written as i/(...) >= 0.3 the
    // substitution would inline graft_intersect_count TWICE (numerator and
    // denominator), doubling the per-pair kernel work. Survivors (a tiny
    // set) recompute the exact double jaccard for output. Exactness: the
    // candidate ratios are rationals with denominator <= a few hundred,
    // which are never within double-rounding distance of 0.3, so the
    // integer form and the oracle's double comparison agree.
    withJaccard(cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      .filter(lit(13) * call_function("graft_intersect_count", col("sa"), col("sb"))
        >= lit(3) * (size(col("sa")) + size(col("sb")))))
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

  // ---- C9 prefix-filtering exact similarity join ------------------------

  /** C9: EXACT set-similarity self-join (Jaccard ≥ 1/2) via prefix
    * filtering — the AllPairs/PPJoin family, the other industrial-scale
    * near-dup algorithm next to MinHash LSH. Unlike C2's length-bucket
    * blocking (a recall heuristic) and C3's LSH banding (probabilistic),
    * this candidate scheme is provably lossless: if J(x,y) ≥ τ then
    * |x∩y| ≥ ⌈τ·|x|⌉, so the (|x|−⌈τ·|x|⌉+1)-prefix of each set under a
    * shared global token order must intersect — an equi-join on prefix
    * tokens finds every qualifying pair.
    *
    * Scale shape: the inverted index is built only over PREFIX tokens
    * (half the set at τ=1/2), and the candidate join carries two further
    * exact prunes in its condition — the length filter (2·|y| ≥ |x| and
    * |y| ≤ 2·|x|) and PPJoin's positional upper bound
    * (1 + min(|x|−px, |y|−py) ≥ ⌈(|x|+|y|)/3⌉) — all in pure int64 math,
    * so the pruning itself never misfires across engines. Only surviving
    * distinct pairs pay the sorted-intersect verify kernel.
    *
    * Hot-family residual: losslessness makes a duplicate family holding a
    * constant corpus FRACTION quadratic by contract (its members share
    * prefix tokens, so one posting holds the whole family — measured 8.0×
    * wall at 10× data on the skew corpus, bench/skew_r8.json). The
    * `graft.dedup.maxPostingFan` knob (default off = the lossless
    * oracle-pinned behavior) is the G32 star-cap semantics applied to the
    * prefix inverted index: see [[prefixCandidates]]. */
  def dedupPrefix(s: SparkSession, dir: String): DataFrame = {
    val sets = Analytics.unpersistAfterUse(Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text")).as("shs"))
      .filter(size(col("shs")) > 0)) // feeds prefix explode + both verify attaches
    val cand = prefixCandidates(s, sets)
    // exact verify: J ≥ 1/2 ⟺ 3·i ≥ |a|+|b| (single kernel occurrence,
    // same single-substitution shape as C2)
    withJaccard(cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      .filter(lit(3) * call_function("graft_intersect_count", col("sa"), col("sb"))
        >= size(col("sa")) + size(col("sb"))))
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** C9's candidate stage over (doc_id, shs) sorted-distinct hashed
    * shingle sets — distinct (doc_a, doc_b) with doc_a < doc_b.
    *
    * With `graft.dedup.maxPostingFan` unset (the default, oracle-pinned)
    * the prefix inverted index is lossless: every pair with J ≥ 1/2
    * shares a prefix token and survives the length + positional prunes.
    * With the cap set, a posting larger than the cap — the signature of
    * ONE boilerplate family holding a constant corpus fraction — stops
    * fanning into C(p,2) pairs and instead emits STAR edges from the
    * posting's min-id doc (the hub) to each other member, s−1 rows. The
    * same contract and caveat as G32 ([[bucketCandidates]]): every member
    * of the saturated family still appears in a candidate edge, the
    * exhaustive within-family pair list (quadratic by contract) does not;
    * hub edges still pass through the exact Jaccard verify, so a hub that
    * chance-shares only the hot token with a member is dropped there, and
    * the reported pair set is a verified SUBSET of the lossless output.
    * Postings at or under the cap keep the exact AllPairs behavior, so
    * uniform corpora are bit-identical with the cap on or off. */
  private[graft] def prefixCandidates(s: SparkSession, sets: DataFrame): DataFrame = {
    val cap = fanCap(s, "graft.dedup.maxPostingFan")
    // prefix length for τ=1/2: n − ⌈n/2⌉ + 1 = ⌊n/2⌋ + 1; the ascending
    // hash order of graft_shingle_hashes IS the shared global token order
    val pref = sets
      .select(col("doc_id"), size(col("shs")).as("n"),
        posexplode(slice(col("shs"), lit(1),
          (floor(size(col("shs")).cast("long") / 2) + 1).cast("int"))))
      .withColumnRenamed("col", "tok") // `pos` is 0-based
    // positional bound 1+min(na−pa−1, nb−pb−1) ≥ ⌈(na+nb)/3⌉, restated
    // division-free: ⌈x/3⌉ ≤ y ⟺ x ≤ 3y — shared by the pair join's
    // condition and the star path's filter (valid per shared-token
    // occurrence either way)
    def prunes: Column =
      lit(2) * col("nb") >= col("na") && col("nb") <= lit(2) * col("na") &&
        lit(3) * (lit(1) + least(col("na") - col("pa") - 1,
          col("nb") - col("pb") - 1)) >= col("na") + col("nb")
    def pairJoin(idx: DataFrame): DataFrame = {
      val a = idx.select(col("doc_id").as("doc_a"), col("n").as("na"),
        col("pos").as("pa"), col("tok"))
      val b = idx.select(col("doc_id").as("doc_b"), col("n").as("nb"),
        col("pos").as("pb"), col("tok"))
      a.join(b, a("tok") === b("tok") && col("doc_a") < col("doc_b") && prunes)
        .select("doc_a", "doc_b")
    }
    if (cap <= 0L) pairJoin(pref).distinct()
    else {
      // per-posting hub (min doc_id; n/pos ride the struct min) + size —
      // one keyed aggregation co-partitioned with the posting join
      val stats = pref.groupBy("tok")
        .agg(min(struct(col("doc_id"), col("n"), col("pos"))).as("hub"),
          count(lit(1)).as("psz"))
      val joined = pref.join(stats, "tok")
      val pairs = pairJoin(joined.filter(col("psz") <= cap)
        .select("doc_id", "n", "pos", "tok"))
      val star = joined
        .filter(col("psz") > cap &&
          col("doc_id") =!= col("hub").getField("doc_id"))
        .select(col("hub").getField("doc_id").as("doc_a"),
          col("hub").getField("n").as("na"),
          col("hub").getField("pos").as("pa"),
          col("doc_id").as("doc_b"), col("n").as("nb"), col("pos").as("pb"))
        .filter(prunes)
        .select("doc_a", "doc_b")
      pairs.union(star).distinct()
    }
  }

  /** Oracle: brute-force all-pairs — deliberately prefix-free, so it
    * checks the candidate scheme's losslessness, not just the verify. */
  val dedupPrefixSql: String = s"""
    WITH $toksSqlCte,
    d AS (SELECT doc_id,
        list_sort(list_distinct(list_transform(
          list_transform(generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1]),
          sh -> ${Hashing.h60pSql("sh")}))) AS shs
      FROM toks WHERE len(toks) >= 2),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        len(list_intersect(a.shs, b.shs)) AS i, len(a.shs) AS na, len(b.shs) AS nb
      FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE len(a.shs) > 0 AND len(b.shs) > 0)
    SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (na + nb - i) AS jaccard
    FROM p WHERE 3 * i >= na + nb
    ORDER BY doc_a, doc_b"""

  /** C9c: containment dedup — directed near-dup pairs where ≥ τ=0.9 of
    * doc A's shingles appear in doc B (A quoted/subsumed by B). Jaccard
    * misses these whenever |B| ≫ |A|, so this is the operator that
    * catches boilerplate inclusion and quote-expansion duplicates a
    * symmetric gate passes through.
    *
    * Candidate generation is a DF-weighted pigeonhole prefix filter: at
    * τ=0.9 a true pair misses at most ⌊n/10⌋ of A's n shingles, so ANY
    * ⌊n/10⌋+1 of them must hit B — probing with the lowest-document-
    * frequency ones minimizes posting-list fan-out. The candidate join is
    * probe(sh) ⋈ index(sh), an equi-join whose cost tracks rare-shingle
    * posting lists, never O(n²). The oracle is deliberately brute-force
    * all-pairs, so it checks the filter's LOSSLESSNESS, not just the
    * verify arithmetic. */
  def dedupContainment(s: SparkSession, dir: String): DataFrame = {
    val sets = Analytics.unpersistAfterUse(Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text")).as("shs"))
      .filter(size(col("shs")) > 0))
    val posts = sets.select(col("doc_id"), explode(col("shs")).as("sh"))
    val dfreq = posts.groupBy("sh").agg(count(lit(1)).as("df"))
    // rank each doc's shingles rarest-first; na rides the same exchange
    // (two window functions over one partition key = one shuffle + sort)
    val byDoc = Window.partitionBy("doc_id")
    val probes = posts.join(dfreq, "sh")
      .withColumn("rk", row_number().over(byDoc.orderBy(col("df"), col("sh"))))
      .withColumn("na", count(lit(1)).over(byDoc))
      .filter(col("rk") <= floor(col("na") / 10) + 1)
      .select(col("doc_id").as("doc_a"), col("sh"), col("na"))
    // size prune at candidate time, implied by the gate (i ≤ |B|, so
    // 10·i ≥ 9·|A| forces 10·|B| ≥ 9·|A|) — lossless, and on a dense
    // corpus it drops the many (big A, small B) posting-list pairs
    // before they reach the distinct/verify stages
    val idx = sets.select(col("doc_id").as("doc_b"),
      size(col("shs")).as("nb"), explode(col("shs")).as("sh"))
    val cand = probes.join(idx, "sh")
      .filter(col("doc_a") =!= col("doc_b") &&
        lit(10) * col("nb") >= lit(9) * col("na"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      // early-exit gated verify: returns |sa ∩ sb| when 10·i ≥ 9·|sa|,
      // else -1 after at most ⌊|sa|/10⌋+1 misses — rejected candidates
      // (the vast majority) cost O(|sa|/10), not a full merge walk
      .withColumn("inter",
        call_function("graft_contain_count", col("sa"), col("sb"), lit(9), lit(10)))
      .filter(col("inter") >= 0)
      .withColumn("containment", col("inter").cast("double") / size(col("sa")))
      .select("doc_a", "doc_b", "containment")
      .orderBy("doc_a", "doc_b")
  }

  val dedupContainmentSql: String = s"""
    WITH $toksSqlCte,
    d AS (SELECT doc_id,
        list_sort(list_distinct(list_transform(
          list_transform(generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1]),
          sh -> ${Hashing.h60pSql("sh")}))) AS shs
      FROM toks WHERE len(toks) >= 2),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        len(list_intersect(a.shs, b.shs)) AS i, len(a.shs) AS na
      FROM d a JOIN d b ON a.doc_id != b.doc_id
      WHERE len(a.shs) > 0 AND len(b.shs) > 0)
    SELECT doc_a, doc_b, CAST(i AS DOUBLE) / na AS containment
    FROM p WHERE 10 * i >= 9 * na
    ORDER BY doc_a, doc_b"""

  // ---- C3 MinHash + LSH -------------------------------------------------

  private[graft] val NumHashes = 16
  private[graft] val Bands = 4
  private[graft] val RowsPerBand = NumHashes / Bands

  /** Static MinHash band index over a corpus — (idx_id, idx_sig,
    * band_ix, bkey), the precomputed side the F14 streaming screen joins
    * each micro-batch against. At 100 TB this is a bucketed table the
    * ingest pipeline writes once and appends to; here it is derived
    * on demand with the same fused kernels as C3. */
  private[graft] def bandIndex(s: SparkSession, dir: String): DataFrame =
    bandRows(Tables.documents(s, dir))

  /** The band-index rows of an arbitrary (doc_id, text) batch — the unit
    * an appendable band index is maintained in: the F20 admission job
    * appends each micro-batch's admitted rows so later batches screen
    * against earlier admissions, not just the frozen corpus. */
  private[graft] def bandRows(docs: DataFrame): DataFrame = {
    val mins = docs
      .select(col("doc_id"),
        call_function("graft_minhash_sig",
          call_function("graft_shingle_hashes", col("text")), lit(NumHashes)).as("sig"))
      .filter(element_at(col("sig"), 1).isNotNull)
    val bandKeys = (0 until Bands).map { bnd =>
      concat_ws("_", (0 until RowsPerBand).map(r =>
        element_at(col("sig"), bnd * RowsPerBand + r + 1)): _*)
    }
    mins.select(col("doc_id").as("idx_id"), col("sig").as("idx_sig"),
        posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band_ix").withColumnRenamed("col", "bkey")
  }

  /** C3: MinHash signatures (16 md5-derived permutations), 4-band LSH
    * bucketing, candidate equi-join on (band, key), exact Jaccard verify.
    * The scale path for near-dup detection: candidate volume tracks true
    * duplicate density, not n². */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    // Single shuffle: one groupBy materializes each doc's hashed shingle
    // set; the 16 MinHash signatures are then per-row array folds over
    // that set (min over a set ≡ min over the multiset), so the signature
    // branch adds no second aggregation and no cache.
    // Shingle sets via the fused graft_shingle_hashes kernel: the
    // explode → md5-per-row → groupBy(collect_set) SHUFFLE the composed
    // form needed is gone — set construction is a narrow per-doc map
    // (sorted distinct hashes ≡ collect_set of the exploded hashes).
    // Docs with <2 tokens have no shingles and are dropped, matching the
    // explode-based form where they never produced a row. Pinned
    // repartition (AQE-exempt) parallelizes the md5 pass (single file).
    val sets = Analytics.unpersistAfterUse(Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text")).as("shs"))
      .filter(size(col("shs")) > 0)) // feeds signatures + both verify attaches — one md5 pass
    // Full signature in one native codegen pass ([[graft.plans.MinHashSig]])
    // instead of 16 interpreted array_min(transform(...)) projections —
    // same permutation math, so the DuckDB oracle is unchanged.
    val mins = sets.select(col("doc_id"),
      call_function("graft_minhash_sig", col("shs"), lit(NumHashes)).as("sig"))
    val bandKeys = (0 until Bands).map { bnd =>
      concat_ws("_", (0 until RowsPerBand).map(r =>
        element_at(col("sig"), bnd * RowsPerBand + r + 1)): _*)
    }
    val bands = mins.select(col("doc_id"), posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band_ix").withColumnRenamed("col", "bkey")
    val cand = bucketCandidates(s, bands, Seq("band_ix", "bkey"), "doc_id")
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
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

  private val TuneBandConfigs = Seq(2, 4, 8) // bands over the 16 hashes

  /** C15: MinHash-LSH banding sweep — the S-curve tuning table
    * (Leskovec-Rajaraman-Ullman ch.3) measured on the corpus instead of
    * assumed: for bands b ∈ {2, 4, 8} over the SAME 16-hash signature
    * (rows r = 16/b), the candidate volume, the verified detections
    * (exact Jaccard ≥ 0.3, same threshold as C3), precision, and recall
    * relative to the UNION of detections across configs (labeled
    * rel_recall: absolute recall needs all-pairs truth, which no 100 TB
    * pass can afford — the union reference is what a tuning run can
    * actually observe). More bands with shorter rows → more candidates,
    * higher recall, lower precision; the table quantifies that trade so
    * the b/r choice is data-driven. One signature pass; each config is a
    * plan dimension (the band explode carries a `bands` marker), so the
    * sweep shuffles once per stage, not once per config. */
  def dedupLshTune(s: SparkSession, dir: String): DataFrame = {
    val sets = Analytics.unpersistAfterUse(Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text")).as("shs"))
      .filter(size(col("shs")) > 0))
    val mins = sets.select(col("doc_id"),
      call_function("graft_minhash_sig", col("shs"), lit(NumHashes)).as("sig"))
    def bandRowsFor(b: Int): DataFrame = {
      val rpb = NumHashes / b
      val keys = (0 until b).map { bnd =>
        concat_ws("_", (0 until rpb).map(r =>
          element_at(col("sig"), bnd * rpb + r + 1)): _*)
      }
      mins.select(col("doc_id"), lit(b).as("bands"),
        posexplode(array(keys: _*)))
        .withColumnRenamed("pos", "band_ix").withColumnRenamed("col", "bkey")
    }
    val allBands = TuneBandConfigs.map(bandRowsFor).reduce(_ unionAll _)
    val cand = allBands.alias("a")
      .join(allBands.alias("b"),
        col("a.bands") === col("b.bands") &&
          col("a.band_ix") === col("b.band_ix") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.bands").as("bands"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // feeds the per-config table and the union reference
    val verified = Analytics.unpersistAfterUse(withJaccard(cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b"))
      .select(col("bands"), col("doc_a"), col("doc_b"),
        (col("jaccard") >= 0.3).as("detected")))
    val union = verified.filter(col("detected"))
      .select("doc_a", "doc_b").distinct()
      .agg(count(lit(1)).as("n_union"))
    verified.groupBy("bands")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("detected"), 1L).otherwise(0L)).as("n_detected"))
      .crossJoin(broadcast(union))
      .select(col("bands"),
        (lit(NumHashes) / col("bands")).cast("long").as("rows_per_band"),
        col("n_candidates"), col("n_detected"),
        (col("n_detected").cast("double") / col("n_candidates").cast("double"))
          .as("precision"),
        (col("n_detected").cast("double") / col("n_union").cast("double"))
          .as("rel_recall"))
      .orderBy("bands")
  }

  val dedupLshTuneSql: String = {
    val minExprs = (0 until NumHashes)
      .map(i => s"MIN(${Hashing.permSql(i, "h")}) AS mh$i").mkString(",\n        ")
    val bandSelects = TuneBandConfigs.flatMap { b =>
      val rpb = NumHashes / b
      (0 until b).map { bnd =>
        val key = (0 until rpb).map(r => s"mh${bnd * rpb + r}")
          .mkString(" || '_' || ")
        s"SELECT doc_id, $b AS bands, $bnd AS band_ix, $key AS bkey FROM mh"
      }
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
    cand AS (SELECT DISTINCT a.bands, a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.bands = b.bands
        AND a.band_ix = b.band_ix AND a.bkey = b.bkey
        AND a.doc_id < b.doc_id),
    sets AS (SELECT doc_id, list_sort(list_distinct(list(h))) AS shs
      FROM h GROUP BY doc_id),
    verified AS (
      SELECT bands, doc_a, doc_b,
        (CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
          / (len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs)))
          >= 0.3) AS detected
      FROM cand JOIN sets x ON doc_a = x.doc_id JOIN sets y ON doc_b = y.doc_id),
    uni AS (
      SELECT COUNT(*) AS n_union FROM (
        SELECT DISTINCT doc_a, doc_b FROM verified WHERE detected))
    SELECT bands, CAST($NumHashes / bands AS BIGINT) AS rows_per_band,
      CAST(COUNT(*) AS BIGINT) AS n_candidates,
      CAST(SUM(CASE WHEN detected THEN 1 ELSE 0 END) AS BIGINT) AS n_detected,
      CAST(SUM(CASE WHEN detected THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS precision,
      CAST(SUM(CASE WHEN detected THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(MAX(n_union) AS DOUBLE) AS rel_recall
    FROM verified CROSS JOIN uni
    GROUP BY bands ORDER BY bands"""
  }

  /** C3e: MinHash-ESTIMATED Jaccard — the signature agreement fraction
    * |{i : sig_a[i] = sig_b[i]}| / 16 stands in for the exact set
    * intersection, so the verify stage touches only the 16-long
    * signatures and never re-reads shingle sets. This is the shape a
    * 100 TB dedup pass actually ships: signatures are ~128 bytes/doc
    * regardless of document length, the pair compare is fixed-cost, and
    * the full-text column stays out of the join entirely. Candidates come
    * from the same 4-band bucketing as C3 (so every emitted pair already
    * agrees on at least one full band); the 16 per-component equality
    * terms are plain codegen'd conditionals — no HOF, no kernel needed. */
  def dedupMinhashEst(s: SparkSession, dir: String): DataFrame = {
    // Persist the SIGNATURES (16 ints/doc), not the shingle sets: both the
    // band explode and the two pair-side attaches re-read them, and at
    // scale this is the entire working set — the shingle arrays are
    // consumed inside the one upstream projection and never materialized.
    val mins = Analytics.unpersistAfterUse(Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_minhash_sig",
          call_function("graft_shingle_hashes", col("text")), lit(NumHashes)).as("sig"))
      // empty shingle set → all-null signature (min over empty); drop it
      // here or every such doc would share the "" band key downstream
      .filter(element_at(col("sig"), 1).isNotNull))
    val bandKeys = (0 until Bands).map { bnd =>
      concat_ws("_", (0 until RowsPerBand).map(r =>
        element_at(col("sig"), bnd * RowsPerBand + r + 1)): _*)
    }
    val bands = mins.select(col("doc_id"), posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band_ix").withColumnRenamed("col", "bkey")
    val cand = bucketCandidates(s, bands, Seq("band_ix", "bkey"), "doc_id")
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val agree = (0 until NumHashes).map(i =>
      when(element_at(col("siga"), i + 1) === element_at(col("sigb"), i + 1),
        1).otherwise(0)).reduce(_ + _)
    cand
      .join(mins.select(col("doc_id").as("doc_a"), col("sig").as("siga")), "doc_a")
      .join(mins.select(col("doc_id").as("doc_b"), col("sig").as("sigb")), "doc_b")
      // k/16 with k integral: exact in binary, so the double compares and
      // the oracle hash are deterministic
      .withColumn("est_jaccard", agree.cast("double") / NumHashes)
      .filter(col("est_jaccard") >= 0.5)
      .select("doc_a", "doc_b", "est_jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val dedupMinhashEstSql: String = {
    val minExprs = (0 until NumHashes)
      .map(i => s"MIN(${Hashing.permSql(i, "h")}) AS mh$i").mkString(",\n        ")
    val bandSelects = (0 until Bands).map { bnd =>
      val key = (0 until RowsPerBand).map(r => s"mh${bnd * RowsPerBand + r}")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $bnd AS band_ix, $key AS bkey FROM mh"
    }.mkString("\n      UNION ALL ")
    val agree = (0 until NumHashes)
      .map(i => s"(CASE WHEN x.mh$i = y.mh$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
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
        AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, est_jaccard FROM (
      SELECT doc_a, doc_b,
        CAST($agree AS DOUBLE) / $NumHashes AS est_jaccard
      FROM cand JOIN mh x ON doc_a = x.doc_id JOIN mh y ON doc_b = y.doc_id)
    WHERE est_jaccard >= 0.5
    ORDER BY doc_a, doc_b"""
  }

  /** C8: incremental dedup — a NEW batch of documents (doc_id % 5 == 0)
    * screened against the already-indexed corpus (every other doc), the
    * shape a production dedup service runs on each arriving batch. Same
    * MinHash banding as C3, but asymmetric: the corpus band index is the
    * big side (at 100 TB a precomputed bucketed table, computed once, not
    * per batch); the new batch's band list is tiny and BROADCAST to it,
    * so screening a batch never shuffles the index. Output: each new doc
    * with the indexed near-duplicates that would reject it. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val sets = Analytics.unpersistAfterUse(Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text")).as("shs"))
      .filter(size(col("shs")) > 0))
    val mins = sets.select(col("doc_id"),
      call_function("graft_minhash_sig", col("shs"), lit(NumHashes)).as("sig"))
    val bandKeys = (0 until Bands).map { bnd =>
      concat_ws("_", (0 until RowsPerBand).map(r =>
        element_at(col("sig"), bnd * RowsPerBand + r + 1)): _*)
    }
    val bands = mins.select(col("doc_id"), posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band_ix").withColumnRenamed("col", "bkey")
    val newBands = bands.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id").as("doc_new"), col("band_ix"), col("bkey"))
    val idxBands = bands.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val cand = idxBands.join(broadcast(newBands),
        idxBands("band_ix") === newBands("band_ix") &&
          idxBands("bkey") === newBands("bkey"))
      .select(col("doc_new"), idxBands("doc_id").as("doc_idx")).distinct()
    withJaccard(cand
      .join(sets.select(col("doc_id").as("doc_new"), col("shs").as("sa")), "doc_new")
      .join(sets.select(col("doc_id").as("doc_idx"), col("shs").as("sb")), "doc_idx"))
      .filter(col("jaccard") >= 0.3)
      .select("doc_new", "doc_idx", "jaccard")
      .orderBy("doc_new", "doc_idx")
  }

  val dedupIncrementalSql: String = {
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
    cand AS (SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_idx
      FROM bands a JOIN bands b ON a.band_ix = b.band_ix AND a.bkey = b.bkey
        AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
    sets AS (SELECT doc_id, list_sort(list_distinct(list(h))) AS shs FROM h GROUP BY doc_id)
    SELECT doc_new, doc_idx, jaccard FROM (
      SELECT doc_new, doc_idx,
        CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
          / (len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs))) AS jaccard
      FROM cand JOIN sets x ON doc_new = x.doc_id JOIN sets y ON doc_idx = y.doc_id)
    WHERE jaccard >= 0.3
    ORDER BY doc_new, doc_idx"""
  }

  // ---- C4 SimHash -------------------------------------------------------

  private val SimBits = 32

  /** C4: 32-bit SimHash (sign-vote over md5 token hashes, term frequency
    * as weight), byte-block LSH candidates, Hamming ≤ 6 verify. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    // Fused graft_simhash32 kernel: the explode(tokens) → h60 → 32
    // per-bit sign-sum AGGREGATION (a full shuffle of every token
    // occurrence) collapses into a narrow per-doc map. Zero-token docs
    // are filtered out, matching the explode-based form where they never
    // reached the groupBy.
    // both block-join sides — one token-hash + vote pass
    val sims = Analytics.unpersistAfterUse(Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .filter(regexp_count(col("text"), lit("[^ ]+")) > 0)
      .select(col("doc_id"),
        call_function("graft_simhash32", col("text")).as("simhash")))
    val blocks = sims.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), 8 * i).bitwiseAND(lit(255L))): _*)))
      .withColumnRenamed("pos", "block_ix").withColumnRenamed("col", "bval")
    val cand = bucketCandidates(s, blocks, Seq("block_ix", "bval"), "doc_id",
        Seq("simhash"))
      .select(col("id_a").as("doc_a"), col("simhash_a").as("sim_a"),
        col("id_b").as("doc_b"), col("simhash_b").as("sim_b"))
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

  // LSH blocking parameters for C5. More tables / fewer bits trades
  // candidate volume for recall; 16×6 keeps ~23% of all pairs as
  // candidates at the deliberately-loose test threshold (cos ≥ 0.4 —
  // the synthetic corpus has no closer pairs) while recovering ~70% of
  // the in-threshold pairs. At a production near-dup threshold
  // (cos ≥ 0.9) the same table count blocks far harder because close
  // pairs almost never split: recall ≈ 1-(1-0.39^6)^16 ≈ 0.9997 with the
  // same ~2% random-pair collision rate per table.
  private[operators] val EmbLshTables = 16
  private[operators] val EmbLshBits = 6

  /** C5: embedding near-dup pairs, blocked on hyperplane-LSH buckets —
    * the same md5-seeded ±1 planes as B3 ([[graft.plans.LshBuckets]],
    * JVM-cached plane matrix), so candidate generation is a bucket
    * equi-join whose volume tracks the number of genuinely-close pairs,
    * not Θ(N²/labels) like the label-blocked form this replaces. The
    * exact scaled-int64 distance kernel then verifies each DISTINCT
    * candidate once: the 16×-exploded bucket join carries only
    * (vec_id, tbl, bucket) — never the vectors — and the quantized
    * vectors are fetched back by key after the distinct. At 100 TB the
    * bucket ids are ingest-time columns (exactly B3's layout) and the
    * pair join shuffles on (tbl, bucket). */
  /** Quantized embedding table shared by C5/C12: (vec_id, qe). */
  private def quantizedEmb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), x => q7(x)).as("qe"))

  /** C5/C12 near-dup threshold as exact scaled-int sq-dist. The default
    * (cos ≥ 0.4 ↔ d² ≤ 1.2 on unit vectors) is the deliberately-loose
    * setting the synthetic corpus needs (it has no closer pairs) and is
    * what the oracle pins; `graft.semantic.minCos` moves it.
    *
    * What the r8 100×-span measurement established: the threshold alone
    * does NOT collapse the slope (exponent 0.71 at cos ≥ 0.4 vs 0.74 at
    * cos ≥ 0.9, bench/scale_r8.json) — candidate GENERATION is
    * threshold-independent, so the LSH self-join + exact scoring floor
    * stays. Production deployments pair the strict threshold with
    * HARDER BLOCKING: `graft.semantic.lshBits` raises bits/table
    * (random-pair collision halves per bit; at cos ≥ 0.9 with 12 bits,
    * per-pair recall ≈ 0.93 over the 16 tables while random collisions
    * drop ~250×). That combination is the measured scale path. */
  private def d2xThreshold(s: SparkSession): Long = {
    val minCos = s.conf.getOption("graft.semantic.minCos").map { raw =>
      try raw.trim.toDouble
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft.semantic.minCos must be a number, got '$raw'")
      }
    }.getOrElse(0.4)
    require(minCos >= -1.0 && minCos <= 1.0,
      s"graft.semantic.minCos must be in [-1, 1], got $minCos")
    // d² = 2 − 2·cos for unit vectors, at quantizer scale (1e7)² = 1e14
    math.round((2.0 - 2.0 * minCos) * 1.0e14)
  }

  private def lshBitsKnob(s: SparkSession): Int = {
    val bits = s.conf.getOption("graft.semantic.lshBits").map { raw =>
      try raw.trim.toInt
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft.semantic.lshBits must be an integer, got '$raw'")
      }
    }.getOrElse(EmbLshBits)
    require(bits >= 1 && bits <= 30,
      s"graft.semantic.lshBits must be in [1, 30], got $bits")
    bits
  }

  /** C5's verified near-dup pair set (vec_a < vec_b, d2x = exact scaled
    * sq-dist ≤ threshold) — the edge source C12's clustering consumes. */
  private[operators] def embcosPairs(s: SparkSession, dir: String): DataFrame = {
    val qe = quantizedEmb(s, dir)
    val buckets = qe
      .select(col("vec_id"), posexplode(call_function("graft_lsh_buckets",
        col("qe"), lit(EmbLshTables), lit(lshBitsKnob(s)))))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bucket"))
    // a pair colliding in k tables must score once, not k times —
    // distinct BEFORE the distance kernel (inside bucketCandidates)
    val cand = bucketCandidates(s, buckets, Seq("tbl", "bucket"), "vec_id")
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"))
    val ea = qe.select(col("vec_id").as("vec_a"), col("qe").as("ea"))
    val eb = qe.select(col("vec_id").as("vec_b"), col("qe").as("eb"))
    cand.join(ea, "vec_a").join(eb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        sqDistExact(col("ea"), col("eb")).as("d2x"))
      .filter(col("d2x") <= lit(d2xThreshold(s))) // default 1.2 at scale 1e14
  }

  def dedupEmbcos(s: SparkSession, dir: String): DataFrame = {
    embcosPairs(s, dir)
      .select(col("vec_a"), col("vec_b"),
        (col("d2x").cast("double") / lit(1.0e14)).as("sq_dist"))
      .orderBy("vec_a", "vec_b")
  }

  /** CTE chain producing `scored` (vec_a, vec_b, d2x) — the DuckDB mirror
    * of [[embcosPairs]] before the threshold filter; shared by C5/C12. */
  private val embcosScoredCtes: String = s"""planes AS (
      SELECT t.range AS t, p.range AS p, d.range AS d,
        (((('0x'||substr(md5(CAST(t.range AS VARCHAR) || '_' || CAST(p.range AS VARCHAR) || '_' || CAST(d.range AS VARCHAR)),1,15))::BIGINT) & 1) * 2 - 1) AS sign
      FROM range($EmbLshTables) t CROSS JOIN range($EmbLshBits) p CROSS JOIN range(64) d),
    vq AS (
      SELECT vec_id, d.range AS d,
        CAST(floor(CAST(embedding[CAST(d.range AS INT) + 1] AS DOUBLE) * 10000000 + 0.5) AS BIGINT) AS qe
      FROM embeddings CROSS JOIN range(64) d),
    pd AS (
      SELECT vq.vec_id, planes.t, planes.p, SUM(planes.sign * vq.qe) AS pdot
      FROM vq JOIN planes ON vq.d = planes.d
      GROUP BY vq.vec_id, planes.t, planes.p),
    buckets AS (
      SELECT vec_id, t,
        CAST(SUM(CASE WHEN pdot > 0 THEN (1 << p) ELSE 0 END) AS INT) AS bucket
      FROM pd GROUP BY vec_id, t),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM buckets a JOIN buckets b
        ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
    scored AS (
      SELECT vec_a, vec_b,
        CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
          s -> (CAST(floor(CAST(s[1] AS DOUBLE) * 10000000 + 0.5) AS BIGINT)
              - CAST(floor(CAST(s[2] AS DOUBLE) * 10000000 + 0.5) AS BIGINT))
             * (CAST(floor(CAST(s[1] AS DOUBLE) * 10000000 + 0.5) AS BIGINT)
              - CAST(floor(CAST(s[2] AS DOUBLE) * 10000000 + 0.5) AS BIGINT)))) AS BIGINT) AS d2x
      FROM cand JOIN embeddings a ON a.vec_id = vec_a
                JOIN embeddings b ON b.vec_id = vec_b)"""

  val dedupEmbcosSql: String = s"""
    WITH $embcosScoredCtes
    SELECT vec_a, vec_b, CAST(d2x AS DOUBLE) / 1.0e14 AS sq_dist
    FROM scored WHERE d2x <= 120000000000000
    ORDER BY vec_a, vec_b"""

  // ---- C12 semantic dedup (SemDeDup) -----------------------------------

  /** C12: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    * dedup over embeddings. C5's LSH-blocked cosine pairs are the edges;
    * [[connectedComponents]] (the C6 engine) transitively closes them
    * into semantic-duplicate groups; then per group the paper's keep
    * rule applies: KEEP the member LEAST similar to the group centroid
    * (dropping the redundant "core" copies preserves the informative
    * outlier — SemDeDup §3.2), ties to the smaller vec_id. Output is the
    * full corpus keep/drop list, one row per vector; singletons keep
    * themselves with a NULL centroid score.
    *
    * Centroid similarity is exact int64: centroid SUMS per dimension
    * (not means) — members of a group share the same centroid vector,
    * and all embeddings are unit-norm, so dot-with-sum ordering ≡ cosine
    * -with-mean ordering while staying division-free. Overflow bound:
    * |qe_i| ≤ 1e7, |csum_i| ≤ size·1e7, so |dot| ≤ 64·size·1e14 —
    * int64-safe to size ≈ 1.4e3; groups beyond that would rescale.
    *
    * Scale shape: edges/cc as C5/C6 (bucket equi-join, hook+contract);
    * centroid sums are one narrow posexplode + (rep, dim) partial agg
    * over CLUSTER MEMBERS ONLY (near-dups — a sliver of the corpus);
    * the final left join fans the tiny clustered artifact back across
    * the corpus scan. */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val qe = quantizedEmb(s, dir)
    val comp = connectedComponents(s,
        embcosPairs(s, dir).select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_rep"), col("cluster_size"))
    val members = comp.join(qe, "vec_id")
    val cent = members
      .select(col("cluster_rep"), posexplode(col("qe")))
      .groupBy(col("cluster_rep"), col("pos")).agg(sum("col").as("cdim"))
      .groupBy("cluster_rep")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cdim")))),
        e => e.getField("cdim")).as("csum"))
    val w = Window.partitionBy("cluster_rep").orderBy(col("cdot").asc, col("vec_id"))
    val clustered = members.join(cent, "cluster_rep")
      .select(col("vec_id"), col("cluster_rep"), col("cluster_size"),
        call_function("graft_dot_l", col("qe"), col("csum")).as("cdot"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("vec_id"), col("cluster_rep"), col("cluster_size"),
        (col("cdot").cast("double") / lit(1.0e14)).as("cent_dot"), col("keep"))
    Tables.embeddings(s, dir).select(col("vec_id"))
      .join(clustered, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_rep"), col("vec_id")).as("cluster_rep"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        col("cent_dot"),
        coalesce(col("keep"), lit(true)).as("keep"))
      .orderBy("vec_id")
  }

  val dedupSemanticSql: String = s"""
    WITH $embcosScoredCtes,
    edges0 AS (SELECT vec_a, vec_b FROM scored WHERE d2x <= 120000000000000),
    edges AS (
      SELECT vec_a AS src, vec_b AS dst FROM edges0
      UNION SELECT vec_b AS src, vec_a AS dst FROM edges0),
    verts AS (SELECT DISTINCT src AS v FROM edges),
    reach AS (
      WITH RECURSIVE r(v, u) AS (
        SELECT v, v FROM verts
        UNION
        SELECT r.v, e.dst FROM r JOIN edges e ON e.src = r.u)
      SELECT v, MIN(u) AS cluster_rep FROM r GROUP BY v),
    sizes AS (SELECT cluster_rep, COUNT(*) AS cluster_size FROM reach GROUP BY cluster_rep),
    cdims AS (
      SELECT reach.cluster_rep, vq.d, SUM(vq.qe) AS cdim
      FROM reach JOIN vq ON vq.vec_id = reach.v
      GROUP BY reach.cluster_rep, vq.d),
    cdot AS (
      SELECT reach.v AS vec_id, reach.cluster_rep,
        CAST(SUM(vq.qe * cdims.cdim) AS BIGINT) AS cdot
      FROM reach JOIN vq ON vq.vec_id = reach.v
      JOIN cdims ON cdims.cluster_rep = reach.cluster_rep AND cdims.d = vq.d
      GROUP BY reach.v, reach.cluster_rep),
    ranked AS (
      SELECT vec_id, cluster_rep, cdot,
        row_number() OVER (PARTITION BY cluster_rep ORDER BY cdot ASC, vec_id) AS rk
      FROM cdot)
    SELECT e.vec_id,
      COALESCE(r.cluster_rep, e.vec_id) AS cluster_rep,
      CAST(COALESCE(s.cluster_size, 1) AS BIGINT) AS cluster_size,
      CAST(r.cdot AS DOUBLE) / 1.0e14 AS cent_dot,
      COALESCE(r.rk = 1, TRUE) AS keep
    FROM embeddings e
    LEFT JOIN ranked r ON r.vec_id = e.vec_id
    LEFT JOIN sizes s ON s.cluster_rep = r.cluster_rep
    ORDER BY e.vec_id"""

  // ---- C6 near-dup clustering (pairs → components → keep-list) ---------

  /** C6: connected components over the near-dup pair graph — the step an
    * industrial dedup pipeline runs AFTER pair generation: transitively
    * merge pairs into clusters and keep one representative (min doc_id)
    * per cluster. Edges here are the SimHash pairs (C4).
    *
    * Algorithm: iterative min-label propagation on DataFrames — each
    * round every vertex takes the min label over itself and its
    * neighbors; converges in O(diameter) rounds (dup clusters are
    * near-cliques, so 2–4 rounds in practice; the loop is bounded and
    * stops early on a fixpoint, checked per-round with one count). This
    * is the standard large-graph CC shape (label propagation over a
    * shuffled edge list); at 100 TB the same loop runs with the edge
    * list hash-partitioned by vertex. Output: one row per clustered doc
    * with its cluster representative and cluster size. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    connectedComponents(s, dedupSimhash(s, dir).select("doc_a", "doc_b"))
      .orderBy("doc_id")

  /** The C6 clustering engine on an arbitrary undirected pair list
    * (`doc_a`, `doc_b` long columns): hook → contract → finish
    * (driver union-find or distributed pointer-jumping propagation).
    * Returns one row per clustered vertex: (doc_id, cluster_rep,
    * cluster_size), unsorted. Reused by C12's semantic clustering over
    * embedding-cosine edges. */
  private[graft] def connectedComponents(s: SparkSession, pairs0: DataFrame): DataFrame = {
    // materialize the pair generation ONCE before the union doubles the
    // lineage (both union branches would otherwise recompute the edges)
    val pairs = pairs0.localCheckpoint(true)
    // `graft.cc.maxLocalEdges` is the driver-finish gate shared by both
    // decision points below — set 0 to force the fully-distributed path
    // (bench/rehearsal of the shape a 100 TB corpus would hit).
    val maxLocal = s.conf.getOption("graft.cc.maxLocalEdges")
      .map(_.toLong).getOrElse(2000000L)
    // Driver fast path: near-dup pair graphs are a sliver of the corpus
    // (the clustered docs only — sf0.1 has ~500 of 60k docs), so when the
    // RAW pair list already fits the driver gate there is nothing to
    // contract: union-find, component sizes, and the output rows are all
    // driver-local arithmetic over a few MB of longs. This replaces the
    // hook → contract → finish pipeline's two further all-partition
    // barriers, two counts, and three joins with ONE collect off the
    // checkpointed pairs (2M edges = 32 MB). The count is cheap: pairs is
    // checkpointed. At 100 TB the pair list exceeds the gate and the
    // distributed contraction below runs instead — the switch is
    // data-driven, not hard-coded.
    if (pairs.count() <= maxLocal) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent.getOrElse(c, c); parent(c) = r; c = n
        }
        r
      }
      val verts = scala.collection.mutable.Set.empty[Long]
      pairs.select(col("doc_a"), col("doc_b")).collect().foreach { row =>
        val (u, w) = (row.getLong(0), row.getLong(1))
        verts += u; verts += w
        val (a, b) = (find(u), find(w))
        // min-root union keeps the component minimum as the representative
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      }
      val assign = verts.toSeq.map(v => (v, find(v)))
      val sizes = assign.groupBy(_._2).map { case (r, xs) => (r, xs.size.toLong) }
      val rows = assign.map { case (v, r) => (v, r, sizes(r)) }
      import s.implicits._
      return rows.toDF("doc_id", "cluster_rep", "cluster_size")
    }
    // Undirected edge list, both directions — min-label flows both ways.
    // localCheckpoint (eager) TRUNCATES the logical plan: in an iterative
    // DataFrame loop the lineage otherwise grows every round and Catalyst
    // re-optimizes the whole history on the single-threaded driver —
    // planning time explodes long before execution time does. On a
    // cluster this would be checkpoint() to reliable storage.
    // no checkpoint here: both uses re-derive from the pairs checkpoint
    // with two cheap projections — one fewer full materialization barrier
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // Phase 1 — one aggregation over the FULL edge list: every vertex
    // hooks to min(self, neighbors). Near-dup components are near-cliques
    // (a 1000-doc duplicate cluster is ~500k pairs), so this single pass
    // collapses almost the whole graph; the component-wide min hooks to
    // itself and therefore survives as a contracted node.
    val l1 = edges.groupBy(col("src").as("v")).agg(min("dst").as("mn"))
      .select(col("v"), least(col("v"), col("mn")).as("label"))
      .localCheckpoint(true)
    // Phase 2 — contract: rewrite both endpoints through l1 and dedupe.
    // The contracted graph carries only the long-tail chain structure
    // (orders of magnitude smaller than the pair graph).
    // l1 is one row per distinct vertex. When that fits a broadcast
    // (~80 MB of (long,long) at the 5M bound) the edge list streams
    // through both contraction lookups with no shuffle; above the bound
    // the joins shuffle hash-partitioned by vertex — the decision is
    // data-driven, like the union-find/propagation switch below, because
    // at 100 TB the dup-pair vertex set can be billions of rows. The
    // count is cheap: l1 is checkpointed.
    val bcastLabels = l1.count() <= 5000000L
    def mb(df: DataFrame): DataFrame = if (bcastLabels) broadcast(df) else df
    val g = edges
      .join(mb(l1.select(col("v").as("src"), col("label").as("src_l"))), "src")
      .join(mb(l1.select(col("v").as("dst"), col("label").as("dst_l"))), "dst")
      .filter(col("src_l") =!= col("dst_l"))
      .select(col("src_l").as("src"), col("dst_l").as("dst")).distinct()
      .localCheckpoint(true)
    // Phase 3 — finish the contracted graph. It carries only the
    // long-tail chain structure; when it is small enough to hold on the
    // driver (the normal case — this is how industrial CC pipelines
    // finish: iterate/contract until tiny, then solve locally), run
    // union-find in-process: zero further jobs instead of one join +
    // count per propagation round. Fallback: distributed min-label
    // propagation, for a contracted graph that is still huge.
    val labels = componentLabels(s, g,
      l1.select(col("label").as("v")).distinct(), maxLocal)
    // Compose: original vertex → hooked label → contracted-component rep.
    // labels and sizes are bounded by the vertex count, so the same
    // data-driven broadcast decision applies.
    val full = l1
      .join(mb(labels.select(col("v").as("label"), col("label").as("rep"))),
        "label")
      .select(col("v").as("doc_id"), col("rep").as("cluster_rep"))
    val sizes = full.groupBy("cluster_rep").agg(count(lit(1)).as("cluster_size"))
    // unsorted, like the driver fast path above — the contract says
    // unsorted and callers (dedupClusters) order themselves; a sort here
    // would make result ordering depend on which branch the gate picked
    full.join(mb(sizes), "cluster_rep")
      .select(col("doc_id"), col("cluster_rep"), col("cluster_size"))
  }

  /** Phase 3 of [[dedupClusters]]: component representatives of the
    * contracted graph `g` (long `src`/`dst` edge columns) for the vertex
    * set `vertices` (one long `v` column). `g` MUST be undirected — both
    * (a,b) and (b,a) present, as the caller's symmetrized edge list
    * guarantees: min-label propagation only flows dst→src, so a
    * one-directional edge list silently under-merges. When `g` fits on the driver
    * (≤ `maxLocalEdges`) it is solved with path-compressed union-find
    * in-process — zero further Spark jobs; otherwise distributed
    * min-label propagation (one join + one fixpoint count per round)
    * finishes it. Returns (v, label) with label = component min. */
  private[graft] def componentLabels(s: SparkSession, g: DataFrame,
      vertices: DataFrame, maxLocalEdges: Long = 2000000L): DataFrame = {
    if (g.count() <= maxLocalEdges) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent.getOrElse(c, c); parent(c) = r; c = n
        }
        r
      }
      g.select(col("src"), col("dst")).collect().foreach { row =>
        val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      }
      val reps = parent.keySet.map(v => (v, find(v))).toSeq
      import s.implicits._
      val repDf = reps.toDF("v", "label")
      // vertices untouched by union-find keep their own label
      vertices
        .join(repDf.withColumnRenamed("v", "rv"), col("v") === col("rv"), "left")
        .select(col("v"), coalesce(col("label"), col("v")).as("label"))
    } else {
      var cur = vertices
        .select(col("v"), col("v").as("label")).localCheckpoint(true)
      var converged = false
      var rounds = 0
      while (!converged && rounds < 20) {
        val neighborMin = g.join(cur, col("dst") === col("v"))
          .groupBy(col("src").as("v2")).agg(min("label").as("nlabel"))
        val stepped = cur.join(neighborMin, col("v") === col("v2"), "left")
          .select(col("v"), col("label").as("old"), least(col("label"),
            coalesce(col("nlabel"), col("label"))).as("label"))
        // pointer jump: label ← label(label). Neighbor-min alone moves the
        // component min ONE hop per round (O(diameter) rounds — a chain
        // of 50 contracted nodes would blow the round cap); composing the
        // label map with itself each round halves the remaining distance,
        // so convergence is O(log diameter) regardless of chain length.
        // The round's previous label rides along as `old`, so the
        // fixpoint check below is a filter+count over the checkpointed
        // rows — no join back against the previous state (which cost a
        // second shuffle per round).
        val next = stepped
          .join(stepped.select(col("v").as("lv"), col("label").as("llabel")),
            col("label") === col("lv"), "left")
          .select(col("v"), col("old"), least(col("label"),
            coalesce(col("llabel"), col("label"))).as("label"))
          .localCheckpoint(true)
        val changed = next.filter(col("label") =!= col("old")).count()
        cur = next.select(col("v"), col("label"))
        converged = changed == 0
        rounds += 1
      }
      cur
    }
  }

  /** Oracle: transitive closure by recursive CTE — reach the minimum
    * doc_id from every vertex along undirected simhash-pair edges. */
  val dedupClustersSql: String = {
    // reuse the simhash pair query as the edge source
    val pairSql = dedupSimhashSql.replace("ORDER BY doc_a, doc_b", "")
    s"""
    WITH pairs AS ($pairSql),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
    verts AS (SELECT DISTINCT src AS v FROM edges)
    , reach AS (
      WITH RECURSIVE r(v, u) AS (
        SELECT v, v FROM verts
        UNION
        SELECT r.v, e.dst FROM r JOIN edges e ON e.src = r.u)
      SELECT v, MIN(u) AS cluster_rep FROM r GROUP BY v),
    sizes AS (SELECT cluster_rep, COUNT(*) AS cluster_size FROM reach GROUP BY cluster_rep)
    SELECT reach.v AS doc_id, reach.cluster_rep, sizes.cluster_size
    FROM reach JOIN sizes USING (cluster_rep)
    ORDER BY doc_id"""
  }

  /** D29c: leakage-safe split keyed by the C6 CLUSTER — the production
    * variant of D29's prefix-family rule. D29 hashes a text-derived
    * family key (zero shuffle, catches prefix-sharing near-dups); this
    * one hashes the connected-component representative from the C6
    * artifact, so ANY pair the near-dup pipeline would link — different
    * prefixes included — lands in one split. Docs outside every cluster
    * have no near-dup (by C6's own definition) and split independently
    * on their id hash; leakage is structurally impossible for exactly
    * the docs where it is possible at all. Audit output per split:
    * docs, clustered docs, clusters.
    *
    * Scale shape: the cluster artifact is the session-shared C6
    * checkpoint (near-dup docs only — a sliver of the corpus, the same
    * keep-list a production pipeline materializes); one broadcast-sized
    * left join attaches it, one 3-row rollup follows. */
  def textSplitCluster(s: SparkSession, dir: String): DataFrame = {
    def splitOf(h: Column): Column =
      when(h < 80, "train").when(h < 90, "val").otherwise("test")
    val clusters = clusterArtifact(s, dir).select("doc_id", "cluster_rep")
    val key = when(col("cluster_rep").isNotNull,
        Hashing.h60p(col("cluster_rep").cast("string")))
      .otherwise(Hashing.h60p(col("doc_id").cast("string")))
    Tables.documents(s, dir).select("doc_id")
      .join(broadcast(clusters), Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_rep"),
        splitOf(key % 100).as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_rep").isNotNull, 1L).otherwise(0L))
          .as("n_clustered_docs"),
        countDistinct("cluster_rep").as("n_clusters"))
      .orderBy("split")
  }

  val textSplitClusterSql: String = {
    val pairSql = dedupSimhashSql.replace("ORDER BY doc_a, doc_b", "")
    s"""
    WITH pairs AS ($pairSql),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b AS src, doc_a AS dst FROM pairs),
    verts AS (SELECT DISTINCT src AS v FROM edges)
    , reach AS (
      WITH RECURSIVE r(v, u) AS (
        SELECT v, v FROM verts
        UNION
        SELECT r.v, e.dst FROM r JOIN edges e ON e.src = r.u)
      SELECT v, MIN(u) AS cluster_rep FROM r GROUP BY v),
    keyed AS (
      SELECT d.doc_id, r.cluster_rep,
        CASE WHEN (CASE WHEN r.cluster_rep IS NOT NULL
              THEN ${Hashing.h60pSql("CAST(r.cluster_rep AS VARCHAR)")}
              ELSE ${Hashing.h60pSql("CAST(d.doc_id AS VARCHAR)")} END) % 100 < 80
             THEN 'train'
             WHEN (CASE WHEN r.cluster_rep IS NOT NULL
              THEN ${Hashing.h60pSql("CAST(r.cluster_rep AS VARCHAR)")}
              ELSE ${Hashing.h60pSql("CAST(d.doc_id AS VARCHAR)")} END) % 100 < 90
             THEN 'val' ELSE 'test' END AS split
      FROM documents d LEFT JOIN reach r ON r.v = d.doc_id)
    SELECT split, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN cluster_rep IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_clustered_docs,
      COUNT(DISTINCT cluster_rep) AS n_clusters
    FROM keyed GROUP BY split ORDER BY split"""
  }

  /** Session-shared C6 artifact: the tiny (doc_id, cluster_rep,
    * cluster_size) assignment, computed once per (session, dir) and
    * eagerly localCheckpointed. C10 keep-best, C11 soft-dedup and the
    * G19 corpus build all consume exactly this artifact; before the memo
    * each of them re-ran the whole clustering job (pair generation +
    * label propagation) from scratch — the three slowest non-diagnostic
    * queries in the round-4 bench, all recomputing identical output. On
    * a cluster the artifact is a parquet keep-list the pipeline writes
    * once; the memo is the session-local equivalent (the checkpoint
    * holds one row per CLUSTERED doc — near-dups only, a sliver of the
    * corpus). [[invalidateClusterArtifacts]] drops the memo if the
    * underlying tables change within a session. */
  private val clusterMemo = new graft.SessionMemo

  private[graft] def clusterArtifact(s: SparkSession, dir: String): DataFrame =
    clusterMemo.getOrElseUpdate(s, dir)(
      dedupClusters(s, dir)
        .select("doc_id", "cluster_rep", "cluster_size")
        .localCheckpoint(true))

  /** Required after rewriting the parquet under a dir within one session —
    * the memo cannot see filesystem rewrites (see [[graft.SessionMemo]]). */
  def invalidateClusterArtifacts(): Unit = clusterMemo.clear()

  // ---- C10 cluster-canonical selection ---------------------------------

  /** C10: cluster-canonical selection — the step after clustering (C6)
    * that industrial dedup pipelines actually ship: keep ONE document per
    * near-dup cluster, chosen by quality (D2 score, ties to the smallest
    * doc_id) rather than by arbitrary min-id. CCNet/RefinedWeb-style
    * pipelines keep the best-quality member so dedup doesn't silently
    * prefer the earliest-crawled (often worst) copy.
    *
    * Output is the full keep/drop list — one row per clustered doc with
    * its cluster, quality score, and keep flag — i.e. the filter artifact
    * the next pipeline stage anti-joins against, not just the winners.
    *
    * Scale shape: C6's cluster assignment (one row per clustered doc)
    * equi-joins the D2 quality scan on doc_id, then one window ranked per
    * cluster_rep — two keyed shuffles over cluster members only (the
    * non-duplicated bulk of the corpus never enters). */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val clusters = clusterArtifact(s, dir)
    val quality = TextAnalysis.textQuality(s, dir).select("doc_id", "score")
    val w = Window.partitionBy("cluster_rep")
      .orderBy(col("score").desc, col("doc_id"))
    clusters.join(quality, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_rep"), col("cluster_size"),
        col("score"), col("keep"))
      .orderBy("doc_id")
  }

  /** Oracle: C6's transitive-closure clusters joined to D2's quality
    * query, best score (ties → min doc_id) per cluster. Score arithmetic
    * is the bit-exact D2 shape, so the double comparison is safe. */
  val dedupKeepBestSql: String = {
    val clustersSql = dedupClustersSql.replace("ORDER BY doc_id", "")
    val qualitySql =
      TextAnalysis.textQualitySql.replace("ORDER BY doc_id", "")
    s"""
    WITH clusters AS ($clustersSql),
    q AS ($qualitySql),
    ranked AS (
      SELECT c.doc_id, c.cluster_rep, c.cluster_size, q.score,
        row_number() OVER (PARTITION BY c.cluster_rep
                           ORDER BY q.score DESC, c.doc_id) AS rk
      FROM clusters c JOIN q ON q.doc_id = c.doc_id)
    SELECT doc_id, cluster_rep, cluster_size, score, rk = 1 AS keep
    FROM ranked
    ORDER BY doc_id"""
  }

  // ---- C11 soft dedup ---------------------------------------------------

  /** C11: SOFT deduplication — instead of dropping near-dup cluster
    * members (C10), every document gets a sampling weight
    * 1/cluster_size: duplicated content contributes once in expectation
    * while rare phrasing variants still contribute signal (the
    * down-weighting alternative studied for LLM pretraining, where hard
    * dedup measurably over-prunes). Unclustered docs keep weight 1.
    *
    * Scale shape: one left join of the corpus id list against C6's
    * cluster assignment; the weight is a single IEEE division of
    * identical operands in both engines. */
  def dedupSoft(s: SparkSession, dir: String): DataFrame = {
    val clusters = clusterArtifact(s, dir)
    Tables.documents(s, dir).select("doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("doc_id")).as("cluster_rep"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        (lit(1.0) / coalesce(col("cluster_size"), lit(1L)).cast("double"))
          .as("weight"))
      .orderBy("doc_id")
  }

  val dedupSoftSql: String = {
    val clustersSql = dedupClustersSql.replace("ORDER BY doc_id", "")
    s"""
    WITH clusters AS ($clustersSql)
    SELECT d.doc_id,
      COALESCE(c.cluster_rep, d.doc_id) AS cluster_rep,
      COALESCE(c.cluster_size, 1) AS cluster_size,
      1.0 / CAST(COALESCE(c.cluster_size, 1) AS DOUBLE) AS weight
    FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    ORDER BY d.doc_id"""
  }

  // ---- C7 benchmark decontamination ------------------------------------

  private val ContamMinShared = 5

  /** C7: train/test decontamination — flag training documents sharing ≥ 5
    * word-2-gram shingles with any benchmark document (docs with id < 20
    * stand in for the held-out eval set). The pattern every LLM training
    * pipeline runs before a corpus ships.
    *
    * Scale shape: per-training-doc cost is INDEPENDENT of the benchmark
    * document count, and the corpus side is completely join-free. The
    * benchmark shingle sets are materialized once at plan-build time
    * (one pushdown scan of the tiny id < 20 slice); their merged sorted
    * distinct union rides the plan as an array literal, so pass 1 is a
    * narrow shuffle-free Filter — one sorted-intersect kernel call per
    * training doc against the union (sound prefilter: each per-bench set
    * is a subset of the union, so a doc sharing ≥ k shingles with some
    * bench doc shares ≥ k with the union). Only the rare survivors fan
    * out ×bench for exact pair attribution, via an exploded literal —
    * no cartesian, nested-loop, or crossJoin node anywhere. The old plan
    * (broadcast bench table, one kernel pass per (train, bench) pair)
    * multiplied the full corpus scan by the benchmark count; with a real
    * eval suite (tens of thousands of docs) that multiplier bites.
    *
    * Above `graft.contam.maxLiteralShingles` total shingles (default 1M
    * ≈ 8 MB of longs) the literals stop being free: an expression-tree
    * literal is serialized into EVERY task binary, so a realistic eval
    * suite (10⁵ docs × 10² shingles) would ship hundreds of MB per task.
    * The large path keeps the identical two-pass shape but rides the
    * union in as a broadcast one-row relation (crossJoin of 1 row =
    * BroadcastNestedLoopJoin whose data moves once per executor as a
    * torrent broadcast) and the per-bench sets as a broadcast hash-join
    * relation — actual broadcast variables, not plan literals. */
  def dedupContamination(s: SparkSession, dir: String): DataFrame = {
    // bench/train split: docs below the gate play the benchmark suite a
    // real pipeline would load from its eval sets — `graft.contam.
    // benchMaxDocId` overrides the demo default (oracle pins 20)
    val benchMax = s.conf.getOption("graft.contam.benchMaxDocId")
      .map(_.toLong).getOrElse(20L)
    val probe = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text")).as("shs"))
      .filter(col("doc_id") >= benchMax)
    contaminationPairs(s, dir, probe)
  }

  /** C7's pair stage against an ARBITRARY probe batch (doc_id, shs) —
    * the benchmark side (sets, union, Bloom pre-filter) is built from
    * `dir` exactly as [[dedupContamination]] does; shared with
    * [[graft.CorpusJob]]'s incremental append, which decontaminates each
    * new batch against the same standing eval suite. */
  /** The eval-suite side of C7 as data: (bench_id, shingle set) rows,
    * derived from the corpus dir's benchmark docs. [[contaminationPairs]]
    * consumes it directly; CorpusJob.run freezes it as a state sidecar so
    * G40 appends decontaminate against the SAME suite with no corpus-dir
    * dependence (the suite is the contract, not the dir it came from). */
  private[graft] def benchShingleSets(s: SparkSession, dir: String)
      : Seq[(Long, Seq[Long])] = {
    val benchMax = s.conf.getOption("graft.contam.benchMaxDocId")
      .map(_.toLong).getOrElse(20L)
    // NULL-text bench docs have no shingles and cannot contaminate
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text")).as("shs"))
      .filter(col("doc_id") < benchMax && col("shs").isNotNull)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
  }

  private[graft] def contaminationPairs(s: SparkSession, dir: String,
      probe: DataFrame): DataFrame =
    contaminationAgainst(s, benchShingleSets(s, dir), probe)

  /** C7's probe against an explicit (frozen) eval suite. */
  private[graft] def contaminationAgainst(s: SparkSession,
      benchSets: Seq[(Long, Seq[Long])], probe: DataFrame): DataFrame = {
    import s.implicits._
    val union: Array[Long] =
      benchSets.flatMap(_._2).distinct.sorted.toArray
    val maxLiteral = s.conf.getOption("graft.contam.maxLiteralShingles")
      .map(_.toLong).getOrElse(1000000L)
    val totalShingles = union.length.toLong + benchSets.map(_._2.size.toLong).sum
    // G30 composed: a Bloom pre-filter on shingle membership ahead of the
    // exact intersect. The sketch is FIXED-SIZE (~32 bits/key here)
    // however large the eval suite grows, and the probe cost per doc is
    // O(shingles · k) independent of the union size — at a realistic
    // 10⁵-doc eval suite the sorted-intersect against the union pays
    // O(log|union|) per shingle on every training doc, the bloom probe
    // doesn't. Zero false negatives (a member key ALWAYS passes), so a
    // doc truly sharing ≥ k shingles keeps ≥ k admitted shingles and the
    // final output is BYTE-IDENTICAL with the pre-filter on or off
    // (false positives only add survivors the exact kernel then
    // rejects) — spec-pinned in CorpusJobSpec. `graft.contam.
    // bloomPrefilter=false` disables.
    val bloomOn = s.conf.getOption("graft.contam.bloomPrefilter")
      .forall(_.trim.equalsIgnoreCase("true"))
    val bloomPre: Option[Column] = if (!bloomOn || union.isEmpty) None else {
      val bloomK = 4
      val mBits = math.max(1 << 13,
        Integer.highestOneBit(math.max(1, union.length)) * 64)
      val blob = new Array[Byte](mBits / 8)
      union.foreach(h => graft.plans.BloomOps.add(blob,
        org.apache.spark.unsafe.types.UTF8String.fromString(h.toString),
        bloomK))
      // native graft_bloom_count kernel, not size(filter(...)): HOFs are
      // CodegenFallback, the kernel stays inside whole-stage codegen
      Some(call_function("graft_bloom_count", lit(blob), col("shs"),
        lit(bloomK)) >= ContamMinShared)
    }
    def withBloom(exact: Column): Column =
      bloomPre.map(_ && exact).getOrElse(exact)
    if (totalShingles <= maxLiteral) {
      val survivors = probe
        .filter(withBloom(call_function("graft_intersect_count",
          col("shs"), typedLit(union)) >= ContamMinShared))
      survivors
        .select(col("doc_id"), col("shs"),
          explode(typedLit(benchSets)).as("b"))
        .select(col("doc_id"), col("b._1").as("bench_id"),
          call_function("graft_intersect_count", col("shs"), col("b._2"))
            .as("n_shared"))
        .filter(col("n_shared") >= ContamMinShared)
        .orderBy("doc_id", "bench_id")
    } else {
      val unionDf = Seq(Tuple1(union.toSeq)).toDF("bunion")
      val benchDf = benchSets.toDF("bench_id", "bshs")
      val survivors = probe
        .crossJoin(broadcast(unionDf)) // 1 row — union moves once per executor
        .filter(withBloom(call_function("graft_intersect_count",
          col("shs"), col("bunion")) >= ContamMinShared))
        .select(col("doc_id"), col("shs"))
      survivors
        .crossJoin(broadcast(benchDf)) // survivors only fan out ×bench
        .select(col("doc_id"), col("bench_id"),
          call_function("graft_intersect_count", col("shs"), col("bshs"))
            .as("n_shared"))
        .filter(col("n_shared") >= ContamMinShared)
        .orderBy("doc_id", "bench_id")
    }
  }

  val dedupContaminationSql: String = s"""
    WITH $toksSqlCte,
    d AS (SELECT doc_id,
        list_sort(list_distinct(list_transform(
          list_transform(generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1]),
          sh -> ${Hashing.h60pSql("sh")}))) AS shs
      FROM toks),
    bench AS (SELECT doc_id AS bench_id, shs AS bshs FROM d WHERE doc_id < 20),
    train AS (SELECT doc_id, shs FROM d WHERE doc_id >= 20)
    SELECT t.doc_id, b.bench_id,
      CAST(len(list_intersect(t.shs, b.bshs)) AS BIGINT) AS n_shared
    FROM train t CROSS JOIN bench b
    WHERE len(list_intersect(t.shs, b.bshs)) >= $ContamMinShared
    ORDER BY t.doc_id, b.bench_id"""

  // ---- C13 exact-substring span dedup -----------------------------------

  private val SubstrK = 8 // span resolution: duplicated runs of >= K tokens

  /** C13: exact duplicated-substring spans (the ExactSubstr pass of Lee et
    * al. 2022, arXiv:2107.06499, "Deduplicating Training Data Makes
    * Language Models Better"): for every document, report the maximal
    * token spans whose every K-token window also appears in some OTHER
    * document — the regions that pass would cut, at K-token resolution.
    * (Lee et al. build a corpus-wide suffix array; a distributed engine
    * gets the same spans from a positional K-gram inverted index — the
    * gram granularity means spans are detected once they reach K tokens
    * and boundaries are exact.) Whole-doc near-dup (C2–C4) cannot see
    * these partial overlaps; winnowing (D16) samples them but cannot
    * bound span edges.
    *
    * Scale shape: positional gram hashes are one shuffle-free narrow pass
    * (fused `graft_pos_grams` kernel) + posexplode; cross-doc document
    * frequency is one keyed count-distinct shuffle on the gram hash;
    * flagged positions come back via a gram-hash equi-join (never an
    * all-pairs doc join); island grouping is one doc-keyed window. Every
    * stage is linear in corpus grams — the suffix array's O(n log n)
    * global sort is replaced by two O(n) shuffles. */
  def dedupSubstring(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(
        call_function("graft_pos_grams", col("text"), lit(SubstrK)))
        .as(Seq("pos", "gh")))
    val dup = grams.groupBy("gh")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= 2).select("gh")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    grams.join(dup, "gh")
      .withColumn("isl", col("pos") - row_number().over(w))
      .groupBy("doc_id", "isl")
      .agg(min("pos").as("p0"), count(lit(1)).as("n_win"))
      .select(col("doc_id"),
        (col("p0") + 1).cast("long").as("span_start"),
        (col("n_win") + lit(SubstrK - 1)).cast("long").as("span_tokens"))
      .orderBy("doc_id", "span_start")
  }

  val dedupSubstringSql: String = {
    val k = SubstrK
    val gram = s"list_aggregate(list_slice(t, i, i + ${k - 1}), 'string_agg', ' ')"
    s"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS t
      FROM documents),
    pg AS (
      SELECT doc_id, u.pos AS pos, u.gh AS gh
      FROM (SELECT doc_id,
          unnest(list_transform(generate_series(1, len(t) - ${k - 1}),
            i -> {'pos': i, 'gh': ${Hashing.h60pSql(gram)}})) AS u
        FROM toks WHERE len(t) >= $k)),
    dup AS (SELECT gh FROM pg GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
    hit AS (SELECT doc_id, pos,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
      FROM pg JOIN dup USING (gh))
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
      CAST(COUNT(*) + ${k - 1} AS BIGINT) AS span_tokens
    FROM hit GROUP BY doc_id, pos - rn
    ORDER BY doc_id, span_start"""
  }

  // ---- C14 dedup audit report --------------------------------------------

  /** C14: the per-source duplication report a data-governance review asks
    * for before any dedup pass runs — document count, distinct-content
    * count (md5 identity, C1's key), duplicate count, and the unique
    * ratio per source. One keyed aggregation with map-side partial
    * count-distinct; the single IEEE division has exact int64 operands. */
  def dedupStats(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"))
      .select(col("source"), col("n_docs"), col("n_unique"),
        (col("n_docs") - col("n_unique")).as("n_dup_docs"),
        (col("n_unique").cast("double") / col("n_docs")).as("unique_ratio"))
      .orderBy("source")
  }

  val dedupStatsSql: String = """
    SELECT source, COUNT(*) AS n_docs,
      COUNT(DISTINCT md5(text)) AS n_unique,
      COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup_docs,
      CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*) AS unique_ratio
    FROM documents GROUP BY source ORDER BY source"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_contamination" -> (dedupContamination _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_exact"   -> (dedupExact _),
    "dedup_url"     -> (dedupUrl _),
    "text_split_cluster" -> (textSplitCluster _),
    "dedup_jaccard" -> (dedupJaccard _),
    "dedup_prefix"  -> (dedupPrefix _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_minhash_est" -> (dedupMinhashEst _),
    "dedup_lsh_tune" -> (dedupLshTune _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embcos"  -> (dedupEmbcos _),
    "dedup_semantic" -> (dedupSemantic _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_keep_best" -> (dedupKeepBest _),
    "dedup_soft" -> (dedupSoft _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_stats" -> (dedupStats _))

  val oracle: Map[String, String] = Map(
    "dedup_contamination" -> dedupContaminationSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_exact"   -> dedupExactSql,
    "dedup_url"     -> dedupUrlSql,
    "text_split_cluster" -> textSplitClusterSql,
    "dedup_jaccard" -> dedupJaccardSql,
    "dedup_prefix"  -> dedupPrefixSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_minhash" -> dedupMinhashSql,
    "dedup_minhash_est" -> dedupMinhashEstSql,
    "dedup_lsh_tune" -> dedupLshTuneSql,
    "dedup_simhash" -> dedupSimhashSql,
    "dedup_embcos"  -> dedupEmbcosSql,
    "dedup_semantic" -> dedupSemanticSql,
    "dedup_clusters" -> dedupClustersSql,
    "dedup_keep_best" -> dedupKeepBestSql,
    "dedup_soft" -> dedupSoftSql,
    "dedup_substring" -> dedupSubstringSql,
    "dedup_stats" -> dedupStatsSql)
}
