package graft.operators

import graft.functions.{Hashing, Text}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native vector store — the engine-side analog of the reference's
  * VectorDatabase interface (VectorDatabase/VectorDatabase.py:13-33:
  * create_schema / ingest_documents / search).
  *
  * The "index" is a parquet dataset partitioned by LSH bucket: ingest
  * chunks each document (TextProcessor.chunk_text semantics), embeds every
  * chunk with the deterministic hashing embedder, assigns a sign-LSH
  * bucket, and writes partitioned by bucket. Search embeds the query,
  * multi-probes its bucket's Hamming-1 neighborhood, and exact-ranks by
  * inner product inside the probed partitions only — at 100 TB the bucket
  * is the partition-pruning key, so a query touches ~(bits+1)/2^bits of
  * the index files.
  */
object VectorStore {

  val Dim = 32
  val Planes = 8

  // PQ sidecar geometry (B7/B8 machinery): Dim-long raw weights split
  // into PqM subspaces of PqSubDim, each coded to the nearest of PqK
  // sampled centroids — 4 small ints per chunk instead of 32 longs.
  val PqM = 4
  val PqSubDim: Int = Dim / PqM
  val PqK = 16
  private val PqDir = "_graft_pq"

  // Learned-cell IVF geometry: KmCells k-means cells trained at store
  // creation (one Lloyd round, B12's exact-int64 math), frozen in a
  // sidecar like the PQ codebook. `cell` is the second partition level
  // (bucket=…/cell=…), so a cell-probed search prunes whole directories.
  val KmCells = 8
  private val CellsDir = "_graft_cells"

  // Residual-PQ sidecar geometry (r10, the store-side B24): codes are cut
  // from the chunk's RESIDUAL against its frozen cell centroid, not the
  // raw weights — residual energy is a fraction of raw energy, so the
  // same PqK centroids quantize it better (what FAISS IVFPQ ships). The
  // exactness discipline differs from B24's per-cell n-scaling: residuals
  // land on ONE shared fixed-point scale, r = raw·2^16 − floor(S·2^16/n)
  // (the floor computed overflow-safely as (S div n)·2^16 + ((S mod n)·
  // 2^16 div n)), so residuals from DIFFERENT cells are directly
  // comparable and one GLOBAL codebook serves every cell — no empty-cell
  // codebook gap, no per-candidate normalizing division at read time.
  private val ResScale = 1L << 16
  private val ResCbFile = "rescb.parquet"

  /** floor(S_d·2^16 / n) per dim, computed DRIVER-side over the K-row
    * centroid sidecar (the searchCells bounded-collect discipline) with
    * exact Long arithmetic — the overflow-safe two-term form keeps
    * S·2^16 from wrapping at web-scale member counts. */
  private def cmeanScaled(csum: Seq[Long], n: Long): Seq[Long] =
    csum.map(s => s / n * ResScale + s % n * ResScale / n)

  /** Scaled residual r = raw·2^16 − cmean, elementwise — pure codegen
    * column math once the cell's scaled mean is attached. */
  private def scaledResidual(raw: Column, cmean: Column): Column =
    zip_with(raw, cmean, (x, c) => x * ResScale - c)

  /** Per-subspace views of a raw int64 vector: array of PqM slices. */
  private def subvecs(v: Column): Column =
    transform(sequence(lit(0), lit(PqM - 1)),
      m => slice(v, m * lit(PqSubDim) + 1, lit(PqSubDim)))

  /** One exact Lloyd refinement round over chunk subvectors (r11, the
    * B25 rule applied to the store's frozen codebooks): assign every
    * (chunk, subspace) of the CREATION batch to its nearest seed
    * centroid (exact int64 sqdist, ties to the smaller j), then refine
    * each surviving (m, j) centroid to the floor-divided integer mean —
    * integer centroids keep the ADC scan in exact int64 with no
    * per-candidate division, and the <1 rounding on the hash-weight axis
    * is noise against centroid spreads. Seeds that win no members vanish
    * (the codebook only shrinks — codes stay dense in [0, K)). Cost: one
    * encode-shaped broadcast pass plus a narrow (m, j, sd) mergeable
    * aggregate, paid once at store creation; appends still reuse the
    * frozen result. `subs` = (doc_id, chunk_ix, m, sub). */
  private def lloydRefine(subs: DataFrame, seeds: DataFrame): DataFrame = {
    val wMin = Window.partitionBy("doc_id", "chunk_ix", "m")
      .orderBy(col("dist"), col("j"))
    val a1 = subs.join(broadcast(seeds), Seq("m"))
      .withColumn("dist", call_function("graft_sqdist_l", col("sub"), col("cent")))
      .withColumn("rk", row_number().over(wMin))
      .filter(col("rk") === 1)
      .select("doc_id", "chunk_ix", "m", "j")
    subs.join(a1, Seq("doc_id", "chunk_ix", "m"))
      .select(col("m"), col("j"), posexplode(col("sub")))
      .groupBy("m", "j", "pos")
      .agg(sum("col").as("cs"), count(lit(1)).as("n"))
      // floorDiv via pmod: exactly-divisible numerator makes the
      // truncating `div` exact regardless of sign
      .select(col("m"), col("j"), col("pos"),
        expr("(cs - pmod(cs, n)) div n").as("c2"))
      .groupBy("m", "j")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c2")))),
        e => e.getField("c2")).as("cent"))
      .select("j", "m", "cent")
  }

  /** (doc_id, chunk_ix, m, sub) subvector rows of a vector column. */
  private def subRows(df: DataFrame, vecCol: Column): DataFrame =
    df.select(col("doc_id"), col("chunk_ix"), posexplode(subvecs(vecCol)))
      .select(col("doc_id"), col("chunk_ix"),
        col("pos").as("m"), col("col").as("sub"))

  /** B22 for the store: OPQ-style energy-balancing permutation ahead of
    * the PQ subspace split, trained on the CREATION batch (per-dim exact
    * int64 energy n·Σx²−(Σx)², snake deal — the Similarity.vecOpq rule)
    * and frozen in a `_graft_pq/perm.parquet` sidecar exactly like the
    * codebook: appends reuse it, because codes cut along two different
    * permutations don't compare. Permutations preserve dot products, so
    * the exact re-rank tail of [[searchCompressed]] is untouched — only
    * the ADC approximation sees the balanced subspaces. A store written
    * before this sidecar existed serves with the identity permutation. */
  private val PermFile = "perm.parquet"

  private def trainPerm(batch: DataFrame): Seq[Int] = {
    val stats = batch.select(posexplode(col("raw")))
      .groupBy(col("pos").as("d"))
      .agg((count(lit(1)) * sum(col("col") * col("col"))
        - sum("col") * sum("col")).as("energy"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val dimOfRank = stats.sortBy { case (d, e) => (-e, d) }.map(_._1)
    (0 until Dim).map { p =>
      val m = p / PqSubDim // target subspace
      val g = p % PqSubDim // slot within the subspace = snake round
      val i = if (g % 2 == 0) m else PqM - 1 - m
      dimOfRank(g * PqM + i)
    }
  }

  private def readPerm(spark: SparkSession, indexDir: String): Option[Seq[Int]] = {
    val p = s"$indexDir/$PqDir/$PermFile"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(p)))
      Some(spark.read.parquet(p).orderBy("p")
        .collect().map(_.getInt(1)).toSeq)
    else None
  }

  /** Gather `v` along the frozen permutation — literal indices, codegen. */
  private def permuteRaw(v: Column, perm: Seq[Int]): Column =
    array(perm.map(d => element_at(v, d + 1)): _*)

  /** Raw int64 hashing-trick weights of a chunk — one pass of the fused
    * graft_hash_embed kernel (the O(dim·tokens) per-slot filter/aggregate
    * HOF chain it replaced was the store's dominant ingest cost). */
  private def rawWeights(text: Column): Column =
    call_function("graft_hash_embed", text, lit(Dim))

  /** L2-normalized double embedding from the raw weights (Σw² exact). */
  private[operators] def embedFromRaw(raw: Column): Column = {
    val ss = call_function("graft_dot_l", raw, raw)
    when(ss > 0,
      transform(raw, x => x.cast("double") / sqrt(ss.cast("double"))))
      .otherwise(transform(raw, x => x.cast("double")))
  }

  /** Bucket from the RAW weights: sign(dot(w, plane)) = sign(dot(w/‖w‖,
    * plane)), so the un-normalized int64 dots (exact, codegen'd, fused
    * single-table graft_lsh_buckets pass — md5 "0_p_d" plane seeds) give
    * the bucket with no float arithmetic at all. */
  private def bucketOf(raw: Column): Column =
    element_at(call_function("graft_lsh_buckets", raw, lit(1), lit(Planes)), 1)

  /** Ingest: documents(doc_id, text, …) → chunk → embed → bucket →
    * parquet index partitioned by bucket. `mode` "append" adds an
    * incremental batch to an existing index. Returns the batch's chunk
    * count (an empty batch writes nothing and returns 0).
    *
    * `batchTag` (r9): the store's TIME AXIS — every row of this batch is
    * stamped with it (an epoch, a CDC sequence number, an ingest round),
    * and a G34 zone-map sidecar on the tag is maintained INCREMENTALLY
    * after each write ([[graft.sources.ZoneMaps.appendSidecar]] — only
    * the batch's own files are scanned). Files written by one batch
    * carry one constant tag, so their zones are single points and a
    * time-windowed serving read ([[searchTagRange]]) prunes to exactly
    * the matching batches' files before any bucket probe runs. */
  def ingest(docs: DataFrame, indexDir: String,
      chunkSize: Int = 20, overlap: Int = 5, mode: String = "overwrite",
      batchTag: Long = 0L, cells: Int = KmCells): Long = {
    require(cells >= 1, s"cells must be >= 1, got $cells")
    // Filtered serving (r16, the Weaviate `where` parity): a `meta`
    // column on the docs batch (map<string,string> by convention) rides
    // every chunk row into the index, so serving reads can fold a
    // predicate BELOW their shortlists (B21's pre-filter discipline).
    // Legacy rules below mirror perm/rescb/scodes.
    val hasMeta = docs.columns.contains("meta")
    val metaIn: Seq[Column] = if (hasMeta) Seq(col("meta")) else Nil
    val chunks = docs
      .select((Seq(col("doc_id")) ++ metaIn ++ Seq(
        posexplode(Text.chunks(col("text"), chunkSize, overlap)))): _*)
      .select((Seq(col("doc_id")) ++ metaIn ++ Seq(
        (col("pos") + 1).as("chunk_ix"), col("col").as("chunk"))): _*)
    ingestChunks(chunks, indexDir, mode, lit(batchTag), cells)
  }

  /** The encode-and-write core shared by [[ingest]] (which chunks docs
    * first) and [[retrainCells]] (which re-encodes the CURRENT chunk set
    * into a staging dir): trains-or-reuses every learned artifact (OPQ
    * perm, PQ codebook, k-means cells, residual codebook), encodes every
    * serving column, and writes index data + sidecars under `indexDir`.
    * `batchTagCol` is a literal for normal ingests and the preserved
    * per-row `orig_tag` column for retrain (so the time axis survives a
    * retrain); an `orig_tag` input column is dropped before the write so
    * the written schema is position-identical to a fresh creation. */
  private def ingestChunks(chunks: DataFrame, indexDir: String,
      mode: String, batchTagCol: Column, cells: Int): Long = {
    // `raw` (exact int64 weights) is kept in the index: search ranks with
    // the codegen'd graft_dot_l kernel over it — the interpreted
    // aggregate/zip_with double dot it replaces was the scan-time cost of
    // every probe. `embedding` stays for float-vector consumers.
    val embedded = chunks
      .withColumn("raw", rawWeights(col("chunk")))
      .withColumn("bucket", bucketOf(col("raw")))
      .withColumn("embedding", embedFromRaw(col("raw")))
      .cache()
    val n = embedded.count()
    if (n > 0) {
      // PQ codebook: frozen at store creation (k-means|| seeding sampled
      // from the first PqK chunks, deterministic); appends MUST reuse it —
      // codes from two different codebooks don't compare. The sidecar is
      // written AFTER the index data: an overwrite-mode index write wipes
      // indexDir, sidecar included.
      val spark = embedded.sparkSession
      val cbPath = s"$indexDir/$PqDir/codebook.parquet"
      val permPath = s"$indexDir/$PqDir/$PermFile"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      // the OPQ permutation freezes FIRST: the codebook's subspaces are
      // defined over the permuted layout, so perm reuse gates like the
      // codebook's (append → frozen; creation → trained on this batch).
      // A store whose codebook predates the perm sidecar was coded over
      // the IDENTITY layout — appending to it must keep that layout (and
      // must NOT write a sidecar): training a fresh permutation here
      // would encode the batch against subspaces the frozen codebook
      // never saw and then permute every future query, corrupting ADC
      // distances for all previously-ingested rows.
      val reuse = mode == "append" &&
        fs.exists(new org.apache.hadoop.fs.Path(cbPath))
      val reusePerm = mode == "append" &&
        fs.exists(new org.apache.hadoop.fs.Path(permPath))
      val legacyIdentity = reuse && !reusePerm
      val perm: Seq[Int] =
        if (reusePerm) readPerm(spark, indexDir).get
        else if (legacyIdentity) 0 until Dim
        else trainPerm(embedded)
      val codebook = if (reuse) {
        // materialize NOW: the lazy plan must not race a sidecar rewrite
        spark.read.parquet(cbPath).localCheckpoint(true)
      } else {
        // seed = first PqK chunks' subvectors (the k-means|| seeding
        // step), then ONE exact Lloyd round over the creation batch
        // (r11) — trained centroids instead of raw samples close most
        // of the sampled-codebook ADC gap (the B25 measurement)
        val wj = Window.orderBy("doc_id", "chunk_ix")
        val seeds = embedded.select("doc_id", "chunk_ix", "raw")
          .orderBy("doc_id", "chunk_ix").limit(PqK)
          .withColumn("j", row_number().over(wj) - 1)
          .select(col("j"), posexplode(subvecs(permuteRaw(col("raw"), perm))))
          .select(col("j"), col("pos").as("m"), col("col").as("cent"))
        lloydRefine(subRows(embedded, permuteRaw(col("raw"), perm)), seeds)
          .localCheckpoint(true)
      }
      // Cell centroids: same freezing discipline as the codebook — one
      // Lloyd round over the creation batch (seed = first `cells` chunks
      // — a creation-time knob (r11): cell count should scale with the
      // corpus (more Voronoi cells = finer directory pruning); every
      // serving path reads the frozen K-row sidecar, so any K serves,
      // assignment by exact int64 sqdist, centroid = exact sum + count),
      // appends assign against the frozen summary so cell ids stay
      // comparable across batches.
      val cellPath = s"$indexDir/$CellsDir/centroids.parquet"
      val reuseCells = mode == "append" &&
        fs.exists(new org.apache.hadoop.fs.Path(cellPath))
      val centroids = if (reuseCells) {
        spark.read.parquet(cellPath).localCheckpoint(true)
      } else {
        val wj = Window.orderBy("doc_id", "chunk_ix")
        val seeds = embedded.select("doc_id", "chunk_ix", "raw")
          .orderBy("doc_id", "chunk_ix").limit(cells)
          .withColumn("cell", row_number().over(wj) - 1)
          .select(col("cell"), col("raw").as("sq"))
        val wMin = Window.partitionBy("doc_id", "chunk_ix")
          .orderBy(col("d2"), col("cell"))
        embedded.select(col("doc_id"), col("chunk_ix"), col("raw"))
          .join(broadcast(seeds))
          .withColumn("d2", call_function("graft_sqdist_l", col("raw"), col("sq")))
          .withColumn("rk", row_number().over(wMin))
          .filter(col("rk") === 1)
          .select(col("cell"), posexplode(col("raw")))
          .groupBy("cell", "pos").agg(sum("col").as("cs"), count(lit(1)).as("cnt"))
          .groupBy("cell")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("cs")))),
            e => e.getField("cs")).as("csum"),
            (max("cnt")).as("n"))
          .localCheckpoint(true)
      }
      // residual-PQ codes (r10): each chunk's rres against its FROZEN
      // cell centroid (scaled means computed driver-side from the K-row
      // summary), coded against one GLOBAL residual codebook — frozen at
      // creation like the raw-layout codebook, reused by appends
      import spark.implicits._
      val cmeans = centroids.collect()
        .map(r => (r.getInt(0),
          cmeanScaled(r.getSeq[Long](1), r.getLong(2))))
        .toSeq.toDF("cell", "cmean")
      val celled = embedded
        .join(cellAssign(centroids, embedded), Seq("doc_id", "chunk_ix"))
      val withRes = celled.join(broadcast(cmeans), "cell")
        .withColumn("rres", scaledResidual(col("raw"), col("cmean")))
        .drop("cmean")
      val resCbPath = s"$indexDir/$PqDir/$ResCbFile"
      val reuseRes = mode == "append" &&
        fs.exists(new org.apache.hadoop.fs.Path(resCbPath))
      // A store whose codebook predates the residual sidecar (pre-r10)
      // carries no `rcodes` column: training a fresh residual codebook
      // from an APPEND batch and coding only the new rows would leave a
      // mixed-schema index where every legacy row silently vanishes from
      // the compressed-cells read (or breaks its schema inference). The
      // perm sidecar's legacyIdentity rule applies here too: such a
      // store keeps appending WITHOUT residual codes and writes no
      // rescb sidecar — [[searchCompressedCellsBatch]] refuses loudly
      // until a full re-ingest upgrades the store.
      val legacyRes = reuse && !reuseRes
      val rescbOpt: Option[DataFrame] =
        if (legacyRes) None
        else if (reuseRes)
          Some(spark.read.parquet(resCbPath).localCheckpoint(true))
        else {
          // same seeding + one exact Lloyd round as the raw codebook
          // (r11): the residual codebook trains on the creation batch's
          // scaled residuals instead of carrying its first-K samples
          val wj = Window.orderBy("doc_id", "chunk_ix")
          val seeds = withRes.select("doc_id", "chunk_ix", "rres")
            .orderBy("doc_id", "chunk_ix").limit(PqK)
            .withColumn("j", row_number().over(wj) - 1)
            .select(col("j"), posexplode(subvecs(col("rres"))))
            .select(col("j"), col("pos").as("m"), col("col").as("cent"))
          Some(lloydRefine(subRows(withRes, col("rres")), seeds)
            .localCheckpoint(true))
        }
      val coded = withRes.drop("rres")
        .join(pqEncode(codebook, embedded, perm), Seq("doc_id", "chunk_ix"))
      // SQ8 codes (G44, r12): per-chunk symmetric int8 quantization of
      // the exact raw weights — the serving rung between the raw-vector
      // cell scan and the PQ/residual ADC. The per-chunk scale
      // FACTORIZES out of the dot product (annSq8's B6 scheme), so the
      // rung needs NO trained artifact: every row self-scales, appends
      // and edits are consistent by construction. A store written
      // before this column existed stays scodes-free on append (the
      // perm/rescb legacy rule) and the sq8 read refuses it loudly.
      val legacyFields: Set[String] =
        if (reuse) spark.read.parquet(indexDir).schema.fieldNames.toSet
        else Set.empty
      val sqLegacy = reuse && !legacyFields.contains("scodes")
      val indexed0 = rescbOpt
        .fold(coded)(cb =>
          coded.join(resEncode(cb, withRes), Seq("doc_id", "chunk_ix")))
        .withColumn("batch_tag", batchTagCol)
      // JL-projected codes (G47, r13): same legacy rule — a store written
      // before the pcodes column stays pcodes-free on append and the rp
      // read refuses it loudly
      val rpLegacy = reuse && !legacyFields.contains("pcodes")
      val indexed1 = if (sqLegacy) indexed0 else sq8Cols(indexed0)
      val indexed2 = if (rpLegacy) indexed1 else rpCols(indexed1)
      // meta legacy rules: a meta-carrying store REFUSES a meta-less
      // append (filtered reads would silently drop the new rows — worse
      // than failing loudly); a pre-meta store drops the batch's meta
      // (backfilling only the new rows would serve a partial filter —
      // the G47 rule) and filtered reads refuse until re-ingest.
      val hasMeta = chunks.columns.contains("meta")
      require(!(reuse && legacyFields.contains("meta")) || hasMeta,
        s"store $indexDir carries a `meta` column: append batches must " +
          "carry `meta` too, or filtered reads would silently drop them")
      val metaLegacy = reuse && hasMeta && !legacyFields.contains("meta")
      val indexed = if (metaLegacy) indexed2.drop("meta") else indexed2
      indexed.drop("orig_tag")
        .write.mode(mode).partitionBy("bucket", "cell").parquet(indexDir)
      // time-axis zone maps: incremental upkeep scans this batch's files
      // only (an overwrite-mode write wiped the old sidecar with the rest
      // of the dir, so it degenerates to a fresh full build there)
      graft.sources.ZoneMaps.appendSidecar(spark, indexDir, "batch_tag")
      // lexical/BM25 sidecar (G49): postings + doclog for the hybrid
      // read — fresh at creation, generation-append on append; a legacy
      // store without the sidecar stays lex-free (rule in VectorStoreLex)
      VectorStoreLex.appendFor(indexDir,
        embedded.select("doc_id", "chunk_ix", "chunk"), create = !reuse)
      if (!reuse)
        codebook.coalesce(1).write.mode("overwrite").parquet(cbPath)
      if (!reusePerm && !legacyIdentity) {
        import spark.implicits._
        perm.zipWithIndex.map { case (src, p) => (p, src) }.toDF("p", "src")
          .coalesce(1).write.mode("overwrite").parquet(permPath)
      }
      if (!reuseCells)
        centroids.coalesce(1).write.mode("overwrite").parquet(cellPath)
      if (!reuseRes)
        rescbOpt.foreach(
          _.coalesce(1).write.mode("overwrite").parquet(resCbPath))
    }
    embedded.unpersist()
    n
  }

  /** SQ8 columns over `raw` — B6's symmetric scheme: per-chunk scale
    * d = max(1, ⌊max_i|raw_i|/127⌋), code_i = sgn(raw_i)·⌊|raw_i|/d⌋.
    * |code| ≤ 127 by construction; the serving ADC d·Σ q_i·code_i is
    * exact int64 (|Σ| bounded by the exact dot the raw scan computes).
    * Stored as an int64 array for the codegen dot kernel. Honest disk
    * note (bench/store_sq8_r12.json): on THIS store parquet's
    * dictionary+RLE already encodes the small count-valued raw weights
    * to ~0.7 byte/dim, so the codes column lands at byte PARITY with
    * raw — the 1-byte-vs-8-byte width win is a DECODED working-set
    * property, and its on-disk counterpart needs high-entropy raw
    * vectors (the B15-style 1e8-scaled embeddings, 65 vs 512 logical
    * bytes/vector). */
  private def sq8Cols(df: DataFrame): DataFrame = {
    val m = array_max(transform(col("raw"), x => abs(x)))
    df.withColumn("sscale",
        greatest((m - pmod(m, lit(127L))) / 127L, lit(1L)).cast("long"))
      .withColumn("scodes", transform(col("raw"), x =>
        (when(x < 0, lit(-1L)).otherwise(lit(1L)) *
          ((abs(x) - pmod(abs(x), col("sscale"))) / col("sscale")))
          .cast("long")))
  }

  private val RpDims = 16

  /** md5-derived ±1 sign matrix for the store's JL projection (G47) —
    * the B27 construction seeded "srp:" over the store's Dim, computed
    * once driver-side. A LITERAL, never a sidecar: like the scodes
    * rung, appends and edits are consistent by construction and splice
    * maintenance never touches it. */
  private lazy val rpSigns: Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(RpDims, Dim) { (j, d) =>
      val hex = md.digest(s"srp:$j:$d".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      ((java.lang.Long.parseLong(hex, 16) >> 3) & 1L) * 2L - 1L
    }
  }

  private def rpProject(raw: Column): Column =
    array((0 until RpDims).map(j =>
      call_function("graft_dot_l", typedLit(rpSigns(j).toSeq), raw)): _*)

  /** JL-projected codes over `raw` (G47): 16 signed sums of the 32 raw
    * weights — the DIM-count compression rung next to scodes' element-
    * width rung: 2× fewer multiplies and array elements per candidate
    * in the shortlist scan, exact int64 end to end (|raw| is token-count
    * sized, so the projected coordinate and the 16-dim projected dot sit
    * far inside int64). An 8-dim variant was measured and REJECTED:
    * quarter-width projections of these 32-dim count vectors drop a
    * verbatim chunk's own row out of a 50-deep shortlist — half-width
    * keeps the self-hit and the recall rung serviceable. */
  private def rpCols(df: DataFrame): DataFrame =
    df.withColumn("pcodes", rpProject(col("raw")))

  /** Coarse cell probe (r11, metric-ALIGNED with assignment): rank cells
    * by the same rule [[cellAssign]] assigns with — exact int64
    * numerator ‖S‖² − 2·(q·S)·n over an IEEE n² — so the probe order IS
    * the assignment order, and a stored chunk's own cell is always its
    * own query's top-1 probe (q = the chunk's raw makes its assigned
    * cell the argmin by definition). The r10 probe ranked by dot(q,S)/n,
    * a direction-only score that could place a chunk's own cell outside
    * its top-nprobe — the self-recall caveat this alignment deletes
    * (spec-pinned for arbitrary stored chunks, not a reachable sample).
    * Driver-side over the K-row frozen sidecar, one IEEE division per
    * cell, ties to the smaller cell id. */
  private def probeCellsFor(centroids: Array[(Int, Array[Long], Long)],
      qraw: Array[Long], nprobe: Int): Seq[Int] =
    centroids.map { case (cell, csum, nMem) =>
      var ss = 0L; var dot = 0L; var i = 0
      while (i < csum.length) {
        ss += csum(i) * csum(i); dot += qraw(i) * csum(i); i += 1
      }
      // (n·n as int64, then one cast — bit-identical to cellAssign's
      // (col("n") * col("n")).cast("double") denominator)
      ((ss - 2L * dot * nMem).toDouble / (nMem * nMem).toDouble, cell)
    }.sortBy { case (s, cell) => (s, cell) }.take(nprobe).map(_._2).toSeq

  /** Assign each batch chunk to its nearest frozen cell centroid S/n:
    * argmin ‖x − S/n‖² restated division-free as
    * (‖S‖² − 2·x·S·n)/n² — exact int64 numerator and denominator, one
    * IEEE division per (chunk, cell), ties to the smaller cell id (the
    * B12 assignment discipline). Broadcast K-row summary × narrow scan. */
  private def cellAssign(centroids: DataFrame, batch: DataFrame): DataFrame = {
    val wMin = Window.partitionBy("doc_id", "chunk_ix")
      .orderBy(col("score"), col("cell"))
    batch.select(col("doc_id"), col("chunk_ix"), col("raw"))
      .join(broadcast(centroids))
      .select(col("doc_id"), col("chunk_ix"), col("cell"),
        ((call_function("graft_dot_l", col("csum"), col("csum"))
          - lit(2) * call_function("graft_dot_l", col("raw"), col("csum")) * col("n"))
          .cast("double") / (col("n") * col("n")).cast("double")).as("score"))
      .withColumn("rk", row_number().over(wMin))
      .filter(col("rk") === 1)
      .select("doc_id", "chunk_ix", "cell")
  }

  /** PQ-encode a batch against a codebook: (doc_id, chunk_ix, codes) with
    * `codes(m)` = nearest centroid id in subspace m (exact int64 sqdist,
    * ties to the smaller id — deterministic). Broadcast codebook join +
    * per-(chunk, subspace) argmin: the B7 encoding shape. */
  private def pqEncode(codebook: DataFrame, batch: DataFrame,
      perm: Seq[Int]): DataFrame = {
    val wMin = Window.partitionBy("doc_id", "chunk_ix", "m")
      .orderBy(col("dist"), col("j"))
    batch.select(col("doc_id"), col("chunk_ix"),
        posexplode(subvecs(permuteRaw(col("raw"), perm))))
      .select(col("doc_id"), col("chunk_ix"), col("pos").as("m"), col("col").as("sub"))
      .join(broadcast(codebook), "m")
      .withColumn("dist", call_function("graft_sqdist_l", col("sub"), col("cent")))
      .withColumn("rk", row_number().over(wMin))
      .filter(col("rk") === 1)
      .groupBy("doc_id", "chunk_ix")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("j")))),
        e => e.getField("j")).as("codes"))
  }

  /** Residual twin of [[pqEncode]]: identity layout (the OPQ permutation
    * serves the raw-layout ADC path; residuals are already centered, and
    * keeping the two sidecar families orthogonal keeps append reuse
    * rules independent), argmin per (chunk, subspace) over the global
    * residual codebook. */
  private def resEncode(rescb: DataFrame, withRes: DataFrame): DataFrame = {
    val wMin = Window.partitionBy("doc_id", "chunk_ix", "m")
      .orderBy(col("dist"), col("j"))
    withRes.select(col("doc_id"), col("chunk_ix"),
        posexplode(subvecs(col("rres"))))
      .select(col("doc_id"), col("chunk_ix"), col("pos").as("m"),
        col("col").as("sub"))
      .join(broadcast(rescb), "m")
      .withColumn("dist", call_function("graft_sqdist_l", col("sub"), col("cent")))
      .withColumn("rk", row_number().over(wMin))
      .filter(col("rk") === 1)
      .groupBy("doc_id", "chunk_ix")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("j")))),
        e => e.getField("j")).as("rcodes"))
  }

  /** Search: top-k chunks for a free-text query, probing the query's LSH
    * bucket and its Hamming-1 neighbors. Bucket pruning happens at the
    * parquet partition level (`bucket IN (…)` on the partition column).
    * Cosine ranking runs on the stored int64 weights through the
    * graft_dot_l codegen kernel — exact integer dot, two norms, one IEEE
    * division per candidate — instead of an interpreted per-element
    * double fold (higher-order functions are CodegenFallback). */
  def search(spark: SparkSession, indexDir: String, query: String, k: Int = 5)
      : DataFrame =
    searchIn(spark, spark.read.parquet(indexDir), query, k)

  /** Time-windowed serving read (r9): [[search]] restricted to ingest
    * batches whose `batch_tag` lies in [lo, hi]. The file list comes
    * from the G34 sidecar the ingest maintains ([[ingest]]'s `batchTag`)
    * — an O(files) pruning decision with no data read — so a "recent
    * batches only" query at 100 TB opens exactly the matching batches'
    * files, and the LSH bucket probe prunes further within them. The
    * residual row filter inside readRange keeps exactness. */
  def searchTagRange(spark: SparkSession, indexDir: String, query: String,
      lo: Long, hi: Long, k: Int = 5): DataFrame =
    searchIn(spark,
      graft.sources.ZoneMaps.readRange(spark, indexDir, "batch_tag", lo, hi),
      query, k)

  private def searchIn(spark: SparkSession, index: DataFrame, query: String,
      k: Int): DataFrame = {
    val qvec = { import spark.implicits._; Seq(query).toDF("qtext") }
    val q = qvec
      .withColumn("qraw", rawWeights(col("qtext")))
      .withColumn("qbucket", bucketOf(col("qraw")))
      .select(col("qraw"), explode(array(
        col("qbucket") +: (0 until Planes).map(p =>
          col("qbucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"))
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    // top-k via orderBy+limit = TakeOrderedAndProject (per-partition
    // heap + driver merge), NOT a global-window rank: a window with no
    // partition key would funnel EVERY probed candidate into one
    // partition. Only the k survivors get a rank (trivial by then).
    val w = Window.orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index.join(broadcast(q), "bucket")
      .select(col("doc_id"), col("chunk_ix"), col("chunk"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
      .limit(k)
      .withColumn("rank", row_number().over(w))
      .select("rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("rank")
  }

  /** Batch serving path: rank MANY queries through one plan. Each query
    * probes its own LSH buckets; candidates carry their `query_id`, so
    * the top-k window partitions BY QUERY — a thousand-query batch ranks
    * in parallel instead of funneling every query's candidates into the
    * single partition an unpartitioned window would force. This is the
    * shape a retrieval-eval or RAG-serving sweep needs; the single-query
    * paths stay on TakeOrderedAndProject. Output schema = [[search]]
    * plus a leading `query_id`. */
  def searchBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int = 5): DataFrame =
    searchInBatch(spark, spark.read.parquet(indexDir), queries, k)

  /** Batch twin of [[searchTagRange]] (the G23/G26 pattern): many
    * queries against one time window, one zone-map-pruned plan. */
  def searchTagRangeBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], lo: Long, hi: Long, k: Int = 5): DataFrame =
    searchInBatch(spark,
      graft.sources.ZoneMaps.readRange(spark, indexDir, "batch_tag", lo, hi),
      queries, k)

  private[operators] def searchInBatch(spark: SparkSession, index: DataFrame,
      queries: Seq[String], k: Int): DataFrame = {
    val qdf = { import spark.implicits._
      queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("query_id", "qtext") }
    val q = qdf
      .withColumn("qraw", rawWeights(col("qtext")))
      .withColumn("qbucket", bucketOf(col("qraw")))
      .select(col("query_id"), col("qraw"), explode(array(
        col("qbucket") +: (0 until Planes).map(p =>
          col("qbucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"))
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index.join(broadcast(q), "bucket")
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), col("chunk"),
        score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("query_id", "rank")
  }

  /** Diversity-aware serving path: MMR (maximal marginal relevance,
    * Carbonell & Goldstein 1998) re-ranking over a relevance shortlist —
    * the standard RAG retrieval step plain top-k lacks: near-duplicate
    * chunks crowd out coverage, so each pick maximizes
    * λ·rel(q,c) − (1−λ)·max sim(c, selected). The shortlist comes from
    * [[search]] (distributed: bucket-pruned scan + TakeOrderedAndProject);
    * the greedy selection runs on the driver over the ≤`shortlist`
    * collected candidates — MMR is inherently sequential (each pick
    * depends on the previous picks), and a k×shortlist greedy over a
    * bounded set is exactly the industrial shape: distribute the scan,
    * finish the tiny sequential tail locally (same reasoning as C6's
    * gated union-find finish). All similarities are exact int64 dots of
    * the stored quantized weights with IEEE division at the end;
    * deterministic ties (score desc, doc_id, chunk_ix), so the result
    * is reproducible run-to-run. */
  def searchDiverse(spark: SparkSession, indexDir: String, query: String,
      k: Int = 5, shortlist: Int = 50, lambdaRel: Double = 0.7): DataFrame = {
    import spark.implicits._
    val cands = search(spark, indexDir, query, shortlist)
      .select("doc_id", "chunk_ix", "chunk", "score")
    val index = spark.read.parquet(indexDir)
      .select(col("doc_id"), col("chunk_ix"), col("raw"))
    val rows = cands.join(index, Seq("doc_id", "chunk_ix"))
      .select(col("doc_id"), col("chunk_ix"), col("chunk"), col("score"),
        col("raw"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3),
        r.getSeq[Long](4).toArray))
      .sortBy { case (d, cx, _, s, _) => (-s, d, cx) }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0L || nb == 0L) 0.0
      else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, String, Double, Array[Long])]
    val remaining = scala.collection.mutable.ArrayBuffer(rows: _*)
    while (selected.size < k && remaining.nonEmpty) {
      val best = remaining.zipWithIndex.map { case (c, ix) =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => cos(c._5, s._5)).max
        val mmr = lambdaRel * c._4 - (1 - lambdaRel) * maxSim
        (mmr, c, ix)
      }.minBy { case (mmr, c, _) => (-mmr, c._1, c._2) }
      selected += best._2
      remaining.remove(best._3)
    }
    selected.zipWithIndex
      .map { case ((d, cx, chunk, rel, _), i) => (i + 1, d, cx, chunk, rel) }
      .toSeq.toDF("rank", "doc_id", "chunk_ix", "chunk", "score")
  }

  /** Compressed serving path: IVF-PQ over the store (B8's machinery
    * composed onto the index). The probed LSH partitions are scanned
    * reading ONLY (ids, bucket, codes) — column pruning keeps the raw
    * vectors, embeddings and chunk text out of the ADC scan, which is
    * what makes a 100 TB store searchable: per-chunk state at scan time
    * is PqM small ints. The query builds one broadcast M×K distance
    * table; approximate distance is a per-code table-lookup sum; the
    * top-`shortlist` ADC candidates are then exact-re-ranked (B9) by
    * fetching their raw vectors from the same probed partitions. Output
    * schema matches [[search]]. */
  def searchCompressed(spark: SparkSession, indexDir: String, query: String,
      k: Int = 5, shortlist: Int = 50): DataFrame = {
    val index = spark.read.parquet(indexDir)
    val codebook = spark.read.parquet(s"$indexDir/$PqDir/codebook.parquet")
    val qvec = { import spark.implicits._; Seq(query).toDF("qtext") }
    val q = qvec
      .withColumn("qraw", rawWeights(col("qtext")))
      .withColumn("qbucket", bucketOf(col("qraw")))
    val probes = q.select(col("qraw"), explode(array(
      col("qbucket") +: (0 until Planes).map(p =>
        col("qbucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"))
    // ADC table: exact int64 subspace distances query ↔ every centroid,
    // over the store's frozen OPQ layout (identity for pre-perm stores)
    val perm = readPerm(spark, indexDir).getOrElse(0 until Dim)
    val dtab = q
      .select(posexplode(subvecs(permuteRaw(col("qraw"), perm))))
      .select(col("pos").as("m"), col("col").as("qsub"))
      .join(broadcast(codebook), "m")
      .select(col("m").as("dm"), col("j").as("dj"),
        call_function("graft_sqdist_l", col("qsub"), col("cent")).as("qdist"))
    // shortlist via TakeOrderedAndProject, not a global-window rank —
    // the ADC scan's candidate set is the whole probed region
    val adcShortlist = index
      .join(broadcast(probes.select("bucket")), "bucket")
      .select(col("doc_id"), col("chunk_ix"), posexplode(col("codes")))
      .select(col("doc_id"), col("chunk_ix"),
        col("pos").as("m"), col("col").as("code"))
      .join(broadcast(dtab),
        col("m") === col("dm") && col("code") === col("dj"))
      .groupBy("doc_id", "chunk_ix")
      .agg(sum("qdist").as("adist"))
      .orderBy(col("adist"), col("doc_id"), col("chunk_ix"))
      .limit(shortlist)
      .select("doc_id", "chunk_ix")
    // exact re-rank of the shortlist only (B9): fetch raw + text by key
    // from the probed partitions
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    // shortlist is ≤ `shortlist` rows — rank after the distributed top-k
    val w = Window.orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index
      .join(broadcast(probes), "bucket")
      .join(broadcast(adcShortlist), Seq("doc_id", "chunk_ix"))
      .select(col("doc_id"), col("chunk_ix"), col("chunk"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
      .limit(k)
      .withColumn("rank", row_number().over(w))
      .select("rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("rank")
  }

  /** Batch twin of [[searchCompressed]]: MANY queries through ONE IVF-PQ
    * plan. The per-query ADC distance tables are one broadcast relation
    * keyed by `query_id` (nq·M·K small rows); the codes-only scan joins
    * it by (query_id, m, code), so the approximate ranking — and the
    * exact re-rank that follows — both window BY QUERY, never funneling
    * the whole probed region into one partition. A RAG eval sweep over
    * the compressed index is one job, not one plan per query. Output
    * schema = [[searchCompressed]] plus a leading `query_id`. */
  def searchCompressedBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int = 5, shortlist: Int = 50): DataFrame = {
    val index = spark.read.parquet(indexDir)
    val codebook = spark.read.parquet(s"$indexDir/$PqDir/codebook.parquet")
    val qdf = { import spark.implicits._
      queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("query_id", "qtext") }
      .withColumn("qraw", rawWeights(col("qtext")))
      .withColumn("qbucket", bucketOf(col("qraw")))
    val probes = qdf.select(col("query_id"), explode(array(
      col("qbucket") +: (0 until Planes).map(p =>
        col("qbucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"))
    // per-query ADC tables, one broadcast relation keyed by query_id,
    // over the store's frozen OPQ layout (identity for pre-perm stores)
    val perm = readPerm(spark, indexDir).getOrElse(0 until Dim)
    val dtab = qdf
      .select(col("query_id"), posexplode(subvecs(permuteRaw(col("qraw"), perm))))
      .select(col("query_id"), col("pos").as("m"), col("col").as("qsub"))
      .join(broadcast(codebook), "m")
      .select(col("query_id").as("dq"), col("m").as("dm"), col("j").as("dj"),
        call_function("graft_sqdist_l", col("qsub"), col("cent")).as("qdist"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("doc_id"), col("chunk_ix"))
    val adcShortlist = index
      .join(broadcast(probes), "bucket")
      .select(col("query_id"), col("doc_id"), col("chunk_ix"),
        posexplode(col("codes")))
      .select(col("query_id"), col("doc_id"), col("chunk_ix"),
        col("pos").as("m"), col("col").as("code"))
      .join(broadcast(dtab), col("query_id") === col("dq")
        && col("m") === col("dm") && col("code") === col("dj"))
      .groupBy("query_id", "doc_id", "chunk_ix")
      .agg(sum("qdist").as("adist"))
      .withColumn("ark", row_number().over(wAdc))
      .filter(col("ark") <= shortlist)
      .select("query_id", "doc_id", "chunk_ix")
    // exact re-rank: fetch raw + text for the ≤ nq·shortlist survivors
    // from the probed partitions only, attach each query's qraw by key
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index
      .join(broadcast(probes.select("bucket").distinct()), "bucket")
      .join(broadcast(adcShortlist), Seq("doc_id", "chunk_ix"))
      .join(broadcast(qdf.select("query_id", "qraw")), "query_id")
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), col("chunk"),
        score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("query_id", "rank")
  }

  /** B20 serving path: Matryoshka truncated-dimension search. The eval
    * (`vec_mrl_recall`, Similarity.scala) measures the recall-vs-cost
    * trade of scoring on a PREFIX of the vector; this serves it: the
    * probed candidates are shortlisted by exact int64 dots over the
    * first `dims` components only — per-candidate cost shrinks by
    * Dim/dims, the whole point of MRL serving — and the ≤`shortlist`
    * survivors are re-ranked at FULL width (the B9 re-rank discipline,
    * same as [[searchCompressed]]'s ADC→exact tail). `dims = Dim`
    * degenerates to the exact ranking, spec-pinned rank-for-rank equal
    * to [[search]]. Delegates to the batch twin (one machinery). Output
    * schema = [[search]].
    *
    * Truncation basis (r10, explicit): the PREFIX OF THE STORED RAW
    * LAYOUT — i.e. the pre-permutation order. MRL semantics live in the
    * embedder's own dimension order (a Matryoshka model front-loads
    * information into the leading dims it was trained with), while the
    * G38 OPQ permutation reorders dims to balance ENERGY across PQ
    * subspaces — the two bases do not commute: a prefix of the permuted
    * layout would mix late dims in and drop early ones, destroying
    * exactly the property MRL truncation relies on. So on a store WITH a
    * perm sidecar, truncated serving deliberately ignores the
    * permutation (it applies only to the PQ/ADC coding path, where
    * subspace balance is what matters), and both contracts hold at once:
    * dims=Dim ≡ [[search]] rank-for-rank, and ADC queries keep the
    * frozen permuted subspaces. Spec-pinned against an OPQ store with a
    * verified non-identity permutation (VectorStoreSpec). */
  def searchTruncated(spark: SparkSession, indexDir: String, query: String,
      k: Int = 5, dims: Int = 16, shortlist: Int = 50): DataFrame =
    searchTruncatedBatch(spark, indexDir, Seq(query), k, dims, shortlist)
      .drop("query_id")

  /** Batch twin of [[searchTruncated]] (the G23/G26/G31 shape): many
    * queries through ONE truncated-then-exact plan — the truncated
    * shortlist and the full-width re-rank both window BY QUERY. Output
    * schema = [[searchBatch]]. */
  def searchTruncatedBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int = 5, dims: Int = 16,
      shortlist: Int = 50): DataFrame = {
    require(dims >= 1 && dims <= Dim, s"dims must be in [1, $Dim], got $dims")
    val index = spark.read.parquet(indexDir)
    val qdf = { import spark.implicits._
      queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("query_id", "qtext") }
      .withColumn("qraw", rawWeights(col("qtext")))
      .withColumn("qbucket", bucketOf(col("qraw")))
    val probes = qdf.select(col("query_id"), col("qraw"), explode(array(
      col("qbucket") +: (0 until Planes).map(p =>
        col("qbucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"))
    // phase 1: truncated scoring — prefix slices on both sides, exact
    // int64 dot, cosine over the TRUNCATED norms (the score a dims-wide
    // store would compute; ranking on it is what vec_mrl_recall grades)
    val rawT = slice(col("raw"), 1, dims)
    val qrawT = slice(col("qraw"), 1, dims)
    val dotT = call_function("graft_dot_l", rawT, qrawT)
    val ssCT = call_function("graft_dot_l", rawT, rawT)
    val ssQT = call_function("graft_dot_l", qrawT, qrawT)
    val scoreT = when(ssCT > 0 && ssQT > 0,
      dotT.cast("double") / (sqrt(ssCT.cast("double")) * sqrt(ssQT.cast("double"))))
      .otherwise(lit(0.0d))
    val wT = Window.partitionBy("query_id")
      .orderBy(col("tscore").desc, col("doc_id"), col("chunk_ix"))
    val short = index
      .join(broadcast(probes), "bucket")
      .select(col("query_id"), col("doc_id"), col("chunk_ix"),
        scoreT.as("tscore"))
      // no distinct: a chunk lives in exactly one bucket partition and a
      // query's 9 probe values are pairwise distinct, so each (query,
      // chunk) scores once (same invariant as searchBatch)
      .withColumn("trk", row_number().over(wT))
      .filter(col("trk") <= shortlist)
      .select("query_id", "doc_id", "chunk_ix")
    // phase 2: full-width exact re-rank of the ≤ nq·shortlist survivors,
    // fetched from the probed partitions only
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index
      .join(broadcast(probes.select("bucket").distinct()), "bucket")
      .join(broadcast(short), Seq("doc_id", "chunk_ix"))
      .join(broadcast(qdf.select("query_id", "qraw")), "query_id")
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), col("chunk"),
        score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("query_id", "rank")
  }

  /** Learned-cell IVF serving path: probe the query's top-`nprobe`
    * k-means cells (by exact centroid score, the B5 probing rule) and
    * exact-rank ONLY inside those cells' directories — `cell` is a
    * partition column, so the pruning is directory-level, and the probe
    * list is literal (collected from the K-row sidecar), so the pruning
    * is static, not even DPP. The measured case for learned cells over
    * hash buckets is IvfCellQualitySpec: Voronoi cells concentrate true
    * neighbors, recall clears the scan fraction; random partitions
    * don't. Output schema matches [[search]]. */
  def searchCells(spark: SparkSession, indexDir: String, query: String,
      k: Int = 5, nprobe: Int = 2): DataFrame = {
    val centroids = spark.read.parquet(s"$indexDir/$CellsDir/centroids.parquet")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    val qvec = { import spark.implicits._; Seq(query).toDF("qtext") }
    val qraw = qvec.select(rawWeights(col("qtext")).as("qraw"))
      .collect().head.getSeq[Long](0).toArray
    // cell ranking = the assignment rule itself ([[probeCellsFor]]):
    // top-nprobe by exact min-sqdist score, ties to the smaller cell id
    val probeCells = probeCellsFor(centroids, qraw, nprobe)
    val index = spark.read.parquet(indexDir)
      .filter(col("cell").isInCollection(probeCells))
    val qdf = qvec.select(rawWeights(col("qtext")).as("qraw"))
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    // distributed top-k over the probed cells, rank the k survivors
    val w = Window.orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index.join(broadcast(qdf))
      .select(col("doc_id"), col("chunk_ix"), col("chunk"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
      .limit(k)
      .withColumn("rank", row_number().over(w))
      .select("rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("rank")
  }

  /** Batch twin of [[searchCells]]: MANY queries through ONE cell-probed
    * plan. Probe selection stays driver-side (it is nq × K exact dots
    * against the K-row frozen centroid sidecar — the same bounded
    * arithmetic the single path does once); the scan then reads the
    * UNION of all probed cell directories once, a broadcast
    * (query_id, cell) probe list restricts each candidate row to the
    * queries that probed its cell, and ranking windows by query. Output
    * schema = [[searchCells]] plus a leading `query_id`. */
  def searchCellsBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int = 5, nprobe: Int = 2): DataFrame =
    cellsBatchIn(spark, indexDir, queries, k, nprobe, None)

  /** Metadata-filtered cell serving (r16 — Weaviate's `where`-filtered
    * search, the most-used store read after plain top-k; the reference's
    * schema exists precisely to filter on: Channel_Name/Message_Author/
    * Message_Date, VectorDatabase/VectorDatabase.py:46-57). `pred` is
    * any Column predicate over index columns — conventionally the
    * `meta` map ingested with the docs batch, e.g.
    * `element_at(col("meta"), "channel") === "ops"`.
    *
    * B21's PRE-filter discipline: the predicate folds into the
    * cell-probed scan BELOW the rank window — never a post-filter over
    * an unfiltered top-k, so a selective predicate still fills all k
    * slots from the probed cells' matching rows (post-filtering would
    * under-fill). Semantics: exact top-k among the probed cells' rows
    * satisfying `pred` (the recall caveat vs a full scan is the same
    * cell-probing tradeoff every cells read documents). A store written
    * before metadata existed refuses a meta-referencing predicate
    * loudly — re-ingest to upgrade (the append-can't-backfill rule). */
  def searchCellsFiltered(spark: SparkSession, indexDir: String,
      query: String, pred: Column, k: Int = 5, nprobe: Int = 2): DataFrame =
    searchCellsFilteredBatch(spark, indexDir, Seq(query), pred, k, nprobe)
      .drop("query_id")

  /** Batch twin of [[searchCellsFiltered]] (the G23/G26 pattern): many
    * queries, one filtered cell-probed plan. Rank-for-rank identical to
    * the single read per query. */
  def searchCellsFilteredBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], pred: Column, k: Int = 5, nprobe: Int = 2)
      : DataFrame = {
    requireFilterable(spark, indexDir, pred)
    cellsBatchIn(spark, indexDir, queries, k, nprobe, Some(pred))
  }

  /** Loud legacy gate for predicate-taking reads: every column the
    * predicate references must exist in the index schema. A pre-meta
    * store (or a typo'd key) fails HERE with the re-ingest message, not
    * deep inside analysis. */
  private[operators] def requireFilterable(spark: SparkSession,
      indexDir: String, pred: Column): Unit = {
    try spark.read.parquet(indexDir).filter(pred).schema
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"store $indexDir cannot serve this predicate " +
            s"(${e.getSimpleMessage}): if it references `meta`, the store " +
            "was written before that metadata existed — re-ingest to " +
            "upgrade (an append cannot backfill `meta` for rows already " +
            "on disk)", e)
    }
    ()
  }

  /** Profile hook: the cells each query would probe (the serving reads'
    * own driver-side selection) — lets churn/skew profiles report the
    * SCAN FRACTION a probe budget costs, the quantity frozen-cell drift
    * actually degrades (a drifted append swelling one frozen cell makes
    * every probe of it scan that fraction of the corpus). */
  private[graft] def probedCells(spark: SparkSession, indexDir: String,
      queries: Seq[String], nprobe: Int): Map[Long, Seq[Int]] = {
    val centroids = spark.read.parquet(s"$indexDir/$CellsDir/centroids.parquet")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    import spark.implicits._
    val qraws = queries.toDF("qtext")
      .select(rawWeights(col("qtext")).as("qraw"))
      .collect().map(_.getSeq[Long](0).toArray)
    qraws.zipWithIndex.map { case (qraw, i) =>
      i.toLong -> probeCellsFor(centroids, qraw, nprobe)
    }.toMap
  }

  /** The shared cell-probed batch plan: probe selection driver-side
    * against the K-row frozen centroid sidecar, directory-pruned scan of
    * the probed cells' union, optional predicate folded in BELOW the
    * per-query rank window (the filtered read's pre-filter bar), then
    * broadcast (query_id, cell) restriction + per-query top-k. */
  private def cellsBatchIn(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int, nprobe: Int,
      pred: Option[Column]): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$indexDir/$CellsDir/centroids.parquet")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    val qdf = queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("query_id", "qtext")
      .withColumn("qraw", rawWeights(col("qtext")))
      .select("query_id", "qraw")
    val qraws = qdf.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val probePairs = qraws.flatMap { case (qid, qraw) =>
      probeCellsFor(centroids, qraw, nprobe).map(cell => (qid, cell))
    }.toSeq
    val probes = probePairs.toDF("query_id", "cell")
    val scanned = spark.read.parquet(indexDir)
      .filter(col("cell").isInCollection(probePairs.map(_._2).distinct))
    val index = pred.fold(scanned)(scanned.filter)
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index.join(broadcast(probes), "cell")
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), col("chunk"),
        score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("query_id", "rank")
  }

  /** G46 (r13): MMR-diversified BATCH serving read — [[searchDiverse]]'s
    * semantics (λ·cos(q,c) − (1−λ)·max-cos(c, selected), λ a pure
    * preference knob since relevance and redundancy share the cosine
    * scale) with BOTH of that method's driver affinities removed: the
    * shortlist is the CELL-probed scan (directory-pruned, the
    * searchCellsBatch machinery, raw vectors kept in the shortlist so no
    * second index pass), and the greedy runs as k bounded DataFrame
    * steps — no vector ever reaches the driver, and MANY queries
    * diversify through ONE plan (the G23/G26 batch discipline).
    * Deterministic: every argmax breaks ties on (doc_id, chunk_ix).
    *
    * Scale shape: the greedy never touches the index — the shortlist
    * (queries × `shortlist`) and its pair table (× shortlist−1)
    * checkpoint once; each step is a keyed join + window over those
    * bounded relations. Rank 1 always equals [[searchCellsBatch]]'s
    * rank 1 (no penalty yet), so relevance-first callers lose nothing.
    * Output schema = [[searchCellsBatch]] plus the `mmr` objective. */
  def searchDiverseBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int = 5, nprobe: Int = 2,
      shortlist: Int = 20, lambda: Double = 0.7): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$indexDir/$CellsDir/centroids.parquet")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    val qdf = queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("query_id", "qtext")
      .withColumn("qraw", rawWeights(col("qtext")))
      .select("query_id", "qraw")
    val qraws = qdf.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val probePairs = qraws.flatMap { case (qid, qraw) =>
      probeCellsFor(centroids, qraw, nprobe).map(cell => (qid, cell))
    }.toSeq
    val probes = probePairs.toDF("query_id", "cell")
    val index = spark.read.parquet(indexDir)
      .filter(col("cell").isInCollection(probePairs.map(_._2).distinct))
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val relScore = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    val cand = index.join(broadcast(probes), "cell")
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), col("chunk"),
        col("raw"), relScore.as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= shortlist)
      .drop("rk")
      .localCheckpoint(true)
    val xs = cand.select(col("query_id"), col("doc_id").as("xd"),
      col("chunk_ix").as("xi"), col("raw").as("xr"))
    val ys = cand.select(col("query_id"), col("doc_id").as("yd"),
      col("chunk_ix").as("yi"), col("raw").as("yr"))
    val dXY = call_function("graft_dot_l", col("xr"), col("yr"))
    val ssX = call_function("graft_dot_l", col("xr"), col("xr"))
    val ssY = call_function("graft_dot_l", col("yr"), col("yr"))
    val cosXY = when(ssX > 0 && ssY > 0,
      dXY.cast("double") / (sqrt(ssX.cast("double")) * sqrt(ssY.cast("double"))))
      .otherwise(lit(0.0d))
    val sims = xs.join(ys, Seq("query_id"))
      .filter(col("xd") =!= col("yd") || col("xi") =!= col("yi"))
      .select(col("query_id"), col("xd"), col("xi"), col("yd"), col("yi"),
        cosXY.as("cos"))
      .localCheckpoint(true)
    var sel = cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("query_id"), lit(1L).as("rank"), col("doc_id"),
        col("chunk_ix"), col("chunk"), col("score"),
        (lit(lambda) * col("score")).as("mmr"))
      .localCheckpoint(true)
    for (step <- 2 to k) {
      val pen = sims
        .join(sel.select(col("query_id"), col("doc_id").as("yd"),
          col("chunk_ix").as("yi")), Seq("query_id", "yd", "yi"))
        .groupBy("query_id", "xd", "xi").agg(max("cos").as("pen"))
        .withColumnRenamed("xd", "doc_id").withColumnRenamed("xi", "chunk_ix")
      val wM = Window.partitionBy("query_id")
        .orderBy(col("mmr").desc, col("doc_id"), col("chunk_ix"))
      val pick = cand
        .join(sel.select("query_id", "doc_id", "chunk_ix"),
          Seq("query_id", "doc_id", "chunk_ix"), "left_anti")
        .join(pen, Seq("query_id", "doc_id", "chunk_ix"))
        .withColumn("mmr",
          lit(lambda) * col("score") - lit(1.0 - lambda) * col("pen"))
        .withColumn("rk", row_number().over(wM))
        .filter(col("rk") === 1)
        .select(col("query_id"), lit(step.toLong).as("rank"), col("doc_id"),
          col("chunk_ix"), col("chunk"), col("score"), col("mmr"))
      sel = sel.unionByName(pick).localCheckpoint(true)
    }
    sel.orderBy("query_id", "rank")
  }

  /** r10: the store-side IVFPQ serving read — the full FAISS composition
    * over frozen sidecars: learned-cell probing (directory-level `cell=`
    * pruning, the searchCells rule) → residual-ADC shortlist over the
    * stored `rcodes` (codes only — no raw vector is read in the scan;
    * residuals share one fixed-point scale, so ADC sums compare across
    * probed cells with NO per-candidate division) → exact full-width
    * re-rank of the ≤ shortlist survivors (the B9 tail, same as
    * [[searchCompressed]]). Every sidecar it reads froze at creation and
    * is reused by appends, so codes from any batch compare. A store
    * created before residual coding existed has no rcodes at all —
    * appends keep it that way (ingest's legacyRes rule) and this read
    * refuses it loudly rather than silently dropping the legacy rows. */
  def searchCompressedCells(spark: SparkSession, indexDir: String,
      query: String, k: Int = 5, nprobe: Int = 2,
      shortlist: Int = 50): DataFrame =
    searchCompressedCellsBatch(spark, indexDir, Seq(query), k, nprobe,
      shortlist).drop("query_id")

  /** Batch twin of [[searchCompressedCells]] (the G23/G26 shape): many
    * queries through ONE probed/ADC/re-rank plan, every ranking windowed
    * per query. Output schema = [[searchBatch]]. */
  def searchCompressedCellsBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int = 5, nprobe: Int = 2,
      shortlist: Int = 50): DataFrame = {
    import spark.implicits._
    // refuse loudly on a store with no residual sidecar (created before
    // the rcodes column existed, and kept rcodes-free by appends — the
    // ingest legacyRes rule): scanning a missing column would silently
    // drop every legacy row from the ADC ranking instead
    val resCbCheck = s"$indexDir/$PqDir/$ResCbFile"
    require(org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(resCbCheck)),
      s"searchCompressedCells needs the residual codebook sidecar at " +
        s"$resCbCheck — this store predates residual coding (no rcodes); " +
        "re-ingest it (mode=overwrite) to serve the compressed-cells path")
    val centroids = spark.read.parquet(s"$indexDir/$CellsDir/centroids.parquet")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    val qdf = queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("query_id", "qtext")
      .withColumn("qraw", rawWeights(col("qtext")))
      .select("query_id", "qraw")
    val qraws = qdf.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    // coarse probe: the assignment-aligned rule ([[probeCellsFor]]) over
    // the K-row summary — exact int64 numerators, one IEEE division each
    val probePairs = qraws.flatMap { case (qid, qraw) =>
      probeCellsFor(centroids, qraw, nprobe).map(cell => (qid, cell))
    }.toSeq
    val probes = probePairs.toDF("query_id", "cell")
    val cmeans = centroids
      .map { case (cell, csum, n) => (cell, cmeanScaled(csum, n)) }
      .toSeq.toDF("cell", "cmean")
    val rescb = spark.read.parquet(s"$indexDir/$PqDir/$ResCbFile")
    // per probed (query, cell): the query's scaled residual against THAT
    // cell's frozen mean, tabled against the global residual codebook —
    // O(queries · nprobe · M · K) rows, broadcast
    val dtab = qdf.join(broadcast(probes), "query_id")
      .join(broadcast(cmeans), "cell")
      .withColumn("qres", scaledResidual(col("qraw"), col("cmean")))
      .select(col("query_id"), col("cell"), posexplode(subvecs(col("qres"))))
      .select(col("query_id"), col("cell"), col("pos").as("m"),
        col("col").as("sub"))
      .join(broadcast(rescb), "m")
      .withColumn("qdist", call_function("graft_sqdist_l", col("sub"), col("cent")))
      .select("query_id", "cell", "m", "j", "qdist")
    val index = spark.read.parquet(indexDir)
      .filter(col("cell").isInCollection(probePairs.map(_._2).distinct))
    // phase 1: ADC over stored codes — the scan reads (cell, ids, rcodes)
    val wT = Window.partitionBy("query_id")
      .orderBy(col("adist"), col("doc_id"), col("chunk_ix"))
    val short = index
      .select(col("cell"), col("doc_id"), col("chunk_ix"),
        posexplode(col("rcodes")))
      .select(col("cell"), col("doc_id"), col("chunk_ix"),
        col("pos").as("m"), col("col").as("code"))
      .join(broadcast(dtab), Seq("cell", "m"))
      .filter(col("code") === col("j"))
      .groupBy("query_id", "doc_id", "chunk_ix")
      .agg(sum("qdist").as("adist"))
      .withColumn("trk", row_number().over(wT))
      .filter(col("trk") <= shortlist)
      .select("query_id", "doc_id", "chunk_ix")
    // phase 2: exact full-width cosine re-rank of the survivors
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index.join(broadcast(short), Seq("doc_id", "chunk_ix"))
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), col("chunk"),
        score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("query_id", "rank")
  }

  /** G44 (r12): SQ8 serving read — the recall rung BETWEEN the
    * raw-vector cell scan ([[searchCells]]: exact scores, 8-byte
    * decoded dims) and the residual-PQ ADC ([[searchCompressedCells]]:
    * M codes per chunk, coarsest): learned-cell probing → int8-code ADC
    * shortlist (1-byte decoded width per dim instead of 8) → exact
    * full-width re-rank of the survivors. Measured rung: recall@5 0.74
    * between exact-cells 0.82 and PQ 0.68 at the same probe budget
    * (bench/store_recall_r12.json). The ADC d·Σ q_i·code_i is exact
    * int64 (the per-chunk scale factorizes out — B6/B15's scheme), so
    * the shortlist order is deterministic. No trained sidecar: each row
    * self-scales, so codes from ANY batch compare and splice
    * maintenance never touches them. A store written before the scodes
    * column existed is refused loudly, mirroring the compressed-cells
    * legacy rule. Honest cost scope (bench/store_sq8_r12.json): on this
    * corpus the PARQUET-encoded codes column is byte-parity with raw
    * (both are low-entropy small ints) and at sf0.1 the extra
    * shortlist→re-rank phase costs more wall than the scan saves — the
    * rung pays in scan-bound regimes over high-entropy vectors; at toy
    * scale its measured value is the recall ladder position. */
  def searchSq8Cells(spark: SparkSession, indexDir: String,
      query: String, k: Int = 5, nprobe: Int = 2,
      shortlist: Int = 50): DataFrame =
    searchSq8CellsBatch(spark, indexDir, Seq(query), k, nprobe, shortlist)
      .drop("query_id")

  /** Batch twin of [[searchSq8Cells]] — many queries through ONE
    * probed/ADC/re-rank plan. Output schema = [[searchBatch]]. */
  def searchSq8CellsBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int = 5, nprobe: Int = 2,
      shortlist: Int = 50): DataFrame = {
    import spark.implicits._
    // refuse loudly on a pre-sq8 store (no scodes column — kept that way
    // by appends): scanning the missing column would fail inference or
    // silently drop legacy rows, the same failure mode the rescb rule
    // guards against
    require(spark.read.parquet(indexDir).schema.fieldNames.contains("scodes"),
      s"searchSq8Cells needs the scodes column — this store predates SQ8 " +
        "coding; re-ingest it (mode=overwrite) to serve the sq8 path")
    val centroids = spark.read.parquet(s"$indexDir/$CellsDir/centroids.parquet")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    val qdf = queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("query_id", "qtext")
      .withColumn("qraw", rawWeights(col("qtext")))
      .select("query_id", "qraw")
    val qraws = qdf.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val probePairs = qraws.flatMap { case (qid, qraw) =>
      probeCellsFor(centroids, qraw, nprobe).map(cell => (qid, cell))
    }.toSeq
    val probes = probePairs.toDF("query_id", "cell")
    val index = spark.read.parquet(indexDir)
      .filter(col("cell").isInCollection(probePairs.map(_._2).distinct))
    // phase 1: SQ8 ADC shortlist — the scan reads (cell, ids, scodes,
    // sscale); the exact raw vector is NOT touched until the tail
    val wT = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("doc_id"), col("chunk_ix"))
    val short = index
      .select(col("cell"), col("doc_id"), col("chunk_ix"),
        col("scodes"), col("sscale"))
      .join(broadcast(probes), "cell")
      .join(broadcast(qdf), "query_id")
      .withColumn("adc",
        call_function("graft_dot_l", col("scodes"), col("qraw")) * col("sscale"))
      .withColumn("trk", row_number().over(wT))
      .filter(col("trk") <= shortlist)
      .select("query_id", "doc_id", "chunk_ix")
    // phase 2: exact full-width cosine re-rank of the survivors
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index.join(broadcast(short), Seq("doc_id", "chunk_ix"))
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), col("chunk"),
        score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("query_id", "rank")
  }

  /** G47 (r13): the JL-projected cell read — B28's dimension-reduction
    * rung on the store, completing the compression-axis pair: scodes
    * shrinks the ELEMENT (8→1 byte decoded, full dim count), pcodes
    * shrinks the DIM COUNT (32→16 coordinates, full-width elements). The
    * shortlist scan evaluates a 16-element int64 dot per candidate (2×
    * fewer multiplies and decoded elements than the raw scan), then the
    * exact full-width cosine re-ranks the ≤shortlist survivors — the
    * B9 refine tail, so served scores are exact. No trained artifact
    * (the sign matrix is a code literal): appends, edits and splices
    * are consistent by construction, exactly the scodes discipline. A
    * store written before the pcodes column is refused loudly. */
  def searchRpCells(spark: SparkSession, indexDir: String,
      query: String, k: Int = 5, nprobe: Int = 2,
      shortlist: Int = 50): DataFrame =
    searchRpCellsBatch(spark, indexDir, Seq(query), k, nprobe, shortlist)
      .drop("query_id")

  /** Batch twin of [[searchRpCells]] — many queries through ONE
    * probed/projected/re-rank plan. Output schema = [[searchBatch]]. */
  def searchRpCellsBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int = 5, nprobe: Int = 2,
      shortlist: Int = 50): DataFrame = {
    import spark.implicits._
    require(spark.read.parquet(indexDir).schema.fieldNames.contains("pcodes"),
      s"searchRpCells needs the pcodes column — this store predates JL " +
        "coding; re-ingest it (mode=overwrite) to serve the projected path")
    val centroids = spark.read.parquet(s"$indexDir/$CellsDir/centroids.parquet")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    val qdf = queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("query_id", "qtext")
      .withColumn("qraw", rawWeights(col("qtext")))
      .withColumn("qp", rpProject(col("qraw")))
      .select("query_id", "qraw", "qp")
    val qraws = qdf.select("query_id", "qraw").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val probePairs = qraws.flatMap { case (qid, qraw) =>
      probeCellsFor(centroids, qraw, nprobe).map(cell => (qid, cell))
    }.toSeq
    val probes = probePairs.toDF("query_id", "cell")
    val index = spark.read.parquet(indexDir)
      .filter(col("cell").isInCollection(probePairs.map(_._2).distinct))
    // phase 1: projected-dot shortlist — the scan reads (cell, ids,
    // pcodes); neither raw nor chunk is touched until the tail
    val wT = Window.partitionBy("query_id")
      .orderBy(col("pdot").desc, col("doc_id"), col("chunk_ix"))
    val short = index
      .select(col("cell"), col("doc_id"), col("chunk_ix"), col("pcodes"))
      .join(broadcast(probes), "cell")
      .join(broadcast(qdf.select("query_id", "qp")), "query_id")
      .withColumn("pdot", call_function("graft_dot_l", col("pcodes"), col("qp")))
      .withColumn("trk", row_number().over(wT))
      .filter(col("trk") <= shortlist)
      .select("query_id", "doc_id", "chunk_ix")
    // phase 2: exact full-width cosine re-rank of the survivors
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index.join(broadcast(short), Seq("doc_id", "chunk_ix"))
      .join(broadcast(qdf.select("query_id", "qraw")), "query_id")
      .select(col("query_id"), col("doc_id"), col("chunk_ix"), col("chunk"),
        score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("query_id", "rank")
  }

  /** Targeted delete — the engine-side analog of the reference's
    * `_delete_knowledge_chunks` (KnowledgeBot.py:351-379), which removes a
    * message's chunks before an #EDIT re-export. Spark-native shape:
    * find the buckets that contain the victim docs, then rewrite ONLY
    * those partitions (dynamic partition overwrite) with the surviving
    * rows — untouched buckets keep their files, so the rewrite cost
    * scales with the victims' bucket footprint, not the index size.
    * Returns the number of chunk rows removed. An #EDIT reprocess is
    * [[edit]] — `delete(ids)` + `ingest(append)` with the graph sidecar
    * maintained through both splices.
    *
    * Crash safety: the multi-step mutation (partition overwrite, then
    * explicit drop of fully-victim bucket dirs) is journaled. A pending
    * intent manifest — (docIds, buckets) — is committed (write + rename)
    * under `_graft_manifest/` BEFORE any data is touched and retired only
    * after the last step; [[recover]] replays pending manifests, and the
    * replay is idempotent at every interruption point because each step
    * re-derives its work from the current on-disk state (victims already
    * gone ⇒ no rewrite; bucket dir already dropped ⇒ no-op delete). */
  private val GraphDir = "_graft_graph"
  private val GraphDegree = 8
  // serving defaults = the published graph_tune_r11 operating point
  // (bucket-seeded 32/32/4: recall@5 0.64 vs full-scan truth at fewer
  // score evaluations than the bucket multiprobe's own candidate count);
  // the r10 fixed-global-entry 8/8/4 config read 0.18 and stays
  // reachable via seedFromBuckets = false
  private val GraphEntries = 32
  private val GraphBeam = 32
  private val GraphHops = 4

  /** G31: DiskANN-style navigable-graph index sidecar. For every stored
    * chunk, the top-[[GraphDegree]] same-bucket neighbors by exact int64
    * inner product, written under `_graft_graph/` next to the PQ and
    * cell sidecars. The candidate generator is the store's OWN bucket
    * layout (the partition column — candidates are physically
    * co-located, never all-pairs), and the B11 fetch-after-distinct
    * discipline keeps the self-join carrying only keys: vectors attach
    * after the pair set is fixed. Appends splice through
    * [[spliceGraph]] (r9 — the background merge a real DiskANN ships,
    * re-solving only the touched buckets and pinned bit-equal to a
    * rebuild); deletes splice through [[spliceGraphDelete]] (r10 — the
    * victims' own buckets re-solve from raw candidates, also bit-equal).
    * Returns the edge count. */
  def buildGraph(spark: SparkSession, indexDir: String,
      degree: Int = GraphDegree): Long = {
    spark.catalog.refreshByPath(indexDir)
    val nodes = spark.read.parquet(indexDir)
      .select(struct(col("doc_id"), col("chunk_ix")).as("nid"),
        col("bucket"), col("raw"))
    val slim = nodes.select(col("nid"), col("bucket"))
    val cand = slim.alias("a")
      .join(slim.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.nid") =!= col("b.nid"))
      .select(col("a.nid").as("src"), col("b.nid").as("dst"))
    // edge rows land PARTITIONED BY the src's bucket: [[spliceGraph]]
    // then refreshes only the buckets an append touched (dynamic
    // partition overwrite), never the whole sidecar
    val edges = topEdges(spark, nodes, cand, degree)
    edges.write.mode("overwrite").partitionBy("sbucket")
      .parquet(s"$indexDir/$GraphDir/edges.parquet")
    // the build degree is part of the sidecar's identity: the splice
    // merge lemma top-d(old∪new) = top-d(top-d(old)∪new) only holds for
    // d ≤ build degree, so [[spliceGraph]] reads this back and refuses
    // a wider splice instead of silently diverging from a rebuild
    import spark.implicits._
    Seq(degree).toDF("degree").coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/$GraphDir/$DegreeFile")
    // per-bucket entry heads for the seeded walk — full rebuild here,
    // splice-maintained thereafter
    writeEntries(spark, indexDir, nodes, None)
    spark.read.parquet(s"$indexDir/$GraphDir/edges.parquet").count()
  }

  private val DegreeFile = "degree.parquet"
  private val EntriesFile = "entries.parquet"

  /** Per-bucket ENTRY sidecar (r11): each bucket's md5-top-
    * [[GraphEntries]] member ids, written next to the edge sidecar and
    * maintained by both splices — so the seeded walk's query-time
    * seeding is a sidecar read (O(buckets · width) rows, no index scan;
    * the same ingest-time-artifact discipline as the codebook/cells/
    * degree sidecars). `touched = None` rebuilds the whole sidecar from
    * `nodes`; `Some(buckets)` recomputes exactly those buckets from
    * `nodes` (which must hold their CURRENT members) and keeps every
    * other stored row — a bucket whose members all vanished loses its
    * rows. The entry pick is the md5 rank, so the maintained sidecar is
    * bit-equal to a from-scratch rebuild (spec-pinned). */
  private def writeEntries(spark: SparkSession, indexDir: String,
      nodes: DataFrame, touched: Option[Seq[Int]]): Unit = {
    val path = s"$indexDir/$GraphDir/$EntriesFile"
    val entryH = md5(concat_ws(":",
      col("nid.doc_id").cast("string"), col("nid.chunk_ix").cast("string")))
    val wB = Window.partitionBy("bucket")
      .orderBy(col("h"), col("nid.doc_id"), col("nid.chunk_ix"))
    val base = touched match {
      case None => nodes
      case Some(b) => nodes.filter(col("bucket").isInCollection(b))
    }
    val fresh = base.select(col("nid"), col("bucket"))
      .withColumn("h", entryH)
      .withColumn("rk", row_number().over(wB))
      .filter(col("rk") <= GraphEntries)
      .select(col("bucket"), col("h"),
        col("nid.doc_id").as("doc_id"), col("nid.chunk_ix").as("chunk_ix"),
        lit(GraphEntries).as("width"))
    val merged = touched match {
      case None => fresh
      case Some(b) =>
        spark.catalog.refreshByPath(path)
        spark.read.parquet(path)
          .filter(!col("bucket").isInCollection(b))
          .unionByName(fresh)
    }
    // materialize BEFORE the overwrite truncates its own input
    merged.localCheckpoint(true)
      .coalesce(1).write.mode("overwrite").parquet(path)
    spark.catalog.refreshByPath(path)
  }

  /** The degree [[buildGraph]] built the edge sidecar with: the degree
    * sidecar if present, else (legacy sidecar) the max stored per-src
    * list length — a lower bound that is exact whenever any bucket has
    * ≥ degree+1 members, and conservative (smaller) otherwise. */
  private def storedDegree(spark: SparkSession, indexDir: String): Int = {
    val p = s"$indexDir/$GraphDir/$DegreeFile"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(p)))
      spark.read.parquet(p).head().getInt(0)
    else Option(spark.read.parquet(s"$indexDir/$GraphDir/edges.parquet")
      .groupBy("src_doc", "src_ix").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().get(0))
      .map(_.asInstanceOf[Long].toInt)
      .getOrElse(0) // a fully-emptied legacy sidecar bounds nothing
  }

  /** Shared scoring tail of [[buildGraph]] and [[spliceGraph]]: attach
    * raw vectors to the candidate pair set, keep each src's top-`degree`
    * by COSINE (exact int64 dot and norms, one IEEE division — ties:
    * dst id, fully deterministic, so a splice and a rebuild agree
    * bit-for-bit). Cosine, not raw dot (r11): the serving walk ranks by
    * cosine, and edges ranked by dot point every list at the same
    * high-NORM hubs regardless of direction — a beam following
    * dot-edges under a cosine objective stalls on hubs, which is
    * exactly what the r10 recall rung measured (0.18). DiskANN's rule:
    * the graph's edge metric IS the serving metric. */
  private def topEdges(spark: SparkSession, nodes: DataFrame,
      cand: DataFrame, degree: Int): DataFrame = {
    val dot = call_function("graft_dot_l", col("sr"), col("dr"))
    val ssS = call_function("graft_dot_l", col("sr"), col("sr"))
    val ssD = call_function("graft_dot_l", col("dr"), col("dr"))
    val cosSD = when(ssS > 0 && ssD > 0,
      dot.cast("double") / (sqrt(ssS.cast("double")) * sqrt(ssD.cast("double"))))
      .otherwise(lit(0.0d))
    val w = Window.partitionBy("src").orderBy(col("cos").desc,
      col("dst.doc_id"), col("dst.chunk_ix"))
    cand
      .join(nodes.select(col("nid").as("src"), col("bucket").as("sbucket"),
        col("raw").as("sr")), "src")
      .join(nodes.select(col("nid").as("dst"), col("raw").as("dr")), "dst")
      .withColumn("cos", cosSD)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= degree)
      .select(col("src.doc_id").as("src_doc"), col("src.chunk_ix").as("src_ix"),
        col("dst.doc_id").as("dst_doc"), col("dst.chunk_ix").as("dst_ix"),
        col("sbucket"))
  }

  /** G31b: bulk INSERT splice — the background-merge step a real DiskANN
    * ships, replacing the rebuild-after-append contract for the common
    * case. For an appended batch (`docIds`), only the LSH buckets the
    * batch landed in are re-solved:
    *
    *  - new→{old,new} edges come from the batch's same-bucket candidate
    *    pairs (the store's own blocking, exactly buildGraph's generator);
    *  - affected OLD nodes merge their STORED top-`degree` list with the
    *    new-endpoint candidates and re-rank: top-d(old ∪ new) =
    *    top-d(top-d(old) ∪ new) — any old peer outside the stored top-d
    *    is already beaten by d stored peers, so the merge reproduces the
    *    full rebuild EXACTLY (spec-pinned bit-for-bit);
    *  - untouched buckets' edge partitions are not read, not rescored,
    *    and not rewritten (the sidecar is partitioned by src bucket and
    *    the write is a dynamic partition overwrite).
    *
    * Cost tracks the appended batch's bucket footprint, not the index
    * size. A removed node invalidates stored lists in a way THIS merge
    * cannot repair (the replacement for an evicted slot was never
    * stored) — deletes go through [[spliceGraphDelete]], which re-solves
    * the victims' buckets from raw candidates instead. Returns the
    * number of edges written (the touched region's new edge count). */
  def spliceGraph(spark: SparkSession, indexDir: String, docIds: Seq[Long],
      degree: Int = GraphDegree): Long = {
    val edgePath = s"$indexDir/$GraphDir/edges.parquet"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(edgePath)),
      s"spliceGraph needs an existing buildGraph sidecar at $edgePath")
    // bit-equal-to-rebuild relies on each stored list being the src's
    // true top-`degree`; splicing WIDER than the build degree would ask
    // the merge for old peers the sidecar never stored — refuse.
    val built = storedDegree(spark, indexDir)
    require(degree <= built,
      s"spliceGraph degree=$degree exceeds the sidecar's build degree " +
        s"$built — top-d(old∪new)=top-d(top-d(old)∪new) only holds for " +
        "d <= build degree; rebuild with buildGraph(degree) instead")
    spark.catalog.refreshByPath(indexDir)
    val nodes = spark.read.parquet(indexDir)
      .select(struct(col("doc_id"), col("chunk_ix")).as("nid"),
        col("bucket"), col("raw"))
    val touched = nodes.filter(col("nid.doc_id").isInCollection(docIds))
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return 0L
    val region = nodes.filter(col("bucket").isInCollection(touched))
      .withColumn("is_new", col("nid.doc_id").isInCollection(docIds))
    val slim = region.select(col("nid"), col("bucket"), col("is_new"))
    val cand = slim.alias("a")
      .join(slim.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.nid") =!= col("b.nid") &&
          (col("a.is_new") || col("b.is_new")))
      .select(col("a.nid").as("src"), col("b.nid").as("dst"))
    spark.catalog.refreshByPath(edgePath)
    val storedPairs = spark.read.parquet(edgePath)
      .select(struct(col("src_doc").as("doc_id"), col("src_ix").as("chunk_ix"))
        .as("src"),
        struct(col("dst_doc").as("doc_id"), col("dst_ix").as("chunk_ix"))
          .as("dst"))
      .join(region.select(col("nid").as("src")), Seq("src"), "left_semi")
    val merged = cand.union(storedPairs).distinct()
    val newRegion = topEdges(spark, nodes, merged, degree)
      // materialize BEFORE the overwrite truncates its own input
      .localCheckpoint(true)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try newRegion.write.mode("overwrite").partitionBy("sbucket")
      .parquet(edgePath)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    spark.catalog.refreshByPath(edgePath)
    // maintain the per-bucket entry sidecar for the touched buckets (a
    // legacy store without one keeps serving through the scan fallback)
    if (fs.exists(new org.apache.hadoop.fs.Path(
        s"$indexDir/$GraphDir/$EntriesFile")))
      writeEntries(spark, indexDir, nodes, Some(touched))
    newRegion.count()
  }

  /** G31c: DELETE splice — closes the sidecar's last full-rebuild case.
    * Call AFTER [[delete]] has removed the victims from the index. The
    * key structural fact making a lossless local repair possible: the
    * candidate generator is SAME-BUCKET pairs, so every edge lives
    * inside one bucket and every src whose stored list cites a victim
    * sits in the victim's own bucket — the stored edge rows citing the
    * victims identify the affected sbucket partitions exactly, with no
    * reverse-edge sidecar needed.
    *
    * Repair granularity (r11 — SRC lists, not whole buckets): under a
    * rebuild, the ONLY lists that can change are (a) victims' own rows
    * (deleted) and (b) lists CITING a victim — a victim occupied top-d
    * slots and its replacement is the d+1-th neighbor, which no stored
    * list kept, so those srcs re-solve from the full live candidate set
    * of their bucket. Every other src's stored top-d is provably the
    * rebuild's answer: victims were not in it, and deleting them does
    * not reorder the surviving candidates — so those rows ride through
    * verbatim. Cost is O(citing lists × bucket membership), linear in
    * membership — the r10 version re-solved every touched bucket's full
    * n² pairs, which for a multi-chunk-doc edit (5 docs ≈ 180 chunks ≈
    * 180 buckets of 256) cost MORE than a rebuild (measured 39 s vs
    * 30 s at sf0.1; this shape reads ~3 s). Untouched buckets'
    * partitions are not read or rewritten; a touched bucket left with
    * no surviving rows has its partition dropped explicitly (dynamic
    * overwrite never rewrites a partition absent from the new data, and
    * stale rows there would cite deleted nodes). `degree` must equal
    * the build degree: ride-through lists are stored at the build
    * width, so a different width could not match a rebuild. Returns the
    * rewritten region's edge count. */
  def spliceGraphDelete(spark: SparkSession, indexDir: String,
      docIds: Seq[Long], degree: Int = GraphDegree): Long = {
    val edgePath = s"$indexDir/$GraphDir/edges.parquet"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(edgePath)),
      s"spliceGraphDelete needs an existing buildGraph sidecar at $edgePath")
    val built = storedDegree(spark, indexDir)
    require(degree == built,
      s"spliceGraphDelete degree=$degree != build degree $built — " +
        "untouched partitions keep their stored lists, so only the build " +
        "width can reproduce a rebuild")
    spark.catalog.refreshByPath(edgePath)
    // affected buckets from the PRE-DELETE edge rows citing a victim
    // (src or dst side — both live in the same bucket by construction)
    val edges = spark.read.parquet(edgePath)
    val victimSrc = col("src_doc").isInCollection(docIds)
    val victimDst = col("dst_doc").isInCollection(docIds)
    val touched = edges.filter(victimSrc || victimDst)
      .select("sbucket").distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return 0L
    // the lists that actually change: live srcs citing a victim
    val affectedSrcs = edges.filter(victimDst && !victimSrc)
      .select(struct(col("src_doc").as("doc_id"),
        col("src_ix").as("chunk_ix")).as("nid"))
      .distinct()
    spark.catalog.refreshByPath(indexDir)
    val nodes = spark.read.parquet(indexDir) // post-delete: victims gone
      .filter(col("bucket").isInCollection(touched))
      .select(struct(col("doc_id"), col("chunk_ix")).as("nid"),
        col("bucket"), col("raw"))
    // candidates: each citing src × its own bucket's live members
    val aff = nodes.join(affectedSrcs, Seq("nid"), "left_semi")
      .select(col("nid").as("src"), col("bucket").as("sb"))
    val cand = aff
      .join(nodes.select(col("nid").as("dst"), col("bucket").as("sb")), "sb")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
    val resolved = topEdges(spark, nodes, cand, degree)
    // ride-through: touched buckets' stored rows minus victim rows minus
    // the re-solved srcs' old lists
    val affKeys = affectedSrcs.select(col("nid.doc_id").as("src_doc"),
      col("nid.chunk_ix").as("src_ix"))
    val keep = edges
      .filter(col("sbucket").isInCollection(touched))
      .filter(!victimSrc && !victimDst)
      .join(affKeys, Seq("src_doc", "src_ix"), "left_anti")
      .select("src_doc", "src_ix", "dst_doc", "dst_ix", "sbucket")
    val newRegion = keep.unionByName(resolved)
      .localCheckpoint(true) // materialize BEFORE the overwrite
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      if (newRegion.isEmpty)
        () // nothing to overwrite; stale partitions drop below
      else newRegion.write.mode("overwrite").partitionBy("sbucket")
        .parquet(edgePath)
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // touched buckets that re-solved to ZERO pairs: drop their stale
    // partitions outright (they would otherwise keep citing victims)
    val nonEmpty = newRegion.select("sbucket").distinct()
      .collect().map(_.getInt(0)).toSet
    touched.filterNot(nonEmpty).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$edgePath/sbucket=$b"), true)
    }
    spark.catalog.refreshByPath(edgePath)
    // entry sidecar: recompute the touched buckets from the post-delete
    // members (an emptied bucket simply loses its rows)
    if (fs.exists(new org.apache.hadoop.fs.Path(
        s"$indexDir/$GraphDir/$EntriesFile")))
      writeEntries(spark, indexDir, nodes, Some(touched))
    newRegion.count()
  }

  /** G31 serving read: beam search over the [[buildGraph]] sidecar — the
    * B17 walk shape against the store. By default (r11, the published
    * graph_tune_r11 operating point) every query seeds [[GraphEntries]]
    * entries from its OWN multiprobe LSH buckets — the only components
    * the same-bucket edge sidecar lets its walk reach — then expands
    * [[GraphHops]] times through the edges keeping the best
    * max([[GraphBeam]], k) by cosine to the query (the beam widens with
    * k — a k above the beam would otherwise be silently capped by the
    * last frontier), and answers with the final top-k. Per hop the walk
    * touches O(beam · degree) stored vectors — independent of index
    * size, the property that makes graph serving the low-latency read
    * once an index outgrows exhaustive bucket probes; at the default
    * knobs the whole walk evaluates fewer scores than the bucket
    * multiprobe's own candidate count (recall@5 0.64 vs the probe's
    * 0.74 at sub-probe cost — bench/graph_tune_r11.json). Delegates to
    * the batch walk (one machinery, spec'd rank-for-rank equal). Output
    * schema = [[search]]. */
  def searchGraph(spark: SparkSession, indexDir: String, query: String,
      k: Int = 5): DataFrame =
    searchGraphBatch(spark, indexDir, Seq(query), k)
      .drop("query_id")

  /** G31 batch twin (the G23/G26 shape for the graph path): many queries
    * walk the edge sidecar through ONE plan. The frontier carries a
    * `query_id`, each hop's beam prunes through a window PARTITIONED BY
    * QUERY, and the bounded (queries × beam)-row frontier is eagerly
    * checkpointed per hop exactly like the single-query walk. Output
    * schema = [[searchBatch]].
    *
    * Serving knobs (r11, the B14 tuning discipline applied to G31):
    * `entries`/`beam`/`hops` widen the walk; `seedFromBuckets` replaces
    * the fixed md5-drawn global entry set with per-query entries drawn
    * from the query's OWN multiprobe LSH buckets. The edge sidecar's
    * candidate generator is same-bucket pairs, so the graph is a union
    * of per-bucket components — a walk can NEVER leave the buckets its
    * entries start in, which is why fixed global entries starve against
    * full-scan truth (store_recall_r10: 0.18) and why cell-sidecar
    * medoids would not help either (medoids land in arbitrary buckets).
    * Bucket seeding reads only the probed partitions, column-pruned to
    * (nid, bucket), caps at `entries` md5-ranked rows per query, and the
    * walk then scores O(entries + hops·beam·degree) vectors — the
    * operating points are published in bench/graph_tune_r11.json. */
  def searchGraphBatch(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int = 5, entries: Int = GraphEntries,
      beam: Int = GraphBeam, hops: Int = GraphHops,
      seedFromBuckets: Boolean = true): DataFrame =
    graphWalk(spark, indexDir, queries, k, entries, beam, hops,
      seedFromBuckets, countTouched = false)._1

  /** G45 (r12): the DiskANN discipline over the G31 walk — every HOP
    * scores candidates from the G44 int8 codes (the per-chunk scale
    * CANCELS from the cosine, so the hop ranking is deterministic pure
    * code arithmetic: d·Σq·c / (d·√Σc²·√Σq²)), and the exact raw
    * vectors are read ONLY for the final ≤beam-per-query re-rank — the
    * walk's per-hop DECODED width drops to ⅛ of the exact walk's at
    * identical knob costs, which is precisely how DiskANN keeps its
    * frontier in fast memory and full vectors on SSD (Subramanya et al.
    * 2019). Served scores stay EXACT (the tail recomputes them
    * full-width), and the measured recall is IDENTICAL to the exact
    * walk (0.64, bench/store_recall_r12.json) — quantized routing loses
    * nothing on this corpus. Honest cost scope
    * (bench/store_sq8_r12.json): the on-disk codes column is
    * byte-parity with raw here (parquet entropy-codes both), and at
    * sf0.1 the extra final re-rank join reads slightly slower than the
    * exact walk — the route-on-codes payoff is a decoded-working-set /
    * scan-bound-regime property. Pre-sq8 stores are refused loudly,
    * like [[searchSq8Cells]]. */
  def searchGraphSq8(spark: SparkSession, indexDir: String, query: String,
      k: Int = 5): DataFrame =
    searchGraphSq8Batch(spark, indexDir, Seq(query), k).drop("query_id")

  /** Batch twin of [[searchGraphSq8]] — knobs as [[searchGraphBatch]]. */
  def searchGraphSq8Batch(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int = 5, entries: Int = GraphEntries,
      beam: Int = GraphBeam, hops: Int = GraphHops,
      seedFromBuckets: Boolean = true): DataFrame =
    graphWalk(spark, indexDir, queries, k, entries, beam, hops,
      seedFromBuckets, countTouched = false, sq8Hops = true)._1

  /** The walk body behind [[searchGraphBatch]]; `countTouched = true`
    * additionally returns the number of (query, vector) score
    * evaluations the walk performed — the cost axis of the published
    * tuning table (extra per-hop counts run only when asked). */
  private[graft] def graphWalk(spark: SparkSession, indexDir: String,
      queries: Seq[String], k: Int, entries: Int, beamIn: Int, hops: Int,
      seedFromBuckets: Boolean, countTouched: Boolean,
      sq8Hops: Boolean = false): (DataFrame, Long) = {
    // the per-hop beam must cover the asked-for k: the final cut runs
    // over the LAST frontier, which holds at most `beam` rows per query
    val beam = math.max(beamIn, k)
    spark.catalog.refreshByPath(indexDir)
    val nodes = spark.read.parquet(indexDir)
      .select(struct(col("doc_id"), col("chunk_ix")).as("nid"),
        col("bucket"), col("chunk"), col("raw"))
    val edges = spark.read.parquet(s"$indexDir/$GraphDir/edges.parquet")
      .select(struct(col("src_doc"), col("src_ix")).as("src"),
        struct(col("dst_doc"), col("dst_ix")).as("dst"))
    val qdf = { import spark.implicits._
      queries.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("query_id", "qtext") }
      .select(col("query_id"), rawWeights(col("qtext")).as("qraw"))
    val entryH = md5(concat_ws(":",
      col("nid.doc_id").cast("string"), col("nid.chunk_ix").cast("string")))
    def globalStart(qs: DataFrame): DataFrame = {
      val entryDf = nodes.select(col("nid"))
        .withColumn("h", entryH)
        .orderBy(col("h"), col("nid.doc_id"), col("nid.chunk_ix"))
        .limit(entries).select(col("nid"))
      qs.crossJoin(broadcast(entryDf))
    }
    val start =
      if (seedFromBuckets) {
        // per-query entries from the query's multiprobe bucket set —
        // deterministic md5-ranked members of the probed buckets, inside
        // the only components the same-bucket edge sidecar lets this
        // query's walk reach. Served from the per-bucket ENTRY sidecar
        // when the graph build wrote one wide enough (O(buckets · width)
        // rows, NO index scan — the 100 TB seeding path); falls back to
        // a column-pruned directory read of the probed partitions for
        // legacy sidecars or wider-than-stored entry requests. Both
        // derivations pick the identical entry set: a per-query winner
        // is necessarily within its own bucket's md5-top-`width`.
        val probes = qdf.select(col("query_id"),
          bucketOf(col("qraw")).as("qbucket"))
          .select(col("query_id"), explode(array(
            col("qbucket") +: (0 until Planes).map(p =>
              col("qbucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"))
        val wE = Window.partitionBy("query_id")
          .orderBy(col("h"), col("nid.doc_id"), col("nid.chunk_ix"))
        val entPath = s"$indexDir/$GraphDir/$EntriesFile"
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val sidecar: Option[DataFrame] =
          if (!fs.exists(new org.apache.hadoop.fs.Path(entPath))) None
          else {
            spark.catalog.refreshByPath(entPath)
            val ent = spark.read.parquet(entPath)
            val width = ent.select(max("width")).head()
            if (width.isNullAt(0) || width.getInt(0) < entries) None
            else Some(ent.select(col("bucket"), col("h"),
              struct(col("doc_id"), col("chunk_ix")).as("nid")))
          }
        val seeded = sidecar match {
          case Some(ent) =>
            ent.join(broadcast(probes), "bucket")
              .withColumn("rk", row_number().over(wE))
              .filter(col("rk") <= entries)
              .select(col("query_id"), col("nid"))
          case None =>
            nodes.select(col("nid"), col("bucket"))
              .join(broadcast(probes), "bucket")
              .withColumn("h", entryH)
              .withColumn("rk", row_number().over(wE))
              .filter(col("rk") <= entries)
              .select(col("query_id"), col("nid"))
        }
        // a query whose 9 probed buckets hold NO rows gets global
        // entries instead of an empty answer (bounded: the unseeded
        // query set is tiny by construction, and usually empty)
        val unseeded = qdf.select(col("query_id"))
          .join(seeded.select("query_id").distinct(),
            Seq("query_id"), "left_anti")
        seeded.unionByName(globalStart(unseeded))
      } else globalStart(qdf.select(col("query_id")))
    val dotQC = call_function("graft_dot_l", col("raw"), col("qraw"))
    val ssC = call_function("graft_dot_l", col("raw"), col("raw"))
    val ssQ = call_function("graft_dot_l", col("qraw"), col("qraw"))
    val score = when(ssC > 0 && ssQ > 0,
      dotQC.cast("double") / (sqrt(ssC.cast("double")) * sqrt(ssQ.cast("double"))))
      .otherwise(lit(0.0d))
    // sq8 hop metric (G45): the per-chunk scale d cancels from
    // d·Σq·c / (d·√Σc² · √Σq²), so hops rank by pure code arithmetic —
    // exact int64 inside, one IEEE division, no scale column read
    val hopNodes =
      if (!sq8Hops) nodes.select(col("nid"), col("raw"))
      else {
        val idx = spark.read.parquet(indexDir)
        require(idx.schema.fieldNames.contains("scodes"),
          s"searchGraphSq8 needs the scodes column — this store predates " +
            "SQ8 coding; re-ingest it (mode=overwrite) to walk on codes")
        idx.select(struct(col("doc_id"), col("chunk_ix")).as("nid"),
          col("scodes"))
      }
    val dot8 = call_function("graft_dot_l", col("scodes"), col("qraw"))
    val ss8 = call_function("graft_dot_l", col("scodes"), col("scodes"))
    val hopScore =
      if (!sq8Hops) score
      else when(ss8 > 0 && ssQ > 0, dot8.cast("double") /
          (sqrt(ss8.cast("double")) * sqrt(ssQ.cast("double"))))
        .otherwise(lit(0.0d))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("nid.doc_id"), col("nid.chunk_ix"))
    var touched = 0L
    def hop(f: DataFrame): DataFrame = {
      val fc = f.select(col("query_id"), col("nid"))
      val grown = fc.union(
        edges.join(broadcast(fc), col("nid") === col("src"))
          .select(col("query_id"), col("dst").as("nid"))).distinct()
      if (countTouched) touched += grown.count()
      hopNodes.join(broadcast(grown), "nid")
        .join(broadcast(qdf), "query_id")
        .select(col("query_id"), col("nid"), hopScore.as("score"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= beam)
        .select(col("query_id"), col("nid"), col("score"))
    }
    val last = (1 to hops)
      .foldLeft(start.localCheckpoint(true))((f, _) => hop(f).localCheckpoint(true))
    // sq8 walk: the exact raw vectors enter ONLY here, for the bounded
    // (queries × beam)-row final re-rank — served scores stay exact
    val finalScored =
      if (!sq8Hops) last
      else nodes.select(col("nid"), col("raw"))
        .join(broadcast(last.select(col("query_id"), col("nid"))), Seq("nid"))
        .join(broadcast(qdf), "query_id")
        .select(col("query_id"), col("nid"), score.as("score"))
    val out = finalScored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(nodes.select(col("nid"), col("chunk")), "nid")
      .select(col("query_id"), col("rank"), col("nid.doc_id").as("doc_id"),
        col("nid.chunk_ix").as("chunk_ix"), col("chunk"), col("score"))
      .orderBy("query_id", "rank")
    (out, touched)
  }

  /** The #EDIT lifecycle op, composed (r10): the reference re-exports an
    * edited message by removing its old chunks and re-ingesting the new
    * text (KnowledgeBot.py:351-379 → `_delete_knowledge_chunks` then the
    * export path; this engine's README spelled it "delete then append"
    * — this method IS that spelling, with the graph sidecar maintained
    * through BOTH splices instead of a rebuild): [[delete]] the old
    * docs' chunks (partition-scoped, journaled), [[spliceGraphDelete]]
    * the victims' buckets out of the edge sidecar, [[ingest]] the
    * re-exported docs as an append (every frozen sidecar — codebook,
    * perm, cells, residual codebook — reused), [[spliceGraph]] the
    * appended region in. Each splice is bit-equal to a rebuild, so the
    * composition ends bit-equal to `buildGraph` over the final index
    * (spec-pinned). A store without a graph sidecar just skips the
    * splices. Returns (chunks removed, chunks added). */
  /** Replace `docIds` with `newDocs` across every plane of the store
    * (index rows, graph splices, lexical sidecar, zone maps).
    *
    * Crash-safe (r15, the r12 verdict's item #4): the new content is
    * STAGED durably first and an edit-intent manifest committed (temp +
    * rename, like delete's), THEN the delete + append sub-steps run. A
    * kill at ANY point — mid-delete, between delete and append,
    * mid-append, between append and graph splice — leaves the manifest
    * pending, and [[recover]] replays [[applyEdit]] from the staged
    * copy. The replay converges to EXACTLY the post-edit state because
    * its first step, delete(docIds), removes the old rows AND any
    * partially-appended new rows (they carry the same doc_ids), and
    * every sub-step is individually replay-safe (delete re-derives from
    * current state, spliceGraphDelete no-ops when nothing cites a
    * victim, the lexical doclog is keep-latest). A crash BEFORE the
    * manifest commits leaves the store bit-identical to pre-edit (the
    * orphaned staging dir is swept by recover). Never a partial state. */
  def edit(spark: SparkSession, indexDir: String, docIds: Seq[Long],
      newDocs: org.apache.spark.sql.DataFrame, chunkSize: Int = 20,
      overlap: Int = 5, batchTag: Long = 0L): (Long, Long) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val stamp = s"${System.currentTimeMillis()}_${docIds.hashCode.abs}"
    val staged = s"$indexDir/$EditStageDir/staged_$stamp"
    // meta rides the staged copy when present: a meta-carrying store's
    // append sub-step requires it (and the replay must see it too)
    val stageCols =
      if (newDocs.columns.contains("meta")) Seq("doc_id", "text", "meta")
      else Seq("doc_id", "text")
    newDocs.select(stageCols.map(col): _*).write.mode("overwrite")
      .parquet(staged)
    val manifest = writeEditManifest(fs, indexDir, stamp, docIds, staged,
      chunkSize, overlap, batchTag)
    val res = applyEdit(spark, indexDir, docIds, staged, chunkSize, overlap,
      batchTag)
    fs.delete(manifest, false) // retire the intent — edit is complete
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    res
  }

  /** The edit body shared by [[edit]] and [[recover]] — every sub-step
    * re-derives from CURRENT state, so replaying after any partial
    * failure converges to the post-edit state. */
  private def applyEdit(spark: SparkSession, indexDir: String,
      docIds: Seq[Long], staged: String, chunkSize: Int, overlap: Int,
      batchTag: Long): (Long, Long) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val hasGraph = fs.exists(new org.apache.hadoop.fs.Path(
      s"$indexDir/$GraphDir/edges.parquet"))
    // the sidecar's own build degree drives BOTH splices: hardcoding the
    // default would make edit() unusable on any buildGraph(degree != 8)
    // store (spliceGraphDelete requires degree == built)
    val deg = if (hasGraph) storedDegree(spark, indexDir) else GraphDegree
    val removed = delete(spark, indexDir, docIds)
    // unconditional (not gated on removed > 0): a replay may find the
    // index rows already deleted while the graph still cites the victims
    // — spliceGraphDelete no-ops when nothing does
    if (hasGraph)
      spliceGraphDelete(spark, indexDir, docIds, deg)
    val newDocs = spark.read.parquet(staged)
    val added = ingest(newDocs, indexDir, chunkSize, overlap,
      mode = "append", batchTag = batchTag)
    if (hasGraph && added > 0) {
      val newIds = newDocs.select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSeq
      spliceGraph(spark, indexDir, newIds, deg)
    }
    (removed, added)
  }

  def delete(spark: SparkSession, indexDir: String, docIds: Seq[Long]): Long = {
    // drop any cached file listing for this path — a previous overwrite
    // (or a concurrent writer) invalidates it, and a stale listing makes
    // reads fail on vanished part files
    spark.catalog.refreshByPath(indexDir)
    val index = spark.read.parquet(indexDir)
    val victims = col("doc_id").isInCollection(docIds)
    val buckets = index.filter(victims).select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (buckets.isEmpty) return 0L
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val manifest = writeManifest(fs, indexDir, docIds, buckets)
    val removed = deleteFromBuckets(spark, indexDir, docIds, buckets)
    // lexical kill rows ride BEFORE the manifest retires: a crash in
    // between replays through recover(), which re-logs (an extra kill
    // row at a later gen is idempotent — still dead, stats carry zeros)
    VectorStoreLex.logDelete(spark, indexDir, docIds)
    fs.delete(manifest, false) // retire the intent — delete is complete
    removed
  }

  /** G51 (r16): retrain the store's learned artifacts over the CURRENT
    * corpus — the dense-plane counterpart of the lexical plane's
    * compactLex, closing the frozen-cell-map gap the r13 verdict named
    * (G22 freezes cell geometry at creation; under drifting appends the
    * Voronoi cells stop matching the data and recall degrades
    * PERMANENTLY — bench/store_recall_churn_r16.json measures it).
    *
    * Semantics: re-derive every learned artifact (OPQ permutation, PQ
    * codebook, k-means cells, residual codebook) and every encoded
    * column EXACTLY as a fresh creation over the current chunk set
    * would — the implementation IS the creation path ([[ingestChunks]])
    * run over the store's surviving chunks, so the retrained store is
    * bit-for-bit the store a fresh ingest of the surviving docs
    * produces (RetrainSpec pins rows + all four artifact sidecars),
    * with one deliberate exception: per-row `batch_tag`s are PRESERVED
    * (the time axis must survive a retrain; a fresh creation would
    * flatten them to one tag). The graph sidecar needs no rebuild —
    * edges reference (doc, chunk) raw vectors, which retrain never
    * changes. The lexical sidecar is recreated at gen 1 over the same
    * content (serving-identical: that is exactly what compactLex
    * guarantees).
    *
    * Crash-safe (the G42/compactLex discipline): the complete new store
    * (data + pq/cells/lex sidecars) stages under `_graft_retrain/`, a
    * `retrain` manifest commits (temp + rename), then the swap replaces
    * each staged entry idempotently (delete final, rename staged — an
    * entry already gone moved before the crash) and the zone-map
    * sidecar rebuilds from the final file set (staged zone maps record
    * staging-dir paths, so they are rebuilt, not moved). recover()
    * finishes a half-done swap from the manifest and sweeps a
    * pre-commit orphan stage. Returns the number of re-encoded chunks.
    *
    * 100 TB shape: one full index rewrite — the same cost class as
    * creation, run RARELY and measured before/after (the churn
    * artifact); all training steps are the creation path's (map-side
    * aggregates + K-row broadcast summaries), nothing new. */
  def retrainCells(spark: SparkSession, indexDir: String,
      cells: Int = KmCells): Long = {
    val n = stageRetrain(spark, indexDir, cells)
    swapRetrain(spark, indexDir)
    n
  }

  private val RetrainDir = "_graft_retrain"
  private def retrainStage(indexDir: String) = s"$indexDir/$RetrainDir/store"
  private def retrainManifest(indexDir: String) =
    new org.apache.hadoop.fs.Path(s"$indexDir/$ManifestDir/retrain.json")

  private[graft] def stageRetrain(spark: SparkSession, indexDir: String,
      cells: Int = KmCells): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    spark.catalog.refreshByPath(indexDir)
    val cur = spark.read.parquet(indexDir)
    val metaIn: Seq[Column] =
      if (cur.columns.contains("meta")) Seq(col("meta")) else Nil
    // the chunk set + preserved tags; orig_tag is consumed (and dropped)
    // by ingestChunks so the written column ORDER matches fresh creation
    val chunks = cur.select((Seq(col("doc_id")) ++ metaIn ++ Seq(
      col("chunk_ix"), col("chunk"), col("batch_tag").as("orig_tag"))): _*)
      .localCheckpoint(true) // sever from indexDir: the swap will replace it
    val stage = retrainStage(indexDir)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    val n = ingestChunks(chunks, stage, "overwrite", col("orig_tag"), cells)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$indexDir/$ManifestDir/retrain.tmp")
    val out = fs.create(tmp, true)
    try out.write("{}".getBytes("UTF-8")) finally out.close()
    fs.rename(tmp, retrainManifest(indexDir))
    n
  }

  /** Idempotent swap half of [[retrainCells]] — also the recover()
    * replay: each staged entry (bucket=* dirs, _graft_pq, _graft_cells,
    * _graft_lex) replaces its final twin; one already gone moved before
    * the crash. The staged zone-map sidecar is discarded and rebuilt
    * over the final tree (it records absolute file paths). */
  private[graft] def swapRetrain(spark: SparkSession,
      indexDir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(retrainStage(indexDir))
    if (fs.exists(stage)) {
      fs.listStatus(stage).map(_.getPath).foreach { p =>
        if (p.getName == "_graft_zonemap") fs.delete(p, true)
        else {
          val tgt = new org.apache.hadoop.fs.Path(s"$indexDir/${p.getName}")
          fs.delete(tgt, true)
          require(fs.rename(p, tgt), s"retrain swap failed: $p -> $tgt")
        }
      }
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/$RetrainDir"), true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/_graft_zonemap"), true)
    spark.catalog.refreshByPath(indexDir)
    graft.sources.ZoneMaps.writeSidecar(spark, indexDir, "batch_tag")
    fs.delete(retrainManifest(indexDir), false)
  }

  /** recover() hook: finish a half-swapped retrain if its manifest is
    * pending; with NO manifest pending, a `_graft_retrain` dir is a
    * pre-commit orphan (crash during staging) and is swept. */
  private def recoverRetrain(spark: SparkSession, indexDir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(retrainManifest(indexDir))) swapRetrain(spark, indexDir)
    else fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/$RetrainDir"),
      true)
  }

  /** Replay pending delete AND edit manifests left by a crashed
    * [[delete]]/[[edit]] run. Call on store open (IngestJob does) or
    * after a failure. A half-swapped lexical compaction replays FIRST:
    * the compaction swap renames staged dirs over the live postings/
    * doclog, so any kill rows / postings the delete/edit replays append
    * must land on the POST-swap dirs — replaying ops first and swapping
    * last would silently discard those appends under the stale staged
    * state (r13 advice: a deleted doc could resurrect in the lexical
    * leg). Then deletes replay (an edit's own delete sub-step journals
    * independently), then edits replay from their staged content, then
    * orphaned staging dirs (crash between manifest retire and stage
    * cleanup) are swept. Returns the number of manifests replayed. Safe
    * to call any time: with no pending manifests it reads nothing but
    * the manifest dir listing. */
  def recover(spark: SparkSession, indexDir: String): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // a half-swapped retrain replays FIRST (it replaces whole planes —
    // anything appended to pre-swap dirs would be discarded), then a
    // half-swapped lexical compaction, BOTH before any manifest replay
    // appends to the lexical sidecar (see scaladoc); with no manifests
    // pending these also sweep pre-commit staging orphans
    recoverRetrain(spark, indexDir)
    VectorStoreLex.recoverCompact(spark, indexDir)
    val dir = new org.apache.hadoop.fs.Path(s"$indexDir/$ManifestDir")
    val listed = if (!fs.exists(dir))
      Array.empty[org.apache.hadoop.fs.Path]
    else fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
    val edits = listed.filter(_.getName.startsWith("edit_"))
    val deletes = listed.filter(_.getName.startsWith("delete_"))
    deletes.foreach { p =>
      val (docIds, buckets) = readManifest(fs, p)
      spark.catalog.refreshByPath(indexDir)
      deleteFromBuckets(spark, indexDir, docIds, buckets)
      VectorStoreLex.logDelete(spark, indexDir, docIds)
      fs.delete(p, false)
    }
    edits.foreach { p =>
      val (docIds, staged, chunkSize, overlap, batchTag) =
        readEditManifest(fs, p)
      spark.catalog.refreshByPath(indexDir)
      applyEdit(spark, indexDir, docIds, staged, chunkSize, overlap, batchTag)
      fs.delete(p, false)
      fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    }
    // orphaned stages: manifest retired (edit complete) but the crash
    // hit before the staging dir was removed — content is already live,
    // the copy is garbage
    val stageRoot = new org.apache.hadoop.fs.Path(s"$indexDir/$EditStageDir")
    if (fs.exists(stageRoot)) {
      val live = (if (!fs.exists(dir)) Array.empty[String]
      else fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("edit_"))
        .filter(_.getName.endsWith(".json"))
        .map(p => readEditManifest(fs, p)._2)).toSet
      fs.listStatus(stageRoot).map(_.getPath)
        .filterNot(p => live.contains(p.toString) ||
          live.exists(_.endsWith(s"/$EditStageDir/${p.getName}")))
        .foreach(p => fs.delete(p, true))
    }
    listed.length
  }

  private[operators] val ManifestDir = "_graft_manifest"

  /** Commit a delete intent atomically: write to a temp name, then rename
    * into place — readers never observe a torn manifest. */
  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      indexDir: String, docIds: Seq[Long], buckets: Seq[Int])
      : org.apache.hadoop.fs.Path = {
    val name = s"delete_${System.currentTimeMillis()}_${docIds.hashCode.abs}"
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/$ManifestDir/$name.tmp")
    val fin = new org.apache.hadoop.fs.Path(s"$indexDir/$ManifestDir/$name.json")
    val json = s"""{"docIds":[${docIds.mkString(",")}],"buckets":[${buckets.mkString(",")}]}"""
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    fs.rename(tmp, fin)
    fin
  }

  private val EditStageDir = "_graft_edit"

  /** Commit an edit intent atomically (the delete-manifest discipline):
    * records the victim ids, the staged new-content path, and the chunk
    * knobs, so [[recover]] can replay the whole edit from durable state. */
  private def writeEditManifest(fs: org.apache.hadoop.fs.FileSystem,
      indexDir: String, stamp: String, docIds: Seq[Long], staged: String,
      chunkSize: Int, overlap: Int, batchTag: Long)
      : org.apache.hadoop.fs.Path = {
    val tmp = new org.apache.hadoop.fs.Path(
      s"$indexDir/$ManifestDir/edit_$stamp.tmp")
    val fin = new org.apache.hadoop.fs.Path(
      s"$indexDir/$ManifestDir/edit_$stamp.json")
    val json = s"""{"docIds":[${docIds.mkString(",")}],""" +
      s""""staged":"$staged","knobs":[$chunkSize,$overlap,$batchTag]}"""
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    fs.rename(tmp, fin)
    fin
  }

  private def readEditManifest(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): (Seq[Long], String, Int, Int, Long) = {
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def nums(key: String): Seq[String] =
      s""""$key":\\[([0-9,\\-]*)\\]""".r.findFirstMatchIn(json)
        .map(_.group(1)).filter(_.nonEmpty).map(_.split(",").toSeq)
        .getOrElse(Seq.empty)
    val staged = """"staged":"([^"]*)"""".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse(
        throw new IllegalStateException(s"torn edit manifest $p: $json"))
    val knobs = nums("knobs")
    (nums("docIds").map(_.toLong), staged,
      knobs(0).toInt, knobs(1).toInt, knobs(2).toLong)
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): (Seq[Long], Seq[Int]) = {
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def nums(key: String): Seq[String] =
      s""""$key":\\[([0-9,\\-]*)\\]""".r.findFirstMatchIn(json)
        .map(_.group(1)).filter(_.nonEmpty).map(_.split(",").toSeq)
        .getOrElse(Seq.empty)
    (nums("docIds").map(_.toLong), nums("buckets").map(_.toInt))
  }

  /** The mutation body shared by [[delete]] and [[recover]]: remove
    * `docIds` from the recorded `buckets`, re-deriving everything from the
    * CURRENT index state so a replay after any partial failure converges
    * to the same result. */
  private def deleteFromBuckets(spark: SparkSession, indexDir: String,
      docIds: Seq[Long], buckets: Seq[Int]): Long = {
    val index = spark.read.parquet(indexDir)
    val victims = col("doc_id").isInCollection(docIds)
    val affected = index.filter(col("bucket").isInCollection(buckets))
    val removed = affected.filter(victims).count()
    val survivors = affected.filter(!victims)
      // the partition column must be part of the written data, and the
      // rewrite must materialize BEFORE overwrite truncates its own input
      .localCheckpoint(true)
    if (removed > 0) {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try survivors.write.mode("overwrite")
        .partitionBy("bucket", "cell").parquet(indexDir)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    // dynamic overwrite only replaces partitions PRESENT in the output: a
    // (bucket, cell) dir whose every row was a victim has no survivors
    // and must be dropped explicitly (idempotent — a replay deletes a
    // missing dir). Whole-bucket drops cover their cell subdirs.
    val survivingPairs = survivors.select("bucket", "cell").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val survivingBuckets = survivingPairs.map(_._1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    buckets.filterNot(survivingBuckets).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/bucket=$b"), true)
    }
    buckets.filter(survivingBuckets).foreach { b =>
      val bDir = new org.apache.hadoop.fs.Path(s"$indexDir/bucket=$b")
      if (fs.exists(bDir)) fs.listStatus(bDir).map(_.getPath)
        .filter(_.getName.startsWith("cell=")).foreach { cDir =>
          val c = cDir.getName.stripPrefix("cell=").toInt
          if (!survivingPairs((b, c))) fs.delete(cDir, true)
        }
    }
    spark.catalog.refreshByPath(indexDir)
    // the rewrite replaced the victims' files with fresh survivor files:
    // bring the time-axis sidecar back in sync (incremental — scans only
    // the rewritten buckets' new files, drops the vanished rows; replay-
    // safe because appendSidecar is a no-op when already current)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/_graft_zonemap")))
      graft.sources.ZoneMaps.appendSidecar(spark, indexDir, "batch_tag")
    removed
  }
}
