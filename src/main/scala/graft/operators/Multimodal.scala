package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decoded-media feature record. A fixed number of scalar feature
  * columns keeps the schema stable regardless of payload size (and keeps
  * the output free of array columns, which generic result comparators
  * can't sort on). */
case class MediaFeature(doc_id: Long, mime: String, n_bytes: Int,
  width: Int, height: Int, f0: Double, f1: Double, f2: Double, f3: Double) {
  def feature: Array[Double] = Array(f0, f1, f2, f3)
}

/** Multimodal binary-column plumbing (SURVEY §2 F4).
  *
  * Pattern for image/audio/video at 100 TB: an opaque `binary` payload
  * column + typed metadata struct travels through the relational plan
  * untouched; decode/feature-extract runs partition-wise so codec state is
  * initialized once per partition (not per row) and batch shape is
  * controlled by `spark.sql.files.maxPartitionBytes`.
  *
  * The decode step itself is a clearly-marked STUB (no image/audio codecs
  * in this container): deterministic pseudo-decode from the payload bytes.
  * Swapping in a real codec changes only `decodeStub` — the Spark-side
  * schema, partitioning, and batching are production-shaped.
  */
object Multimodal {

  /** STUB decoder — stands in for e.g. JPEG decode + resize + embed.
    * Deterministic in the payload bytes so tests are stable. */
  private[graft] def decodeStub(docId: Long, mime: String,
      payload: Array[Byte]): MediaFeature = {
    val n = payload.length
    val width = 64 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(payload(0)) % 64)
    val height = 64 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(payload(1)) % 64)
    val f = Array.tabulate(4) { i =>
      if (n == 0) 0.0
      else java.lang.Byte.toUnsignedInt(payload(i % n)).toDouble / 255.0
    }
    MediaFeature(docId, mime, n, width, height, f(0), f(1), f(2), f(3))
  }

  /** F4: binary-column pipeline — synthesize payloads from the documents
    * table (UTF-8 bytes as the stand-in blob), then partition-wise
    * pseudo-decode into typed features. Rows-only check (no SQL oracle:
    * the decode is engine-internal by design). */
  def mmPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        concat(lit("text/plain;doc="), col("doc_id")).as("mime"))
      .filter(col("payload").isNotNull) // no payload → nothing to decode
      .as[(Long, Array[Byte], String)]
    media.mapPartitions { it =>
      // per-partition init point: a real implementation opens its codec here
      it.map { case (id, payload, mime) => decodeStub(id, mime, payload) }
    }.toDF()
      .orderBy("doc_id")
  }

  /** One sampled "frame" from a media payload. */
  case class Frame(doc_id: Long, frame_ix: Int, offset: Int, frame_hash: Long)

  /** F5: frame sampling — the video-pipeline pattern where one blob row
    * fans out to N frame rows. The sampler walks the payload at a fixed
    * stride (stand-in for keyframe selection), emitting typed frame rows
    * partition-wise; downstream ops (dedup, embedding) treat frames as
    * ordinary rows. Decode is the same STUB contract as mmPipeline. */
  def mmFrameSample(s: SparkSession, dir: String, strideBytes: Int = 64)
      : DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(col("payload").isNotNull) // no payload → no frames
      .as[(Long, Array[Byte])]
    media.flatMap { case (id, payload) =>
      // real impl: codec opens once per row, seeks keyframes; the stride
      // walk keeps output deterministic in the payload bytes
      (0 until payload.length by strideBytes).iterator.zipWithIndex.map {
        case (off, ix) =>
          val end = math.min(off + strideBytes, payload.length)
          // mod-P polynomial (not wrapping int64): engine-portable, so the
          // frame hash is reproducible by the DuckDB oracle byte-for-byte
          var h = 0L
          var i = off
          while (i < end) { h = (h * 31 + (payload(i) & 0xff)) % P; i += 1 }
          Frame(id, ix + 1, off, h)
      }
    }.toDF().orderBy("doc_id", "frame_ix")
  }

  private val P = 1000000007L

  private def mmFrameSampleQ(s: SparkSession, dir: String): DataFrame =
    mmFrameSample(s, dir)

  /** F11: exact media dedup by payload content hash — the first pass of
    * every image/video dedup pipeline (byte-identical copies collapse on
    * md5 before any expensive perceptual step). One hash shuffle,
    * keep-min-id, copy count: the binary twin of C1. */
  def mmDedup(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(col("payload").isNotNull)
      .groupBy(md5(col("payload")).as("content_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")
  }

  // DuckDB's md5() takes VARCHAR, not BLOB — hashing the text directly
  // covers the same UTF-8 bytes the Spark side casts to binary.
  val mmDedupSql: String = """
    SELECT md5(text) AS content_hash,
      MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents WHERE text IS NOT NULL
    GROUP BY md5(text)
    ORDER BY keep_doc_id"""

  private val OverlapMinShared = 3
  private val OverlapMaxDf = 100

  /** F12: near-dup media by shared sampled frames — the video-pipeline
    * near-dup step: two blobs sharing ≥ 3 frame hashes are re-encodes /
    * re-uploads of the same content. Candidate generation is an
    * equi-join on frame_hash (blocked — never all-pairs), with
    * stop-frame removal first: hashes appearing in > 100 docs (black
    * frames, intros) are dropped before the join, the frequency cap
    * every shared-frame joiner at scale applies to bound hot-key
    * fan-out. */
  def mmFrameOverlap(s: SparkSession, dir: String): DataFrame = {
    val frames = mmFrameSample(s, dir)
      .select(col("doc_id"), col("frame_hash")).distinct()
    val keep = frames.groupBy("frame_hash")
      .agg(count(lit(1)).as("df")).filter(col("df") <= OverlapMaxDf)
      .select("frame_hash")
    val f = frames.join(keep, "frame_hash")
    val a = f.select(col("frame_hash"), col("doc_id").as("doc_a"))
    val b = f.select(col("frame_hash"), col("doc_id").as("doc_b"))
    a.join(b, Seq("frame_hash")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= OverlapMinShared)
      .orderBy("doc_a", "doc_b")
  }

  private val CutThreshold = P / 2

  /** F24: shot-boundary detection — the video-pipeline segmentation step
    * (scene cuts, then per-shot sampling/captioning). A cut opens where
    * the inter-frame distance jumps past the threshold; each video's
    * frames then fold into a shot table (shot id = running cut count,
    * frames per shot, first frame). With the stub decode the per-frame
    * signal is the sampled frame hash and distance is |h − prev| over
    * the mod-P space — a real implementation swaps in histogram or
    * embedding distance and the plan shape (one keyed lag + one keyed
    * running sum + one aggregation, all partitioned by video) is
    * unchanged. */
  def mmSceneCut(s: SparkSession, dir: String): DataFrame = {
    val byFrame = Window.partitionBy("doc_id").orderBy("frame_ix")
    val run = byFrame.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mmFrameSample(s, dir)
      .withColumn("prev", lag("frame_hash", 1).over(byFrame))
      .withColumn("cut", when(col("prev").isNull, lit(1))
        .otherwise(when(abs(col("frame_hash") - col("prev")) > CutThreshold,
          lit(1)).otherwise(lit(0))))
      .withColumn("shot_id", sum("cut").over(run))
      .groupBy("doc_id", "shot_id")
      .agg(count(lit(1)).as("n_frames"), min("frame_ix").as("first_frame"))
      .orderBy("doc_id", "shot_id")
  }

  private val PhashBits = 30 // frame hashes are mod-P (P < 2^30)
  private val PhashHammingMax = 3

  /** F25: perceptual-hash near-dup media — the pHash step between F11's
    * exact byte-hash pass and F12's shared-frame join: one 30-bit
    * signature per payload, bit b = MAJORITY vote of bit b across the
    * payload's sampled frame hashes (a SimHash over frames — a re-encode
    * or trim shifts a few frames, the majorities barely move), banded
    * into 4 blocks. Candidates are a block equi-join (never all-pairs;
    * G32's saturated-bucket cap applies to this join like every blocked
    * pair source), survivors keep Hamming ≤ 3 — the pigeonhole radius 4
    * blocks make EXACT (3 flipped bits cannot touch all 4 blocks, so no
    * in-radius pair is lost). Frame hashing is the committed stub
    * decode; a real pHash (DCT low-frequency signs) swaps the per-frame
    * hash only — signature, banding, join, and radius are unchanged.
    * Scale shape: one per-doc aggregation (30 map-side-partial bit
    * sums), block equi-join on ≤ 8-bit keys, no payload bytes past the
    * frame sampler. */
  def mmPhash(s: SparkSession, dir: String): DataFrame = {
    val frames = mmFrameSample(s, dir).select(col("doc_id"), col("frame_hash"))
    val sums = (0 until PhashBits).map(b =>
      sum(shiftright(col("frame_hash"), b).bitwiseAND(lit(1L))).as(s"s$b"))
    val votes = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("nf"), sums: _*)
    val phash = (0 until PhashBits).map(b =>
      when(col(s"s$b") * 2 > col("nf"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sigs = votes.select(col("doc_id"), phash.as("phash"))
    val blocks = sigs.select(col("doc_id"), col("phash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("phash"), 8 * i).bitwiseAND(lit(255L))): _*)))
      .withColumnRenamed("pos", "block_ix").withColumnRenamed("col", "bval")
    Dedup.bucketCandidates(s, blocks, Seq("block_ix", "bval"),
        "doc_id", Seq("phash"))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        bit_count(col("phash_a").bitwiseXOR(col("phash_b")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= PhashHammingMax)
      .orderBy("doc_a", "doc_b")
  }

  private def mmPhashSql(frameSql: String): String = {
    val sumExprs = (0 until PhashBits)
      .map(b => s"SUM((frame_hash >> $b) & 1) AS s$b").mkString(",\n        ")
    val phashExpr = (0 until PhashBits)
      .map(b => s"CASE WHEN s$b * 2 > nf THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END")
      .mkString("\n        + ")
    s"""
    WITH votes AS (
      SELECT doc_id, COUNT(*) AS nf,
        $sumExprs
      FROM ($frameSql) GROUP BY doc_id),
    sigs AS (SELECT doc_id, $phashExpr AS phash FROM votes),
    blocks AS (
      SELECT doc_id, phash, 0 AS block_ix, (phash >> 0) & 255 AS bval FROM sigs
      UNION ALL SELECT doc_id, phash, 1, (phash >> 8) & 255 FROM sigs
      UNION ALL SELECT doc_id, phash, 2, (phash >> 16) & 255 FROM sigs
      UNION ALL SELECT doc_id, phash, 3, (phash >> 24) & 255 FROM sigs),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.phash AS ph_a,
        b.doc_id AS doc_b, b.phash AS ph_b
      FROM blocks a JOIN blocks b ON a.block_ix = b.block_ix
        AND a.bval = b.bval AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(ph_a, ph_b)) <= $PhashHammingMax
    ORDER BY doc_a, doc_b"""
  }

  private val FpBands = 256
  private val FpFanout = 3
  private val FpMaxDf = 100
  private val FpMinAligned = 4

  /** F27: audio-fingerprint constellation matching — the Shazam family
    * (Wang 2003): per track, spectrogram PEAKS pair into landmark
    * fingerprints hash(anchor freq, target freq, Δt) within a bounded
    * fan-out window; a true match (re-encode, clip, sample) is not "many
    * shared hashes" but many shared hashes AGREEING ON ONE TIME OFFSET —
    * the offset-coherence vote that kills chance collisions. With the
    * committed stub decode the "peaks" are the sampled frame hashes
    * folded to [[FpBands]] bands and time is the frame index; a real
    * front-end swaps in STFT peak picking and every downstream shape —
    * landmark pairing, hash join, offset histogram, per-pair argmax —
    * is unchanged.
    *
    * Scale shape: landmark pairing is an equi-join on (track, time+Δt)
    * (the fan-out is a ≤[[FpFanout]]-row explode, never a range join);
    * candidate matching is an equi-join on the fingerprint hash behind a
    * df ≤ [[FpMaxDf]] stop-hash cap (the F12 discipline — silence/intro
    * landmarks would otherwise be the hot keys); the offset vote is one
    * keyed aggregation plus a per-pair window. No payload bytes travel
    * past the frame sampler. */
  def mmAudioFp(s: SparkSession, dir: String): DataFrame = {
    val frames = mmFrameSample(s, dir)
      .select(col("doc_id"), col("frame_ix"),
        pmod(col("frame_hash"), lit(FpBands.toLong)).as("freq"))
    val anchors = frames
      .select(col("doc_id"), col("frame_ix").as("ta"), col("freq").as("fa"),
        explode(array((1 to FpFanout).map(d => lit(d)): _*)).as("dt"))
      .withColumn("tb", col("ta") + col("dt"))
    val targets = frames
      .select(col("doc_id"), col("frame_ix").as("tb"), col("freq").as("fb"))
    val fps = anchors.join(targets, Seq("doc_id", "tb"))
      .select(col("doc_id"),
        ((col("fa") * FpBands + col("fb")) * (FpFanout + 1) + col("dt"))
          .as("fp"),
        col("ta"))
    val keep = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= FpMaxDf).select("fp")
    val k = fps.join(keep, "fp")
    val a = k.select(col("fp"), col("doc_id").as("doc_a"), col("ta").as("t_a"))
    val b = k.select(col("fp"), col("doc_id").as("doc_b"), col("ta").as("t_b"))
    val aligned = a.join(b, Seq("fp")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"),
        (col("t_a") - col("t_b")).as("offset"))
      .agg(count(lit(1)).as("n_aligned"))
    val w = Window.partitionBy("doc_a", "doc_b")
      .orderBy(col("n_aligned").desc, col("offset"))
    aligned.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("n_aligned") >= FpMinAligned)
      .select(col("doc_a"), col("doc_b"), col("offset").cast("long").as("offset"),
        col("n_aligned"))
      .orderBy("doc_a", "doc_b")
  }

  /** Oracle for F27: frame oracle as a CTE, then the same landmark →
    * stop-hash cap → offset vote → per-pair argmax, all integer. */
  private def mmAudioFpSql(frameSql: String): String = {
    val inner = frameSql.replace("ORDER BY doc_id, frame_ix", "")
    s"""
    WITH fr AS (
      SELECT doc_id, frame_ix, frame_hash % $FpBands AS freq FROM ($inner)),
    fp AS (
      SELECT a.doc_id,
        (a.freq * $FpBands + b.freq) * ${FpFanout + 1}
          + (b.frame_ix - a.frame_ix) AS fp,
        a.frame_ix AS ta
      FROM fr a JOIN fr b ON a.doc_id = b.doc_id
        AND b.frame_ix - a.frame_ix BETWEEN 1 AND $FpFanout),
    keep AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= $FpMaxDf),
    k AS (SELECT fp.* FROM fp JOIN keep USING (fp)),
    al AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.ta - b.ta AS off,
        COUNT(*) AS n_aligned
      FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3),
    r AS (
      SELECT doc_a, doc_b, off, n_aligned,
        row_number() OVER (PARTITION BY doc_a, doc_b
                           ORDER BY n_aligned DESC, off) AS rk
      FROM al)
    SELECT doc_a, doc_b, CAST(off AS BIGINT) AS offset,
      CAST(n_aligned AS BIGINT) AS n_aligned
    FROM r WHERE rk = 1 AND n_aligned >= $FpMinAligned
    ORDER BY doc_a, doc_b"""
  }

  /** F30's shard byte budget. 16 KiB on the synthetic corpus (~10 shards
    * at sf0.01); a production WebDataset run sets ~100 MB-1 GB. */
  private val ShardBytes = 16384L

  /** F30: WebDataset-style shard packing — the training-data step that
    * turns N media blobs into sequential size-bounded shard archives a
    * dataloader streams. Each blob (doc_id order) is assigned the shard
    * its START byte offset falls in (offset ÷ budget — the same
    * concat-then-cut contract as D13's token packing, applied to bytes),
    * then the manifest aggregates per shard: blob count, payload bytes,
    * id range. Deterministic, integer-only.
    *
    * Scale shape: a naive global byte cumsum is a ONE-PARTITION window;
    * this uses D13's decomposition — per-bucket byte sums (one small
    * shuffle), cumulative bucket offsets over the tiny bucket list
    * (broadcast back), per-bucket windows — identical output to the
    * global window the oracle runs, every stage parallel. The manifest
    * agg is a second small keyed shuffle. */
  def mmShardPack(s: SparkSession, dir: String): DataFrame = {
    val blobs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(col("payload").isNotNull)
      .select(col("doc_id"), length(col("payload")).cast("long").as("n_bytes"),
        (col("doc_id") - pmod(col("doc_id"), lit(100L))).as("bucket"))
    val wB = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blobs.groupBy("bucket").agg(sum("n_bytes").as("b_sum"))
      .withColumn("b_off", coalesce(sum("b_sum").over(wB), lit(0L)))
      .select("bucket", "b_off")
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    blobs.join(broadcast(offsets), "bucket")
      .withColumn("start_off",
        col("b_off") + coalesce(sum("n_bytes").over(wIn), lit(0L)))
      .withColumn("shard_id",
        ((col("start_off") - pmod(col("start_off"), lit(ShardBytes)))
          / ShardBytes).cast("long"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_blobs"), sum("n_bytes").as("shard_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard_id")
  }

  val mmShardPackSql: String = s"""
    WITH b AS (
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents WHERE text IS NOT NULL),
    c AS (
      SELECT doc_id, n_bytes,
        COALESCE(SUM(n_bytes) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
      FROM b)
    SELECT CAST(start_off // $ShardBytes AS BIGINT) AS shard_id,
      CAST(COUNT(*) AS BIGINT) AS n_blobs,
      CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
      MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY shard_id ORDER BY shard_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_shard_pack" -> (mmShardPack _),
    "mm_audio_fp" -> (mmAudioFp _),
    "mm_phash" -> (mmPhash _),
    "mm_pipeline" -> (mmPipeline _),
    "mm_framesample" -> (mmFrameSampleQ _),
    "mm_dedup" -> (mmDedup _),
    "mm_scene_cut" -> (mmSceneCut _),
    "mm_frame_overlap" -> (mmFrameOverlap _))

  /** Oracles replicate the stub decode from the payload bytes. The test
    * corpus is pure ASCII (verified), so DuckDB's per-character ord()
    * equals the UTF-8 byte the Scala side reads — the operator contract
    * is over bytes; the oracle is valid for this dataset. */
  /** Oracle for F12: the framesample oracle as a CTE, stop-frame cap,
    * pair join, shared-count threshold. */
  private def mmFrameOverlapSql(frameSql: String): String = {
    val inner = frameSql.replace("ORDER BY doc_id, frame_ix", "")
    s"""
    WITH frames AS (
      SELECT DISTINCT doc_id, frame_hash FROM ($inner)),
    keep AS (
      SELECT frame_hash FROM frames GROUP BY frame_hash
      HAVING COUNT(*) <= $OverlapMaxDf),
    f AS (SELECT frames.* FROM frames JOIN keep USING (frame_hash))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
    FROM f a JOIN f b ON a.frame_hash = b.frame_hash AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= $OverlapMinShared
    ORDER BY doc_a, doc_b"""
  }

  private val mmFrameSampleSql: String = s"""
      WITH f AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
        WHERE text IS NOT NULL),
      offs AS (
        SELECT doc_id, text, n, CAST(unnest(generate_series(0, n - 1, 64)) AS INT) AS "offset"
        FROM f WHERE n > 0)
      SELECT doc_id, CAST("offset" // 64 + 1 AS INT) AS frame_ix, "offset",
        CAST(list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(generate_series("offset" + 1, LEAST("offset" + 64, n)),
              i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
          (a, b) -> (a * 31 + b) % $P) AS BIGINT) AS frame_hash
      FROM offs
      ORDER BY doc_id, frame_ix"""

  /** Oracle for F24: the framesample oracle as a CTE, then the same
    * lag → cut flag → running-sum shot id → shot aggregation. */
  private def mmSceneCutSql(frameSql: String): String = {
    val inner = frameSql.replace("ORDER BY doc_id, frame_ix", "")
    s"""
    WITH lagd AS (
      SELECT doc_id, frame_ix, frame_hash,
        lag(frame_hash) OVER (PARTITION BY doc_id ORDER BY frame_ix) AS prev
      FROM ($inner)),
    cuts AS (
      SELECT doc_id, frame_ix,
        CASE WHEN prev IS NULL THEN 1
             WHEN abs(frame_hash - prev) > $CutThreshold THEN 1
             ELSE 0 END AS cut
      FROM lagd),
    shots AS (
      SELECT doc_id, frame_ix,
        CAST(SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_ix
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS shot_id
      FROM cuts)
    SELECT doc_id, shot_id, COUNT(*) AS n_frames,
      MIN(frame_ix) AS first_frame
    FROM shots GROUP BY doc_id, shot_id
    ORDER BY doc_id, shot_id"""
  }

  val oracle: Map[String, String] = Map(
    "mm_shard_pack" -> mmShardPackSql,
    "mm_audio_fp" -> mmAudioFpSql(mmFrameSampleSql),
    "mm_phash" -> mmPhashSql(mmFrameSampleSql),
    "mm_dedup" -> mmDedupSql,
    "mm_framesample" -> mmFrameSampleSql,
    "mm_scene_cut" -> mmSceneCutSql(mmFrameSampleSql),
    "mm_frame_overlap" -> mmFrameOverlapSql(mmFrameSampleSql),
    "mm_pipeline" -> """
      WITH f AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
        WHERE text IS NOT NULL)
      SELECT doc_id, 'text/plain;doc=' || CAST(doc_id AS VARCHAR) AS mime,
        CAST(n AS INT) AS n_bytes,
        CAST(64 + CASE WHEN n = 0 THEN 0 ELSE ord(substr(text, 1, 1)) % 64 END AS INT) AS width,
        CAST(64 + CASE WHEN n < 2 THEN 0 ELSE ord(substr(text, 2, 1)) % 64 END AS INT) AS height,
        CASE WHEN n = 0 THEN 0.0 ELSE CAST(ord(substr(text, (0 % n) + 1, 1)) AS DOUBLE) / 255.0 END AS f0,
        CASE WHEN n = 0 THEN 0.0 ELSE CAST(ord(substr(text, (1 % n) + 1, 1)) AS DOUBLE) / 255.0 END AS f1,
        CASE WHEN n = 0 THEN 0.0 ELSE CAST(ord(substr(text, (2 % n) + 1, 1)) AS DOUBLE) / 255.0 END AS f2,
        CASE WHEN n = 0 THEN 0.0 ELSE CAST(ord(substr(text, (3 % n) + 1, 1)) AS DOUBLE) / 255.0 END AS f3
      FROM f ORDER BY doc_id""")
}
