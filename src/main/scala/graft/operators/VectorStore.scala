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

  /** Deterministic ±1 hyperplanes (seeded — engine-internal). */
  private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(Planes, Dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Hashing-trick embedding of a token array, L2-normalized. */
  private[operators] def embed(toks: Column): Column = {
    val slots = transform(sequence(lit(0), lit(Dim - 1)), i => {
      val contrib = filter(toks, t => (Hashing.h60(t) % Dim).cast("int") === i)
      // signed sum of this slot's tokens: +1 if hash bit 5 set, else -1
      aggregate(contrib, lit(0L),
        (acc, t) => acc + (shiftright(Hashing.h60(t), 5).bitwiseAND(lit(1L)) * 2 - 1))
        .cast("double")
    })
    val norm = sqrt(aggregate(slots, lit(0.0d), (acc, x) => acc + x * x))
    when(norm > 0, transform(slots, x => x / norm)).otherwise(slots)
  }

  private def bucketOf(vec: Column): Column =
    (0 until Planes).map { p =>
      val d = aggregate(zip_with(vec, lit(planes(p)), (x, w) => x * w),
        lit(0.0d), (acc, t) => acc + t)
      when(d > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Ingest: documents(doc_id, text, …) → chunk → embed → bucket →
    * parquet index partitioned by bucket. `mode` "append" adds an
    * incremental batch to an existing index. Returns the batch's chunk
    * count (an empty batch writes nothing and returns 0). */
  def ingest(docs: DataFrame, indexDir: String,
      chunkSize: Int = 20, overlap: Int = 5, mode: String = "overwrite"): Long = {
    val toks = Text.tokens(col("text"))
    val chunks = docs
      .select(col("doc_id"), posexplode(Text.chunks(toks, chunkSize, overlap)))
      .select(col("doc_id"), (col("pos") + 1).as("chunk_ix"), col("col").as("chunk"))
    val indexed = chunks
      .withColumn("embedding", embed(Text.tokens(col("chunk"))))
      .withColumn("bucket", bucketOf(col("embedding")))
      .cache()
    val n = indexed.count()
    if (n > 0)
      indexed.write.mode(mode).partitionBy("bucket").parquet(indexDir)
    indexed.unpersist()
    n
  }

  /** Search: top-k chunks for a free-text query, probing the query's LSH
    * bucket and its Hamming-1 neighbors. Bucket pruning happens at the
    * parquet partition level (`bucket IN (…)` on the partition column). */
  def search(spark: SparkSession, indexDir: String, query: String, k: Int = 5)
      : DataFrame = {
    val index = spark.read.parquet(indexDir)
    val qvec = { import spark.implicits._; Seq(query).toDF("qtext") }
    val q = qvec
      .withColumn("qemb", embed(Text.tokens(col("qtext"))))
      .withColumn("qbucket", bucketOf(col("qemb")))
      .select(col("qemb"), explode(array(
        col("qbucket") +: (0 until Planes).map(p =>
          col("qbucket").bitwiseXOR(lit(1 << p))): _*)).as("bucket"))
    val w = Window.orderBy(col("score").desc, col("doc_id"), col("chunk_ix"))
    index.join(broadcast(q), "bucket")
      .select(col("doc_id"), col("chunk_ix"), col("chunk"),
        aggregate(zip_with(col("embedding"), col("qemb"), (x, y) => x * y),
          lit(0.0d), (acc, v) => acc + v).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("rank", "doc_id", "chunk_ix", "chunk", "score")
      .orderBy("rank")
  }
}
