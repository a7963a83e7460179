package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds a derived ~sf(N/10) corpus for scale rehearsal by replicating a
  * source SF `reps` times with disjoint key ranges:
  * `runMain graft.ScaleCorpus <srcSfDir> <dstDir> [reps=10]`.
  *
  * The replication is shaped so data volume scales without changing the
  * statistical structure the operators key on — i.e. the honest way to
  * rehearse 10× more data, not a benchmark-rigging copy:
  *
  *  - every key column is offset by `replica · 10^9`, consistently across
  *    tables (o_custkey moves with c_custkey, l_orderkey with o_orderkey),
  *    so join fan-outs are preserved and replicas never collide;
  *  - document tokens get a per-replica suffix, giving each replica a
  *    disjoint vocabulary: docs that were near-dups stay near-dups WITHIN
  *    a replica, but replicas don't near-dup each other — cluster count
  *    scales ×reps while cluster sizes (and the pair-graph's quadratic
  *    in-cluster term) stay constant, exactly how a real corpus grows;
  *  - embeddings are rotated by `replica` positions (norm-preserving), so
  *    replica vectors are novel points rather than exact copies that
  *    would inflate every similarity operator's candidate sets;
  *  - the fixed dimensions (region, nation) and the demo query/bench
  *    prefixes (vec_id < 10 queries, doc_id < 20 contamination bench) stay
  *    single-copy — fixed query sets over a growing corpus;
  *  - timestamps and dates are untouched: the same time range at ×reps
  *    density, which is what a bigger day of the same traffic looks like.
  */
object ScaleCorpus {
  private val Off = 1000000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleCorpus <srcSfDir> <dstDir> [reps]")
    val src = args(0)
    val dst = args(1)
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def save(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def replicate(t: String, parts: Int)(f: (DataFrame, Int) => DataFrame): Unit =
      save((0 until reps).map(i => f(load(t), i)).reduce(_ unionByName _),
        t, parts)
    def off(i: Int) = lit(i * Off)

    save(load("region"), "region", 1)
    save(load("nation"), "nation", 1)
    replicate("customer", 4)((df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + off(i)))
    replicate("supplier", 2)((df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + off(i)))
    replicate("part", 4)((df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + off(i)))
    replicate("orders", 8)((df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + off(i))
      .withColumn("o_custkey", col("o_custkey") + off(i)))
    replicate("lineitem", 16)((df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + off(i))
      .withColumn("l_partkey", col("l_partkey") + off(i))
      .withColumn("l_suppkey", col("l_suppkey") + off(i)))
    replicate("events", 8)((df, i) => df
      .withColumn("event_id", col("event_id") + off(i))
      .withColumn("user_id", col("user_id") + off(i)))
    replicate("documents", 8) { (df, i) =>
      val text =
        if (i == 0) col("text")
        else when(col("text").isNull, lit(null)).otherwise(
          array_join(transform(split(col("text"), " "),
            t => when(length(t) > 0, concat(t, lit(s"r$i"))).otherwise(t)),
            " "))
      df.withColumn("doc_id", col("doc_id") + off(i))
        .withColumn("text", text)
        .withColumn("n_chars",
          when(col("text").isNull, col("n_chars")).otherwise(length(col("text"))))
    }
    replicate("embeddings", 4) { (df, i) =>
      val emb =
        if (i == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
          s"slice(embedding, 1, $i))")
      df.withColumn("vec_id", col("vec_id") + off(i))
        .withColumn("embedding", emb)
    }
    println(s"""{"scale_corpus":"$dst","reps":$reps}""")
    spark.stop()
  }
}
