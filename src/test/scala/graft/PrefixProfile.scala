package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the C9 prefix similarity join: times each stage
  * subtree in isolation so candidate-enumeration cost is visible next to
  * verify cost. Run with:
  * `sbt "Test/runMain graft.PrefixProfile /root/testdata/sf0.1"`.
  *
  * Measured at sf0.1 / local[8] (2026-08-13): the synthetic corpus is
  * blocking-resistant for EXACT similarity joins — only 931 distinct
  * shingle hashes over 5000 docs (median df 285), so posting-list
  * products put ~19M pair evaluations through the prefix equi-join
  * (cand_raw 1.5 s, the floor), 6.4M survive the length+positional
  * prunes, 3.7M are distinct. The three orderings of the tail
  * (distinct→attach→kernel, attach-broadcast→kernel→distinct, and the
  * df-ordered-prefix variant, measured in DuckDB at 16.5M vs 17.5M raw
  * matches) all land within noise of 2.8-3.0 s: the enumeration is
  * intrinsic to AllPairs losslessness at this df flatness, not a plan
  * defect. On Zipfian real-corpus dfs the same plan's posting lists are
  * rare-token-sized and the join is near-linear. */
object PrefixProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }
    // warmup
    operators.Dedup.dedupPrefix(spark, "/root/testdata/sf0.001").count()
    val sets = sources.Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", col("text")).as("shs"))
      .filter(size(col("shs")) > 0)
      .persist()
    t("sets")(sets.count())
    val pref = sets
      .select(col("doc_id"), size(col("shs")).as("n"),
        posexplode(slice(col("shs"), lit(1),
          (floor(size(col("shs")).cast("long") / 2) + 1).cast("int"))))
      .withColumnRenamed("col", "tok")
    t("pref")(pref.count())
    val a = pref.select(col("doc_id").as("doc_a"), col("n").as("na"),
      col("pos").as("pa"), col("tok"))
    val b = pref.select(col("doc_id").as("doc_b"), col("n").as("nb"),
      col("pos").as("pb"), col("tok"))
    val candRaw = a.join(b,
      a("tok") === b("tok") && col("doc_a") < col("doc_b") &&
        lit(2) * col("nb") >= col("na") && col("nb") <= lit(2) * col("na") &&
        lit(3) * (lit(1) + least(col("na") - col("pa") - 1,
          col("nb") - col("pb") - 1)) >= col("na") + col("nb"))
      .select("doc_a", "doc_b")
    t("cand_raw")(candRaw.count())
    val cand = candRaw.distinct()
    t("cand_distinct")(cand.count())
    val verified = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      .filter(lit(3) * call_function("graft_intersect_count", col("sa"), col("sb"))
        >= size(col("sa")) + size(col("sb")))
    t("verify_attach+kernel")(verified.count())
    t("full_operator")(operators.Dedup.dedupPrefix(spark, dir).count())
    // variant: no pre-verify distinct — attach sets via broadcast to the
    // raw (duplicated) candidate stream, kernel-filter, dedupe survivors
    val verified2 = candRaw
      .join(broadcast(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa"))), "doc_a")
      .join(broadcast(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb"))), "doc_b")
      .filter(lit(3) * call_function("graft_intersect_count", col("sa"), col("sb"))
        >= size(col("sa")) + size(col("sb")))
      .select("doc_a", "doc_b").distinct()
    t("verify_first_bcast")(verified2.count())
    sets.unpersist()
  }
}
