package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential cell-quality check: IVF probing over `vec_kmeans` (B12)
  * cells vs the synthetic `label` column that B5 `ann_ivf` uses as its
  * stand-in cell map. The label cells are random partitions — probing
  * them carries no geometric signal, so recall ≈ scan fraction (the
  * no-free-lunch case the B5 Scaladoc documents). Lloyd cells are
  * Voronoi regions: the same probe budget concentrates true neighbors
  * in-cell, so recall must clear the scan fraction. This is the
  * measured justification for running k-means before IVF ingest at
  * scale. Runs at sf0.01 (500 vectors) for a stable recall estimate. */
class IvfCellQualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private val Probes = 2

  private def q4(c: org.apache.spark.sql.Column) =
    floor(c.cast("double") * lit(1.0e4) + lit(0.5))

  /** Per-query candidate set from probing the top-`Probes` cells of the
    * given (vec_id, cell) assignment, by exact centroid dot/count score. */
  private def probedCandidates(cells: DataFrame): Map[Long, Set[Long]] = {
    val corpus = Tables.embeddings(spark, dir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), transform(col("embedding"), v => q4(v)).as("xq"))
      .join(cells, "vec_id")
    val cent = corpus.select(col("cell"), posexplode(col("xq")))
      .groupBy("cell", "pos").agg(sum("col").as("cs"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cs")))),
        e => e.getField("cs")).as("cs"))
      .join(corpus.groupBy("cell").agg(count(lit(1)).as("n")), "cell")
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), v => q4(v)).as("qq"))
    val probed = queries.join(broadcast(cent))
      .select(col("query_id"), col("cell"),
        (call_function("graft_dot_l", col("qq"), col("cs")).cast("double")
          / col("n")).as("score"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("cell"))))
      .filter(col("rk") <= Probes)
      .select("query_id", "cell")
    probed.join(corpus.select(col("vec_id"), col("cell")), "cell")
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
  }

  test("kmeans Voronoi cells beat random label cells at equal probe budget") {
    val truth = Similarity.annBrute(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    val kmCells = Similarity.vecKmeans(spark, dir)
      .select(col("vec_id"), col("cluster").as("cell"))
    val labelCells = Tables.embeddings(spark, dir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("label").cast("long").as("cell"))
    def recall(cand: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) =>
        (cand.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
      per.sum / per.size
    }
    val km = probedCandidates(kmCells)
    val lb = probedCandidates(labelCells)
    val (rKm, rLb) = (recall(km), recall(lb))
    val kmScan = km.values.map(_.size).sum.toDouble / (km.size * 490)
    info(f"recall kmeans=$rKm%.3f (scan ${kmScan * 100}%.1f%%) label=$rLb%.3f")
    assert(rKm > rLb,
      f"kmeans cells should out-recall random label cells: $rKm%.3f vs $rLb%.3f")
    assert(rKm > kmScan,
      f"kmeans recall $rKm%.3f should clear its scan fraction $kmScan%.3f")
  }
}
