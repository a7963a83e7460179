package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for B12 `vec_kmeans` on the driver-generated
  * embeddings table: assignment optimality (every vector sits in its
  * true argmin cluster, re-derived with independent composed column
  * expressions instead of the kernels) and the Lloyd descent guarantee
  * (one update + re-assignment never increases the k-means objective). */
class VecKmeansSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def q4(c: org.apache.spark.sql.Column) =
    floor(c.cast("double") * lit(1.0e4) + lit(0.5))

  test("every vector is assigned to its exact argmin cluster (composed re-derivation)") {
    val out = Similarity.vecKmeans(spark, sf)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recomputation: round-1 assignment + centroid sums with
    // composed expressions (zip_with/aggregate), then exact rational
    // argmin on the driver over the K centroid summaries
    val x = Tables.embeddings(spark, sf).filter(col("vec_id") >= 10)
      .select(col("vec_id"), transform(col("embedding"), v => q4(v)).as("xq"))
    val seeds = x.filter(col("vec_id") < 18)
      .select(col("vec_id").as("cid"), col("xq").as("sq"))
    val d2 = zip_with(col("xq"), col("sq"), (a, b) => (a - b) * (a - b))
    val a1 = x.join(broadcast(seeds))
      .select(col("vec_id"), col("xq"), col("cid"),
        aggregate(d2, lit(0L), (acc, v) => acc + v).as("d2"))
    val best1 = a1.groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
    val cents = a1.join(best1, Seq("vec_id", "cid"))
      .select(col("cid"), posexplode(col("xq")))
      .groupBy("cid", "pos").agg(sum("col").as("cs"))
      .collect().groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)) }
    val ns = a1.join(best1, Seq("vec_id", "cid"))
      .groupBy("cid").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = x.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    assert(vecs.nonEmpty && cents.nonEmpty)
    vecs.foreach { case (id, xq) =>
      val scored = cents.toSeq.map { case (cid, cs) =>
        val n = ns(cid)
        val c2 = cs.map(v => v * v).sum
        val xdot = xq.zip(cs).map { case (a, b) => a * b }.sum
        ((c2 - 2L * xdot * n).toDouble / (n * n).toDouble, cid)
      }
      val expect = scored.min._2
      assert(out(id) == expect, s"vec $id: got ${out(id)}, argmin $expect")
    }
  }

  test("Lloyd descent: objective after update+re-assign <= seed-assignment objective") {
    val x = Tables.embeddings(spark, sf).filter(col("vec_id") >= 10)
      .select(col("vec_id"), transform(col("embedding"), v => q4(v)).as("xq"))
    val seeds = x.filter(col("vec_id") < 18)
      .select(col("vec_id").as("cid"), col("xq").as("sq"))
    val d2 = zip_with(col("xq"), col("sq"), (a, b) => (a - b) * (a - b))
    val obj1 = x.join(broadcast(seeds))
      .select(col("vec_id"), aggregate(d2, lit(0L), (acc, v) => acc + v).as("d2"))
      .groupBy("vec_id").agg(min("d2").as("d2"))
      .agg(sum(col("d2").cast("double"))).head().getDouble(0)
    // round-2 objective: score already IS ‖x−m‖²−‖x‖² scaled; rebuild the
    // true squared distance by adding ‖x‖² back per vector
    val xnorm = x.select(col("vec_id"),
      aggregate(transform(col("xq"), v => v * v), lit(0L), (a, v) => a + v)
        .cast("double").as("x2"))
    val obj2 = Similarity.vecKmeans(spark, sf)
      .join(xnorm, "vec_id")
      .agg(sum(col("score") + col("x2"))).head().getDouble(0)
    assert(obj2 <= obj1 + 1e-6 * math.abs(obj1),
      s"objective rose: seed=$obj1 after-lloyd=$obj2")
  }
}
