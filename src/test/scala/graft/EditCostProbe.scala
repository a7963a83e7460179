package graft

import graft.operators.VectorStore
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** One-off phase-level timing of the edit() composition on a plain
  * sf0.1 store — finds which leg carries the index-sized cost.
  * Run: `sbt "Test/runMain graft.EditCostProbe"`. */
object EditCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    def t[A](nm: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"[editprobe] $nm%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      a
    }
    val src = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, src).select("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ecp").toString + "/index"
    t("ingest_create")(VectorStore.ingest(docs, dir))
    t("build_graph")(VectorStore.buildGraph(spark, dir))
    val ids = Seq(30L, 31L, 32L, 33L, 34L)
    val edited = docs.filter(col("doc_id").isin(ids.map(Long.box): _*))
      .select(col("doc_id"), concat(lit("edited "), col("text")).as("text"))
      .localCheckpoint(true)
    t("delete")(VectorStore.delete(spark, dir, ids))
    t("splice_delete")(VectorStore.spliceGraphDelete(spark, dir, ids))
    t("ingest_append")(VectorStore.ingest(edited, dir, mode = "append"))
    t("splice_insert")(VectorStore.spliceGraph(spark, dir, ids))
    spark.stop()
  }
}
