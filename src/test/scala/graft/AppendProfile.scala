package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiler for G40's "append cost tracks the batch, not the
  * corpus" claim: build standing state at two SFs 100× apart, append
  * the SAME synthetic batch to each, and compare min-of-3 walls. Run:
  * `sbt "Test/runMain graft.AppendProfile"`.
  *
  * Measured numbers land in bench/append_r9.json. Residual corpus-size
  * couplings (by design, all pruned/bounded): the decontamination
  * benchmark side re-derives from the corpus dir behind a
  * doc_id < 20 pushed filter; the seen anti-join's right side is one
  * narrow hash per standing INPUT doc; the band screen's right side is
  * O(admitted docs × 4 bands). */
object AppendProfile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    def batch = (0 until 30).map { i =>
      (9000000L + i, (0 until 60).map(j => s"ap${i}q$j").mkString(" "),
        "xx", "srcX")
    }.toDF("doc_id", "text", "lang", "source")
    val results = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1").map { dir =>
      val out = java.nio.file.Files
        .createTempDirectory("graft_ap").toString
      CorpusJob.run(spark, dir, out).collect()
      val walls = (1 to 3).map { repIx =>
        // fresh ids per rep so the seen state never short-circuits a rep
        val rep = batch.withColumn("doc_id",
          col("doc_id") + lit(repIx * 1000000L))
        val t0 = System.nanoTime()
        CorpusJob.append(spark, dir, rep, out).collect()
        (System.nanoTime() - t0) / 1e9
      }
      dir -> walls.min
    }
    val r = results.toMap
    val small = r("/root/testdata/sf0.001")
    val big = r("/root/testdata/sf0.1")
    println(f"""{"metric":"corpus_append_scale","batch_docs":30,"standing_sf0001_sec":$small%.3f,"standing_sf01_sec":$big%.3f,"ratio_100x_corpus":${big / small}%.3f}""")
    spark.stop()
  }
}
