package graft

import org.apache.spark.sql.functions._

/** Measures what the B22 OPQ permutation and B20 MRL truncation buy on an
  * ANISOTROPIC embedding corpus — the other half of r9's honest "no
  * uplift on isotropic data" result. The twin (SkewCorpus.writeAniso)
  * gives the test embeddings the exponentially-decaying per-dim energy
  * profile real embedding models produce; the same oracle-checked rung
  * queries (`ann_recall`, `vec_mrl_recall`) then run unchanged on both
  * corpora. Run: `sbt "Test/runMain graft.AnisoProfile"`. Numbers land in
  * bench/aniso_r11.json. */
object AnisoProfile {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val decay = args.headOption.map(_.toDouble).getOrElse(0.85)
    val src = "/root/testdata/sf0.01"
    val dst = java.nio.file.Files.createTempDirectory("graft_aniso").toString
    SkewCorpus.writeAniso(spark, src, dst, decay)
    def avgRecall(dir: String): Map[String, Double] =
      SparkEntry.queries("ann_recall")(spark, dir)
        .groupBy("method").agg(avg("recall").as("r")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    def mrlCurve(dir: String): Seq[(Long, Double)] =
      SparkEntry.queries("vec_mrl_recall")(spark, dir)
        .groupBy("dims").agg(avg("recall").as("r")).orderBy("dims")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def fmt(m: Map[String, Double]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => f""""$k":$v%.3f""" }
        .mkString("{", ",", "}")
    def fmtCurve(c: Seq[(Long, Double)]) =
      c.map { case (d, v) => f""""d$d":$v%.3f""" }.mkString("{", ",", "}")
    val iso = avgRecall(src)
    val aniso = avgRecall(dst)
    val isoMrl = mrlCurve(src)
    val anisoMrl = mrlCurve(dst)
    println(s"""{"metric":"aniso_recall","decay":$decay,""" +
      s""""iso":${fmt(iso)},"aniso":${fmt(aniso)},""" +
      f""""opq_minus_pq_iso":${iso("vec_opq") - iso("vec_pq")}%.3f,""" +
      f""""opq_minus_pq_aniso":${aniso("vec_opq") - aniso("vec_pq")}%.3f,""" +
      f""""lloyd_minus_pq_iso":${iso("vec_pq_lloyd") - iso("vec_pq")}%.3f,""" +
      f""""lloyd_minus_pq_aniso":${aniso("vec_pq_lloyd") - aniso("vec_pq")}%.3f,""" +
      s""""mrl_iso":${fmtCurve(isoMrl)},"mrl_aniso":${fmtCurve(anisoMrl)}}""")
    spark.stop()
  }
}
