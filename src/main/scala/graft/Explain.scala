package graft

/** Plan inspector: prints the formatted physical plan for the named
  * queries (or all). Usage: runMain graft.Explain [sfDir] [query ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.build("graft-explain")
    val exec = sys.env.contains("SPARK_GRAFT_EXEC")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) {
        // run THIS df's own execution (count() would build a separate one,
        // leaving this plan un-finalized) so AQE finalizes and the plan
        // shows the real WholeStageCodegen spans
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
