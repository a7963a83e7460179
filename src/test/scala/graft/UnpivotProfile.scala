package graft

import org.apache.spark.sql.functions._

/** Ad-hoc profiler for E23u unpivot: plan + stage timings at a given SF.
  * Run with `sbt "Test/runMain graft.UnpivotProfile /root/testdata/sf0.1"`. */
object UnpivotProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = TestSpark.spark
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }
    operators.Analytics.qUnpivot(spark, "/root/testdata/sf0.001").count() // warmup
    val df = operators.Analytics.qUnpivot(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0).linesIterator.take(30).mkString("\n"))
    t("full q_unpivot")(df.count())
    val measures = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val base = sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey") +: col("l_linenumber") +: measures.map(col): _*)
    t("scan only")(base.write.mode("overwrite").format("noop").save())
    val up = base.unpivot(Array(col("l_orderkey"), col("l_linenumber")),
      measures.map(col).toArray, "measure", "value")
    t("unpivot no agg")(up.write.mode("overwrite").format("noop").save())
    t("unpivot + count agg")(up.groupBy("measure").count().collect().length)
  }
}
