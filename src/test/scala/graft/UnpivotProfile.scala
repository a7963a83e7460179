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
    // bench-style: fresh plan per rep, clearCache + gc, noop sink — the
    // protocol the round bench uses; prints EVERY rep, not just the min
    def benchStyle(name: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 5).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] bench-style $name%-18s " +
        times.map(x => f"$x%5.2f").mkString(" ") + f"  min ${times.min}%5.2f")
    }
    benchStyle("registered", () => operators.Analytics.qUnpivot(spark, dir))
    benchStyle("no decimal sum", () => {
      val b = sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey") +: col("l_linenumber") +: measures.map(col): _*)
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          measures.map(col).toArray, "measure", "value")
      b.groupBy("measure").agg(count(lit(1)).as("n_rows"),
        sum(col("value")).as("total"), max("value").as("max_value"))
        .orderBy("measure")
    })
    benchStyle("agg-then-stack", () => {
      val aggs = measures.flatMap(m => Seq(
        count(lit(1)).as(s"${m}_n"),
        sum(col(m).cast("decimal(18,2)")).cast("double").as(s"${m}_total"),
        max(col(m)).as(s"${m}_max")))
      sources.Tables.lineitem(spark, dir)
        .select(measures.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .select(explode(array(measures.map(m => struct(
          lit(m).as("measure"), col(s"${m}_n").as("n_rows"),
          col(s"${m}_total").as("total"), col(s"${m}_max").as("max_value")
        )): _*)).as("r"))
        .select(col("r.*"))
        .orderBy("measure")
    })
    benchStyle("cents agg-stack", () => {
      val aggs = measures.flatMap(m => Seq(
        count(lit(1)).as(s"${m}_n"),
        (sum((col(m).cast("decimal(18,2)") * 100).cast("long")) / 100.0)
          .as(s"${m}_total"),
        max(col(m)).as(s"${m}_max")))
      sources.Tables.lineitem(spark, dir)
        .select(measures.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .select(explode(array(measures.map(m => struct(
          lit(m).as("measure"), col(s"${m}_n").as("n_rows"),
          col(s"${m}_total").as("total"), col(s"${m}_max").as("max_value")
        )): _*)).as("r"))
        .select(col("r.*"))
        .orderBy("measure")
    })
    benchStyle("unpivot cents", () => {
      val b = sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey") +: col("l_linenumber") +: measures.map(col): _*)
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          measures.map(col).toArray, "measure", "value")
      b.groupBy("measure").agg(count(lit(1)).as("n_rows"),
        (sum((col("value").cast("decimal(18,2)") * 100).cast("long")) / 100.0)
          .as("total"),
        max("value").as("max_value"))
        .orderBy("measure")
    })
    benchStyle("narrow unpivot", () => {
      val b = sources.Tables.lineitem(spark, dir)
        .select(measures.map(col): _*)
        .unpivot(Array.empty, measures.map(col).toArray, "measure", "value")
      b.groupBy("measure").agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
        max("value").as("max_value"))
        .orderBy("measure")
    })
  }
}
