package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format parity: the engine is not parquet-only — the same
  * aggregation over the same rows must produce identical results when
  * the data arrives as parquet, JSON-lines, or CSV (with an explicit
  * schema; no sampling-based inference in a pipeline). */
class SourceParitySpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  private def summarize(df: DataFrame): Seq[(String, Long, Double)] =
    df.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total"))
      .orderBy("event_type")
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

  test("parquet, json-lines, csv and orc sources agree on the same rows") {
    val base = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    val dir = Files.createTempDirectory("graft_srcparity").toString
    base.write.mode("overwrite").json(s"$dir/events_json")
    base.write.mode("overwrite").option("header", "true").csv(s"$dir/events_csv")
    base.write.mode("overwrite").orc(s"$dir/events_orc")

    val fromParquet = summarize(base)
    val fromJson = summarize(
      spark.read.schema(schema).json(s"$dir/events_json"))
    val fromCsv = summarize(
      spark.read.schema(schema).option("header", "true").csv(s"$dir/events_csv"))
    val fromOrc = summarize(spark.read.orc(s"$dir/events_orc"))

    assert(fromParquet.nonEmpty)
    assert(fromJson == fromParquet, "json-lines diverged from parquet")
    assert(fromCsv == fromParquet, "csv diverged from parquet")
    assert(fromOrc == fromParquet, "orc diverged from parquet")
  }

  test("filters push into the orc scan like the parquet scan") {
    // pushdown parity: a columnar swap (parquet -> orc) must not cost the
    // scan its predicate pushdown — both formats' scans must advertise
    // the filter, not evaluate it post-scan only.
    val dir = Files.createTempDirectory("graft_srcpush").toString
    val base = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "event_type", "value")
    base.write.mode("overwrite").orc(s"$dir/events_orc")
    for ((fmt, df) <- Seq(
        "parquet" -> spark.read.parquet(s"$sf/events.parquet"),
        "orc" -> spark.read.orc(s"$dir/events_orc"))) {
      val plan = df.filter(col("value") > 50.0).select("event_id")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,50.0)]"),
        s"$fmt scan lost the pushed filter:\n$plan")
    }
  }
}
