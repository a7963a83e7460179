package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the test corpus.
  *
  * Loaders return the raw scan; operators `select` only the columns they
  * need and filter as early as possible so Catalyst pushes projection and
  * predicates into the parquet reader (check `PushedFilters`/`ReadSchema`
  * in the formatted plan). At 100 TB these would be partitioned/bucketed
  * catalog tables; the call sites would not change.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; sessions set spark.sql.legacy.parquet.nanosAsLong=true and we
    * rebuild a microsecond timestamp here (integer div — no double
    * round-trip, matches DuckDB's ns→us truncation). */
  private def nanosToTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = nanosToTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
