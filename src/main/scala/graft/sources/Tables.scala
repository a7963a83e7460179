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

  /** events.ts has shipped in three parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (read as long under
    * spark.sql.legacy.parquet.nanosAsLong=true), TIMESTAMP(MICROS) with no
    * timezone (Spark's inferTimestampNTZ maps it to TIMESTAMP_NTZ, which
    * `unix_micros` & friends reject at analysis), and plain TIMESTAMP.
    * Normalize all three to session-TZ TIMESTAMP here so every downstream
    * operator sees one type. Session TZ is pinned UTC
    * (GraftSession.scala), so NTZ→TIMESTAMP is a pure re-tag — wall-clock
    * fields and `unix_micros` values are unchanged, and DuckDB (which
    * reads the same file as its TZ-less TIMESTAMP) agrees. */
  private def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast("timestamp"))
      case _ => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  // o_orderdate / l_shipdate ship in the same TZ-less parquet encoding as
  // events.ts — normalize them too, so the NEXT operator that reaches for
  // unix_micros/unix_timestamp on a date column can't reproduce the
  // round-5 NTZ analysis failure (SchemaContractSpec pins this).
  def orders(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "lineitem"), "l_shipdate")
  def events(s: SparkSession, d: String): DataFrame     = normalizeTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
