package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout for shuffle-free fact⋈fact joins.
  *
  * At 100 TB the orders⋈lineitem shuffle dominates any per-query cost;
  * the standing fix is to land both facts bucketed (and sorted) on the
  * join key once at write time, after which every join on that key is a
  * local zip of pre-hashed buckets — no Exchange in the plan, verified by
  * BucketingSpec. `spark.sql.sources.bucketing.enabled` is on by
  * default; bucket counts must match (or divide) across the two tables.
  */
object Bucketing {

  /** Drop stale table metadata AND orphaned warehouse locations — the
    * catalog is per-session but managed-table dirs persist, and CREATE
    * TABLE AS refuses to reuse an existing location. */
  private def dropAndClean(spark: SparkSession, names: Seq[String]): Unit = {
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    names.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(warehouse, t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
  }

  /** Land orders+lineitem bucketed by order key as catalog tables. */
  def writeBucketed(spark: SparkSession, dataDir: String, buckets: Int = 8): Unit = {
    dropAndClean(spark, Seq("orders_bucketed", "lineitem_bucketed"))
    Tables.orders(spark, dataDir)
      .write.mode("overwrite")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("orders_bucketed")
    Tables.lineitem(spark, dataDir)
      .write.mode("overwrite")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("lineitem_bucketed")
  }

  /** Per-order revenue via the bucketed layout — joins and aggregates on
    * the bucket key, so the whole plan runs without a single shuffle
    * until the final presentation sort. */
  def bucketedOrderRevenue(spark: SparkSession): DataFrame = {
    val o = spark.table("orders_bucketed")
      .select("o_orderkey", "o_orderstatus")
    val l = spark.table("lineitem_bucketed")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(sum("rev").as("revenue"), count(lit(1)).as("n_items"))
  }

  /** G35: land the two as-of legs (purchases = the probe side, clicks =
    * the quote/state side) bucketed on user_id. The AsOfJoin physical
    * operator (plans/AsOfJoin.scala) requires only ClusteredDistribution
    * on the key; two bucketed scans with the SAME bucket count already
    * satisfy it compatibly, so the merge-scan plans with ZERO Exchange —
    * the standing layout turns every as-of batch at 100 TB into a local
    * per-bucket merge (the fintech trades⋈quotes serving pattern). The
    * remaining SortExecs are per-bucket LOCAL sorts, not shuffles. */
  def writeAsOfBucketed(spark: SparkSession, dataDir: String,
      buckets: Int = 8): Unit = {
    dropAndClean(spark, Seq("purchases_bucketed", "clicks_bucketed"))
    val e = Tables.events(spark, dataDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("epoch"))
    e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("epoch"))
      .write.mode("overwrite")
      .bucketBy(buckets, "user_id").sortBy("user_id", "epoch")
      .format("parquet").saveAsTable("purchases_bucketed")
    e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("epoch").as("c_epoch"))
      .write.mode("overwrite")
      .bucketBy(buckets, "c_user").sortBy("c_user", "c_epoch")
      .format("parquet").saveAsTable("clicks_bucketed")
  }

  /** Close the CDC → lakehouse loop: land E56's merge-on-read snapshot
    * (qCdcApply — latest non-tombstoned state per user) as a lakehouse
    * table serving BOTH production axes at once:
    *
    *  - day-partitioned on the snapshot's change time (`last_day` dirs)
    *    and bucketed+sorted on `user_id` within each day — the standard
    *    date×key layout, so every keyed serve (equi/as-of join on
    *    user_id against a same-bucket-count probe) plans with ZERO
    *    Exchange on the snapshot side;
    *  - a G34 zone-map sidecar on `last_us` over the table's files: the
    *    day dirs make each file's [zmin, zmax] a day-bounded slice, so
    *    "which keys changed in [t1, t2]" prunes to the overlapping files
    *    before the parquet reader ever opens one.
    *
    * Returns the table's filesystem location (the handle [[ZoneMaps]]
    * pruning reads take). At 100 TB the snapshot rewrite itself is the
    * compaction job; incremental sidecar upkeep across appends is
    * [[ZoneMaps.appendSidecar]]. */
  def writeCdcSnapshot(spark: SparkSession, dataDir: String,
      buckets: Int = 8): String = {
    dropAndClean(spark, Seq("cdc_snapshot_bucketed"))
    graft.operators.Analytics.qCdcApply(spark, dataDir)
      .withColumn("last_day", expr("last_us div 86400000000"))
      .write.mode("overwrite")
      .partitionBy("last_day")
      .bucketBy(buckets, "user_id").sortBy("user_id")
      .format("parquet").saveAsTable("cdc_snapshot_bucketed")
    val loc = java.nio.file.Paths.get(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath,
      "cdc_snapshot_bucketed").toString
    ZoneMaps.writeSidecar(spark, loc, "last_us")
    loc
  }

  /** The snapshot as-of read: each purchase joined to the user's latest
    * CDC state at-or-before it — the merge-on-read serving pattern,
    * against [[writeCdcSnapshot]]'s layout. Both sides are bucketed on
    * the key with the same count, so the AsOfJoin merge plans with zero
    * Exchange (spec-pinned); the snapshot's day dirs don't disturb the
    * bucket-scan partitioning. */
  def cdcSnapshotAsOf(spark: SparkSession): DataFrame = {
    val purchases = spark.table("purchases_bucketed")
    val state = spark.table("cdc_snapshot_bucketed")
      .select(col("user_id").as("s_user"),
        expr("last_us div 1000000").as("s_epoch"),
        col("last_type"), col("last_value"))
    import org.apache.spark.sql.GraftBridge
    val plan = graft.plans.AsOfJoin(
      purchases.queryExecution.analyzed, state.queryExecution.analyzed,
      GraftBridge.expr(purchases("user_id")), GraftBridge.expr(state("s_user")),
      GraftBridge.expr(purchases("epoch")), GraftBridge.expr(state("s_epoch")),
      GraftBridge.expr(state("s_epoch")), forward = false, tolerance = None)
    GraftBridge.ofRows(spark, plan)
      .select(col("user_id"), col("purchase_id"), col("epoch"),
        col("s_epoch"), col("last_type"), col("last_value"))
      .orderBy("user_id", "purchase_id")
  }

  /** The E11 as-of (latest click at-or-before each purchase) against the
    * bucketed layout — same merge operator, no shuffle in the plan
    * (BucketingSpec pins it, and pins result equality with the
    * shuffling E11n variant). */
  def bucketedAsOf(spark: SparkSession): DataFrame = {
    val purchases = spark.table("purchases_bucketed")
    val clicks = spark.table("clicks_bucketed")
    import org.apache.spark.sql.GraftBridge
    val plan = graft.plans.AsOfJoin(
      purchases.queryExecution.analyzed, clicks.queryExecution.analyzed,
      GraftBridge.expr(purchases("user_id")), GraftBridge.expr(clicks("c_user")),
      GraftBridge.expr(purchases("epoch")), GraftBridge.expr(clicks("c_epoch")),
      GraftBridge.expr(clicks("click_id")), forward = false, tolerance = None)
    GraftBridge.ofRows(spark, plan)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (col("epoch") - col("c_epoch")).as("gap_s"))
      .orderBy("user_id", "purchase_id")
  }
}
