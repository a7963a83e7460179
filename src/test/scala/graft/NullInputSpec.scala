package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null tolerance: real 100 TB corpora carry NULL text / payload rows.
  * Every text, dedup, and multimodal operator must evaluate cleanly when
  * some document rows have NULL text — null rows flow to null kernel
  * outputs and drop out of set/pair logic, never throw. */
class NullInputSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private lazy val dirWithNulls: String = {
    val dir = Files.createTempDirectory("graft_nulls").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // null out the embedding of every 7th vector
    spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("embedding",
        when(col("vec_id") % 7 === 0, lit(null)).otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // null out the text of every 7th document
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val affected = SparkEntry.queries.keys.filter(n =>
    n.startsWith("text_") || n.startsWith("dedup_") || n.startsWith("kb_") ||
      n.startsWith("mm_") || n.startsWith("ann_") || n.startsWith("knn_vote") ||
      n == "vec_embed").toSeq.sorted

  affected.foreach { name =>
    test(s"query $name evaluates with NULL document text") {
      SparkEntry.queries(name)(spark, dirWithNulls).count() // must not throw
    }
  }
}
