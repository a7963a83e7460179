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

  test("q_benford excludes zero and negative amounts instead of throwing") {
    // Benford has no leading significant digit for non-positive values:
    // a zero yields digit 0 (element_at(expected, 0) throws under ANSI)
    // and a negative yields the sign character → null digit. Both must
    // be gated out, not crash the scan or skew the ppm denominators.
    val dir = Files.createTempDirectory("graft_benford").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val junk = li.limit(2).withColumn("l_extendedprice", lit(0.0))
      .union(li.limit(2).withColumn("l_extendedprice", lit(-123.45)))
    li.union(junk).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_benford")(spark, dir).collect()
    assert(out.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 9),
      "a non-significant digit row leaked through")
    val positives = li.filter(col("l_extendedprice") > 0).count()
    assert(out.map(_.getLong(1)).sum == positives,
      "non-positive amounts entered the digit histogram")
  }
}
