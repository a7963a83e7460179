package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FloatVecDotSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(0.5f, -0.5f), Array(2.0f, 2.0f))).toDF("a", "b")

  test("graft_dot matches the higher-order-function dot product") {
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v)).as[Double].collect().toSeq
    val native = df.select(call_function("graft_dot", col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(native == hof && native == Seq(32.0, 0.0))
  }

  test("graft_dot is callable from SQL via GraftExtensions") {
    df.createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT graft_dot(a, b) FROM vecs ORDER BY 1")
      .as[Double].collect().toSeq
    assert(out == Seq(0.0, 32.0))
  }

  test("graft_dot rejects non-float-array inputs") {
    val bad = Seq((Array(1.0, 2.0), Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(call_function("graft_dot", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }
}
