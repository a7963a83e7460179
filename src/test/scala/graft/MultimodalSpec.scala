package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("mm_pipeline produces one typed feature row per document") {
    val df = Multimodal.mmPipeline(spark, sf)
    assert(df.columns.toSeq ==
      Seq("doc_id", "mime", "n_bytes", "width", "height", "f0", "f1", "f2", "f3"))
    val rows = df.collect()
    assert(rows.length == 500)
    val r = rows.head
    assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("width") < 128)
    assert(r.getAs[Double]("f0") >= 0.0 && r.getAs[Double]("f0") <= 1.0)
  }

  test("stub decode is deterministic in the payload") {
    val a = Multimodal.decodeStub(1, "m", "hello".getBytes("UTF-8"))
    val b = Multimodal.decodeStub(1, "m", "hello".getBytes("UTF-8"))
    assert(a.width == b.width && a.feature.toSeq == b.feature.toSeq)
    assert(a.n_bytes == 5)
  }
}
