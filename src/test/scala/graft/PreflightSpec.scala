package graft

import org.scalatest.funsuite.AnyFunSuite

class PreflightSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("all preflight checks pass against the smoke corpus") {
    val results = Preflight.run(spark, sf)
    assert(results.size == 5)
    assert(results.forall(_.ok), results.filterNot(_.ok).mkString("; "))
  }

  test("a missing data dir fails the data checks but not the others") {
    val results = Preflight.run(spark, "/nonexistent_dir")
    val byName = results.map(c => c.name -> c.ok).toMap
    assert(!byName("data dir readable"))
    assert(!byName("all tables present with rows"))
    assert(byName("config resolves and validates"))
    assert(byName("native functions registered (GraftExtensions)"))
  }

  test("invalid config (overlap >= chunk size) is caught") {
    val results = Preflight.run(spark, sf,
      env = Map("GRAFT_CHUNK_SIZE" -> "5", "GRAFT_CHUNK_OVERLAP" -> "9"))
    assert(!results.head.ok)
    assert(results.head.detail.contains("overlap"))
  }
}
