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

  // typed field validation parity with the reference's BotConfig
  // (Config/Schema.py:39-126): each bad value fails load() with the
  // offending key in the message

  private def failsWith(env: Map[String, String], fragment: String): Unit = {
    val e = intercept[IllegalArgumentException](GraftConfig.load(env))
    assert(e.getMessage.contains(fragment),
      s"expected '$fragment' in: ${e.getMessage}")
  }

  test("non-integer chunk size names the key") {
    failsWith(Map("GRAFT_CHUNK_SIZE" -> "twenty"), "GRAFT_CHUNK_SIZE")
  }

  test("port range is enforced (0 and 70000 rejected, 1..65535 accepted)") {
    failsWith(Map("GRAFT_STORE_PORT" -> "0"), "GRAFT_STORE_PORT")
    failsWith(Map("GRAFT_STORE_PORT" -> "70000"), "GRAFT_STORE_PORT")
    failsWith(Map("GRAFT_STORE_PORT" -> "8x80"), "GRAFT_STORE_PORT")
    assert(GraftConfig.load(Map("GRAFT_STORE_PORT" -> "65535")).storePort == 65535)
  }

  test("unknown store provider is rejected with the allowed enum listed") {
    failsWith(Map("GRAFT_STORE_PROVIDER" -> "weaviate"), "parquet")
    assert(GraftConfig.load(Map("GRAFT_STORE_PROVIDER" -> "Memory"))
      .storeProvider == "memory") // case-normalized like the reference
  }

  test("bool parsing matches the reference truthy set") {
    for (v <- Seq("true", "1", "yes", "on", "YES", "On"))
      assert(GraftConfig.load(Map("GRAFT_ENABLE_ENRICH" -> v)).enableEnrich, v)
    for (v <- Seq("false", "0", "no", "off", "banana", ""))
      assert(!GraftConfig.load(Map("GRAFT_ENABLE_ENRICH" -> v)).enableEnrich, v)
  }

  test("negative age, equal tags, empty channel list are rejected") {
    failsWith(Map("GRAFT_THREAD_MAX_AGE_DAYS" -> "-1"),
      "GRAFT_THREAD_MAX_AGE_DAYS")
    failsWith(Map("GRAFT_END_TAG" -> "#KNOWLEDGE"), "must differ")
    failsWith(Map("GRAFT_KNOWLEDGE_CHANNELS" -> " , ,"), "at least one")
  }
}
