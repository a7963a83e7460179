package graft

import graft.operators.{Analytics, Sketches}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E61/E61a parametric form (r11): `profile(df, cols)` generates the
  * per-column aggregate list from the SCHEMA, so any table profiles with
  * one call — pinned here over a SECOND table (documents) and over a
  * synthetic frame exercising the null and fractional-canonicalization
  * rules. The registry queries q_profile/q_profile_hll are these same
  * generators applied to events, so their oracle checks pin the
  * events-shaped output; this spec pins the generality. */
class ProfileSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("exact profile over the documents table: schema-driven aggregates") {
    val docs = Tables.documents(spark, sf)
    val p = Analytics.profile(docs, Seq("doc_id", "n_chars", "lang", "text"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("doc_id", "n_chars", "lang", "text"))
    val n = docs.count()
    val langs = docs.select("lang").distinct().count()
    // integral columns carry min/max; strings carry null min/max
    val d = p("doc_id")
    assert(d.getLong(1) == n && d.getLong(2) == 0 && d.getLong(3) == n)
    assert(d.getLong(4) == 0 && d.getLong(5) == n - 1)
    val l = p("lang")
    assert(l.getLong(3) == langs && l.isNullAt(4) && l.isNullAt(5))
    val nc = p("n_chars")
    assert(nc.getLong(4) == docs.agg(min("n_chars")).head.getLong(0))
    assert(nc.getLong(5) == docs.agg(max("n_chars")).head.getLong(0))
  }

  test("sketch profile over documents: estimates track exact distincts") {
    val docs = Tables.documents(spark, sf)
    val est = Sketches.profile(docs, Seq("doc_id", "lang", "source"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = Analytics.profile(docs, Seq("doc_id", "lang", "source"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // G18's md5-register HLL: ±20% once the cardinality is a healthy
    // multiple of the register count (doc_id: 500 distinct); the raw
    // estimator is biased UP at tiny cardinalities (lang/source hold a
    // handful of values — the regime a profile reads as "low-cardinality
    // dimension column", where the exact twin is the tool), so those
    // pin ordering, not the band
    val (e, ex) = (est("doc_id"), exact("doc_id"))
    assert(e > ex * 0.8 && e < ex * 1.2,
      s"doc_id: estimate $e vs exact $ex out of band")
    assert(est("lang") > 0 && est("source") > 0)
    assert(est("lang") < e && est("source") < e,
      "low-cardinality estimates should sit far below the 500-distinct column")
  }

  test("null counting and fractional canonicalization on a synthetic frame") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 1.5, "a"), (2L, null, "b"), (3L, 1.5, null), (null, 2.25, "a"))
      .toDF("k", "v", "s")
    val p = Analytics.profile(df, Seq("k", "v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(2) == 1 && p("v").getLong(2) == 1 &&
      p("s").getLong(2) == 1, "null counts")
    assert(p("k").getLong(4) == 1 && p("k").getLong(5) == 3, "integral min/max")
    assert(p("v").isNullAt(4), "fractional column must not carry long min/max")
    assert(p("v").getLong(3) == 2 && p("s").getLong(3) == 2, "distincts")
    // the sketch twin canonicalizes doubles through DECIMAL(18,6): two
    // frames whose doubles differ only BEYOND six decimals must hash to
    // identical registers — same estimate to the bit
    val est = Sketches.profile(df, Seq("v")).collect().head.getDouble(3)
    val df2 = Seq[(java.lang.Double, java.lang.Double)](
      (1.5000000001, null), (null, null), (1.4999999999, null),
      (2.2500000004, null)).toDF("v", "pad").drop("pad")
    val est2 = Sketches.profile(df2, Seq("v")).collect().head.getDouble(3)
    assert(est == est2,
      s"DECIMAL(18,6) canonicalization leaked sub-precision bits: $est vs $est2")
    // an empty table profiles to zero rows (the registry-wide contract)
    assert(Analytics.profile(df.filter(lit(false)), Seq("k")).count() == 0)
    assert(Sketches.profile(df.filter(lit(false)), Seq("k")).count() == 0)
  }
}
