package graft.operators

import graft.functions.Hashing
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-pattern operators (SURVEY §2 E15–E16, E19, E28): skew-safe
  * salted aggregation and join, cross-engine-deterministic HyperLogLog
  * and count-min sketches.
  */
object Sketches {

  /** E15: two-phase salted aggregation. A heavy-hitter group key melts
    * one reducer at 100 TB; salting splits each key across `Salt`
    * partial groups (map-side spread), then a second tiny aggregation
    * merges partials. The result is exactly the plain GROUP BY — the
    * oracle IS the unsalted query, proving the rewrite is lossless. */
  private val Salt = 8

  def qSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val partial = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        col("value").cast(DecimalType(12, 2)).as("v"))
      .withColumn("salt", Hashing.h60(col("event_id").cast("string")) % Salt)
      .groupBy("event_type", "salt")
      .agg(sum("v").as("pv"), count(lit(1)).as("pn"))
    partial.groupBy("event_type")
      .agg(sum("pv").cast("double").as("total_value"), sum("pn").as("n_events"))
      .orderBy("event_type")
  }

  val qSaltedAggSql: String = """
    SELECT event_type,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
      COUNT(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type"""

  /** E16: HyperLogLog distinct-count sketch as pure column expressions.
    * md5-derived hashes; 64 registers; register rank from length(bin(x))
    * (leading-zero count without engine-private intrinsics); registers
    * merge with MAX, so the shuffle carries ≤64 small ints per group
    * regardless of cardinality. The harmonic mean is accumulated in
    * EXACT scaled integers (Σ 2^(55−m) as int64), so the estimate is
    * bit-identical in any engine — a portable sketch format. Exact
    * distinct ships alongside for error inspection (estimate σ ≈ 13%). */
  private val HllM = 64
  private val Scale55 = "36028797018963968" // 2^55, exact in double too

  def qHllUsers(s: SparkSession, dir: String): DataFrame = {
    val registers = Tables.events(s, dir)
      .select(col("event_type"),
        Hashing.h60(col("user_id").cast("string")).as("h"))
      .select(col("event_type"),
        (col("h") % HllM).cast("int").as("reg"),
        (lit(55) - length(bin(expr(s"h div $HllM")))).as("rank"))
      .groupBy("event_type", "reg")
      .agg(max("rank").as("m"))
    val est = registers
      .withColumn("w", expr("shiftleft(cast(1 as bigint), cast(55 - m as int))"))
      .groupBy("event_type")
      .agg(sum("w").as("z_present"), count(lit(1)).as("n_present"))
      .withColumn("z",
        col("z_present") + (lit(HllM) - col("n_present")) * expr(s"cast($Scale55 as bigint)"))
      .select(col("event_type"),
        (lit(0.709) * lit((HllM * HllM).toDouble) * lit(Scale55.toDouble)
          / col("z").cast("double")).as("hll_estimate"))
    val exact = Tables.events(s, dir).groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_distinct"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("hll_estimate"), col("exact_distinct"))
      .orderBy("event_type")
  }

  val qHllUsersSql: String = s"""
    WITH regs AS (
      SELECT event_type,
        CAST(h % $HllM AS INT) AS reg,
        MAX(55 - length(bin(h // $HllM))) AS m
      FROM (SELECT event_type,
              ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
            FROM events)
      GROUP BY event_type, CAST(h % $HllM AS INT)),
    est AS (
      SELECT event_type,
        SUM(CAST(1 AS BIGINT) << (55 - m)) AS z_present,
        COUNT(*) AS n_present
      FROM regs GROUP BY event_type),
    final AS (
      SELECT event_type,
        CAST(0.709 AS DOUBLE) * ${(HllM * HllM).toDouble} * ${Scale55}.0
          / CAST(z_present + ($HllM - n_present) * CAST($Scale55 AS BIGINT) AS DOUBLE)
          AS hll_estimate
      FROM est),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type)
    SELECT event_type, hll_estimate, exact_distinct
    FROM final JOIN exact USING (event_type)
    ORDER BY event_type"""

  /** E19: count-min sketch heavy hitters — engine-portable CMS (depth 4 ×
    * width 256, md5-derived row hashes), built with one narrow explode +
    * (row, col) aggregation. The sketch is ≤1024 cells regardless of key
    * cardinality — at 100 TB it merges map-side and broadcasts — and the
    * per-key estimate is min over rows of the hashed cell, always ≥ the
    * true count. Output: top-10 keys by estimate with the exact count
    * alongside (the overestimate is visible, not hidden). */
  private val CmsDepth = 4
  private val CmsWidth = 256

  private def cmsCol(r: Int, key: org.apache.spark.sql.Column) =
    Hashing.h60(concat(lit(s"${r}_"), key.cast("string"))) % CmsWidth

  def qCmsTopk(s: SparkSession, dir: String): DataFrame = {
    // One aggregation over raw events, then everything — sketch cells AND
    // key probes — derives from the per-key counts. md5 volume drops from
    // 4·|events| to 4·|distinct users|, and the fact table is scanned once
    // (the shared `exact` exchange is reused across both consumers).
    val exact = Tables.events(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("exact_count"))
    val keyCells = exact.select(col("user_id"), col("exact_count"),
        posexplode(array((0 until CmsDepth).map(r =>
          cmsCol(r, col("user_id"))): _*)))
      .withColumnRenamed("pos", "r").withColumnRenamed("col", "c")
    // A cell's count is the sum of counts of every key hashing into it —
    // identical to counting raw events per cell, without touching events.
    val cells = keyCells.groupBy("r", "c").agg(sum("exact_count").as("cnt"))
    // exact_count rides along the probe aggregation (constant per key), so
    // no third join back to `exact` — both remaining consumers share the
    // identical per-key exchange subtree and the scan is reused.
    keyCells.join(broadcast(cells), Seq("r", "c"))
      .groupBy("user_id").agg(min("cnt").as("cms_estimate"),
        max("exact_count").as("exact_count"))
      .select("user_id", "cms_estimate", "exact_count")
      .orderBy(col("cms_estimate").desc, col("user_id"))
      .limit(10)
  }

  val qCmsTopkSql: String = s"""
    WITH cellkeys AS (
      SELECT user_id, r.range AS r,
        (('0x'||substr(md5(CAST(r.range AS VARCHAR) || '_' || CAST(user_id AS VARCHAR)),1,15))::BIGINT % $CmsWidth) AS c
      FROM events CROSS JOIN range($CmsDepth) r),
    cells AS (
      SELECT r, c, COUNT(*) AS cnt FROM cellkeys GROUP BY r, c),
    keyprobe AS (
      SELECT DISTINCT user_id, r, c FROM cellkeys),
    est AS (
      SELECT k.user_id, MIN(cells.cnt) AS cms_estimate
      FROM keyprobe k JOIN cells ON cells.r = k.r AND cells.c = k.c
      GROUP BY k.user_id),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id)
    SELECT est.user_id, cms_estimate, exact_count
    FROM est JOIN exact USING (user_id)
    ORDER BY cms_estimate DESC, est.user_id
    LIMIT 10"""

  /** E16n: the HLL sketch as a native MERGEABLE aggregate
    * ([[graft.plans.HllEstimate]], G18) — same registers, same exact
    * int64 estimate as E16, but the shuffle carries ONE 64-byte register
    * buffer per (mapper, group) with map-side partial aggregation,
    * instead of E16's 64 (group, register) rows through a two-level
    * aggregation. Same oracle as E16 — the expression form's SQL
    * validates the aggregate unchanged. */
  def qHllNative(s: SparkSession, dir: String): DataFrame = {
    // the exact count lives in its OWN aggregation: count(distinct)
    // in the same agg would force Spark's two-phase distinct expansion,
    // keying the first shuffle by (type, user) — the register buffers
    // would ride a per-user shuffle and the one-buffer-per-mapper
    // property (the aggregate's whole point) would be lost
    val est = Tables.events(s, dir)
      .select(col("event_type"),
        Hashing.h60(col("user_id").cast("string")).as("h"))
      .groupBy("event_type")
      .agg(call_function("graft_hll_est", col("h")).as("hll_estimate"))
    val exact = Tables.events(s, dir).groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_distinct"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("hll_estimate"), col("exact_distinct"))
      .orderBy("event_type")
  }

  /** E61a: the sketch-served twin of E61's exact single-pass profile —
    * the 100 TB default for feeds where approximate distincts suffice.
    * Same one-scan shape (row count, null count, min/max for integral
    * columns), but `n_distinct` is replaced by a [[graft.plans
    * .HllEstimate]] per column: the exact variant's multi-column
    * COUNT(DISTINCT) plans through Spark's expand — one input row fans
    * to one row per distinct column and the aggregation state is
    * O(distinct values × columns), the one operator in the registry
    * whose shuffle state is data-sized by definition — while this one
    * carries ONE 64-byte register buffer per (mapper, column), no
    * expand, mergeable map-side. The estimate is md5-deterministic (the
    * G18 registers), so it stays exactly oracle-checkable; hashing
    * canonicalizes each column to a cross-engine-stable string (longs
    * cast directly; the double column through DECIMAL(18,6), the classic
    * float-formatting parity trap sidestepped). */
  def qProfileHll(s: SparkSession, dir: String): DataFrame =
    profile(Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us")),
      Seq("event_id", "user_id", "ts_us", "event_type", "value"))

  /** E61a parametric form (r11): the sketch profile over ANY table — the
    * per-column aggregate list is generated from the SCHEMA: integral
    * columns add BIGINT min/max; fractional columns (double/float/
    * decimal) canonicalize through DECIMAL(18,6) before hashing (the
    * cross-engine float-formatting rule the hardwired version applied to
    * `value`); everything hashes via its string form into one
    * md5-deterministic HLL register set per column. [[qProfileHll]] is
    * this applied to the events table. One scan, one 64-byte register
    * buffer per (mapper, column) — no expand, mergeable map-side, the
    * 100 TB default profile. */
  def profile(df: DataFrame, colNames: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val cols: Seq[(String, Boolean)] = colNames.map { nm =>
      nm -> (df.schema(nm).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    }
    def canon(nm: String): Column = df.schema(nm).dataType match {
      case DoubleType | FloatType | _: DecimalType =>
        col(nm).cast(DecimalType(18, 6)).cast("string")
      case _ => col(nm).cast("string")
    }
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap {
      case (nm, integral) =>
        Seq(count(col(nm)).as(s"nn_$nm"),
          call_function("graft_hll_est", Hashing.h60(canon(nm)))
            .as(s"nd_$nm")) ++
          (if (integral)
            Seq(min(col(nm)).cast("long").as(s"mn_$nm"),
              max(col(nm)).cast("long").as(s"mx_$nm"))
          else Nil)
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { case (nm, integral) =>
        struct(lit(nm).as("col_name"), col("n_rows"),
          (col("n_rows") - col(s"nn_$nm")).as("n_nulls"),
          col(s"nd_$nm").as("n_distinct_est"),
          (if (integral) col(s"mn_$nm") else lit(null).cast("long"))
            .as("min_long"),
          (if (integral) col(s"mx_$nm") else lit(null).cast("long"))
            .as("max_long"))
      }: _*)).as("p"))
      .select("p.*")
      .filter(col("n_rows") > 0) // empty-input contract: emit nothing
      .orderBy("col_name")
  }

  val qProfileHllSql: String = {
    def h(nm: String): String = {
      val canon =
        if (nm == "value") s"CAST(CAST($nm AS DECIMAL(18,6)) AS VARCHAR)"
        else s"CAST($nm AS VARCHAR)"
      s"('0x'||substr(md5($canon),1,15))::BIGINT"
    }
    def leg(nm: String, integral: Boolean): String = {
      val mn = if (integral) s"CAST(MIN($nm) AS BIGINT)" else "CAST(NULL AS BIGINT)"
      val mx = if (integral) s"CAST(MAX($nm) AS BIGINT)" else "CAST(NULL AS BIGINT)"
      s"""SELECT '$nm' AS col_name, st.n_rows, st.n_nulls,
        hll.n_distinct_est, st.min_long, st.max_long
      FROM (SELECT COUNT(*) AS n_rows, COUNT(*) - COUNT($nm) AS n_nulls,
              $mn AS min_long, $mx AS max_long FROM ev
            HAVING COUNT(*) > 0) st,
           (SELECT CAST(0.709 AS DOUBLE) * ${(HllM * HllM).toDouble} * ${Scale55}.0
              / CAST(z_present + ($HllM - n_present) * CAST($Scale55 AS BIGINT) AS DOUBLE)
              AS n_distinct_est
            FROM (SELECT SUM(CAST(1 AS BIGINT) << (55 - m)) AS z_present,
                    COUNT(*) AS n_present
                  FROM (SELECT CAST(h % $HllM AS INT) AS reg,
                          MAX(55 - length(bin(h // $HllM))) AS m
                        FROM (SELECT ${h(nm)} AS h FROM ev)
                        WHERE h IS NOT NULL
                        GROUP BY CAST(h % $HllM AS INT)))) hll"""
    }
    s"""
    WITH ev AS (
      SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
      FROM events)
    ${Seq("event_id" -> true, "user_id" -> true, "ts_us" -> true,
      "event_type" -> false, "value" -> false)
      .map { case (nm, i) => leg(nm, i) }.mkString("\n    UNION ALL\n    ")}
    ORDER BY col_name"""
  }

  /** E31: HLL sketch MERGE — the property that makes sketches work at
    * 100 TB: registers built independently per shard (here per day)
    * combine with element-wise MAX into exactly the registers a global
    * pass would build, so distinct counts merge without re-touching the
    * data. The pipeline: per-(type, day) registers → MAX-merge per type
    * → the same exact-int64 estimate as E16 — and because MAX is
    * associative the merged estimate is bit-identical to E16's
    * single-pass estimate, which is precisely what the oracle (written
    * in the same two-level shape) hash-checks. At scale the per-shard
    * sketch table is the only thing that moves: ≤64 small ints per
    * (shard, group), mergeable in any order, incrementally updatable as
    * new days land. */
  def qHllMerge(s: SparkSession, dir: String): DataFrame = {
    val dayRegs = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        Hashing.h60(col("user_id").cast("string")).as("h"))
      .select(col("event_type"), col("day"),
        (col("h") % HllM).cast("int").as("reg"),
        (lit(55) - length(bin(expr(s"h div $HllM")))).as("rank"))
      .groupBy("event_type", "day", "reg")
      .agg(max("rank").as("m"))
    val merged = dayRegs.groupBy("event_type", "reg").agg(max("m").as("m"))
    val days = dayRegs.groupBy("event_type")
      .agg(countDistinct("day").as("n_days"))
    merged
      .withColumn("w", expr("shiftleft(cast(1 as bigint), cast(55 - m as int))"))
      .groupBy("event_type")
      .agg(sum("w").as("z_present"), count(lit(1)).as("n_present"))
      .withColumn("z",
        col("z_present") + (lit(HllM) - col("n_present")) * expr(s"cast($Scale55 as bigint)"))
      .join(days, "event_type")
      .select(col("event_type"), col("n_days"),
        (lit(0.709) * lit((HllM * HllM).toDouble) * lit(Scale55.toDouble)
          / col("z").cast("double")).as("hll_estimate"))
      .orderBy("event_type")
  }

  val qHllMergeSql: String = s"""
    WITH dayregs AS (
      SELECT event_type, date_trunc('day', ts) AS day,
        CAST(h % $HllM AS INT) AS reg,
        MAX(55 - length(bin(h // $HllM))) AS m
      FROM (SELECT event_type, ts,
              ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
            FROM events)
      GROUP BY event_type, date_trunc('day', ts), CAST(h % $HllM AS INT)),
    merged AS (
      SELECT event_type, reg, MAX(m) AS m
      FROM dayregs GROUP BY event_type, reg),
    days AS (
      SELECT event_type, COUNT(DISTINCT day) AS n_days
      FROM dayregs GROUP BY event_type),
    est AS (
      SELECT event_type,
        SUM(CAST(1 AS BIGINT) << (55 - m)) AS z_present,
        COUNT(*) AS n_present
      FROM merged GROUP BY event_type)
    SELECT est.event_type, days.n_days,
      CAST(0.709 AS DOUBLE) * ${(HllM * HllM).toDouble} * ${Scale55}.0
        / CAST(z_present + ($HllM - n_present) * CAST($Scale55 AS BIGINT) AS DOUBLE)
        AS hll_estimate
    FROM est JOIN days USING (event_type)
    ORDER BY est.event_type"""

  /** E28: skew-safe salted JOIN — the join-side twin of E15. The fact
    * table joins per-key statistics back on `event_type`, a 5-value key:
    * a plain shuffle join would land each hot key on ONE reducer (5 busy
    * tasks at 100 TB, the rest idle). Remedy: replicate the stats side
    * `Salt` ways (`explode(sequence)`), salt the fact side by a hash of
    * its row id, and equi-join on (key, salt) — each hot key spreads
    * over `Salt` reducers and the join result is EXACTLY the unsalted
    * join, which is what the oracle runs. The SHUFFLE_HASH hint pins the
    * shuffle path so the demo exercises what it demonstrates (unhinted,
    * Spark would broadcast this tiny stats side — the right call in
    * production when the dim fits, in which case salting is unneeded;
    * salting is the remedy when the replicated side is itself too big to
    * broadcast, e.g. per-user stats with hot users). AQE's skew-join
    * split covers sort-merge joins at runtime; salting is the
    * plan-level form that also works without AQE.
    *
    * The query itself is groupwise normalization — count each type's
    * events above the type mean. "Above mean" is tested as
    * v·n > Σv in exact decimal×int arithmetic: no division, no IEEE
    * drift, oracle hash-matches bit-for-bit. */
  private val JoinSalt = 16

  def qSkewJoin(s: SparkSession, dir: String): DataFrame = {
    def v = col("value").cast(DecimalType(12, 2))
    val facts = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), v.as("v"))
      .withColumn("salt", Hashing.h60(col("event_id").cast("string")) % JoinSalt)
    val stats = Tables.events(s, dir)
      .select(col("event_type"), v.as("v"))
      .groupBy("event_type").agg(sum("v").as("tv"), count(lit(1)).as("n"))
      .withColumn("salt", explode(sequence(lit(0L), lit(JoinSalt - 1L))))
    facts.join(stats.hint("SHUFFLE_HASH"), Seq("event_type", "salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("v") * col("n") > col("tv"), 1).otherwise(0))
          .as("n_above"))
      .orderBy("event_type")
  }

  val qSkewJoinSql: String = """
    WITH stats AS (
      SELECT event_type, SUM(CAST(value AS DECIMAL(12,2))) AS tv,
             COUNT(*) AS n
      FROM events GROUP BY event_type)
    SELECT e.event_type, COUNT(*) AS n_events,
      CAST(SUM(CASE WHEN CAST(e.value AS DECIMAL(12,2)) * s.n > s.tv
               THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM events e JOIN stats s USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type"""

  /** E35n: the E35 histogram-quantile question answered by the G24
    * native mergeable aggregate `graft_qhist` — ONE aggregation with
    * map-side partial (edge → count) maps, no shuffled histogram, no
    * windows; quantile picks happen inside `eval` per group. The same
    * bucket/pick math as the composed form, so E35's DuckDB oracle
    * validates the aggregate unchanged. The sketch-aggregate family is
    * now cardinality (G18 HLL) + frequency (G17 top-k) + quantiles. */
  def qQhistNative(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(call_function("graft_qhist", col("value"), lit(10.0d),
        lit(0.5d), lit(0.9d), lit(0.99d)).as("q"))
      .select(col("event_type"), col("q.p50_edge"), col("q.p90_edge"),
        col("q.p99_edge"), col("q.n_events"))
      .orderBy("event_type")

  /** E42: cross-set overlap via the G29 KMV (theta-style) sketch — the
    * distinct-intersection question HLL (E16/G18) cannot answer. Per
    * event_type the `graft_kmv` aggregate retains the k = 128 minimum
    * md5-60 user hashes (bounded mergeable state, map-side combined);
    * every pair of types is then compared with pure ARRAY ARITHMETIC on
    * the two sketches: union sketch = k smallest of the merged lists,
    * θ = v_k / 2^60 its sampled fraction, per-set distinct estimates
    * (k−1)·M/v_k, intersection estimate |union-sketch ∩ A ∩ B| / θ, and
    * a Jaccard estimate from the same hits — the DataSketches
    * theta-intersection algebra as Column expressions. Unsaturated
    * sketches (m < k) hold the whole set, so estimates switch to exact
    * counts. Exact integers until the final IEEE divisions, so DuckDB
    * (relational restatement: row_number-ranked hashes instead of
    * arrays) matches bit-for-bit. The 5×5 type-pair join is a bounded
    * dimension cross, broadcast by construction; at 100 TB only the
    * per-source 128-long sketches move. */
  def qKmvOverlap(s: SparkSession, dir: String): DataFrame = {
    val sk = Tables.events(s, dir)
      .select(col("event_type"),
        Hashing.h60(col("user_id").cast("string")).as("h"))
      .groupBy("event_type")
      .agg(call_function("graft_kmv", col("h"), lit(KmvK)).as("kmv"))
    kmvOverlap(sk, "event_type", KmvK)
      .withColumnRenamed("key_a", "type_a")
      .withColumnRenamed("key_b", "type_b")
      .orderBy("type_a", "type_b")
  }

  /** E43: KMV sketch rollup — the union-merge algebra of G29 at the
    * query level, mirroring E31's HLL rollup: per (event_type, day) user
    * sketches are merged up to event_type with pure array arithmetic
    * (concat → distinct → sort → first k), and the merged estimate is
    * emitted NEXT TO the directly-built whole-set sketch estimate. The
    * two are provably identical — any of the k global minima is within
    * its own day's k minima, so k-min-of-union-of-k-mins ≡ k-min of the
    * whole set — and the oracle checks that equality row by row
    * (`merge_lossless` must be true). This is what makes per-shard KMV
    * sidecars a safe 100 TB artifact: daily/shard sketches roll up to
    * any coarser grain after the fact with NO loss vs re-scanning, the
    * same re-aggregatable-artifact contract as E31.
    *
    * Scale shape: one (type, day) aggregation with bounded state, one
    * k-array merge per type over #days rows, one broadcastable 5-row
    * join; the raw events are scanned twice only because the direct
    * sketch is deliberately rebuilt as the proof's other side. */
  def qKmvRollup(s: SparkSession, dir: String): DataFrame = {
    val k = KmvK
    val hashed = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        Hashing.h60(col("user_id").cast("string")).as("h"))
    val daySk = hashed.groupBy("event_type", "day")
      .agg(call_function("graft_kmv", col("h"), lit(k)).as("kmv"))
    val merged = daySk.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
          1, k).as("kmv_merged"))
    val direct = hashed.groupBy("event_type")
      .agg(call_function("graft_kmv", col("h"), lit(k)).as("kmv_direct"))
    merged.join(direct, "event_type")
      .select(col("event_type"), col("n_days"),
        kmvEstimate(col("kmv_merged"), k).as("est_merged"),
        kmvEstimate(col("kmv_direct"), k).as("est_direct"),
        (col("kmv_merged") === col("kmv_direct")).as("merge_lossless"))
      .orderBy("event_type")
  }

  val qKmvRollupSql: String = s"""
    WITH h AS (
      SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
        ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
      FROM events),
    day_sk AS (
      SELECT event_type, day, h FROM (
        SELECT event_type, day, h,
          row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rk
        FROM h)
      WHERE rk <= 128),
    days AS (SELECT event_type, COUNT(DISTINCT day) AS n_days
             FROM day_sk GROUP BY event_type),
    merged AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        FROM (SELECT DISTINCT event_type, h FROM day_sk))
      WHERE rk <= 128),
    mst AS (SELECT event_type, COUNT(*) AS m, MAX(h) AS vk
            FROM merged GROUP BY event_type),
    direct AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h)  AS rk
        FROM (SELECT DISTINCT event_type, h FROM h))
      WHERE rk <= 128),
    dst AS (SELECT event_type, COUNT(*) AS m, MAX(h) AS vk
            FROM direct GROUP BY event_type),
    eq AS (
      SELECT m.event_type,
        COUNT(d.h) = MAX(ms.m) AND MAX(ms.m) = MAX(ds.m) AS merge_lossless
      FROM merged m
      LEFT JOIN direct d ON d.event_type = m.event_type AND d.h = m.h
      JOIN mst ms ON ms.event_type = m.event_type
      JOIN dst ds ON ds.event_type = m.event_type
      GROUP BY m.event_type)
    SELECT days.event_type, days.n_days,
      CASE WHEN ms.m < 128 THEN CAST(ms.m AS DOUBLE)
           ELSE 127.0 * 1152921504606846976.0 / CAST(ms.vk AS DOUBLE)
      END AS est_merged,
      CASE WHEN ds.m < 128 THEN CAST(ds.m AS DOUBLE)
           ELSE 127.0 * 1152921504606846976.0 / CAST(ds.vk AS DOUBLE)
      END AS est_direct,
      eq.merge_lossless
    FROM days
    JOIN mst ms ON ms.event_type = days.event_type
    JOIN dst ds ON ds.event_type = days.event_type
    JOIN eq ON eq.event_type = days.event_type
    ORDER BY days.event_type"""

  // ---- shared KMV estimator algebra (every G29 consumer) ---------------

  /** 2^60 — the h60 hash space every KMV estimate divides by. */
  private[graft] val KmvSpace = 1152921504606846976L

  /** The k every G29 sketch in this library is built with. The estimator
    * and the sketch MUST agree on k: estimating a k=64 sketch with
    * k=128 makes every saturated sketch look "unsaturated" and reports
    * the retained-hash count as the distinct count — plausible-looking
    * and badly wrong. One shared constant instead of repeated literals. */
  val KmvK = 128

  /** KMV distinct estimate: exact retained count below saturation, else
    * the (k−1)·M/v_k order-statistic estimator. */
  private[graft] def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(KmvSpace.toDouble)
        / element_at(kmv, k).cast("double"))

  /** k-min union sketch of two sketches (theta-union). */
  private[graft] def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Union-sketch hashes present in BOTH inputs — the uniform
    * intersection sample within the union's θ-region. */
  private[graft] def kmvHits(u: Column, a: Column, b: Column): Column =
    size(array_intersect(array_intersect(u, a), b))

  /** The E42 theta set-algebra over ANY (key, kmv) sketch table built
    * with `graft_kmv(h, k)`: one row per unordered key pair with
    * per-set, union, and intersection distinct estimates plus a Jaccard
    * estimate. Pure array arithmetic — reusable wherever per-partition
    * sketches already exist (q_kmv_overlap over event types, G19's
    * per-source corpus-overlap audit). Unsaturated sketches (m < k)
    * give exact counts. `k` MUST be the k the sketches were built with
    * (see [[KmvK]]). Pairs where BOTH sketches are empty are dropped —
    * matching the relational oracle's inner join (and keeping v_k's
    * element_at off the empty array, which would throw). */
  def kmvOverlap(sk: DataFrame, key: String, k: Int): DataFrame = {
    val a = sk.select(col(key).as("key_a"), col("kmv").as("kmv_a"))
    val b = sk.select(col(key).as("key_b"), col("kmv").as("kmv_b"))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("u", kmvUnion(col("kmv_a"), col("kmv_b"), k))
      .withColumn("mu", size(col("u")))
      .filter(col("mu") > 0)
      .withColumn("vku", element_at(col("u"), col("mu")))
      .withColumn("c", kmvHits(col("u"), col("kmv_a"), col("kmv_b")))
      .select(col("key_a"), col("key_b"),
        kmvEstimate(col("kmv_a"), k).as("est_a"),
        kmvEstimate(col("kmv_b"), k).as("est_b"),
        when(col("mu") < k, col("mu").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(KmvSpace.toDouble)
            / col("vku").cast("double")).as("est_union"),
        when(col("mu") < k, col("c").cast("double"))
          .otherwise(col("c").cast("double") * lit(KmvSpace.toDouble)
            / col("vku").cast("double")).as("est_inter"),
        (col("c").cast("double") / col("mu").cast("double")).as("kmv_jaccard"))
  }

  val qKmvOverlapSql: String = s"""
    WITH h AS (
      SELECT DISTINCT event_type,
        ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
      FROM events),
    sk AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        FROM h)
      WHERE rk <= 128),
    st AS (SELECT event_type, COUNT(*) AS m, MAX(h) AS vk
           FROM sk GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, a.m AS ma, a.vk AS vka,
             b.event_type AS type_b, b.m AS mb, b.vk AS vkb
      FROM st a JOIN st b ON a.event_type < b.event_type),
    uni0 AS (
      SELECT p.type_a, p.type_b, s.h
      FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY p.type_a, p.type_b, s.h),
    uni AS (
      SELECT type_a, type_b, h FROM (
        SELECT type_a, type_b, h,
          row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rk
        FROM uni0)
      WHERE rk <= 128),
    ust AS (SELECT type_a, type_b, COUNT(*) AS mu, MAX(h) AS vku
            FROM uni GROUP BY type_a, type_b),
    hits AS (
      SELECT u.type_a, u.type_b, COUNT(*) AS c
      FROM uni u
      JOIN sk sa ON sa.event_type = u.type_a AND sa.h = u.h
      JOIN sk sb ON sb.event_type = u.type_b AND sb.h = u.h
      GROUP BY u.type_a, u.type_b)
    SELECT p.type_a, p.type_b,
      CASE WHEN p.ma < 128 THEN CAST(p.ma AS DOUBLE)
           ELSE 127.0 * 1152921504606846976.0 / CAST(p.vka AS DOUBLE)
      END AS est_a,
      CASE WHEN p.mb < 128 THEN CAST(p.mb AS DOUBLE)
           ELSE 127.0 * 1152921504606846976.0 / CAST(p.vkb AS DOUBLE)
      END AS est_b,
      CASE WHEN u.mu < 128 THEN CAST(u.mu AS DOUBLE)
           ELSE 127.0 * 1152921504606846976.0 / CAST(u.vku AS DOUBLE)
      END AS est_union,
      CASE WHEN u.mu < 128 THEN CAST(COALESCE(ht.c, 0) AS DOUBLE)
           ELSE CAST(COALESCE(ht.c, 0) AS DOUBLE) * 1152921504606846976.0
                / CAST(u.vku AS DOUBLE)
      END AS est_inter,
      CAST(COALESCE(ht.c, 0) AS DOUBLE) / CAST(u.mu AS DOUBLE) AS kmv_jaccard
    FROM pairs p
    JOIN ust u ON u.type_a = p.type_a AND u.type_b = p.type_b
    LEFT JOIN hits ht ON ht.type_a = p.type_a AND ht.type_b = p.type_b
    ORDER BY p.type_a, p.type_b"""

  // E46 (G30's oracle query): 4096-bit sketch, 3 double-hashed probes.
  private val BloomBits = 4096
  private val BloomK = 3

  /** E46: native Bloom semi-join pre-filter — the G30 sketch doing E20's
    * job without E20's exploded hash-row build. High-balance customers
    * (the small dim-side predicate) are folded into ONE m-bit blob by the
    * mergeable `graft_bloom` aggregate (bounded state, map-side combined);
    * the orders fact scan is then filtered by the codegen'd
    * `graft_bloom_contains` probe against the broadcast 1-row sketch — at
    * 100 TB the fact side never shuffles and ships nothing but its
    * survivors. The query reports, per order priority, how many orders
    * the sketch admits next to how many an exact membership join admits:
    * the gap IS the false-positive overhead, and `bloom_pass ≥
    * exact_pass` row-by-row is the no-false-negative contract made
    * visible. Oracle: the bit math restated relationally — a candidate
    * passes iff all k of its double-hashed positions land in the DISTINCT
    * position set of the member keys (same salted md5-60 hashes, same
    * modulus), which is exactly the Bloom semantics without a bit array. */
  def qBloomNative(s: SparkSession, dir: String): DataFrame = {
    val members = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 7000).select(col("c_custkey"))
    val sketch = members.agg(
      call_function("graft_bloom", col("c_custkey").cast("string"),
        lit(BloomBits), lit(BloomK)).as("bf"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderpriority"))
      .crossJoin(broadcast(sketch)) // 1-row sketch attach (bounded)
      .withColumn("pass", call_function("graft_bloom_contains",
        col("bf"), col("o_custkey").cast("string"), lit(BloomK)))
      .join(broadcast(members), col("o_custkey") === col("c_custkey"), "left")
      .groupBy("o_orderpriority")
      .agg(sum(when(col("pass"), 1L).otherwise(0L)).as("bloom_pass"),
        sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)).as("exact_pass"))
      .orderBy("o_orderpriority")
  }

  val qBloomNativeSql: String = s"""
    WITH members AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 7000),
    ks AS (SELECT range AS i FROM range($BloomK)),
    mh AS (
      SELECT
        ('0x'||substr(md5('b1|'||CAST(c_custkey AS VARCHAR)),1,15))::BIGINT AS h1,
        ('0x'||substr(md5('b2|'||CAST(c_custkey AS VARCHAR)),1,15))::BIGINT AS h2
      FROM members),
    mbits AS (
      SELECT DISTINCT (h1 + i * h2) % $BloomBits AS b FROM mh CROSS JOIN ks),
    oh AS (
      SELECT o_orderkey, o_custkey, o_orderpriority,
        ('0x'||substr(md5('b1|'||CAST(o_custkey AS VARCHAR)),1,15))::BIGINT AS h1,
        ('0x'||substr(md5('b2|'||CAST(o_custkey AS VARCHAR)),1,15))::BIGINT AS h2
      FROM orders),
    obits AS (
      SELECT o_orderkey, o_custkey, o_orderpriority,
        (h1 + i * h2) % $BloomBits AS b
      FROM oh CROSS JOIN ks),
    per_order AS (
      SELECT o_orderkey, o_custkey, o_orderpriority,
        BOOL_AND(mb.b IS NOT NULL) AS pass
      FROM obits LEFT JOIN mbits mb ON mb.b = obits.b
      GROUP BY o_orderkey, o_custkey, o_orderpriority)
    SELECT o_orderpriority,
      CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS bloom_pass,
      CAST(SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM members)
               THEN 1 ELSE 0 END) AS BIGINT) AS exact_pass
    FROM per_order
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** E48: RFM (recency / frequency / monetary) customer segmentation —
    * the classic CRM cut, built the way 100 TB forces: the quartile
    * boundaries come from the G24 `graft_qhist` mergeable histogram
    * sketch (three sketches in ONE bounded-state pass over the per-user
    * profile), never from an `ntile() OVER (ORDER BY ...)` global sort
    * window — the textbook RFM spelling that funnels every user through
    * one task. Scores compare each user's own bucket edge against the
    * sketch's quartile edges (same quantized space both sides, so ties
    * are bucket-exact and engine-independent); R is inverted so 4 =
    * most recent across all three axes. Output is the ≤ 4³ segment
    * histogram. Exact arithmetic end-to-end: day = epoch div 86400,
    * monetary summed as DECIMAL then bucketed on an exactly-representable
    * double. Oracle: the E35 composed histogram-quantile form, once per
    * metric, over the same user profile. */
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        (unix_timestamp(col("ts")) - pmod(unix_timestamp(col("ts")), lit(86400L)))
          .divide(lit(86400L)).cast("long").as("day"),
        col("value").cast(DecimalType(12, 2)).as("v"))
    val users = ev.groupBy("user_id").agg(
      max("day").as("last_day"), count(lit(1)).as("freq"), sum("v").as("mon"))
    val gmax = users.agg(max("last_day").as("maxd"))
    val u = users.crossJoin(broadcast(gmax))
      .select(col("user_id"), (col("maxd") - col("last_day")).as("rec"),
        col("freq"), col("mon").cast("double").as("mond"))
    val edges = u.agg(
      call_function("graft_qhist", col("rec"), lit(1.0d),
        lit(0.25d), lit(0.5d), lit(0.75d)).as("re"),
      call_function("graft_qhist", col("freq"), lit(1.0d),
        lit(0.25d), lit(0.5d), lit(0.75d)).as("fe"),
      call_function("graft_qhist", col("mond"), lit(100.0d),
        lit(0.25d), lit(0.5d), lit(0.75d)).as("me"))
    def above(vEdge: Column, q: String, e: String): Column =
      (vEdge > col(s"$e.p${q}_edge")).cast("int")
    def score(vEdge: Column, e: String): Column =
      lit(1) + above(vEdge, "25", e) + above(vEdge, "50", e) +
        above(vEdge, "75", e)
    u.crossJoin(broadcast(edges))
      .select(
        (lit(5) - score(col("rec") + 1, "re")).as("r_score"),
        score(col("freq") + 1, "fe").as("f_score"),
        score((floor(col("mond") / 100) * 100 + 100).cast("long"), "me")
          .as("m_score"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("r_score", "f_score", "m_score")
  }

  val qRfmSql: String = """
    WITH ev AS (
      SELECT user_id,
        CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day,
        CAST(value AS DECIMAL(12,2)) AS v
      FROM events),
    users AS (
      SELECT user_id, MAX(day) AS last_day, COUNT(*) AS freq, SUM(v) AS mon
      FROM ev GROUP BY user_id),
    gmax AS (SELECT MAX(last_day) AS maxd FROM users),
    u AS (
      SELECT user_id, (maxd - last_day) AS rec, freq,
        CAST(mon AS DOUBLE) AS mond
      FROM users CROSS JOIN gmax),
    rhist AS (SELECT rec + 1 AS edge, COUNT(*) AS cnt FROM u GROUP BY rec + 1),
    rcum AS (SELECT edge, SUM(cnt) OVER (ORDER BY edge) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM rhist),
    redges AS (SELECT
      MIN(CASE WHEN cum >= ceil(0.25 * n) THEN edge END) AS q1,
      MIN(CASE WHEN cum >= ceil(0.5 * n) THEN edge END) AS q2,
      MIN(CASE WHEN cum >= ceil(0.75 * n) THEN edge END) AS q3 FROM rcum),
    fhist AS (SELECT freq + 1 AS edge, COUNT(*) AS cnt FROM u GROUP BY freq + 1),
    fcum AS (SELECT edge, SUM(cnt) OVER (ORDER BY edge) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM fhist),
    fedges AS (SELECT
      MIN(CASE WHEN cum >= ceil(0.25 * n) THEN edge END) AS q1,
      MIN(CASE WHEN cum >= ceil(0.5 * n) THEN edge END) AS q2,
      MIN(CASE WHEN cum >= ceil(0.75 * n) THEN edge END) AS q3 FROM fcum),
    mhist AS (
      SELECT CAST(floor(mond / 100) AS BIGINT) * 100 + 100 AS edge,
        COUNT(*) AS cnt
      FROM u GROUP BY CAST(floor(mond / 100) AS BIGINT) * 100 + 100),
    mcum AS (SELECT edge, SUM(cnt) OVER (ORDER BY edge) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM mhist),
    medges AS (SELECT
      MIN(CASE WHEN cum >= ceil(0.25 * n) THEN edge END) AS q1,
      MIN(CASE WHEN cum >= ceil(0.5 * n) THEN edge END) AS q2,
      MIN(CASE WHEN cum >= ceil(0.75 * n) THEN edge END) AS q3 FROM mcum),
    scored AS (
      SELECT
        5 - (1 + CASE WHEN rec + 1 > r.q1 THEN 1 ELSE 0 END
               + CASE WHEN rec + 1 > r.q2 THEN 1 ELSE 0 END
               + CASE WHEN rec + 1 > r.q3 THEN 1 ELSE 0 END) AS r_score,
        1 + CASE WHEN freq + 1 > f.q1 THEN 1 ELSE 0 END
          + CASE WHEN freq + 1 > f.q2 THEN 1 ELSE 0 END
          + CASE WHEN freq + 1 > f.q3 THEN 1 ELSE 0 END AS f_score,
        1 + CASE WHEN CAST(floor(mond / 100) AS BIGINT) * 100 + 100 > m.q1 THEN 1 ELSE 0 END
          + CASE WHEN CAST(floor(mond / 100) AS BIGINT) * 100 + 100 > m.q2 THEN 1 ELSE 0 END
          + CASE WHEN CAST(floor(mond / 100) AS BIGINT) * 100 + 100 > m.q3 THEN 1 ELSE 0 END AS m_score
      FROM u CROSS JOIN redges r CROSS JOIN fedges f CROSS JOIN medges m)
    SELECT r_score, f_score, m_score, COUNT(*) AS n_users
    FROM scored GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score"""

  /** E59: time-decayed engagement score — the feature-store staple
    * (recency-weighted activity) made ENGINE-REPRODUCIBLE: a weekly
    * half-life means weight 2^−w for an event w whole weeks before the
    * corpus's last day, so scoring in fixed-point units of 2^−20
    * (weights capped at 20 weeks — beyond that the weight is below one
    * unit anyway) keeps every sum an exact int64: units =
    * cents · 2^(20−min(w,20)). The only float op is ONE final division
    * of an exact long < 2^53 by the constant 2^20 — correctly rounded
    * identically in both engines, unlike the textbook exp(−λΔt) sum
    * whose answer depends on the engine's reduction order. The max-day
    * anchor is a 1-row broadcast attach (the q_rfm shape, allowlisted);
    * everything else is one keyed aggregation with map-side partials. */
  def qDecayScore(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"),
        expr("unix_timestamp(ts) div 86400").as("day"))
    val anchor = ev.agg(max("day").as("max_day"))
    ev.crossJoin(broadcast(anchor)) // 1-row anchor attach
      .withColumn("w", least(expr("(max_day - day) div 7"), lit(20L)))
      .select(col("user_id"),
        (col("cents") *
          expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - w AS INT))")).as("u"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("u").as("score_units"))
      .withColumn("decay_score",
        col("score_units").cast("double") / lit(1048576.0d))
      .select("user_id", "n_events", "score_units", "decay_score")
      .orderBy("user_id")
  }

  val qDecayScoreSql: String = """
    WITH ev AS (
      SELECT user_id,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS day
      FROM events),
    anchor AS (SELECT MAX(day) AS max_day FROM ev),
    u AS (
      SELECT user_id,
        cents * (CAST(1 AS BIGINT) <<
          (20 - LEAST((max_day - day) // 7, 20))) AS u
      FROM ev CROSS JOIN anchor)
    SELECT user_id, COUNT(*) AS n_events,
      CAST(SUM(u) AS BIGINT) AS score_units,
      CAST(CAST(SUM(u) AS BIGINT) AS DOUBLE) / 1048576.0 AS decay_score
    FROM u GROUP BY user_id ORDER BY user_id"""

  /** E57: model lift / gains table — the decile report every
    * propensity-targeting evaluation starts with: rank users by an
    * engagement score, cut into 10 deciles, report per-decile and
    * cumulative conversion against the base rate. The scale-critical
    * choice: deciles come from the G24 histogram sketch's exact edges
    * (one mergeable aggregation + a broadcast 1-row attach, the q_rfm
    * discipline) — NOT from `NTILE(10) OVER (ORDER BY score)`, whose
    * global sort serializes every user through one partition at 100 TB.
    * Decile 1 = highest engagement (above the p90 edge). All exact
    * arithmetic: integer cents, ppm floors, decimal(38) cross-products
    * ahead of the single integer division; the cumulative windows run
    * on the 10-row decile table (allowlisted bounded SinglePartition).
    * Score = view/click engagement cents; label = any purchase. */
  def qDecileLift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"))
    val users = ev.groupBy("user_id").agg(
      sum(when(col("event_type").isin("view", "click"), col("cents"))
        .otherwise(0L)).as("score"),
      max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("buyer"))
    val qs = (1 to 9).map(i => lit(i / 10.0d))
    val edges = users.agg(call_function("graft_qhist",
      (col("score") +: lit(1.0d) +: qs): _*).as("e"))
    // #edges strictly below score+1 = #deciles the user clears; 9 cleared
    // edges → decile 1 (top). Same (v+1 > edge) convention as q_rfm.
    val decile = lit(10) - (1 to 9).map(i =>
      (col("score") + 1 > col(s"e.p${i * 10}_edge")).cast("int"))
      .reduce(_ + _)
    val byDec = users.crossJoin(broadcast(edges)) // 1-row edge attach
      .select(decile.as("decile"), col("buyer"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum("buyer").as("n_buyers"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy()
    byDec
      .withColumn("cum_users", sum("n_users").over(wCum))
      .withColumn("cum_buyers", sum("n_buyers").over(wCum))
      .withColumn("tot_users", sum("n_users").over(wTot))
      .withColumn("tot_buyers", sum("n_buyers").over(wTot))
      .select(col("decile"), col("n_users"), col("n_buyers"),
        expr("n_buyers * 1000000 div n_users").as("conv_ppm"),
        // explicit NULL when the corpus has zero buyers: Spark's non-ANSI
        // div yields NULL on /0 but DuckDB's // raises — the CASE makes
        // the degenerate-input behavior engine-independent
        expr("""CASE WHEN tot_buyers = 0 THEN NULL ELSE
                CAST((CAST(cum_buyers AS DECIMAL(38,0)) * tot_users * 1000000)
                div (CAST(cum_users AS DECIMAL(38,0)) * tot_buyers) AS BIGINT)
                END""")
          .as("cum_lift_ppm"))
      .orderBy("decile")
  }

  val qDecileLiftSql: String = {
    val edgeDefs = (1 to 9).map(i =>
      s"MIN(CASE WHEN cum >= ceil(0.$i * n) THEN edge END) AS e$i")
      .mkString(",\n      ")
    val cleared = (1 to 9).map(i =>
      s"(CASE WHEN score + 1 > e$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""
    WITH ev AS (
      SELECT user_id, event_type,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM events),
    users AS (
      SELECT user_id,
        SUM(CASE WHEN event_type IN ('view', 'click') THEN cents
            ELSE 0 END) AS score,
        MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS buyer
      FROM ev GROUP BY user_id),
    hist AS (SELECT score + 1 AS edge, COUNT(*) AS cnt FROM users
             GROUP BY score + 1),
    cum AS (SELECT edge, SUM(cnt) OVER (ORDER BY edge) AS cum,
            CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM hist),
    edges AS (SELECT
      $edgeDefs
      FROM cum),
    dec AS (
      SELECT 10 - ($cleared) AS decile, buyer
      FROM users CROSS JOIN edges),
    byd AS (
      SELECT decile, COUNT(*) AS n_users,
        CAST(SUM(buyer) AS BIGINT) AS n_buyers
      FROM dec GROUP BY decile),
    c AS (
      SELECT decile, n_users, n_buyers,
        SUM(n_users) OVER (ORDER BY decile) AS cum_users,
        SUM(n_buyers) OVER (ORDER BY decile) AS cum_buyers,
        SUM(n_users) OVER () AS tot_users,
        SUM(n_buyers) OVER () AS tot_buyers
      FROM byd)
    SELECT decile, n_users, n_buyers,
      CAST(n_buyers * 1000000 // n_users AS BIGINT) AS conv_ppm,
      CASE WHEN tot_buyers = 0 THEN NULL ELSE
        CAST((cum_buyers * tot_users * 1000000)
          // (cum_users * tot_buyers) AS BIGINT) END AS cum_lift_ppm
    FROM c ORDER BY decile"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decay_score" -> (qDecayScore _),
    "q_decile_lift" -> (qDecileLift _),
    "q_rfm" -> (qRfm _),
    "q_bloom_native" -> (qBloomNative _),
    "q_kmv_overlap" -> (qKmvOverlap _),
    "q_kmv_rollup" -> (qKmvRollup _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_hll_users"  -> (qHllUsers _),
    "q_cms_topk"   -> (qCmsTopk _),
    "q_skew_join"  -> (qSkewJoin _),
    "q_hll_merge"  -> (qHllMerge _),
    "q_hll_native" -> (qHllNative _),
    "q_profile_hll" -> (qProfileHll _),
    "q_qhist_native" -> (qQhistNative _))

  val oracle: Map[String, String] = Map(
    "q_decay_score" -> qDecayScoreSql,
    "q_decile_lift" -> qDecileLiftSql,
    "q_rfm" -> qRfmSql,
    "q_bloom_native" -> qBloomNativeSql,
    "q_kmv_overlap" -> qKmvOverlapSql,
    "q_kmv_rollup" -> qKmvRollupSql,
    "q_salted_agg" -> qSaltedAggSql,
    "q_hll_users"  -> qHllUsersSql,
    "q_cms_topk"   -> qCmsTopkSql,
    "q_skew_join"  -> qSkewJoinSql,
    "q_hll_merge"  -> qHllMergeSql,
    "q_hll_native" -> qHllUsersSql,
    "q_profile_hll" -> qProfileHllSql,
    "q_qhist_native" -> AnalyticsExt.qQuantileHistSql)
}
