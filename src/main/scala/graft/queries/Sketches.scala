package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.HeavyHittersExpr

/** Sketch aggregates: bounded-state approximations whose exact regime is
  * oracle-checked (capacity sized above the key cardinality ⇒ the sketch
  * degenerates to the exact answer), while ScalaTest covers the
  * overflowed approximate regime's guarantees.
  */
object Sketches {

  /** SpaceSaving top-20 part keys by lineitem frequency. At sf0.01 the
    * 64 Ki-counter sketch never overflows, so the result IS the exact
    * GROUP BY — same (n desc, item asc) tie-break on both sides. At
    * 100 TB the same plan holds: each partial carries at most `capacity`
    * counters through the shuffle, however many distinct keys the scan
    * produces.
    */
  val heavyHitters = QueryDef("q62_heavy_hitters",
    """SELECT l_partkey AS item, count(*) AS n
      |FROM lineitem GROUP BY l_partkey
      |ORDER BY n DESC, item ASC LIMIT 20""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .agg(HeavyHittersExpr.topK(col("l_partkey"), 20, 1 << 16).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("item"), col("h.n").as("n"))
  }

  /** Discrete quantiles per group — SQL-standard PERCENTILE_DISC picks
    * the smallest element with cumulative distribution >= p, so both
    * engines return the identical data element (no interpolation float
    * hazard). Exact quantiles sort within each group; the 100 TB path
    * for a global quantile is `approx_percentile` (KLL-style mergeable
    * buffers) — HeavyHittersSpec's sibling coverage — while per-group
    * quantiles like these stay safe whenever a group fits an executor.
    */
  val quantiles = QueryDef("q63_quantiles",
    """SELECT l_returnflag, quantile_disc(l_quantity, 0.5) AS qty_p50,
      |  quantile_disc(l_quantity, 0.95) AS qty_p95,
      |  quantile_disc(l_extendedprice, 0.5) AS price_p50
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("graft_q63_lineitem")
      s.sql("""SELECT l_returnflag,
        percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS qty_p50,
        percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity) AS qty_p95,
        percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS price_p50
        FROM graft_q63_lineitem GROUP BY l_returnflag""")
  }

  /** KMV distinct-count sketch per group — oracle-gated IN ITS
    * APPROXIMATE REGIME, which no HLL-style sketch can offer: the hash
    * (first 15 hex digits of md5, 60 bits) and the exact-integer
    * estimator (k-1)·2^60 ÷ h_k are reproduced digit-by-digit by
    * DuckDB, and the k smallest distinct hashes are a pure function of
    * the input set. l_partkey (~2000 distinct per flag at sf0.01)
    * overflows k=256 so the estimate path is live; l_linestatus (1-2
    * distinct) pins the exact path (`kth` = -1). At 100 TB each
    * partial ships at most k longs per group however many keys the
    * scan holds.
    */
  val kmvSketch = QueryDef("q112_kmv_distinct",
    """WITH hx AS (
      |  SELECT l_returnflag AS flag,
      |    substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS h
      |  FROM lineitem GROUP BY 1, 2),
      |counts AS (SELECT flag, count(*) AS nd FROM hx GROUP BY 1),
      |kth AS (
      |  SELECT flag, h FROM (
      |    SELECT flag, h,
      |      row_number() OVER (PARTITION BY flag ORDER BY h) AS rk
      |    FROM hx) WHERE rk = 256),
      |num AS (
      |  SELECT k.flag,
      |    sum((strpos('0123456789abcdef', substr(k.h, g.i, 1)) - 1)
      |        * (1::BIGINT << ((15 - g.i) * 4))) AS hv
      |  FROM kth k, generate_series(1, 15) AS g(i) GROUP BY 1),
      |ls AS (
      |  SELECT l_returnflag AS flag,
      |    count(DISTINCT md5(CAST(l_linestatus AS VARCHAR))) AS nd
      |  FROM lineitem GROUP BY 1)
      |SELECT c.flag AS l_returnflag,
      |  CASE WHEN n.hv IS NULL THEN c.nd
      |       ELSE CAST((255::HUGEINT * 1152921504606846976::HUGEINT)
      |                 // n.hv::HUGEINT AS BIGINT) END AS part_est,
      |  COALESCE(CAST(n.hv AS BIGINT), -1) AS part_kth,
      |  ls.nd AS status_est, CAST(-1 AS BIGINT) AS status_kth
      |FROM counts c LEFT JOIN num n ON c.flag = n.flag
      |JOIN ls ON ls.flag = c.flag
      |ORDER BY 1""".stripMargin) { (s, d) =>
    import graft.functions.KmvDistinctExpr.kmvDistinct
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        kmvDistinct(col("l_partkey").cast("string"), 256).as("pk"),
        kmvDistinct(col("l_linestatus").cast("string"), 256).as("st"))
      .select(col("l_returnflag"),
        col("pk.est").as("part_est"), col("pk.kth").as("part_kth"),
        col("st.est").as("status_est"), col("st.kth").as("status_kth"))
      .orderBy(col("l_returnflag"))
  }

  /** KMV SET OPERATIONS — the composable form of the q112 sketch: the
    * k smallest hashes of A ∪ B are computable from each side's k
    * minima alone, so union cardinality, intersection estimate and
    * Jaccard similarity come from two bounded sketches without ever
    * joining the underlying sets (Bar-Yossef et al. 2002). Sides are
    * the (part, supplier) pairs on low-quantity vs high-quantity
    * lineitems — overlapping in the [20, 25) band. The estimator
    * 255·2^60 ÷ h is computed in exact wide integers on both engines
    * (decimal(38,0) here, HUGEINT in DuckDB) so the APPROXIMATE
    * estimates hash-match exactly at any h — a BIGINT decomposition
    * would overflow on 255·(2^60 mod h) whenever the k-th min hash is
    * large, i.e. exactly when the input is sparse. At 100 TB each side
    * ships k longs per partial; the combination is one 1×1 join.
    */
  val kmvJaccard = QueryDef("q116_kmv_jaccard",
    """WITH ha AS (
      |  SELECT substr(md5(CAST(l_partkey * 1000 + l_suppkey AS VARCHAR)),
      |                1, 15) AS h
      |  FROM lineitem WHERE l_quantity < 25 GROUP BY 1),
      |hb AS (
      |  SELECT substr(md5(CAST(l_partkey * 1000 + l_suppkey AS VARCHAR)),
      |                1, 15) AS h
      |  FROM lineitem WHERE l_quantity >= 20 GROUP BY 1),
      |ak AS (SELECT h FROM (
      |  SELECT h, row_number() OVER (ORDER BY h) AS rk FROM ha)
      |  WHERE rk <= 256),
      |bk AS (SELECT h FROM (
      |  SELECT h, row_number() OVER (ORDER BY h) AS rk FROM hb)
      |  WHERE rk <= 256),
      |u AS (SELECT h FROM (
      |  SELECT h, row_number() OVER (ORDER BY h) AS rk
      |  FROM (SELECT h FROM ak UNION SELECT h FROM bk))
      |  WHERE rk <= 256),
      |m AS (SELECT count(*) AS matches FROM u
      |      WHERE h IN (SELECT h FROM ak) AND h IN (SELECT h FROM bk)),
      |hx(nm, h) AS (
      |  SELECT 'a', max(h) FROM ak
      |  UNION ALL SELECT 'b', max(h) FROM bk
      |  UNION ALL SELECT 'u', max(h) FROM u),
      |hv AS (SELECT nm,
      |    sum((strpos('0123456789abcdef', substr(h, g.i, 1)) - 1)
      |        * (1::BIGINT << ((15 - g.i) * 4))) AS v
      |  FROM hx, generate_series(1, 15) AS g(i) GROUP BY 1),
      |est AS (SELECT nm, CAST((255::HUGEINT * 1152921504606846976::HUGEINT)
      |    // v::HUGEINT AS BIGINT) AS e FROM hv)
      |SELECT
      |  CAST((SELECT e FROM est WHERE nm = 'a') AS BIGINT) AS est_a,
      |  CAST((SELECT e FROM est WHERE nm = 'b') AS BIGINT) AS est_b,
      |  CAST((SELECT e FROM est WHERE nm = 'u') AS BIGINT) AS est_union,
      |  CAST(((SELECT matches FROM m)
      |        * (SELECT e FROM est WHERE nm = 'u')) // 256 AS BIGINT)
      |    AS est_inter,
      |  CAST(((SELECT matches FROM m) * 10000) // 256 AS BIGINT)
      |    AS jaccard_bp,
      |  CAST((SELECT matches FROM m) AS BIGINT) AS matches""".stripMargin) {
    (s, d) =>
    import graft.functions.KmvDistinctExpr.kmvMins
    val li = Tables.lineitem(s, d)
    val elem = (col("l_partkey") * 1000 + col("l_suppkey")).cast("string")
    val a = li.filter(col("l_quantity") < 25)
      .agg(kmvMins(elem, 256).as("ka"))
    val b = li.filter(col("l_quantity") >= 20)
      .agg(kmvMins(elem, 256).as("kb"))
    def estOf(h: String) =
      s"(cast(255 as decimal(38,0)) * 1152921504606846976L) div $h"
    a.crossJoin(b) // two one-row sketches — the bounded combination
      .withColumn("ku",
        slice(array_sort(array_union(col("ka"), col("kb"))), 1, 256))
      .withColumn("matches", size(filter(col("ku"), x =>
        array_contains(col("ka"), x) && array_contains(col("kb"), x)))
        .cast("long"))
      // kth-minimum probe: 0-based `get` at min(size,k)-1 so a sketch that
      // never filled (fewer than k distinct) degrades to its max hash —
      // exactly DuckDB's max(h) — instead of an ANSI out-of-bounds error.
      .withColumn("hha", get(col("ka"), least(size(col("ka")), lit(256)) - 1))
      .withColumn("hhb", get(col("kb"), least(size(col("kb")), lit(256)) - 1))
      .withColumn("hhu", get(col("ku"), least(size(col("ku")), lit(256)) - 1))
      .withColumn("est_a", expr(estOf("hha")))
      .withColumn("est_b", expr(estOf("hhb")))
      .withColumn("est_union", expr(estOf("hhu")))
      .select(col("est_a"), col("est_b"), col("est_union"),
        expr("(matches * est_union) div 256").as("est_inter"),
        expr("(matches * 10000L) div 256").as("jaccard_bp"),
        col("matches"))
  }

  /** Count-Min frequency sketch (the third mergeable summary beside
    * SpaceSaving and KMV): the full d×w counter grid aggregates in one
    * pass (d·w longs per partial, elementwise-add merge), and probe
    * estimates are min-over-rows lookups — computed here as plain
    * `element_at`/`least` column arithmetic with the probe buckets
    * derived from the same md5 hash DuckDB recomputes digit-by-digit.
    * Estimates (with their collision overcounting!) hash-match
    * exactly; exact counts ride along for the error to be visible.
    */
  val cmsFreq = QueryDef("q123_cms_freq",
    """WITH keys AS (
      |  SELECT CAST(l_partkey AS VARCHAR) AS k, count(*) AS n
      |  FROM lineitem GROUP BY 1),
      |rows_ AS (SELECT unnest(generate_series(0, 3)) AS j),
      |probes(k) AS (VALUES ('1'), ('17'), ('999'), ('2000')),
      |hx AS (
      |  SELECT k.k, k.n, r.j,
      |    substr(md5(k.k || '#' || CAST(r.j AS VARCHAR)), 1, 15) AS h
      |  FROM keys k, rows_ r),
      |num AS (
      |  SELECT k, n, j,
      |    sum((strpos('0123456789abcdef', substr(h, g.i, 1)) - 1)
      |        * (1::BIGINT << ((15 - g.i) * 4))) % 512 AS bucket
      |  FROM hx, generate_series(1, 15) AS g(i) GROUP BY 1, 2, 3),
      |cms AS (SELECT j, bucket, CAST(sum(n) AS BIGINT) AS c
      |        FROM num GROUP BY 1, 2),
      |-- probe buckets hashed INDEPENDENTLY of data presence: an
      |-- absent key still estimates (its buckets' collision mass)
      |hxp AS (
      |  SELECT p.k, r.j,
      |    substr(md5(p.k || '#' || CAST(r.j AS VARCHAR)), 1, 15) AS h
      |  FROM probes p, rows_ r),
      |nump AS (
      |  SELECT k, j,
      |    sum((strpos('0123456789abcdef', substr(h, g.i, 1)) - 1)
      |        * (1::BIGINT << ((15 - g.i) * 4))) % 512 AS bucket
      |  FROM hxp, generate_series(1, 15) AS g(i) GROUP BY 1, 2),
      |est AS (
      |  SELECT p.k, min(COALESCE(c.c, 0)) AS e
      |  FROM nump p LEFT JOIN cms c ON p.j = c.j AND p.bucket = c.bucket
      |  GROUP BY 1)
      |SELECT
      |  COALESCE((SELECT e FROM est WHERE k = '1'), 0) AS est_1,
      |  COALESCE((SELECT CAST(n AS BIGINT) FROM keys WHERE k = '1'), 0)
      |    AS n_1,
      |  COALESCE((SELECT e FROM est WHERE k = '17'), 0) AS est_17,
      |  COALESCE((SELECT CAST(n AS BIGINT) FROM keys WHERE k = '17'), 0)
      |    AS n_17,
      |  COALESCE((SELECT e FROM est WHERE k = '999'), 0) AS est_999,
      |  COALESCE((SELECT CAST(n AS BIGINT) FROM keys WHERE k = '999'), 0)
      |    AS n_999,
      |  COALESCE((SELECT e FROM est WHERE k = '2000'), 0) AS est_2000,
      |  COALESCE((SELECT CAST(n AS BIGINT) FROM keys WHERE k = '2000'), 0)
      |    AS n_2000""".stripMargin) { (s, d) =>
    import graft.functions.{CmsState, CountMinExpr}
    import org.apache.spark.unsafe.types.UTF8String
    val (dd, ww) = (4, 512)
    val key = col("l_partkey").cast("string")
    val probes = Seq("1", "17", "999", "2000")
    val aggs = CountMinExpr.cms(key, dd, ww).as("s") +:
      probes.map(p => sum(when(key === p, 1L).otherwise(0L))
        .cast("long").as(s"n_$p"))
    val row = Tables.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
    val cols = probes.flatMap { p =>
      // probe buckets are DRIVER-side constants of the same md5 math
      val est = least((0 until dd).map { j =>
        val b = CmsState.bucket(UTF8String.fromString(p), j, ww)
        element_at(element_at(col("s"), j + 1), b + 1)
      }: _*).as(s"est_$p")
      Seq(est, col(s"n_$p"))
    }
    row.select(cols: _*)
  }

  /** q134 — HYPERLOGLOG distinct counting (the fourth mergeable
    * summary: 256 six-bit registers whatever the cardinality), with the
    * estimator EXACT-INTEGER so the approximate value itself
    * hash-matches DuckDB: each element's 60-bit md5 hash splits into a
    * register index (top 8 bits) and a 52-bit suffix whose rank is
    * 53 − bitlength (binary-string length on both engines — no float
    * log); the harmonic sum Σ 2^(−M_j) is carried scaled by 2^53 as
    * S = Σ 2^(53−M_j) (empty registers contribute 2^53), and the raw
    * estimate α·m²/ (S/2^53) becomes one HUGEINT/DECIMAL integral
    * divide: (7182·65536·2^53) div (10000·S). Exact count and empty-
    * register count ride along so the sketch's error is visible in the
    * gated output.
    *
    * Scale shape: ONE scan of the fact table: the register reduction
    * carries a per-register element count alongside the max rank, so
    * n_exact is Σ counts from the same 256-row aggregate — no second
    * pass, no driver-side count action. Partials are 256 small ints
    * per group however many distinct keys the scan holds; the
    * estimator is O(m) driver-free arithmetic.
    *
    * Deliberately the RAW estimator: the standard linear-counting
    * small-range correction (E < 2.5m with empty registers) needs
    * m·ln(m/V), and a float ln cannot hash-match across engines. Below
    * ~2.5·m ≈ 640 distinct values `est` is therefore biased low — by
    * design; `v_zero` and `n_exact` ride along so the regime (and the
    * sketch's true error) is visible in the gated output. Valid use is
    * cardinalities ≫ m, which is the only regime HLL is for.
    */
  val hllDistinct = QueryDef("q134_hll_distinct",
    """WITH el AS (
      |  SELECT DISTINCT CAST(l_partkey * 1000 + l_suppkey AS VARCHAR) AS e
      |  FROM lineitem),
      |hx AS (
      |  SELECT e, sum((strpos('0123456789abcdef', substr(md5(e), g.i, 1)) - 1)
      |      * (1::BIGINT << ((15 - g.i) * 4))) AS h
      |  FROM el, generate_series(1, 15) AS g(i) GROUP BY e),
      |rw AS (
      |  SELECT CAST(h // 4503599627370496 AS BIGINT) AS idx,
      |    CAST(h % 4503599627370496 AS BIGINT) AS w
      |  FROM hx),
      |regs AS (
      |  SELECT idx, max(CASE WHEN w = 0 THEN 53
      |                  ELSE 53 - length(bin(w)) END) AS m
      |  FROM rw GROUP BY idx),
      |full_ AS (
      |  SELECT g.i AS idx, COALESCE(r.m, 0) AS m
      |  FROM generate_series(0, 255) g(i) LEFT JOIN regs r ON r.idx = g.i),
      |agg AS (
      |  SELECT CAST(sum(1::HUGEINT << (53 - m)) AS HUGEINT) AS s,
      |    count(CASE WHEN m = 0 THEN 1 END) AS v_zero
      |  FROM full_)
      |SELECT CAST((SELECT count(*) FROM el) AS BIGINT) AS n_exact,
      |  CAST((SELECT v_zero FROM agg) AS BIGINT) AS v_zero,
      |  CAST((SELECT s FROM agg) AS BIGINT) AS s_scaled,
      |  CAST((7182::HUGEINT * 65536 * (1::HUGEINT << 53))
      |       // (10000::HUGEINT * (SELECT s FROM agg)) AS BIGINT) AS est
      |""".stripMargin) { (s, d) =>
    // distinct on the 8-byte LONG key, string-cast after (guide §2.3):
    // long→string is injective, so the distinct set is identical while
    // the dedup exchange carries longs instead of decimal strings
    val el = Tables.lineitem(s, d)
      .select((col("l_partkey") * 1000 + col("l_suppkey")).as("ek"))
      .distinct()
      .select(col("ek").cast("string").as("e"))
    val h = el.select(
      conv(substring(md5(col("e")), 1, 15), 16, 10).cast("long").as("h"))
    val rw = h.select(expr("h div 4503599627370496").as("idx"),
      (col("h") % 4503599627370496L).as("w"))
    val regs = rw.groupBy("idx")
      .agg(max(when(col("w") === 0, 53)
        .otherwise(lit(53) - length(conv(col("w"), 10, 2)))).as("m"),
        count(lit(1)).as("cnt")) // piggyback: n_exact = Σ cnt, same pass
    import s.implicits._
    val full = (0 until 256).toDF("idx")
      .join(regs, Seq("idx"), "left")
      .select(coalesce(col("m"), lit(0)).as("m"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val agg = full.agg(
      sum(col("cnt")).as("n_exact"),
      sum(expr("shiftleft(1L, 53 - m)")).as("s"),
      count(when(col("m") === 0, 1)).as("v_zero"))
    // α_256·m²·2^53 as one exact decimal literal; integral divide → BIGINT
    agg.select(
      col("n_exact").cast("long").as("n_exact"),
      col("v_zero").cast("long").as("v_zero"),
      col("s").cast("long").as("s_scaled"),
      expr("CAST(4239504509996223990595584 AS DECIMAL(38,0)) " +
        "div (CAST(10000 AS DECIMAL(38,0)) * s)").cast("long").as("est"))
  }

  /** q143 — fixed-bin HISTOGRAM quantiles: the bounded-state scale path
    * q63's doc comment promises. q63's exact per-group percentile sorts
    * every group's values; at 100 TB a hot group's sort spills. Here the
    * distributed pass is a (flag, bin) count — each partial carries at
    * most `domain / binWidth` counters whatever the row count, exactly
    * like the sketch family above — and the quantile readout picks the
    * first bin whose cumulative count crosses ceil(p·n), over the TINY
    * histogram relation (groups × bins), not the data. The answer is
    * the bin's lower edge: deterministically quantized (error ≤ the
    * $100 bin width, a DOCUMENTED bound, not a float hazard), so both
    * engines compute bit-identical integers and the approximation
    * itself hash-gates — same discipline as q134's raw HLL estimator.
    * Bin width 10000 (cents) over l_extendedprice ≈ 1000 live bins.
    */
  val histQuantiles = QueryDef("q143_hist_quantiles",
    """WITH q AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(floor(l_extendedprice * 100) AS BIGINT) // 10000 AS bin
      |  FROM lineitem),
      |hist AS (SELECT flag, bin, count(*) AS c FROM q GROUP BY 1, 2),
      |cum AS (
      |  SELECT flag, bin,
      |    sum(c) OVER (PARTITION BY flag ORDER BY bin) AS cum,
      |    sum(c) OVER (PARTITION BY flag) AS total
      |  FROM hist)
      |SELECT flag,
      |  min(CASE WHEN cum >= (total * 50 + 99) // 100 THEN bin END) * 10000
      |    AS p50_lo_u,
      |  min(CASE WHEN cum >= (total * 95 + 99) // 100 THEN bin END) * 10000
      |    AS p95_lo_u,
      |  min(CASE WHEN cum >= (total * 99 + 99) // 100 THEN bin END) * 10000
      |    AS p99_lo_u
      |FROM cum GROUP BY flag ORDER BY flag""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT) div 10000")
          .as("bin"))
      .groupBy("flag", "bin").agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum",
        sum("c").over(Window.partitionBy("flag").orderBy("bin")))
      .withColumn("total", sum("c").over(Window.partitionBy("flag")))
    def pick(p: Int, name: String) =
      (min(when(col("cum") >= expr(s"(total * $p + 99) div 100"), col("bin")))
        * 10000L).as(name)
    cum.groupBy("flag")
      .agg(pick(50, "p50_lo_u"), pick(95, "p95_lo_u"), pick(99, "p99_lo_u"))
      .orderBy("flag")
  }

  val all: Seq[QueryDef] = Seq(heavyHitters, quantiles, kmvSketch,
    kmvJaccard, cmsFreq, hllDistinct, histQuantiles)
}
