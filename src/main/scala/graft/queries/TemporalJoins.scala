package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.{AsOfJoin, RangeJoin}

/** Temporal join operators Spark lacks natively — as-of join and keyless
  * range (interval) join — each expressed through the single-shuffle /
  * binned-equi-join formulations in `graft.ops` and oracled against
  * DuckDB's native ASOF JOIN / range-predicate join.
  */
object TemporalJoins {

  /** As-of join (click→latest-preceding-purchase attribution per user).
    * The oracle is DuckDB's NATIVE `ASOF JOIN`; the Spark side is the
    * union+window formulation (one |L|+|R| shuffle on user_id, no join
    * fan-out). Times are epoch-µs longs on BOTH sides: DuckDB's parquet
    * scan truncates the INT64-nanos column to a µs TIMESTAMP, so the
    * join must order at µs granularity in both engines or a sub-µs tie
    * could match differently (per-user µs timestamps are unique in the
    * testdata, so the pick itself is well-defined).
    */
  val asOfJoin = QueryDef("q60_asof_join",
    """WITH clicks AS (
      |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_ts,
      |    value AS click_value
      |  FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, epoch_us(ts) AS purchase_ts,
      |    value AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id, c.click_id, c.click_ts, c.click_value,
      |  p.purchase_ts, p.purchase_value
      |FROM clicks c ASOF JOIN purchases p
      |  ON c.user_id = p.user_id AND c.click_ts >= p.purchase_ts
      |ORDER BY c.user_id, c.click_ts""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        expr("ts div 1000").as("click_ts"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("purchase_ts"),
        col("value").as("purchase_value"))
    AsOfJoin.joinAsOf(clicks, purchases, Seq("user_id"),
      leftTime = "click_ts", rightTime = "purchase_ts")
  }

  /** Keyless range join: lineitems shipped inside ±15-day windows around
    * the top-100 orders by price. The oracle joins on the raw range
    * predicate; the Spark side runs the 30-day-binned equi-join (no
    * BroadcastNestedLoopJoin — the exploded interval side hash-joins on
    * the bin, and AQE broadcasts it while it is small).
    */
  val rangeJoin = QueryDef("q61_range_join",
    """WITH top_orders AS (
      |  SELECT o_orderkey, o_orderdate - INTERVAL 15 DAY AS w_start,
      |    o_orderdate + INTERVAL 15 DAY AS w_end
      |  FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
      |SELECT t.o_orderkey, count(*) AS n_items,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      |FROM top_orders t JOIN lineitem l
      |  ON l.l_shipdate >= t.w_start AND l.l_shipdate < t.w_end
      |GROUP BY t.o_orderkey ORDER BY t.o_orderkey""".stripMargin) { (s, d) =>
    val intervals = Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
      .select(col("o_orderkey"),
        expr("o_orderdate - INTERVAL 15 DAYS").as("w_start"),
        expr("o_orderdate + INTERVAL 15 DAYS").as("w_end"))
    val points = Tables.lineitem(s, d).select(col("l_shipdate"), col("l_quantity"))
    RangeJoin.binned(points, intervals, pointCol = "l_shipdate",
        startCol = "w_start", endCol = "w_end",
        toBin = unix_timestamp(_), binWidth = 30L * 86400)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("sum_qty"))
  }

  /** Time-series resample + linear gap-fill: each user's irregular
    * event series interpolated onto the hourly grid spanning it — the
    * forecast-pipeline regularization step (align observations to the
    * model timestep before joining against forecasts). Spark plan: ONE
    * window (lead) over the user_id shuffle to form adjacent pairs,
    * then `sequence()`+`explode` generates grid points inside each gap
    * WITHOUT a join — per-pair work, embarrassingly parallel, state
    * bounded by the pair's own gap. Grid points are integer epoch-µs
    * hour multiples; interpolated values quantize to floor-microunits
    * so the cross-engine hash is exact-integer arithmetic end to end.
    */
  val gapFill = QueryDef("q101_gap_fill",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS t, value AS v, event_id FROM events),
      |p AS (
      |  SELECT user_id, t, v,
      |    lead(t) OVER w AS t2, lead(v) OVER w AS v2
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      |g AS (
      |  SELECT user_id, t, v, t2, v2,
      |    unnest(generate_series(
      |      (t + 3599999999) // 3600000000 * 3600000000,
      |      t2 - 1, 3600000000)) AS h
      |  FROM p WHERE t2 IS NOT NULL),
      |i AS (
      |  SELECT user_id, h,
      |    v + (v2 - v) * CAST(h - t AS DOUBLE) / CAST(t2 - t AS DOUBLE) AS iv
      |  FROM g)
      |SELECT user_id, count(*) AS n_points,
      |  CAST(sum(CAST(floor(iv * 1e6) AS BIGINT)) AS BIGINT) AS sum_interp_u,
      |  min(h) AS first_h, max(h) AS last_h
      |FROM i GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val step = 3600000000L
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    val pairs = Tables.events(s, d)
      .select(col("user_id"), expr("ts div 1000").as("t"),
        col("value").as("v"), col("event_id"))
      .withColumn("t2", lead("t", 1).over(w))
      .withColumn("v2", lead("v", 1).over(w))
      .filter(col("t2").isNotNull)
    val h0 = expr(s"((t + ${step - 1}) div $step) * $step")
    val grid = pairs
      .withColumn("h", explode(
        when(h0 <= col("t2") - 1,
          sequence(h0, col("t2") - 1, lit(step))).otherwise(
          array().cast("array<bigint>"))))
    grid
      .withColumn("iv", col("v") + (col("v2") - col("v")) *
        (col("h") - col("t")).cast("double") /
        (col("t2") - col("t")).cast("double"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_points"),
        sum(floor(col("iv") * 1e6).cast("long")).as("sum_interp_u"),
        min(col("h")).as("first_h"), max(col("h")).as("last_h"))
  }

  val all: Seq[QueryDef] = Seq(asOfJoin, rangeJoin, gapFill)
}
