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

  val all: Seq[QueryDef] = Seq(asOfJoin, rangeJoin)
}
