package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Analytic-window, set-operation, and pivot coverage — the remaining
  * relational surface a user of a full OLAP engine reaches for. Every
  * ordering carries a unique tie-break so ranks/offsets are
  * deterministic in both engines.
  */
object WindowSetOps {

  /** rank / dense_rank / ntile / lag / lead over one window each — all
    * partition-local, one shuffle on the partition key.
    */
  val windowSuite = QueryDef("q64_window_suite",
    """SELECT o_orderkey, o_orderpriority,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  ntile(4) OVER w AS quartile,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderpriority, rnk""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderpriority"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      ntile(4).over(w).as("quartile"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"))
  }

  /** INTERSECT / EXCEPT with bag-to-set semantics: nations present in
    * both the customer and supplier footprints, and customers with
    * finished orders but no open ones. Set ops plan as hash
    * aggregations on the full row — same single-shuffle shape as
    * distinct.
    */
  val setOps = QueryDef("q65_set_ops",
    """WITH both_sides AS (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT
      |  SELECT s_nationkey FROM supplier),
      |finished_only AS (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |SELECT
      |  (SELECT CAST(count(*) AS BIGINT) FROM both_sides) AS n_shared_nations,
      |  (SELECT CAST(count(*) AS BIGINT) FROM finished_only)
      |    AS n_finished_only_custs""".stripMargin) { (s, d) =>
    val shared = Tables.customer(s, d).select(col("c_nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey")))
    val finishedOnly = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O").select(col("o_custkey")))
    shared.agg(count(lit(1)).as("n_shared_nations"))
      .crossJoin(finishedOnly.agg(count(lit(1)).as("n_finished_only_custs")))
  }

  /** Pivot: per-user event counts by type, wide. Spark's relational
    * pivot == conditional aggregation (what DuckDB's FILTER clause
    * spells) — one hash aggregate, no per-category scan.
    */
  val pivot = QueryDef("q66_pivot",
    """SELECT user_id,
      |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
      |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
      |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
      |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
      |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      // explicit category list: Spark then skips the distinct-values
      // pre-query, and unseen categories still yield columns (count 0)
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  val all: Seq[QueryDef] = Seq(windowSuite, setOps, pivot)
}
