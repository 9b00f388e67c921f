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

  val all: Seq[QueryDef] = Seq(heavyHitters, quantiles)
}
