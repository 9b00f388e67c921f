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

  val all: Seq[QueryDef] = Seq(heavyHitters)
}
