package graft.queries

import graft.{QueryDef, Tables}

/** §2.4 grouping-analytics completion alongside q19's ROLLUP: CUBE and
  * explicit GROUPING SETS over the same small dimension join (free from
  * Spark per SURVEY §2.4 — registered so the surface exercises them).
  * Same SQL formulation as q19: the DataFrame-API cube/rollup trips the
  * ambiguous-attribute check on any post-Expand re-select.
  */
object GroupingSets {

  val cube = QueryDef("q53_cube",
    """SELECT COALESCE(r_name, 'ALL') AS region_name,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY CUBE(r_name, o_orderpriority)
      |ORDER BY region_name, priority""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("g53_orders")
    Tables.customer(s, d).createOrReplaceTempView("g53_customer")
    Tables.nation(s, d).createOrReplaceTempView("g53_nation")
    Tables.region(s, d).createOrReplaceTempView("g53_region")
    s.sql(
      """SELECT /*+ BROADCAST(g53_nation), BROADCAST(g53_region) */
        |  COALESCE(r_name, 'ALL') AS region_name,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n
        |FROM g53_orders
        |JOIN g53_customer ON o_custkey = c_custkey
        |JOIN g53_nation ON c_nationkey = n_nationkey
        |JOIN g53_region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, o_orderpriority)""".stripMargin)
  }

  val groupingSets = QueryDef("q54_grouping_sets",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("g54_lineitem")
    s.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM g54_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(cube, groupingSets)
}
