package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.PageRank

/** Link-analysis ranking over driver data: [[graft.ops.PageRank]] on
  * the part↔supplier co-occurrence graph, oracle-replicated by three
  * chained CTE iterations of the same exact-integer recurrence.
  */
object GraphRank {

  /** q115 — 3 PageRank iterations on the bidirectional bipartite graph
    * of distinct (part, supplier) lineitem pairs (suppliers offset by
    * 10^6 into their own id space). Every arithmetic step is integer
    * (div-truncated), so the Spark loop and the DuckDB CTE chain agree
    * bit-for-bit; top 25 by (rank desc, node) keeps the output small
    * while covering both node classes.
    */
  val pagerank = QueryDef("q115_pagerank",
    """WITH e0 AS (
      |  SELECT DISTINCT l_partkey AS a, l_suppkey + 1000000 AS b
      |  FROM lineitem),
      |edges AS (SELECT a AS src, b AS dst FROM e0
      |          UNION ALL SELECT b, a FROM e0),
      |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS v FROM edges
      |          UNION SELECT DISTINCT dst FROM edges),
      |r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS pr FROM nodes),
      |c1 AS (SELECT e.dst AS v, CAST(sum(r.pr // g.d) AS BIGINT) AS s
      |       FROM edges e JOIN r0 r ON e.src = r.v
      |       JOIN deg g ON e.src = g.src GROUP BY 1),
      |r1 AS (SELECT n.v, 150000 + (17 * COALESCE(c.s, 0)) // 20 AS pr
      |       FROM nodes n LEFT JOIN c1 c ON n.v = c.v),
      |c2 AS (SELECT e.dst AS v, CAST(sum(r.pr // g.d) AS BIGINT) AS s
      |       FROM edges e JOIN r1 r ON e.src = r.v
      |       JOIN deg g ON e.src = g.src GROUP BY 1),
      |r2 AS (SELECT n.v, 150000 + (17 * COALESCE(c.s, 0)) // 20 AS pr
      |       FROM nodes n LEFT JOIN c2 c ON n.v = c.v),
      |c3 AS (SELECT e.dst AS v, CAST(sum(r.pr // g.d) AS BIGINT) AS s
      |       FROM edges e JOIN r2 r ON e.src = r.v
      |       JOIN deg g ON e.src = g.src GROUP BY 1),
      |r3 AS (SELECT n.v, 150000 + (17 * COALESCE(c.s, 0)) // 20 AS pr
      |       FROM nodes n LEFT JOIN c3 c ON n.v = c.v)
      |SELECT CAST(v AS BIGINT) AS node, CAST(pr AS BIGINT) AS pr FROM r3
      |ORDER BY pr DESC, node LIMIT 25""".stripMargin) { (s, d) =>
    val e0 = Tables.lineitem(s, d)
      .select(col("l_partkey").as("a"),
        (col("l_suppkey") + 1000000L).as("b"))
      .distinct()
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .union(e0.select(col("b").as("src"), col("a").as("dst")))
    PageRank.run(edges, iterations = 3)
      .select(col("v").as("node"), col("pr"))
      .orderBy(col("pr").desc, col("node")).limit(25)
  }

  val all: Seq[QueryDef] = Seq(pagerank)
}
