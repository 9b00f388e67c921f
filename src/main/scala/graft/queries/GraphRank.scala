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

  /** q126 — co-occurrence mining (the market-basket pair count behind
    * "frequently bought together"): distinct (order, part) items
    * self-joined within the basket with p1 < p2, counted, top-20 with
    * a total deterministic tie-break. Scale shape: the self-join
    * co-partitions both sides on the basket key (one shuffle) and the
    * pair explosion is bounded by basket size squared — baskets are
    * small by construction here (≤7 lines/order); a 100 TB run over
    * heavy baskets would cap or sample per-basket items first, the
    * standard FP-growth preprocessing step.
    */
  val coOccurrence = QueryDef("q126_co_occurrence",
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |supp AS (SELECT p, count(*) AS np FROM items GROUP BY 1),
      |tot AS (SELECT count(DISTINCT o) AS no FROM items),
      |pairs AS (
      |  SELECT a.p AS p1, b.p AS p2, count(*) AS n
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2)
      |SELECT p1, p2, n,
      |  CAST((n * 1000000) // s1.np AS BIGINT) AS conf_ppm,
      |  CAST((n * tot.no * 1000000) // (s1.np * s2.np) AS BIGINT)
      |    AS lift_ppm
      |FROM pairs JOIN supp s1 ON s1.p = p1 JOIN supp s2 ON s2.p = p2,
      |  tot
      |ORDER BY n DESC, p1, p2 LIMIT 20""".stripMargin) { (s, d) =>
    // ONE fact scan + ONE shuffle builds the basket relation directly:
    // collect_set dedups (o, p) inside the aggregation, so the separate
    // distinct() exchange the old plan paid (and re-read for support,
    // basket-total and pair branches) disappears; support counts and
    // the basket total are then derived FROM the baskets (persisted —
    // three consumers), never from a second fact-table pass
    val baskets = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))
      .persist()
    val supp = baskets.select(explode(col("ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("np"))
    val tot = baskets.select(count(lit(1)).as("no"))
    // pairs WITHOUT a self-join: group each basket once, emit its
    // ordered pairs map-side from the sorted item array (p1 < p2 falls
    // out of the sort) — one shuffle on the basket key instead of a
    // join's shuffle of both sides plus the pair re-aggregation
    val pairs = baskets
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))),
          y => struct(x.as("p1"), y.as("p2")))))).as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(supp.withColumnRenamed("p", "p1")
        .withColumnRenamed("np", "np1")), "p1")
      .join(broadcast(supp.withColumnRenamed("p", "p2")
        .withColumnRenamed("np", "np2")), "p2")
      .crossJoin(broadcast(tot))
      // association-rule metrics in exact integer ppm: confidence
      // P(p2|p1) and lift P(p1,p2)/(P(p1)P(p2)) — truncation-divided
      // identically in both engines
      .select(col("p1"), col("p2"), col("n"),
        expr("(n * 1000000) div np1").as("conf_ppm"),
        expr("(n * no * 1000000) div (np1 * np2)").as("lift_ppm"))
      .orderBy(col("n").desc, col("p1"), col("p2"))
      .limit(20)
  }

  /** q133 — exact TRIANGLE COUNTING (the graph-analytics primitive
    * behind clustering coefficients and community scoring) by the
    * degree-ordered orientation algorithm: orient every undirected edge
    * from its lower-(degree, id) endpoint to the higher one, build each
    * node's out-neighbor PAIRS, and semi-join the closing edge. Each
    * triangle is counted EXACTLY once (its three nodes are totally
    * ordered by (degree, id); the orientation makes the minimum node
    * the one emitting both wings).
    *
    * Scale shape: the orientation bounds out-degree by O(√m) on any
    * graph (a node of degree d only keeps edges to HIGHER-degree
    * neighbors, and there are at most 2m/d of those) — so the wing
    * self-join fans out O(m^1.5) total instead of Σ d² on the raw
    * adjacency, the standard MapReduce triangle-count bound. The
    * oracle brute-forces the same count from the a<b<c edge triple
    * join; wedges (ordered out-pairs) ride along to make the
    * clustering-coefficient denominator part of the hash. The fact
    * table is scanned exactly once: the distinct edge set is cached
    * (it IS the graph — O(m), nothing next to the scan) and every
    * branch reads it from memory.
    */
  val triangles = QueryDef("q133_triangles",
    """WITH raw AS (
      |  SELECT DISTINCT least(l_partkey % 200, l_suppkey % 200) AS a,
      |    greatest(l_partkey % 200, l_suppkey % 200) AS b
      |  FROM lineitem
      |  WHERE l_partkey % 200 <> l_suppkey % 200),
      |tri AS (
      |  SELECT count(*) AS t
      |  FROM raw e1 JOIN raw e2 ON e2.a = e1.a AND e2.b > e1.b
      |  JOIN raw e3 ON e3.a = e1.b AND e3.b = e2.b),
      |deg AS (SELECT v, count(*) AS d FROM (
      |    SELECT a AS v FROM raw UNION ALL SELECT b FROM raw) GROUP BY 1)
      |SELECT CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
      |  CAST((SELECT count(*) FROM raw) AS BIGINT) AS n_edges,
      |  CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS BIGINT)
      |    AS n_wedges""".stripMargin) { (s, d) =>
    // The distinct edge set is the graph itself — O(edges), tiny next
    // to the fact scan — so cache it and pay the lineitem scan ONCE:
    // the count below materializes the cache AND is n_edges, and every
    // downstream branch (degrees, orientation, closing-edge probe)
    // reads the cached edges instead of re-scanning the fact table.
    val raw = Tables.lineitem(s, d)
      .select(pmod(col("l_partkey"), lit(200)).as("u"),
        pmod(col("l_suppkey"), lit(200)).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()
      .cache()
    val nEdges = raw.count()
    val deg = raw.select(col("a").as("v")).union(raw.select(col("b")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient a→b from the (degree, id)-smaller endpoint: out-degrees
    // bounded by O(√m) whatever the degree skew
    val oriented = raw
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"))
      .cache()
    val w1 = oriented.select(col("src"), col("dst").as("x"))
    val w2 = oriented.select(col("src"), col("dst").as("y"))
    // wings: ordered out-neighbor pairs of each source
    val wings = w1.join(w2, Seq("src")).filter(col("x") < col("y"))
    // the closing edge may be oriented either way between x and y —
    // normalize to (min,max) and probe the undirected edge set
    val closing = raw.select(col("a").as("x"), col("b").as("y"))
    // one collected row carries both remaining aggregates
    val row = wings.join(closing, Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("t"))
      .crossJoin(broadcast(
        deg.agg(sum(expr("d * (d - 1) div 2")).as("w"))))
      .head()
    val nTri = row.getLong(0)
    val nWedges = row.getLong(1)
    oriented.unpersist()
    raw.unpersist()
    import s.implicits._
    Seq((nTri, nEdges, nWedges))
      .toDF("n_triangles", "n_edges", "n_wedges")
  }

  val all: Seq[QueryDef] = Seq(pagerank, coOccurrence, triangles)
}
