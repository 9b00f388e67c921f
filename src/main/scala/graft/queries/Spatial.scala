package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.SpatialJoin
import graft.ops.SpatialJoin.Poly

/** Spatial containment over driver data: the polygon-join layer above
  * the grid analytics (q109 zonal statistics assigns cells to bboxes;
  * this assigns points to CONVEX POLYGONS — the real zone shape).
  */
object Spatial {

  /** The q114 zone set: integer-vertex convex polygons in the
    * [0, 1024)² plane the quantized point cloud lives in — a triangle,
    * an axis-aligned square, a pentagon and a tilted quad that
    * OVERLAPS the square (a point in both emits two rows, pinning the
    * inner-join multiplicity).
    */
  val zones: Seq[Poly] = Seq(
    Poly(1, Seq((0L, 0L), (600L, 0L), (0L, 600L))),
    Poly(2, Seq((200L, 200L), (800L, 200L), (800L, 800L), (200L, 800L))),
    Poly(3, Seq((500L, 100L), (900L, 400L), (750L, 850L), (250L, 850L),
      (100L, 400L))),
    Poly(4, Seq((400L, 400L), (1000L, 500L), (900L, 1000L), (450L, 900L))))

  /** Point-in-convex-polygon join (the [[SpatialJoin]] operator):
    * points quantized from lineitem keys, zones broadcast, containment
    * the exact-integer half-plane conjunction — so the DuckDB oracle
    * reproduces every comparison bit-for-bit from the same edge list.
    * Boundary points count as inside on both engines (>= 0).
    */
  val pointInPolygon = QueryDef("q114_point_in_polygon",
    """WITH raw AS (
      |  SELECT l_partkey % 1024 AS px, l_orderkey % 1024 AS py,
      |    CAST(floor(l_quantity * 100) AS BIGINT) AS qty_u
      |  FROM lineitem),
      |pts AS (
      |  SELECT px, py, count(*) AS m, sum(qty_u) AS q
      |  FROM raw GROUP BY 1, 2),
      |e(pid, x1, y1, x2, y2) AS (VALUES
      |  (1, 0, 0, 600, 0), (1, 600, 0, 0, 600), (1, 0, 600, 0, 0),
      |  (2, 200, 200, 800, 200), (2, 800, 200, 800, 800),
      |  (2, 800, 800, 200, 800), (2, 200, 800, 200, 200),
      |  (3, 500, 100, 900, 400), (3, 900, 400, 750, 850),
      |  (3, 750, 850, 250, 850), (3, 250, 850, 100, 400),
      |  (3, 100, 400, 500, 100),
      |  (4, 400, 400, 1000, 500), (4, 1000, 500, 900, 1000),
      |  (4, 900, 1000, 450, 900), (4, 450, 900, 400, 400)),
      |ne AS (SELECT pid, count(*) AS n FROM e GROUP BY 1),
      |hit AS (
      |  SELECT pts.px, pts.py, pts.m, pts.q, e.pid, count(*) AS sat
      |  FROM pts, e
      |  WHERE (e.x2 - e.x1) * (pts.py - e.y1)
      |      - (e.y2 - e.y1) * (pts.px - e.x1) >= 0
      |  GROUP BY 1, 2, 3, 4, 5),
      |ins AS (
      |  SELECT h.pid, h.px, h.py, h.m, h.q
      |  FROM hit h JOIN ne ON h.pid = ne.pid AND h.sat = ne.n)
      |SELECT pid, CAST(sum(m) AS BIGINT) AS n_pts,
      |  CAST(sum(q) AS BIGINT) AS qty_u_sum,
      |  CAST(min(px * 1024 + py) AS BIGINT) AS first_cell,
      |  CAST(max(px * 1024 + py) AS BIGINT) AS last_cell
      |FROM ins GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    // pre-aggregate to distinct cells (the quantized plane is at most
    // 1024² cells, and at 100 TB this map-side combine is what keeps
    // the broadcast-join input small) — multiplicity and the measure
    // ride along
    val pts = Tables.lineitem(s, d).select(
        pmod(col("l_partkey"), lit(1024)).cast("long").as("px"),
        pmod(col("l_orderkey"), lit(1024)).cast("long").as("py"),
        floor(col("l_quantity") * 100).cast("long").as("qty_u"))
      .groupBy("px", "py")
      .agg(count(lit(1)).as("m"), sum("qty_u").as("q"))
    SpatialJoin.pointInPolygon(pts, SpatialJoin.polyTable(s, zones),
        col("px"), col("py"))
      .groupBy("pid")
      .agg(sum("m").cast("long").as("n_pts"),
        sum("q").cast("long").as("qty_u_sum"),
        min(col("px") * 1024 + col("py")).as("first_cell"),
        max(col("px") * 1024 + col("py")).as("last_cell"))
      .orderBy("pid")
  }

  /** The q122 zone set: CONCAVE simple polygons — an L-shape and a
    * five-point star — that the half-plane conjunction cannot express;
    * containment is ray-cast crossing parity in exact integers.
    */
  val concaveZones: Seq[Poly] = Seq(
    Poly(1, Seq((100L, 100L), (500L, 100L), (500L, 300L), (300L, 300L),
      (300L, 500L), (100L, 500L))),
    Poly(2, Seq((700L, 850L), (641L, 681L), (462L, 677L), (605L, 569L),
      (553L, 398L), (700L, 500L), (847L, 398L), (795L, 569L),
      (938L, 677L), (759L, 681L))))

  /** Point-in-GENERAL-polygon join (even-odd ray casting, see
    * [[SpatialJoin.containsGeneral]]): the concave-zone assignment the
    * convex fast path (q114) cannot answer, with the crossing-parity
    * arithmetic replicated comparison-for-comparison by DuckDB.
    */
  val pointInConcave = QueryDef("q122_point_in_concave",
    """WITH raw AS (
      |  SELECT l_partkey % 1024 AS px, l_orderkey % 1024 AS py,
      |    CAST(floor(l_quantity * 100) AS BIGINT) AS qty_u
      |  FROM lineitem),
      |pts AS (
      |  SELECT px, py, count(*) AS m, sum(qty_u) AS q
      |  FROM raw GROUP BY 1, 2),
      |e(pid, x1, y1, x2, y2) AS (VALUES
      |  (1, 100, 100, 500, 100), (1, 500, 100, 500, 300),
      |  (1, 500, 300, 300, 300), (1, 300, 300, 300, 500),
      |  (1, 300, 500, 100, 500), (1, 100, 500, 100, 100),
      |  (2, 700, 850, 641, 681), (2, 641, 681, 462, 677),
      |  (2, 462, 677, 605, 569), (2, 605, 569, 553, 398),
      |  (2, 553, 398, 700, 500), (2, 700, 500, 847, 398),
      |  (2, 847, 398, 795, 569), (2, 795, 569, 938, 677),
      |  (2, 938, 677, 759, 681), (2, 759, 681, 700, 850)),
      |hit AS (
      |  SELECT pts.px, pts.py, pts.m, pts.q, e.pid,
      |    sum(CASE WHEN (e.y1 > pts.py) <> (e.y2 > pts.py)
      |          AND CASE WHEN e.y2 > e.y1
      |            THEN (e.x2 - e.x1) * (pts.py - e.y1)
      |               - (e.y2 - e.y1) * (pts.px - e.x1) > 0
      |            ELSE (e.x2 - e.x1) * (pts.py - e.y1)
      |               - (e.y2 - e.y1) * (pts.px - e.x1) < 0 END
      |        THEN 1 ELSE 0 END) AS nc
      |  FROM pts, e GROUP BY 1, 2, 3, 4, 5),
      |ins AS (SELECT pid, px, py, m, q FROM hit WHERE nc % 2 = 1),
      |ar AS (
      |  SELECT pid, CAST(abs(sum(x1 * y2 - x2 * y1)) AS BIGINT) AS a2
      |  FROM e GROUP BY 1)
      |SELECT i.pid, CAST(sum(m) AS BIGINT) AS n_pts,
      |  CAST(sum(q) AS BIGINT) AS qty_u_sum,
      |  CAST(min(px * 1024 + py) AS BIGINT) AS first_cell,
      |  CAST(max(px * 1024 + py) AS BIGINT) AS last_cell,
      |  CAST(max(ar.a2) AS BIGINT) AS area2,
      |  -- integer density: points per area, in millionths
      |  CAST((sum(m) * 2000000) // max(ar.a2) AS BIGINT) AS density_ppm
      |FROM ins i JOIN ar ON ar.pid = i.pid
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val pts = Tables.lineitem(s, d).select(
        pmod(col("l_partkey"), lit(1024)).cast("long").as("px"),
        pmod(col("l_orderkey"), lit(1024)).cast("long").as("py"),
        floor(col("l_quantity") * 100).cast("long").as("qty_u"))
      .groupBy("px", "py")
      .agg(count(lit(1)).as("m"), sum("qty_u").as("q"))
    import s.implicits._
    val areas = concaveZones
      .map(p => (p.pid, math.abs(SpatialJoin.area2(p))))
      .toDF("a_pid", "area2")
    SpatialJoin.pointInPolygonGeneral(pts,
        SpatialJoin.polyTableGeneral(s, concaveZones),
        col("px"), col("py"))
      .groupBy("pid")
      .agg(sum("m").cast("long").as("n_pts"),
        sum("q").cast("long").as("qty_u_sum"),
        min(col("px") * 1024 + col("py")).as("first_cell"),
        max(col("px") * 1024 + col("py")).as("last_cell"))
      .join(broadcast(areas), col("pid") === col("a_pid"))
      .select(col("pid"), col("n_pts"), col("qty_u_sum"),
        col("first_cell"), col("last_cell"), col("area2"),
        // integer density: points per area, in millionths (the
        // factor 2 folds the shoelace doubling back out)
        expr("(n_pts * 2000000) div area2").as("density_ppm"))
      .orderBy("pid")
  }

  /** q147 — DISTANCE-THRESHOLD self-join via GRID BUCKETING: the
    * point-point proximity complement of q114's point-in-polygon (and
    * the 2-D sibling of q61's binned 1-D range join). Cell size =
    * the radius r, so every pair within r lies in the same or an
    * adjacent cell; the left side emits its 9-cell neighborhood keys
    * and the equi-join against home cells is a lossless candidate
    * cover. Exactly ONE of the nine offsets equals a qualifying
    * pair's cell delta, so with the rid<rid orientation no pair
    * duplicates and no DISTINCT pass is needed — the join output is
    * the candidate set. Residual exact predicate in integers
    * (dx²+dy² ≤ r²). At 100 TB: candidates O(n·density) instead of
    * the O(n²) cross join the oracle brute-forces; cell keys hash-
    * partition evenly for quantized-uniform clouds, and a skewed hot
    * cell would salt exactly like q52.
    */
  val proximityJoin = QueryDef("q147_proximity_join",
    """WITH p AS (
      |  SELECT p_partkey AS id, p_partkey % 1024 AS x,
      |    (p_partkey * 7919) % 1024 AS y
      |  FROM part),
      |pairs AS (
      |  SELECT a.id AS ia, b.id AS ib,
      |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      |  FROM p a JOIN p b ON a.id < b.id)
      |SELECT count(*) AS n_pairs, CAST(sum(d2) AS BIGINT) AS sum_d2,
      |  count(DISTINCT ia) AS n_anchors
      |FROM pairs WHERE d2 <= 256""".stripMargin) { (s, d) =>
    val r = 16L
    val pts = Tables.part(s, d).select(col("p_partkey").as("id"),
        pmod(col("p_partkey"), lit(1024)).cast("long").as("x"),
        pmod(col("p_partkey") * 7919, lit(1024)).cast("long").as("y"))
      .withColumn("cx", expr(s"x div $r")).withColumn("cy", expr(s"y div $r"))
    // left side: 9-cell neighborhood; right side: home cell
    val probe = pts.select(col("id"), col("x"), col("y"),
      explode(expr("transform(sequence(0, 8), " +
        "i -> struct(cx + i div 3 - 1 AS cx, cy + i % 3 - 1 AS cy))"))
        .as("c"))
      .select(col("id"), col("x"), col("y"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    val joined = probe.as("a").join(pts.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        ((col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
          (col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))).as("d2"))
      .filter(col("d2") <= r * r)
    joined.agg(count(lit(1)).as("n_pairs"),
      sum("d2").cast("long").as("sum_d2"),
      count_distinct(col("ia")).as("n_anchors"))
  }

  val all: Seq[QueryDef] = Seq(pointInPolygon, pointInConcave,
    proximityJoin)
}
