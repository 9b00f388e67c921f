package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-in-convex-polygon spatial join — the containment primitive
  * behind zone assignment (which county/tile/basin does each
  * observation fall in). Polygons are CONVEX with integer vertices, so
  * containment is a half-plane conjunction in EXACT integer
  * arithmetic: p is inside a CCW polygon iff every edge's cross
  * product (x2-x1)(py-y1) - (y2-y1)(px-x1) >= 0 (boundary counts as
  * inside). No epsilon, no orientation robustness gymnastics — and a
  * SQL engine reproduces it bit-for-bit, which is what q114 gates.
  *
  * Scale shape: the polygon side is a SMALL dimension table (zones,
  * not data) and broadcasts; the point side never shuffles. The join
  * condition leads with the polygon's precomputed bbox — the cheap
  * rectangle rejection — before the per-edge conjunction, evaluated
  * via `forall` over the edges array inside codegen. A 100 TB point
  * table therefore streams through one broadcast nested-loop pass,
  * the same plan family as the zonal-statistics query (q109).
  */
object SpatialJoin {

  /** One convex polygon: id + CCW vertex ring (closed implicitly). */
  final case class Poly(pid: Int, vertices: Seq[(Long, Long)])

  /** Cross product sign of edge (x1,y1)->(x2,y2) vs point — > 0 means
    * the point lies left of the directed edge.
    */
  def cross(x1: Long, y1: Long, x2: Long, y2: Long,
            px: Long, py: Long): Long =
    (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)

  /** Plain-Scala containment twin (spec parity for the Column form). */
  def contains(p: Poly, px: Long, py: Long): Boolean = {
    val n = p.vertices.size
    (0 until n).forall { i =>
      val (x1, y1) = p.vertices(i)
      val (x2, y2) = p.vertices((i + 1) % n)
      cross(x1, y1, x2, y2, px, py) >= 0L
    }
  }

  /** The polygon dimension table: pid, bbox columns, and the edge ring
    * as array<struct<x1,y1,x2,y2>>. Rejects non-convex or clockwise
    * rings loudly — a silently-flipped ring would classify the
    * complement.
    */
  def polyTable(spark: SparkSession, polys: Seq[Poly]): DataFrame = {
    import spark.implicits._
    polys.foreach { p =>
      require(p.vertices.size >= 3, s"polygon ${p.pid} needs >= 3 vertices")
      val n = p.vertices.size
      (0 until n).foreach { i =>
        val (x1, y1) = p.vertices(i)
        val (x2, y2) = p.vertices((i + 1) % n)
        val (x3, y3) = p.vertices((i + 2) % n)
        require(cross(x1, y1, x2, y2, x3, y3) > 0,
          s"polygon ${p.pid} is not strictly convex CCW at vertex $i")
      }
    }
    polys.map { p =>
      val n = p.vertices.size
      val edges = (0 until n).map { i =>
        val (x1, y1) = p.vertices(i)
        val (x2, y2) = p.vertices((i + 1) % n)
        (x1, y1, x2, y2)
      }
      (p.pid, p.vertices.map(_._1).min, p.vertices.map(_._1).max,
        p.vertices.map(_._2).min, p.vertices.map(_._2).max, edges)
    }.toDF("pid", "xmin", "xmax", "ymin", "ymax", "edges")
  }

  /** TWICE the signed area of a ring (the shoelace sum Σ x1·y2 − x2·y1
    * over edges) — exact in integers, positive for CCW rings. Absolute
    * value / 2 is the polygon area; with integer vertices `area2` keeps
    * the result integral, so zone densities (points per area) derive
    * without float hazard.
    */
  def area2(p: Poly): Long = {
    val n = p.vertices.size
    (0 until n).map { i =>
      val (x1, y1) = p.vertices(i)
      val (x2, y2) = p.vertices((i + 1) % n)
      x1 * y2 - x2 * y1
    }.sum
  }

  /** GENERAL (possibly concave) simple-polygon containment by integer
    * ray casting (even-odd rule): a horizontal ray to +x crosses edge
    * (x1,y1)->(x2,y2) iff the edge spans the point's y strictly
    * ((y1 > py) != (y2 > py) — the half-open treatment that makes
    * shared vertices count once) AND the intersection lies strictly
    * right of the point, which in exact integers is cross > 0 for
    * upward edges and cross < 0 for downward ones (cross as in
    * [[cross]]). No division, no epsilon; points exactly ON an edge
    * line are not crossed by it (boundary semantics follow parity of
    * the remaining edges — identical in any engine running the same
    * comparisons, which is what q122 gates).
    */
  def containsGeneral(p: Poly, px: Long, py: Long): Boolean = {
    val n = p.vertices.size
    var inside = false
    var i = 0
    while (i < n) {
      val (x1, y1) = p.vertices(i)
      val (x2, y2) = p.vertices((i + 1) % n)
      if ((y1 > py) != (y2 > py)) {
        val cr = cross(x1, y1, x2, y2, px, py)
        if (if (y2 > y1) cr > 0 else cr < 0) inside = !inside
      }
      i += 1
    }
    inside
  }

  /** Polygon table WITHOUT the convexity requirement (ray casting
    * handles any simple ring, either orientation).
    */
  def polyTableGeneral(spark: SparkSession, polys: Seq[Poly]): DataFrame = {
    import spark.implicits._
    polys.foreach(p =>
      require(p.vertices.size >= 3, s"polygon ${p.pid} needs >= 3 vertices"))
    polys.map { p =>
      val n = p.vertices.size
      val edges = (0 until n).map { i =>
        val (x1, y1) = p.vertices(i)
        val (x2, y2) = p.vertices((i + 1) % n)
        (x1, y1, x2, y2)
      }
      (p.pid, p.vertices.map(_._1).min, p.vertices.map(_._1).max,
        p.vertices.map(_._2).min, p.vertices.map(_._2).max, edges)
    }.toDF("pid", "xmin", "xmax", "ymin", "ymax", "edges")
  }

  /** General containment join: same broadcast/bbox shape as
    * [[pointInPolygon]], with the half-plane conjunction replaced by
    * the ray-cast crossing parity over the edge ring.
    */
  def pointInPolygonGeneral(points: DataFrame, polyDim: DataFrame,
                            px: Column, py: Column): DataFrame = {
    val e = col("edges")
    def crossE(ed: Column) =
      (ed.getField("_3") - ed.getField("_1")) * (py - ed.getField("_2")) -
        (ed.getField("_4") - ed.getField("_2")) * (px - ed.getField("_1"))
    val crossings = size(filter(e, ed =>
      (ed.getField("_2") > py) =!= (ed.getField("_4") > py) &&
        when(ed.getField("_4") > ed.getField("_2"), crossE(ed) > 0L)
          .otherwise(crossE(ed) < 0L)))
    points.join(broadcast(polyDim),
      px >= col("xmin") && px <= col("xmax") &&
        py >= col("ymin") && py <= col("ymax") && crossings % 2 === 1)
  }

  /** Join `points` (with integer columns `px`, `py`) to the polygons
    * containing them. Inner join; a point in k polygons emits k rows.
    */
  def pointInPolygon(points: DataFrame, polyDim: DataFrame,
                     px: Column, py: Column): DataFrame = {
    val e = col("edges")
    val inside = forall(e, ed =>
      (ed.getField("_3") - ed.getField("_1")) * (py - ed.getField("_2")) -
        (ed.getField("_4") - ed.getField("_2")) * (px - ed.getField("_1"))
        >= 0L)
    points.join(broadcast(polyDim),
      px >= col("xmin") && px <= col("xmax") &&
        py >= col("ymin") && py <= col("ymax") && inside)
  }
}
