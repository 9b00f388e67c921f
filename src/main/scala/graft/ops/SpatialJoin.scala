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
