package graft

import org.apache.spark.sql.functions._
import graft.ops.SpatialJoin
import graft.ops.SpatialJoin.Poly

/** Point-in-convex-polygon join: the Column-form half-plane test
  * matches the plain-Scala twin everywhere on a dense grid, boundary
  * semantics are inclusive, malformed rings are rejected, and the
  * polygon side broadcasts. Cross-engine arithmetic parity is q114.
  */
class SpatialJoinSpec extends SparkSpec {

  private val tri = Poly(1, Seq((0L, 0L), (8L, 0L), (0L, 8L)))
  private val quad = Poly(2, Seq((2L, 2L), (9L, 3L), (8L, 9L), (3L, 8L)))

  test("Column containment matches the plain-Scala twin on a dense grid") {
    import spark.implicits._
    val pts = (for (x <- -2L to 11L; y <- -2L to 11L) yield (x, y))
      .toDF("px", "py")
    val dim = SpatialJoin.polyTable(spark, Seq(tri, quad))
    val got = SpatialJoin.pointInPolygon(pts, dim, $"px", $"py")
      .select("px", "py", "pid").as[(Long, Long, Int)].collect().toSet
    val want = (for {
      x <- -2L to 11L; y <- -2L to 11L
      p <- Seq(tri, quad) if SpatialJoin.contains(p, x, y)
    } yield (x, y, p.pid)).toSet
    assert(got === want)
    // boundary is inside: a vertex and an edge midpoint of the triangle
    assert(want.contains((0L, 0L, 1)))
    assert(want.contains((4L, 0L, 1)))
    // and just outside is not
    assert(!want.contains((-1L, 0L, 1)))
  }

  test("clockwise and non-convex rings are rejected loudly") {
    intercept[IllegalArgumentException] {
      SpatialJoin.polyTable(spark, Seq(Poly(9, tri.vertices.reverse)))
    }
    intercept[IllegalArgumentException] {
      SpatialJoin.polyTable(spark, Seq(
        Poly(9, Seq((0L, 0L), (8L, 0L), (4L, 2L), (0L, 8L))))) // dent
    }
  }

  test("the polygon side broadcasts (no shuffle of the point side)") {
    import spark.implicits._
    val pts = (0L until 2000L).map(i => (i % 40, i % 37)).toDF("px", "py")
    val dim = SpatialJoin.polyTable(spark, Seq(tri, quad))
    val plan = SpatialJoin.pointInPolygon(pts, dim, $"px", $"py")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.toLowerCase.contains("sortmergejoin"), plan)
  }

  test("general (concave) containment: ray-cast Column form matches " +
    "the plain-Scala twin on a dense grid, and agrees with the " +
    "half-plane test on convex rings") {
    import spark.implicits._
    // an L-shape (concave) and the convex quad, both through ray cast
    val ell = Poly(3, Seq((2L, 2L), (10L, 2L), (10L, 6L), (6L, 6L),
      (6L, 10L), (2L, 10L)))
    val pts = (for (x <- 0L to 12L; y <- 0L to 12L) yield (x, y))
      .toDF("px", "py")
    val dim = SpatialJoin.polyTableGeneral(spark, Seq(ell, quad))
    val got = SpatialJoin.pointInPolygonGeneral(pts, dim, $"px", $"py")
      .select("px", "py", "pid").as[(Long, Long, Int)].collect().toSet
    val want = (for {
      x <- 0L to 12L; y <- 0L to 12L
      p <- Seq(ell, quad) if SpatialJoin.containsGeneral(p, x, y)
    } yield (x, y, p.pid)).toSet
    assert(got === want)
    // concavity is real: the notch corner region is OUTSIDE
    assert(!want.contains((8L, 8L, 3)))
    assert(want.contains((4L, 8L, 3)) && want.contains((8L, 4L, 3)))
    // on convex rings ray casting agrees with the half-plane interior
    // (boundaries excepted — parity treats edges half-open)
    for (x <- 0L to 12L; y <- 0L to 12L) {
      val strict = (0 until quad.vertices.size).forall { i =>
        val (x1, y1) = quad.vertices(i)
        val (x2, y2) = quad.vertices((i + 1) % quad.vertices.size)
        SpatialJoin.cross(x1, y1, x2, y2, x, y) > 0
      }
      if (strict) assert(SpatialJoin.containsGeneral(quad, x, y), (x, y))
      if (!SpatialJoin.contains(quad, x, y))
        assert(!SpatialJoin.containsGeneral(quad, x, y), (x, y))
    }
  }

  test("q114's zone set is strictly convex CCW (fixture sanity)") {
    // polyTable throws otherwise; also pin the overlap the query doc
    // claims: (500, 600) sits in BOTH the square and the tilted quad
    SpatialJoin.polyTable(spark, graft.queries.Spatial.zones)
    val overlapping = graft.queries.Spatial.zones
      .filter(p => SpatialJoin.contains(p, 500L, 600L)).map(_.pid)
    assert(overlapping.contains(2) && overlapping.contains(4))
  }
}
