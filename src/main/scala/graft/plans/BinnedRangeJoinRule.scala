package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite an inner join whose ONLY cross-side predicate
  * is a range (`s <= p < e` in any strict/non-strict mix) into the
  * binned equi-join form, so the planner picks a hash join on the bin
  * instead of BroadcastNestedLoopJoin / CartesianProduct — the
  * O(|L|×|R|) plans that die at scale.
  *
  * The transform is the logical-plan twin of `ops.RangeJoin.binned`:
  *
  *   points:    + _graft_bin = floor(p / w)
  *   intervals: + explode(sequence(floor(s / w), floor(e / w)))
  *   join on    _graft_bin = _graft_bin_i  AND  <original condition>
  *
  * The bin function is monotonic and the ORIGINAL conjuncts all stay in
  * the join condition as the residual filter, so a poorly-sized bin
  * width only costs performance, never correctness (this also covers
  * the empty-interval `s > e` edge, where Spark's `sequence` descends:
  * any false bin candidates fail the residual). A point falls in
  * exactly one bin, so no post-join dedup is needed.
  *
  * Activation is explicit: set `spark.graft.rangeJoin.binWidth` to a
  * positive long in the native units of the point column (e.g. epoch
  * seconds for `unix_timestamp` points). Sizing: of the order of the
  * typical interval length — too small multiplies the exploded interval
  * rows, too large widens each bin's false-candidate band. The rule
  * skips joins that already have a cross-side equi conjunct (those hash-
  * join fine already), which also makes it idempotent inside the
  * optimizer's fixed-point batch: its own output carries the bin
  * equality.
  *
  * Registered via `GraftExtensions` (`injectOptimizerRule`), the same
  * hook a cluster deployment reaches with
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Option[Long] =
    SQLConf.get.getConfString(ConfKey, "").toLongOption.filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, w).getOrElse(j)
      }
  }

  /** Integral / floating point points bin exactly; everything else is
    * left alone. (Cast-to-double then floor-divide is monotonic
    * non-decreasing for every numeric type, which is all the bin
    * function needs.)
    */
  private def binnable(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType => true
    case _ => false
  }

  private def binOf(x: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble))), LongType)

  // (point, bound, pointSideIsLeft, isLowerBound)
  private type Bound = (Expression, Expression, Boolean, Boolean)

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    if (!conjuncts.forall(_.deterministic)) return None

    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(j.left.outputSet)) Some(true)
      else if (refs.subsetOf(j.right.outputSet)) Some(false)
      else None
    }

    def crossSide(a: Expression, b: Expression): Boolean =
      (sideOf(a), sideOf(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }

    // an existing cross-side equi conjunct already makes this a hash join
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }
    if (hasEqui) return None

    /** Orient a comparison as `big >= small`, then read it both ways:
      * `big` is a point with a LOWER bound, `small` is a point with an
      * UPPER bound. The pair-matching step keeps whichever point
      * expression shows up with a bound of each kind.
      */
    def readings(big: Expression, small: Expression): Seq[Bound] =
      (sideOf(big), sideOf(small)) match {
        case (Some(x), Some(y)) if x != y =>
          Seq((big, small, x, true), (small, big, y, false))
        case _ => Nil
      }

    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => readings(a, b)
      case GreaterThan(a, b) => readings(a, b)
      case LessThanOrEqual(a, b) => readings(b, a)
      case LessThan(a, b) => readings(b, a)
      case _ => Nil
    }

    val pair = bounds.filter(_._4).flatMap { case (p, lo, onLeft, _) =>
      bounds.filterNot(_._4).collectFirst {
        case (p2, hi, onLeft2, _)
            if p2.semanticEquals(p) && onLeft2 == onLeft &&
              binnable(p) && binnable(lo) && binnable(hi) =>
          (p, lo, hi, onLeft)
      }
    }.headOption

    pair.map { case (point, lo, hi, pointsOnLeft) =>
      val (points, intervals) =
        if (pointsOnLeft) (j.left, j.right) else (j.right, j.left)

      val pBin = Alias(binOf(point, w), "_graft_bin")()
      val pointsSide = Project(points.output :+ pBin, points)

      val b0 = Alias(binOf(lo, w), "_graft_b0")()
      val b1 = Alias(binOf(hi, w), "_graft_b1")()
      val ivProj = Project(intervals.output ++ Seq(b0, b1), intervals)
      val binAttr =
        AttributeReference("_graft_bin_i", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression: without a timeZoneId it
      // stays unresolved and the optimizer's plan-change validation
      // rejects the rewrite (the zone is irrelevant for long bins)
      val gen = Generate(
        Explode(Sequence(b0.toAttribute, b1.toAttribute, None,
          Some(SQLConf.get.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binAttr), child = ivProj)

      val newCond = (EqualTo(pBin.toAttribute, binAttr) +: conjuncts)
        .reduce[Expression](And)
      Project(j.output, Join(pointsSide, gen, Inner, Some(newCond), j.hint))
    }
  }
}
