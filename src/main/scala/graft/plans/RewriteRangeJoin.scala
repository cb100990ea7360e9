package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite qualifying nested-loop range joins
  * into binned equi-joins (see [[graft.operators.RangeJoin]] for the
  * algorithm and cost model).
  *
  * Fires on an INNER join whose condition contains, for one point
  * expression `p` from one side and bound expressions `s`, `e` from the
  * other side, both `p >= s` (or `p > s`) and `p < e` (or `p <= e`) —
  * and NO cross-side equality (an equi key already gives Catalyst a
  * hash join; binning would only add overhead). All three expressions
  * must be numeric.
  *
  * The rewrite adds `floor(p / w)` to the point side, explodes each
  * interval onto `floor(s/w)..floor(e/w)` on the interval side, joins
  * on the bin equi-key AND the original condition (kept verbatim as the
  * residual, so semantics are exactly the original join's), and
  * projects the bin columns away. The equi-conjunct it introduces makes
  * the output ineligible for re-matching, so the rule is a fixpoint.
  *
  * Opt-in via `spark.graft.rangeJoin.binWidth` (positive double, in
  * units of the point column's domain); unset disables the rule. One
  * width per session is deliberate: the right bin width depends on the
  * interval-length distribution, which only the user knows. The width
  * applies to EVERY qualifying inner range join while set — an
  * interval spanning n·binWidth units explodes onto n bins, so set it
  * for the query it fits and unset it after (a width far below a
  * join's interval lengths multiplies that join's rows by len/width).
  */
case class RewriteRangeJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan =
    spark.conf.getOption(confKey)
      // a malformed value must not take down every query's optimization
      .flatMap(v => scala.util.Try(v.toDouble).toOption)
      .filter(_ > 0) match {
      case None => plan
      case Some(w) =>
        plan.transformUp {
          case j @ Join(_, _, Inner, Some(cond), _) =>
            extract(j, cond).map(rewrite(j, _, w)).getOrElse(j)
        }
    }

  /** (point, lower bound, upper bound, point side is left?) */
  private case class RangeShape(
      point: Expression, lower: Expression, upper: Expression,
      pointOnLeft: Boolean)

  private def extract(j: Join, cond: Expression): Option[RangeShape] = {
    val conjuncts = splitConjuncts(cond)
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(j.left.outputSet)) Some(true)
      else if (refs.subsetOf(j.right.outputSet)) Some(false)
      else None
    }
    // a cross-side equality means Catalyst already has an equi key
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => sideOf(a).isDefined && sideOf(b).isDefined &&
        sideOf(a) != sideOf(b)
      case EqualNullSafe(a, b) => sideOf(a).isDefined && sideOf(b).isDefined &&
        sideOf(a) != sideOf(b)
      case _ => false
    }
    if (hasEqui) return None
    def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]
    // normalize each comparison to (point, bound, isLower, pointSide)
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => norm(a, b, sideOf, numeric)
      case GreaterThan(a, b)        => norm(a, b, sideOf, numeric)
      case LessThanOrEqual(a, b)    => norm(b, a, sideOf, numeric)
      case LessThan(a, b)           => norm(b, a, sideOf, numeric)
      case _                        => Nil
    }
    // pair a lower and an upper bound on the same point expression
    val lowers = bounds.filter(_._3)
    val uppers = bounds.filter(!_._3)
    (for {
      (p, s, _, pSide) <- lowers
      (p2, e, _, _) <- uppers
      if p.semanticEquals(p2)
    } yield RangeShape(p, s, e, pSide)).headOption
  }

  /** Normalize `big >= small` into bound records. `big >= small` is a
    * lower bound on `big` (point = big, bound = small) when big and
    * small sit on opposite sides — and symmetrically an upper bound on
    * `small` (point = small, bound = big).
    */
  private def norm(
      big: Expression, small: Expression,
      sideOf: Expression => Option[Boolean],
      numeric: Expression => Boolean)
      : Seq[(Expression, Expression, Boolean, Boolean)] = {
    (sideOf(big), sideOf(small)) match {
      case (Some(bs), Some(ss)) if bs != ss && numeric(big) && numeric(small) =>
        // big >= small: lower bound for big, upper bound for small
        Seq((big, small, true, bs), (small, big, false, ss))
      case _ => Nil
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  private def bin(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  private def rewrite(j: Join, shape: RangeShape, w: Double): LogicalPlan = {
    val (pointPlan, intervalPlan) =
      if (shape.pointOnLeft) (j.left, j.right) else (j.right, j.left)

    val pointBin = Alias(bin(shape.point, w), "__graft_bin_p")()
    val pointSide = Project(pointPlan.output :+ pointBin, pointPlan)

    val binAttr = AttributeReference("__graft_bin_i", LongType, nullable = false)()
    // timeZoneId must be pinned or Sequence stays unresolved (it is
    // TimeZoneAwareExpression even for numeric sequences)
    val seqExpr = Sequence(
      bin(shape.lower, w), bin(shape.upper, w), Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val intervalSide = Generate(
      Explode(seqExpr),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(binAttr),
      // degenerate intervals (upper < lower) can't match and would make
      // the sequence run backwards
      Filter(LessThanOrEqual(shape.lower, shape.upper), intervalPlan))

    val newCond = And(EqualTo(pointBin.toAttribute, binAttr), j.condition.get)
    val (newLeft, newRight) =
      if (shape.pointOnLeft) (pointSide, intervalSide)
      else (intervalSide, pointSide)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
