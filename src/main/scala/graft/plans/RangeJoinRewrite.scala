package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a pure range join — an inner join whose condition
  * has NO equi conjunct, only `point >= lo AND point <= hi` bounds — into the
  * binned equi-join of [[graft.operators.RangeJoin]], automatically.
  *
  * Without this, Catalyst plans any non-equi inner join as
  * BroadcastNestedLoopJoin (or a cartesian), which is O(|L| x |R|) compute no
  * matter how selective the range is: the classic silent scale-killer when a
  * user writes `a JOIN b ON a.ts BETWEEN b.lo AND b.hi` in the raw-SQL
  * extraction path. The rewrite synthesizes a bin key on both sides
  * (`point div w` on the point side, `explode(sequence(lo div w, hi div w))`
  * on the interval side), joins on it — hash/sort-merge with AQE skew
  * handling — and keeps the ORIGINAL condition as the exact post-filter, so
  * semantics are preserved by construction (any monotone binning is
  * admissible, and each point lives in exactly one bin so no pair duplicates).
  * Inverted intervals (lo > hi) produce a descending bin walk that the
  * post-filter then empties — matching the nested loop's "no match", never
  * erroring.
  *
  * Intervals wider than `maxBinsPerInterval` bins would replicate unboundedly
  * through the explode, so the interval side is SPLIT: narrow intervals take
  * the binned join, the (rare) wide ones keep the original nested-loop form,
  * and the two unioned halves together are exactly the original join. The
  * wide branch carries a marker column so the rule does not re-fire on it
  * when the optimizer batch runs to fixed point.
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`; also usable as
  * `spark.experimental.extraOptimizations :+= RangeJoinRewrite`. Knobs:
  * `spark.graft.rangeJoin.enabled` (default true),
  * `spark.graft.rangeJoin.binWidth` (default 64 — in the point column's own
  * units; set it near the typical interval length), and
  * `spark.graft.rangeJoin.maxBinsPerInterval` (default 4096).
  *
  * Only integral-typed bounds are rewritten (monotone long/double bin
  * arithmetic); anything with an equi conjunct is left to Spark's own hash
  * join planning.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val binCol = "graft_range_bin"
  private val markerCol = "graft_range_wide"

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean
  private def binWidth: Long =
    SQLConf.get.getConfString("spark.graft.rangeJoin.binWidth", "64").toLong
  private def maxBins: Long =
    SQLConf.get.getConfString("spark.graft.rangeJoin.maxBinsPerInterval", "4096").toLong

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType => true
    case _ => false
  }

  private def refsIn(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** `(point, lo, hi, pointOnLeft)` for a conjunct pair bounding one side's
    * expression by the other side's. */
  private def rangePattern(conjuncts: Seq[Expression], left: LogicalPlan,
                           right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    // normalize every conjunct to (smaller, larger) i.e. smaller <= larger
    // (strictness stays in the post-filter; bins only need monotone bounds)
    val bounds = conjuncts.collect {
      case LessThanOrEqual(a, b) => (a, b)
      case LessThan(a, b) => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
      case GreaterThan(a, b) => (b, a)
    }
    // a lower bound (lo <= point) and an upper bound (point <= hi) on the
    // same point expression, with point and bounds on opposite sides
    val candidates = for {
      (lo, p1) <- bounds
      (p2, hi) <- bounds
      if p1.semanticEquals(p2) && integral(p1) && integral(lo) && integral(hi)
      pointOnLeft <- (refsIn(p1, left), refsIn(lo, right) && refsIn(hi, right)) match {
        case (true, true) => Some(true)
        case _ if refsIn(p1, right) && refsIn(lo, left) && refsIn(hi, left) => Some(false)
        case _ => None
      }
    } yield (p1, lo, hi, pointOnLeft)
    candidates.headOption
  }

  private def hasEquiKey(conjuncts: Seq[Expression], left: LogicalPlan,
                         right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (refsIn(a, left) && refsIn(b, right)) || (refsIn(a, right) && refsIn(b, left))
      case EqualNullSafe(a, b) =>
        (refsIn(a, left) && refsIn(b, right)) || (refsIn(a, right) && refsIn(b, left))
      case _ => false
    }

  private def hasMarker(plan: LogicalPlan): Boolean =
    plan.output.exists(_.name == markerCol)

  /** ColumnPruning strips the marker column (it contributes nothing to the
    * final output), so in the production `injectOptimizerRule` path — where
    * this rule shares a fixed-point batch with ColumnPruning — the marker
    * alone cannot prevent re-firing on the wide arm. Structural second line:
    * the wide arm is recognizable by its own width guard, a Filter conjunct of
    * shape `NOT((hi - lo) <= cap)` (or `(hi - lo) > cap` after
    * BooleanSimplification) anywhere below the join. A user's own such filter
    * also matches — skipping those joins is conservative and safe. */
  private def hasWidthGuard(plan: LogicalPlan): Boolean = plan.exists {
    case Filter(cond, _) => splitConjunctivePredicates(cond).exists {
      case Not(LessThanOrEqual(_: Subtract, _: Literal)) => true
      case GreaterThan(_: Subtract, _: Literal) => true
      case _ => false
    }
    case _ => false
  }

  /** Exact monotone bin: floor(x / w) over doubles is monotone and identical
    * on both sides of the join, which is all binning needs. */
  private def binOf(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !hasMarker(left) && !hasMarker(right) &&
            !hasWidthGuard(left) && !hasWidthGuard(right) &&
            !hasEquiKey(splitConjunctivePredicates(cond), left, right) =>
        val conjuncts = splitConjunctivePredicates(cond)
        rangePattern(conjuncts, left, right) match {
          case Some((point, lo, hi, pointOnLeft)) =>
            val w = binWidth
            val (pointSide, intervalSide) = if (pointOnLeft) (left, right) else (right, left)

            // interval-width split: narrow -> binned equi-join; wide -> keep
            // the nested-loop form (bounded replication either way)
            val narrowPred = LessThanOrEqual(
              Subtract(Cast(hi, LongType), Cast(lo, LongType)),
              Literal(maxBins * w))
            val narrowIv = Filter(narrowPred, intervalSide)
            val wideIv = Project(
              intervalSide.output :+ Alias(Literal(true), markerCol)(),
              Filter(Not(narrowPred), intervalSide))

            val pointBin = Alias(binOf(point, w), binCol)()
            val pointPlan = Project(pointSide.output :+ pointBin, pointSide)
            // no explicit step: direction auto-negates, so an inverted
            // interval (lo > hi) walks downward instead of erroring; the
            // exact post-filter then drops every candidate it produced
            val seq = Sequence(binOf(lo, w), binOf(hi, w), None,
              Some(SQLConf.get.sessionLocalTimeZone))
            val ivBinAttr = AttributeReference(binCol, LongType, nullable = true)()
            val ivPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(ivBinAttr),
              child = narrowIv)

            val equi = EqualTo(pointBin.toAttribute, ivBinAttr)
            val (nl, nr) = if (pointOnLeft) (pointPlan, ivPlan) else (ivPlan, pointPlan)
            val binnedJoin = Join(nl, nr, Inner, Some(And(equi, cond)), hint)

            val (wl, wr) = if (pointOnLeft) (pointSide, wideIv) else (wideIv, pointSide)
            val wideJoin = Join(wl, wr, Inner, Some(cond), hint)

            val out = left.output ++ right.output
            Union(Seq(Project(out, binnedJoin), Project(out, wideJoin)))
          case None => j
        }
    }
  }
}
