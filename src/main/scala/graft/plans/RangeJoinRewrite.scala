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
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`; also usable as
  * `spark.experimental.extraOptimizations :+= RangeJoinRewrite`. Knobs:
  * `spark.graft.rangeJoin.enabled` (default true) and
  * `spark.graft.rangeJoin.binWidth` (default 64 — in the point column's own
  * units; set it near the typical interval length).
  *
  * Only integral-typed bounds are rewritten (bin arithmetic in exact long
  * math); the guard also skips self-referencing bounds and anything with an
  * equi conjunct (Spark already plans those as hash joins with the range as a
  * post-filter).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val binCol = "graft_range_bin"

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean
  private def binWidth: Long =
    SQLConf.get.getConfString("spark.graft.rangeJoin.binWidth", "64").toLong

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

  /** Exact monotone bin: floor(x / w) over doubles is monotone and identical
    * on both sides of the join, which is all binning needs. */
  private def binOf(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !hasEquiKey(splitConjunctivePredicates(cond), left, right) =>
        val conjuncts = splitConjunctivePredicates(cond)
        rangePattern(conjuncts, left, right) match {
          case Some((point, lo, hi, pointOnLeft)) =>
            val w = binWidth
            val (pointSide, intervalSide) = if (pointOnLeft) (left, right) else (right, left)

            val pointBin = Alias(binOf(point, w), binCol)()
            val pointPlan = Project(pointSide.output :+ pointBin, pointSide)

            // Sequence is TimeZoneAwareExpression: resolution requires an
            // explicit zone even for pure long sequences
            val seq = Sequence(binOf(lo, w), binOf(hi, w), Some(Literal(1L)),
              Some(SQLConf.get.sessionLocalTimeZone))
            val ivBinAttr = AttributeReference(binCol, LongType, nullable = true)()
            val ivPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(ivBinAttr),
              child = intervalSide)

            val equi = EqualTo(pointBin.toAttribute, ivBinAttr)
            val (newL, newR) = if (pointOnLeft) (pointPlan, ivPlan) else (ivPlan, pointPlan)
            val joined = Join(newL, newR, Inner, Some(And(equi, cond)), hint)
            Project(left.output ++ right.output, joined)
          case None => j
        }
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }
}
