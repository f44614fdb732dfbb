package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Logical rewrite for *band joins* — the range-join strategy SURVEY
  * §7.3 leaves as the one optional custom rule. An inner join whose
  * condition contains `abs(l.ts − r.ts) <= c` (and no equi-conjunct
  * that already bounds it) would execute as a broadcast-nested-loop /
  * cartesian O(n·m) plan; the rewrite injects time buckets of width c —
  * the probe side explodes into bucket −1/0/+1 — turning it into a
  * shuffled *equi* join on the bucket with the band as residual, the
  * plan `TradeMatching` builds by hand (every true match has bucket
  * distance ≤ 1, so the candidate set is identical).
  *
  * Registered through `GraftExtensions` (`injectOptimizerRule`), so any
  * user query `a.join(b, abs($"a.ts" − $"b.ts") <= lit(c))` gets the
  * scalable plan without knowing the trick.
  */
object BandJoinRule extends Rule[LogicalPlan] {

  private val ProbeName = "__band_probe"
  private val BucketName = "__band_bucket"

  /** Extract `abs(l − r) <= lit` with one side from each child. */
  private def bandConjunct(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    conjuncts.collectFirst {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(c: Long, LongType))
          if c > 0 &&
            a.references.subsetOf(left.outputSet) && a.dataType == LongType &&
            b.references.subsetOf(right.outputSet) && b.dataType == LongType =>
        (a, b, c)
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(c: Long, LongType))
          if c > 0 &&
            b.references.subsetOf(left.outputSet) && b.dataType == LongType &&
            a.references.subsetOf(right.outputSet) && a.dataType == LongType =>
        (b, a, c)
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.output.exists(a => a.name == ProbeName || a.name == BucketName) &&
          left.resolved && right.resolved =>
      bandConjunct(cond, left, right) match {
        case Some((lts, rts, c)) =>
          val bucket = IntegralDivide(lts, Literal(c))
          val probes = CreateArray(Seq(
            Subtract(bucket, Literal(1L)), bucket, Add(bucket, Literal(1L))))
          val probeAttr = AttributeReference(ProbeName, LongType,
            nullable = true)()
          val gen = Generate(Explode(probes), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(probeAttr), child = left)
          val bucketAttr = Alias(IntegralDivide(rts, Literal(c)), BucketName)()
          val proj = Project(right.output :+ bucketAttr, right)
          val newCond = And(cond,
            EqualTo(probeAttr, bucketAttr.toAttribute))
          Project(j.output,
            Join(gen, proj, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
