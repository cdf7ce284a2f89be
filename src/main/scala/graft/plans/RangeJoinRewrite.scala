package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite point-in-interval inequality joins into
  * banded equi-joins.
  *
  * Spark plans `points ⋈ intervals ON p >= lo AND p < hi` (no equality
  * conjunct) as BroadcastNestedLoopJoin — O(|points| × |intervals|)
  * comparisons, unusable at scale. This rule detects the shape on a
  * resolved inner join and rewrites it to the same plan
  * [[graft.operators.RangeJoin.pointInInterval]] builds by hand:
  *
  *   - points gain a band id `floor(p / W)`;
  *   - intervals explode onto every band they overlap
  *     (`sequence(floor(lo/W), floor(hi/W))`);
  *   - the join becomes an EQUI join on the band id, with the original
  *     inequality predicate kept as the post-join filter.
  *
  * Null/empty-interval semantics are unchanged: a null point or bound
  * produces a null band/array, which the equi-join/explode drops —
  * exactly the rows the raw predicate could never match. The extra
  * `lo < hi` pre-filter only removes rows that match nothing.
  *
  * Config: `spark.graft.rangeJoin.enabled` (default FALSE — the
  * rewrite explodes `interval_width / bandWidth` band rows per
  * interval, so enabling it with a bandWidth far below the widest
  * interval would inflate the build side without bound; opt in with a
  * bandWidth sized to the data's typical interval length),
  * `spark.graft.rangeJoin.bandWidth` (default 100.0). The rewritten
  * join's condition contains an equality, so the rule never re-fires
  * on its own output.
  */
case class RangeJoinRewrite(spark: org.apache.spark.sql.SparkSession)
  extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.rangeJoin.enabled", "false").toBoolean
  private def bandWidth: Double =
    spark.conf.get("spark.graft.rangeJoin.bandWidth", "100.0").toDouble

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** Decompose `cond` as (point, lo, hi) with point from `l` and
    * bounds from `r`: p >= lo AND p < hi (any conjunct order). */
  private def matchPointInterval(cond: Expression, l: LogicalPlan, r: LogicalPlan)
  : Option[(Expression, Expression, Expression)] = cond match {
    case And(a, b) =>
      val pair = Seq((a, b), (b, a)).collectFirst {
        case (GreaterThanOrEqual(p1, lo), LessThan(p2, hi))
          if p1.semanticEquals(p2) => (p1, lo, hi)
      }
      pair.filter { case (p, lo, hi) =>
        refsOnly(p, l) && refsOnly(lo, r) && refsOnly(hi, r) &&
          p.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
          lo.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
          hi.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      }
    case _ => None
  }

  private def bandOf(e: Expression): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(bandWidth)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && matchPointInterval(cond, left, right).isDefined =>
        val (p, lo, hi) = matchPointInterval(cond, left, right).get

        // left: append the point's band id
        val lBand = Alias(bandOf(p), "__graft_band_l")()
        val newLeft = Project(left.output :+ lBand, left)

        // right: drop empty intervals, explode covered bands
        // Sequence is TimeZoneAwareExpression: without a zone id it
        // reports unresolved and fails plan validation
        val bandsArr = Alias(
          Sequence(bandOf(lo), bandOf(hi), Some(Literal(1L)),
            Some(conf.sessionLocalTimeZone)), "__graft_bands")()
        val filtered = Filter(LessThan(lo, hi), right)
        val withArr = Project(right.output :+ bandsArr, filtered)
        val rBand = AttributeReference("__graft_band_r", LongType, nullable = false)()
        val exploded = Generate(
          Explode(bandsArr.toAttribute), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(rBand), child = withArr)
        val newRight = Project(right.output :+ rBand, exploded)

        val newCond = And(EqualTo(lBand.toAttribute, rBand), cond)
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}

/** Session-extensions entry point: register graft's optimizer rules
  * in every session built with `.withExtensions(new GraftExtensions)`
  * or via `spark.sql.extensions=graft.plans.GraftExtensions` (the rule
  * then runs inside the main operator-optimization batch, so Catalyst
  * further optimizes the rewritten plan — pushdown, pruning). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(session => RangeJoinRewrite(session))
  }
}

object GraftExtensions {
  /** Install on an ALREADY-RUNNING session via
    * `experimental.extraOptimizations` (extensions can't be added to a
    * live session). The rule then runs in the user-provided batch
    * after the main optimizer — correctness identical, the rewritten
    * operators just skip a second pushdown pass. Idempotent. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[RangeJoinRewrite]))
      spark.experimental.extraOptimizations = existing :+ RangeJoinRewrite(spark)
  }
}
