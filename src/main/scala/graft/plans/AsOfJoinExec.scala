package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical node for the native as-of join: for every left row, attach
  * `rightValues` from the right row with the greatest
  * `rightTime <= leftTime` (backward, `forward = false`) or the
  * smallest `rightTime >= leftTime` (forward) sharing the join key.
  * Inner semantics (left rows with no matching right row drop out),
  * null keys/times never match — identical to
  * [[graft.operators.AsOfJoin]]'s compositions, which are the
  * differential references in OperatorSpec.
  *
  * Built already-resolved from analyzed children (the Column-API entry
  * resolves attributes by name), so no analyzer rule is needed — only
  * the planner [[AsOfJoinStrategy]].
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightValues: Seq[Attribute],
                        forward: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightValues
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan)
  : LogicalPlan = copy(left = l, right = r)
}

/** Physical sort-merge as-of join.
  *
  * Declares `ClusteredDistribution` on the key for both children (so
  * EnsureRequirements co-partitions them with one hash exchange each)
  * and (key, time) ascending child orderings (sort satisfied inside
  * the exchange). Execution is then a single streaming merge per
  * partition: advance the right iterator while its (key, time) is at
  * or before the left row's, remembering the latest right row per key;
  * emit left ++ rightValues when one exists. O(|L|+|R|) per partition,
  * no buffering beyond one row — the true scale shape for as-of
  * (versus the union+window composition, which materializes a
  * double-width union and window-scans it).
  *
  * v1 scope: LongType keys, TimestampType/LongType times (both read
  * via `getLong` on internal rows). Null key/time rows are skipped.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightValues: Seq[Attribute],
                        forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightValues

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexOf(leftKey)
    val lTimeOrd = left.output.indexOf(leftTime)
    val rKeyOrd = right.output.indexOf(rightKey)
    val rTimeOrd = right.output.indexOf(rightTime)
    val rightOut = right.output
    val leftOut = left.output
    val rightVals = rightValues

    val isForward = forward
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val valueProj = UnsafeProjection.create(rightVals, rightOut)
      val outProj = UnsafeProjection.create(leftOut ++ rightVals, leftOut ++ rightVals)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val rBuf = rIt.buffered

      if (isForward) {
        // forward merge: left times ascend, so any right row strictly
        // before (k, t) can never match this or a later left row —
        // discard it; the matching row (first with rk == k, rt >= t)
        // is PEEKED, not consumed, because the next left row at the
        // same key may match it again
        lIt.flatMap { l =>
          if (l.isNullAt(lKeyOrd) || l.isNullAt(lTimeOrd)) Iterator.empty
          else {
            val k = l.getLong(lKeyOrd)
            val t = l.getLong(lTimeOrd)
            var continue = true
            while (continue && rBuf.hasNext) {
              val r = rBuf.head
              if (r.isNullAt(rKeyOrd) || r.isNullAt(rTimeOrd)) rBuf.next()
              else {
                val rk = r.getLong(rKeyOrd)
                if (rk < k || (rk == k && r.getLong(rTimeOrd) < t)) rBuf.next()
                else continue = false
              }
            }
            if (rBuf.hasNext && rBuf.head.getLong(rKeyOrd) == k)
              Iterator.single(outProj(joined(l, valueProj(rBuf.head))))
            else Iterator.empty
          }
        }
      } else {
        var lastKey = 0L
        var haveLast = false
        var lastValues: InternalRow = null

        def advanceRight(k: Long, t: Long): Unit = {
          var continue = true
          while (continue && rBuf.hasNext) {
            val r = rBuf.head
            if (r.isNullAt(rKeyOrd) || r.isNullAt(rTimeOrd)) { rBuf.next() }
            else {
              val rk = r.getLong(rKeyOrd)
              val rt = r.getLong(rTimeOrd)
              if (rk < k || (rk == k && rt <= t)) {
                if (rk == k) {
                  lastValues = valueProj(r).copy()
                  lastKey = rk
                  haveLast = true
                }
                rBuf.next()
              } else continue = false
            }
          }
        }

        lIt.flatMap { l =>
          if (l.isNullAt(lKeyOrd) || l.isNullAt(lTimeOrd)) Iterator.empty
          else {
            val k = l.getLong(lKeyOrd)
            val t = l.getLong(lTimeOrd)
            if (haveLast && lastKey != k) haveLast = false
            advanceRight(k, t)
            if (haveLast && lastKey == k) Iterator.single(outProj(joined(l, lastValues)))
            else Iterator.empty
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

/** Planner strategy mapping the logical node to the exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, fwd) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {
  /** Column-API entry: backward as-of join via the native operator.
    * Attributes are resolved by name against the analyzed children;
    * the strategy is registered idempotently on the session. */
  def joinAsOfBackward(left: org.apache.spark.sql.DataFrame,
                       right: org.apache.spark.sql.DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       valueCols: Seq[String]): org.apache.spark.sql.DataFrame =
    joinAsOf(left, right, leftKey, rightKey, leftTime, rightTime, valueCols,
      forward = false)

  /** Forward as-of join via the native operator: smallest
    * `rightTime >= leftTime` per key. */
  def joinAsOfForward(left: org.apache.spark.sql.DataFrame,
                      right: org.apache.spark.sql.DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      valueCols: Seq[String]): org.apache.spark.sql.DataFrame =
    joinAsOf(left, right, leftKey, rightKey, leftTime, rightTime, valueCols,
      forward = true)

  private def joinAsOf(left: org.apache.spark.sql.DataFrame,
                       right: org.apache.spark.sql.DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       valueCols: Seq[String],
                       forward: Boolean): org.apache.spark.sql.DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    // Self-join safety: when the right plan shares lineage with the
    // left (q51's events-vs-events shape), its attributes carry the
    // SAME exprIds — UnsafeProjection binds by first exprId match, so
    // the appended right values would silently resolve to LEFT columns.
    // Re-alias the right side with fresh exprIds, as Dataset.join's
    // dedup step does.
    val rPlan0 = right.queryExecution.analyzed
    val rPlan =
      if (rPlan0.outputSet.intersect(lPlan.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${p.output.map(_.name)}"))
    // the exec reads keys/times via getLong: anything not physically
    // long-backed (e.g. DateType's int days vs TimestampType's micros)
    // would silently compare wrong scales — reject it here
    def requireLongBacked(a: Attribute, role: String): Unit = a.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => ()
      case dt => throw new IllegalArgumentException(
        s"native as-of join requires a long-backed $role " +
          "(LongType / TimestampType / TimestampNTZType), " +
          s"got ${dt.simpleString} for ${a.name} — cast it first or use " +
          "operators.AsOfJoin.joinAsOfBackward")
    }
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    Seq(lk -> "key", rk -> "key", lt -> "time", rt -> "time")
      .foreach { case (a, role) => requireLongBacked(a, role) }
    // long-backed is necessary but not sufficient: a LongType epoch-
    // nanos column against a TimestampType (micros) column would pass
    // per-attribute checks yet compare raw longs across units — require
    // matching types so both sides share one scale. TimestampType and
    // TimestampNTZType are both micros-since-epoch, so that mix is
    // unit-safe (the session zone only affects rendering).
    def requireSameType(a: Attribute, b: Attribute, role: String): Unit = {
      def micros(dt: org.apache.spark.sql.types.DataType): Boolean =
        dt == org.apache.spark.sql.types.TimestampType ||
          dt == org.apache.spark.sql.types.TimestampNTZType
      if (a.dataType != b.dataType && !(micros(a.dataType) && micros(b.dataType)))
        throw new IllegalArgumentException(
        s"native as-of join requires both $role columns to share one type " +
          s"(raw long comparison can't mix units/scales): " +
          s"${a.name} is ${a.dataType.simpleString} but ${b.name} is " +
          s"${b.dataType.simpleString} — cast one side first")
    }
    requireSameType(lk, rk, "key")
    requireSameType(lt, rt, "time")
    val node = AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt,
      valueCols.map(attr(rPlan, _)), forward)
    org.apache.spark.sql.graftshim.ColumnShim.ofRows(spark, node)
  }

  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraStrategies
    if (!existing.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = existing :+ AsOfJoinStrategy
  }
}
