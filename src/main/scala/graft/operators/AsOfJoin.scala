package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Backward as-of join: for each left row, attach values from the
  * right row with the greatest `rightTime <= leftTime` for the same
  * key (the classic "latest state as of event time" enrichment).
  *
  * Spark has no built-in as-of join, and the naive range-join
  * (`l.key = r.key AND r.t <= l.t` + per-row max) explodes to
  * O(|matches|) pairs before aggregating. This implementation is the
  * union-and-window composition instead:
  *
  *   1. tag left and right rows, align schemas, union;
  *   2. one window per key ordered by (time, side) — right rows sort
  *      before left rows at equal time, giving inclusive <= semantics;
  *   3. `last(value, ignoreNulls)` carries the latest right values
  *      forward onto each left row.
  *
  * One shuffle on the key, O(n log n) per partition, no pair blowup —
  * the 100 TB-safe shape. Inner semantics: left rows with no prior
  * right row are dropped (their carried values are all null).
  */
object AsOfJoin {

  def joinAsOfBackward(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       valueCols: Seq[String]): DataFrame =
    joinAsOf(left, right, leftKey, rightKey, leftTime, rightTime, valueCols,
      forward = false)

  /** Forward as-of join: attach the right row with the SMALLEST
    * `rightTime >= leftTime` per key ("next scheduled event after this
    * one"). Same union-and-window shape, mirrored: right rows sort
    * after left rows at equal time is wrong for inclusive >= — so
    * right sorts first at equal times and the carry runs backward via
    * an unbounded-following frame. */
  def joinAsOfForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      valueCols: Seq[String]): DataFrame =
    joinAsOf(left, right, leftKey, rightKey, leftTime, rightTime, valueCols,
      forward = true)

  private def joinAsOf(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       valueCols: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // sort position of right rows at equal timestamps: backward wants
    // right BEFORE left (so <= is inclusive under a preceding frame);
    // forward wants right AFTER left under a following frame — which
    // is again "left greater", so the flag encoding flips
    val lFlag = 1
    val lNorm = left.select(
      (Seq(col(leftKey).cast("long").as("__k"),
        col(leftTime).cast(TimestampType).as("__t"),
        lit(lFlag).as("__isL")) ++
        leftCols.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c"))): _*)
    val rNorm = right.select(
      (Seq(col(rightKey).cast("long").as("__k"),
        col(rightTime).cast(TimestampType).as("__t"),
        lit(0).as("__isL")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__v_$c"))): _*)
    val ordered = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), if (forward) col("__isL").desc else col("__isL").asc)
    val w =
      if (forward) ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry: Column => Column =
      if (forward) c => first(c, ignoreNulls = true).over(w)
      else c => last(c, ignoreNulls = true).over(w)
    val filled = valueCols.foldLeft(lNorm.unionByName(rNorm)) { (df, c) =>
      df.withColumn(s"__v_$c", carry(col(s"__v_$c")))
    }
    filled
      .filter(col("__isL") === 1 && valueCols.map(c => col(s"__v_$c").isNotNull).reduce(_ && _))
      .select((leftCols.map(col) ++ valueCols.map(c => col(s"__v_$c").as(c))): _*)
  }
}
