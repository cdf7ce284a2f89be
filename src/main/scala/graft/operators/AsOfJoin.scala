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
  * right row are dropped (no carried right-row struct exists); a
  * matched row's individual values may be null and pass through.
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

  /** Duplicate-match caveat: if several right rows tie on exactly
    * (key, time), the carried winner among them is engine-order
    * dependent (Spark's window sort is not stable across equal keys,
    * and DuckDB's ASOF leaves the same choice unspecified). Callers
    * needing a deterministic winner must dedupe the right side on
    * (key, time) first — any extra ordering column injected here would
    * pin Spark's choice while still diverging from other engines'. */
  private def joinAsOf(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       valueCols: Seq[String], forward: Boolean): DataFrame = {
    // keys funnel through cast("long") below; under ANSI-off semantics
    // a non-integral key (string, double) would cast to NULL and every
    // row would silently drop through the null filter — fail loudly
    // instead, mirroring the native path's requireLongBacked
    def requireIntegralKey(df: DataFrame, name: String): Unit =
      df.schema(name).dataType match {
        case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
        case dt => throw new IllegalArgumentException(
          s"as-of join key $name must be an integral type, got " +
            s"${dt.simpleString} — cast it explicitly first")
      }
    requireIntegralKey(left, leftKey)
    requireIntegralKey(right, rightKey)
    val leftCols = left.columns.toSeq
    // null keys/times never match under the as-of predicate (SQL
    // comparison semantics) — filter them out rather than letting the
    // window's null partition/ordering invent matches
    val vrowType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lNorm = left
      .filter(col(leftKey).isNotNull && col(leftTime).isNotNull)
      .select(
        (Seq(col(leftKey).cast("long").as("__k"),
          col(leftTime).cast(TimestampType).as("__t"),
          lit(1).as("__isL")) ++
          leftCols.map(col) :+
          lit(null).cast(vrowType).as("__vrow")): _*)
    // the matched right row travels as ONE struct — carrying value
    // columns independently with ignoreNulls would stitch values from
    // DIFFERENT right rows whenever the true match holds a null value
    val rNorm = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        (Seq(col(rightKey).cast("long").as("__k"),
          col(rightTime).cast(TimestampType).as("__t"),
          lit(0).as("__isL")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(valueCols.map(col): _*).as("__vrow")): _*)
    // sort position of right rows at equal timestamps: backward wants
    // right BEFORE left (so <= is inclusive under a preceding frame);
    // forward wants right AFTER left under a following frame — which
    // is again "left greater", so the flag encoding flips
    val ordered = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), if (forward) col("__isL").desc else col("__isL").asc)
    val w =
      if (forward) ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried =
      if (forward) first(col("__vrow"), ignoreNulls = true).over(w)
      else last(col("__vrow"), ignoreNulls = true).over(w)
    lNorm.unionByName(rNorm)
      .withColumn("__vrow", carried)
      // inner semantics: a left row survives iff a matched right ROW
      // exists — its value fields may legitimately be null
      .filter(col("__isL") === 1 && col("__vrow").isNotNull)
      .select((leftCols.map(col) ++ valueCols.map(c => col(s"__vrow.$c").as(c))): _*)
  }
}
