package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: points ⋈ intervals on `lo <= point < hi`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin —
  * O(|points| × |intervals|) comparisons, a non-starter at scale. The
  * standard fix is banding: quantize the value domain into fixed-width
  * bands, explode each interval onto every band it overlaps, hash-join
  * points to intervals on the band id, then apply the exact predicate.
  * Work drops to O(|points| + |intervals| × bands/interval + |true
  * matches|), with the band id as an equi shuffle key Catalyst can
  * hash-partition — the same trick Databricks' range-join hints and
  * the interval-join literature use.
  *
  * `bandWidth` tunes replication: bands much narrower than typical
  * interval length inflate the exploded build side; much wider bands
  * inflate the post-join filter. Intervals with `hi <= lo` (empty)
  * match nothing, as in the raw predicate.
  */
object RangeJoin {

  /** Inner join of `points` to `intervals` where
    * `pointCol ∈ [loCol, hiCol)`. Band ids are `floor(v / bandWidth)`,
    * so negative domains work. All of the interval's columns plus the
    * point's columns survive, like a plain join. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bandWidth: Double): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    def band(c: Column): Column = floor(c / bandWidth).cast("long")
    // hi is exclusive: the hi band is still needed when hi is not
    // exactly on a band edge; sequence() is inclusive so band(hi)
    // covers it, and the exact filter below discards the overshoot.
    val banded = intervals
      .filter(col(loCol) < col(hiCol))
      .withColumn("__band", explode(sequence(band(col(loCol)), band(col(hiCol)))))
    points
      .withColumn("__band", band(col(pointCol)))
      .join(banded, Seq("__band"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__band")
  }
}
