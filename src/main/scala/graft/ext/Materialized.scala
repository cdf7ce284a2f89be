package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for ADDITIVE aggregates
  * (count / sum — and means as sum÷count at read time).
  *
  * The reference's whole incrementality story is "re-run the month's
  * batch with dynamic partition overwrite" (SURVEY §2.9) — fine for
  * partition-aligned FACTS, but a grouped AGGREGATE table (a
  * dashboard rollup) keyed by something other than the partition
  * column forces a full-history rescan per refresh. Additive
  * aggregates compose: agg(old ∪ Δ) = agg(old) ⊕ agg(Δ), so the
  * refresh cost is the DELTA's aggregation plus one key-aligned
  * full-outer join against the (already group-sized) view — history
  * is never rescanned. This is standard incremental view maintenance
  * (Gupta/Mumick survey, public), the same delta algebra Spark's own
  * streaming aggregation state updates use.
  *
  * Non-additive aggregates (min/max under deletes, distinct counts)
  * need retraction logs or sketches and are out of scope by design —
  * callers meter those with the HLL/GK sketch ops (q46/q47).
  */
object Materialized {

  /** One refresh step: `view` is the current aggregate table carrying
    * `countCol` and `sumCols` per `keys` group; `delta` is the new
    * batch of RAW rows. Returns the refreshed view: existing groups
    * accumulate, new groups appear. The delta aggregate partial-aggs
    * map-side; the join shuffles only group-cardinality rows. */
  def refreshAdditive(view: DataFrame, delta: DataFrame, keys: Seq[String],
                      countCol: String, sumCols: Seq[String]): DataFrame = {
    val dAgg = aggregate(delta, keys, countCol, sumCols)
    val d = (countCol +: sumCols).foldLeft(dAgg)((df, c) =>
      df.withColumnRenamed(c, s"__d_$c"))
    view.join(d, keys, "full_outer")
      .select(keys.map(col) ++
        ((countCol, "bigint") +: sumCols.map((_, "double"))).map { case (c, t) =>
          (coalesce(col(c), lit(0).cast(t)) +
            coalesce(col(s"__d_$c"), lit(0).cast(t))).as(c)
        }: _*)
  }

  /** The view's defining aggregation — used for the bootstrap AND as
    * the full-recompute twin the refresh is verified against
    * (refreshAdditive(aggregate(a), b) must equal aggregate(a ∪ b)). */
  def aggregate(rows: DataFrame, keys: Seq[String],
                countCol: String, sumCols: Seq[String]): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(countCol),
        sumCols.map(c => sum(col(c)).as(c)): _*)
}
