package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for shuffle-free co-located
  * joins and aggregations.
  *
  * At 100 TB, re-shuffling a fact table for every fact⋈fact join is
  * the dominant cost. Writing both tables bucketed by the join key
  * lets Catalyst's `EnsureRequirements` see matching
  * `HashPartitioning(key, n)` on both sides and plan a SortMergeJoin
  * with NO Exchange on either side — the join runs bucket-to-bucket,
  * and `sortBy` on the bucket key also drops the per-task sort.
  * Aggregations on the bucket key likewise skip their exchange.
  *
  * This is the in-engine analogue of the reference's Hive-metastore
  * tables (SURVEY.md §2.1 S10): a catalog-registered layout contract
  * that outlives a single query. The number of buckets is the join
  * parallelism — size it like shuffle partitions (data / ~128 MB).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table in the
    * session catalog (warehouse dir). Overwrites. */
  def saveBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi-join two tables previously bucketed on `key` with the same
    * bucket count. Plans with no shuffle on either side. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
