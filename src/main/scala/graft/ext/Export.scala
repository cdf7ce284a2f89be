package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data export: deterministic sharded JSONL — the hand-off
  * format between a curation pipeline and a trainer's data loader.
  *
  * Shard assignment hashes the id ([[Sampling.hashFraction]]), so the
  * layout is stable across runs, engines, and cluster sizes — a
  * re-export after an incremental update moves only the rows that
  * changed, not the whole shard map. The `repartition` on the shard
  * key bounds writer parallelism at nShards (hash collisions between
  * shard values may co-locate two shards in one task; `partitionBy`
  * still routes every row to its own shard directory);
  * `sortWithinPartitions` makes record order inside a shard
  * reproducible; `maxRecordsPerFile` bounds individual file sizes for
  * streaming loaders.
  */
object Export {

  /** Hash-assigned shard id in [0, nShards). */
  def shardOf(id: org.apache.spark.sql.Column, nShards: Int): org.apache.spark.sql.Column =
    floor(Sampling.hashFraction(id) * nShards).cast("int")

  /** Write `df` as JSONL under `outDir/shard=N/…`. */
  def writeJsonlShards(df: DataFrame, idCol: String, outDir: String,
                       nShards: Int, maxRecordsPerFile: Int = 0): Unit = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .json(outDir)
  }

  /** Shard manifest over an export: row count per shard — what a
    * loader reads to plan worker assignment. */
  def manifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.json(outDir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("shard"))
}
