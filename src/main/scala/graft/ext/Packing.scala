package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into fixed-token-budget bins
  * (context windows) for training.
  *
  * This is the SCALABLE packing shape: documents are sharded by id,
  * ordered within their shard, and assigned
  * `bin = floor(exclusive-cumulative-tokens / windowTokens)` — the
  * cumulative variant of greedy packing (a document may straddle two
  * bins; the trainer's loader splits it, which is what production
  * packers do — exact greedy packing is inherently sequential and
  * cannot fan out). One shuffle on the shard key; each shard's window
  * scan is independent, so parallelism = nShards at any data size.
  */
object Packing {

  /** Per-document bin assignment: (idCol, shard, n_tokens, bin).
    * `tokenCount` meters the budget unit — defaults to whitespace
    * words; pass `TextStats.bpeTokenCount` to pack in model-tokenizer
    * subword tokens (what a trainer's context window actually holds). */
  def assignBins(docs: DataFrame, idCol: String, textCol: String,
                 windowTokens: Int, nShards: Int = 8,
                 tokenCount: Column => Column = c => size(TextStats.tokens(c))): DataFrame = {
    require(windowTokens > 0 && nShards > 0, "windowTokens and nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // tokenCount (possibly a full BPE fold) evaluates BEFORE the
    // shard shuffle — spread a narrow input so it parallelizes
    Par.spread(docs)
      .select(col(idCol), pmod(col(idCol), lit(nShards)).as("shard"),
        tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / windowTokens).cast("long"))
      .drop("cum_before")
  }

  /** Bin manifest: per (shard, bin) document count and token total —
    * what a loader consumes to plan epochs. */
  def binManifest(docs: DataFrame, idCol: String, textCol: String,
                  windowTokens: Int, nShards: Int = 8,
                  tokenCount: Column => Column = c => size(TextStats.tokens(c))): DataFrame =
    assignBins(docs, idCol, textCol, windowTokens, nShards, tokenCount)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))

  /** EXACT greedy packing (no document straddles a bin): within each
    * shard, documents in id order fill the current bin until adding
    * the next would exceed `windowTokens`, which closes the bin; a
    * single document larger than the window gets a bin of its own.
    *
    * Greedy packing is inherently sequential, so this is the
    * documented `mapPartitions` tier — per-partition imperative logic
    * no expression can state. Parallelism is preserved the same way as
    * [[assignBins]]: one exchange hash-partitions the shards, rows are
    * sorted (shard, id) within each partition, and the per-shard
    * accumulator resets on shard change (a partition may carry several
    * shards). Returns (idCol, shard, n_tokens, bin). */
  def assignBinsGreedy(docs: DataFrame, idCol: String, textCol: String,
                       windowTokens: Int, nShards: Int = 8): DataFrame = {
    require(windowTokens > 0 && nShards > 0, "windowTokens and nShards must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    Par.spread(docs)
      .select(col(idCol).cast("long"), pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
        size(TextStats.tokens(col(textCol))).as("n_tokens"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        var curShard = -1L
        var bin = 0L
        var used = 0L
        it.map { case (id, shard, n) =>
          if (shard != curShard) { curShard = shard; bin = 0L; used = 0L }
          if (used > 0 && used + n > windowTokens) { bin += 1; used = 0L }
          used += n
          (id, shard, n, bin)
        }
      }
      .toDF(idCol, "shard", "n_tokens", "bin")
  }
}
