package graft.ext

import org.apache.spark.sql.DataFrame

/** Input rebalancing for expensive per-row kernels (optimization
  * guide §2: partitioning that avoids stragglers and idle capacity).
  *
  * A parquet ROW GROUP is the scan-splittability atom, so a table
  * that arrives as one (or few) row groups serializes every per-row
  * kernel that runs in the scan stage — tokenize/shingle/minhash
  * front-ends, codec synthesize/decode chains — onto as many cores as
  * there are row groups, regardless of cluster size. The bench
  * testdata is exactly that shape (one file, one row group per
  * table), and profiles showed multi-second single-task stages.
  *
  * [[spread]] rebalances the kernel's input to the session's core
  * count ONLY when the plan's current parallelism is lower: a table
  * that already scans wide (any production-sized input) passes
  * through untouched, so at scale this adds NO shuffle — the guard is
  * what keeps the fix 100 TB-shaped rather than a local-mode hack.
  * When it does fire, the shuffled payload is the kernel's input
  * projection (ids + text), and the work it unlocks is the kernel
  * itself — orders of magnitude larger. Explicit-N round-robin so
  * AQE keeps the fan-out; Spark's sort-before-repartition (default
  * on) keeps row placement deterministic under retries.
  */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    val enabled = df.sparkSession.conf
      .getOption("spark.graft.par.spread").forall(_.toBoolean)
    val n = df.sparkSession.sparkContext.defaultParallelism
    // physical planning only — no job; the few-ms cost buys the
    // skip-at-scale guarantee
    if (!enabled || n <= 1 || df.rdd.getNumPartitions >= n) df
    else df.repartition(n)
  }
}
