package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything keys off a content-independent uniform hash of the row
  * id (`md5` → first 32 bits → [0,1) fraction), so results are
  * reproducible across runs, engines, cluster sizes, and partitionings
  * — unlike `df.sample`, whose output depends on partition layout and
  * seed plumbing. md5 keeps every stage oracle-checkable in DuckDB
  * (same reasoning as [[Dedup]]).
  *
  * Scale posture: pure map-side expressions — no shuffle, no state, no
  * driver involvement; filters push down on top of the scan.
  */
object Sampling {

  /** Uniform [0,1) fraction from the id: first 8 hex chars of
    * md5(id as string) over 2³². The divisor is 2³² (not 2³²−1): the
    * hash 0xffffffff must map BELOW 1.0, or `fraction = 1.0` samples
    * would drop that one-in-4-billion row and shard assignment
    * (`floor(frac × n)`) would emit an out-of-range shard. */
  def hashFraction(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** Deterministic Bernoulli sample: keep rows with hash < fraction. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashFraction(col(idCol)) < fraction)

  /** Deterministic train/val/test split: cumulative weight thresholds
    * over the id hash. `weights` are (label, weight) in declaration
    * order; they must sum to 1 (a final catch-all guards rounding). */
  def hashSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $weights")
    val frac = hashFraction(col(idCol))
    val thresholds = weights.scanLeft(0.0)(_ + _._2).tail
    val cases = weights.zip(thresholds).dropRight(1)
      .foldLeft(Option.empty[Column]) { case (acc, ((label, _), cum)) =>
        Some(acc.fold(when(frac < cum, label))(_.when(frac < cum, label)))
      }
    val split = cases.fold(lit(weights.last._1))(_.otherwise(weights.last._1))
    df.withColumn("split", split)
  }

  /** Per-stratum contribution cap — the domain-capping step of C4/
    * RefinedWeb-style curation: every stratum (source, domain) keeps
    * at most `maxRows` rows, chosen by id-hash order so the selection
    * is an unbiased deterministic sample rather than "whatever sorted
    * first". One shuffle on the stratum key; the per-stratum
    * row_number is the standard windowed top-N (heavily skewed strata
    * should pre-aggregate or raise shuffle partitions — the window
    * processes each stratum on one task, the inherent cost of an
    * exact per-group limit). Adds `cap_rank` (1-based). */
  def capPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                    maxRows: Int): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashFraction(col(idCol)), col(idCol))
    df.withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= maxRows)
  }

  /** Token-budget dataset mixing — [[stratifiedSample]]'s knob
    * measured in the unit that actually matters for a training mix:
    * TOKENS, not documents. Rows order within their stratum by the id
    * hash (unbiased, deterministic) and survive while the running
    * token total stays within the stratum's budget — a strict prefix
    * in hash order: the first row to overflow is dropped and, since
    * the cumulative total only grows, so is everything after it (no
    * knapsack back-filling — determinism and one-pass semantics over
    * marginally fuller budgets). Strata absent from `budgets` are
    * dropped, like [[stratifiedSample]]'s missing fractions.
    *
    * One shuffle on the stratum key; the running sum is the same
    * windowed cumulative shape as [[graft.ext.Packing]]'s bins, with
    * [[capPerStratum]]'s skew caveat. Adds `cum_tokens`. */
  def capTokensPerStratum(df: DataFrame, idCol: String, stratumCol: String,
                          tokenCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.values.forall(_ > 0), "token budgets must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashFraction(col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (k, b)) =>
      when(col(stratumCol) === k, lit(b)).otherwise(acc)
    }
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Per-stratum bucket thresholds — phase 1 of the two-phase caps:
    * bucket every row's hash fraction into `nBuckets` fixed cells,
    * aggregate `weight` per (stratum, bucket) — a groupBy whose key
    * space is strata × nBuckets, so map-side partial aggregation
    * crushes a hot stratum — and return, per stratum, the smallest
    * bucket whose running total reaches `target(stratum)` (the cap in
    * rows or tokens). Strata that never reach their target keep
    * everything (threshold = last bucket). Deterministic under any
    * partitioning: the histogram is exact, not sampled. */
  private[graft] def stratumBucketThresholds(df: DataFrame, idCol: String,
                                             stratumCol: String, weight: Column,
                                             target: Column, nBuckets: Int): DataFrame = {
    val bucket = floor(hashFraction(col(idCol)) * nBuckets).cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col("__bucket"))
    df.groupBy(col(stratumCol), bucket.as("__bucket"))
      .agg(sum(weight).as("__w"))
      .withColumn("__cum", sum(col("__w")).over(w))
      .groupBy(col(stratumCol))
      .agg(coalesce(
        min(when(col("__cum") >= target, col("__bucket"))),
        lit(nBuckets - 1)).as("__thr"))
  }

  /** Two-phase [[capPerStratum]] for hot strata — identical output,
    * bounded window input. [[capPerStratum]]'s exact per-group top-N
    * sends EVERY row of a stratum through one window task; here the
    * histogram threshold (phase 1) prefilters map-side, so the window
    * sees at most maxRows + one bucket's worth of rows per stratum —
    * ~maxRows + |stratum|/nBuckets — instead of the full stratum.
    * Correctness: the N hash-smallest rows all live in buckets ≤ the
    * threshold bucket (its running count reaches N), and the window
    * ranks survivors exactly as before. The threshold join MUST be an
    * explicit broadcast (one row per stratum — always tiny): left to
    * the planner, the join and the downstream window share the
    * stratum clustering, so Catalyst keeps a sort-merge join to reuse
    * the exchange — which shuffles and SORTS the ENTIRE input on the
    * stratum key before the prefilter can drop anything, resurrecting
    * the exact hot-task serialization this operator exists to avoid
    * (SKEWBENCH measured 95 s vs 5 s single-phase at 32M rows before
    * the broadcast was forced; 2.4 s after). */
  def capPerStratumTwoPhase(df: DataFrame, idCol: String, stratumCol: String,
                            maxRows: Int, nBuckets: Int = 1024): DataFrame = {
    require(maxRows > 0 && nBuckets > 0, "maxRows and nBuckets must be positive")
    val thr = stratumBucketThresholds(df, idCol, stratumCol,
      lit(1L), lit(maxRows.toLong), nBuckets)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashFraction(col(idCol)), col(idCol))
    df.join(broadcast(thr), Seq(stratumCol))
      .filter(floor(hashFraction(col(idCol)) * nBuckets).cast("int") <= col("__thr"))
      .drop("__thr")
      .withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= maxRows)
  }

  /** Decision half of [[capPerStratumAdaptive]]: does any stratum hold
    * more than `hotFactor × maxRows` rows? One groupBy-count whose key
    * space is the strata (map-side partial aggregation crushes a hot
    * key — counting CANNOT itself be skew-victimized the way the
    * window can) and a single driver-side max. Exposed separately so
    * callers (and the spec) can observe which plan the adaptive form
    * picked; at 100 TB the same answer can come from catalog/ANALYZE
    * statistics instead of this scan. */
  def stratumCapNeedsTwoPhase(df: DataFrame, stratumCol: String,
                              maxRows: Int, hotFactor: Int = 8): Boolean = {
    require(maxRows > 0 && hotFactor > 0, "maxRows and hotFactor must be positive")
    val top = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__max")).head()
    !top.isNullAt(0) && top.getLong(0) > maxRows.toLong * hotFactor
  }

  /** Histogram-chooser stratum cap: picks [[capPerStratum]] (one
    * shuffle, no extra pass) when every stratum is within
    * `hotFactor × maxRows` rows — the window input is small, so the
    * two-phase histogram pass would cost more than it saves — and
    * [[capPerStratumTwoPhase]] (histogram prefilter, bounded window
    * input) when some stratum is hot enough that the exact top-N
    * window would serialize on one task. Both branches produce
    * IDENTICAL rows (the two-phase construction's invariant, asserted
    * again by the adaptive spec on both fixture shapes); only the plan
    * differs. The decision costs one count-by-stratum scan — a small
    * fraction of the phase-1 histogram it potentially avoids. */
  def capPerStratumAdaptive(df: DataFrame, idCol: String, stratumCol: String,
                            maxRows: Int, hotFactor: Int = 8,
                            nBuckets: Int = 1024): DataFrame =
    if (stratumCapNeedsTwoPhase(df, stratumCol, maxRows, hotFactor))
      capPerStratumTwoPhase(df, idCol, stratumCol, maxRows, nBuckets)
    else
      capPerStratum(df, idCol, stratumCol, maxRows)

  /** Two-phase [[capTokensPerStratum]] — identical output, bounded
    * window input (same construction as [[capPerStratumTwoPhase]],
    * with token sums as the histogram weight). The kept prefix ends at
    * the first row whose running total exceeds the budget; that row
    * lives in the first bucket whose cumulative token sum passes the
    * budget, so filtering to buckets ≤ threshold preserves the entire
    * prefix plus at most one bucket of spill. */
  def capTokensPerStratumTwoPhase(df: DataFrame, idCol: String, stratumCol: String,
                                  tokenCol: String, budgets: Map[String, Long],
                                  nBuckets: Int = 1024): DataFrame = {
    require(budgets.values.forall(_ > 0), "token budgets must be positive")
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (k, b)) =>
      when(col(stratumCol) === k, lit(b)).otherwise(acc)
    }
    // reach strictly PAST the budget: the kept prefix may extend into
    // the bucket where the running total first exceeds it
    val thr = stratumBucketThresholds(df, idCol, stratumCol,
      col(tokenCol).cast("long"), budget + 1, nBuckets)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashFraction(col(idCol)), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // explicit broadcast for the same reason as capPerStratumTwoPhase:
    // an exchange-reusing sort-merge join would sort the full input on
    // the stratum key ahead of the prefilter
    df.join(broadcast(thr), Seq(stratumCol))
      .filter(floor(hashFraction(col(idCol)) * nBuckets).cast("int") <= col("__thr"))
      .drop("__thr")
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Quality-weighted deterministic sampling — soft curation: each row
    * survives with probability `probCol` (clamped to [0,1], e.g. a
    * quality score times a base rate), decided by the SAME id-hash
    * fraction as every other sampler, so the selection is reproducible
    * and composable with splits (a row's hash is fixed; only its
    * threshold moves). Map-side filter, no shuffle. */
  def weightedSample(df: DataFrame, idCol: String, probCol: Column): DataFrame =
    df.filter(hashFraction(col(idCol)) < least(greatest(probCol, lit(0.0)), lit(1.0)))

  /** Stratified deterministic sampling — the dataset-mixing primitive:
    * each stratum (e.g. source) keeps its own fraction of rows, so a
    * training mix like {web: 0.5, code: 1.0, chat: 0.1} is one
    * map-side filter. Strata absent from `fractions` are dropped. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(hashFraction(col(idCol)) < frac)
  }

  /** DSIR-style hashed importance resampling (Xie et al., "Data
    * Selection for Language Models via Importance Resampling"): score
    * every RAW document by how much more likely its hashed-unigram
    * features are under the TARGET distribution than under the raw
    * one, and keep the top `k`.
    *
    * Features: each token hashes to one of `buckets` bins (md5 → first
    * 8 hex chars → mod, the engine-portable hash this module already
    * keys on). Both distributions are add-one smoothed bin frequencies:
    *
    *   log w(doc) = Σ_tokens [ ln((t_f+1)/(T+B)) − ln((r_f+1)/(R+B)) ]
    *
    * with t/r the bin counts over target/raw token occurrences, T/R
    * the totals and B = `buckets`. The per-document sum is a
    * sequential fold over the position-sorted per-token ratio list
    * (bit-stable; same determinism argument as
    * [[TextStats.lmScore]]), rounded to 6 before ranking so both
    * engines rank identical keys; ties break on id.
    *
    * Scale shape: token explode + bin hash are map-side; the two bin
    * histograms are partial-agg groupBys onto B rows; the per-token
    * score lookup is a BROADCAST join (B rows by construction — never
    * a shuffle); one doc-keyed groupBy, then a global top-k
    * (TakeOrdered — no single-task global sort). The rank window runs
    * AFTER the limit, over k rows. */
  def importanceResample(df: DataFrame, textCol: String, idCol: String,
                         targetPred: Column, buckets: Int, k: Int): DataFrame = {
    require(buckets > 0 && k > 0, "need positive buckets and k")
    val toked = df
      .select(col(idCol), targetPred.as("is_target"),
        posexplode(TextStats.tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col(idCol), col("is_target"), col("pos"),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % buckets).as("f"))
    // both histograms in ONE pass over the token stream (partial agg
    // crushes each bin map-side; the result is exactly `buckets` rows)
    val bins = toked.groupBy(col("f")).agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("c_t"),
      sum(when(col("is_target"), 0L).otherwise(1L)).as("c_r"))
    val totals = bins.agg(sum(col("c_t")).as("tt"), sum(col("c_r")).as("rt"))
    val binScores = bins.crossJoin(broadcast(totals))
      .select(col("f"),
        (log((col("c_t") + 1).cast("double") / (col("tt") + buckets)) -
         log((col("c_r") + 1).cast("double") / (col("rt") + buckets))).as("lr"))
    toked.filter(!col("is_target"))
      .join(broadcast(binScores), Seq("f"))
      .groupBy(col(idCol))
      .agg(expr("aggregate(transform(array_sort(collect_list(struct(pos, lr)))," +
        " x -> x.lr), 0.0D, (acc, x) -> acc + x)").as("w"))
      .select(col(idCol), round(col("w"), 6).as("logw"))
      .orderBy(col("logw").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("logw").desc, col(idCol))))
  }

  /** Distribution-trim quality gate (the FineWeb-style "drop both
    * extremes" recipe): keep rows whose `scoreCol` lies within the
    * corpus's [loQ, hiQ] interpolated-quantile band. The thresholds
    * are ONE aggregate row broadcast-cross-joined back; the filter
    * itself is map-side, so the gate costs one column aggregate plus
    * one scan. Exact `percentile` is the oracle-checkable form (it
    * buffers the column per aggregate — corpus-global here, the same
    * documented trade as q43/q47); at 100 TB flip to
    * `approx_percentile` on the identical shape. */
  def quantileBandFilter(df: DataFrame, scoreCol: String,
                         loQ: Double, hiQ: Double): DataFrame = {
    require(scoreCol.matches("[A-Za-z0-9_]+"), s"scoreCol must be word-shaped, got '$scoreCol'")
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, s"need 0 <= loQ < hiQ <= 1, got [$loQ, $hiQ]")
    val band = df.agg(expr(s"percentile($scoreCol, array($loQ, $hiQ))").as("__band"))
    df.crossJoin(broadcast(band))
      .filter(col(scoreCol) >= element_at(col("__band"), 1) &&
        col(scoreCol) <= element_at(col("__band"), 2))
      .drop("__band")
  }
}
