package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting.
  *
  * All built from codegen'd Spark built-ins (higher-order array
  * functions, regexp) — no UDFs — so they stay inside whole-stage
  * codegen and scale linearly with input splits at 100 TB.
  */
object TextStats {

  /** Whitespace tokens of lowercased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** BPE-ish sub-word segmentation: letter runs, digit runs, single
    * non-alphanumeric marks — the standard pre-tokenizer shape. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** The checked-in byte-pair merge table behind [[bpeTokens]] —
    * see [[graft.functions.TextHash.bpeMergeTable]]. */
  def bpeMerges: Seq[(String, String)] = graft.functions.TextHash.bpeMergeTable.toSeq

  /** REAL BPE tokenization: pre-tokenize ([[bpeishTokens]]), then
    * apply the checked-in merge table within each word and flatten in
    * word order. This is what the token-denominated curation operators
    * meter (q55 packing bins, q67 token budgets) — model-tokenizer-
    * style subword tokens, not whitespace words. Backed by the
    * codegen'd [[graft.functions.BpeEncode]] expression; map-side,
    * no shuffle, no UDF. */
  def bpeTokens(text: Column): Column =
    graft.functions.TextFunctions.bpeEncode(bpeishTokens(text))

  /** Subword-token count of a text under the checked-in merge table. */
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Built-in-only formulation of [[bpeTokens]] (reference semantics
    * for the custom expression; identical output asserted in ExtSpec):
    * the outer `aggregate` folds the merge table in priority order,
    * the inner one applies one rule as a greedy left-to-right
    * adjacent-pair merge — comparing each element against the
    * accumulator's LAST symbol, which equals the kernel's two-pointer
    * scan because a merged symbol a+b can never re-match as either
    * side of the same rule (that would need the other side empty). */
  def bpeTokensHof(text: Column): Column = {
    val merges = typedlit(bpeMerges)
    flatten(transform(bpeishTokens(text), w =>
      aggregate(
        merges,
        transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
        (syms, r) => {
          val a = r.getField("_1")
          val b = r.getField("_2")
          aggregate(syms, array().cast("array<string>"),
            (acc, x) =>
              when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
                concat(slice(acc, lit(1), size(acc) - 1), array(concat(a, b))))
                .otherwise(concat(acc, array(x))))
        })))
  }

  /** Distributed BPE TRAINING (Sennrich et al.): learn `nMerges`
    * byte-pair merge rules from the corpus itself — the other half of
    * the tokenizer story next to [[bpeTokens]]'s fixed checked-in
    * table.
    *
    * The classic trainer optimization makes this tractable at corpus
    * scale: pair counting and merge application run over the DISTINCT
    * pre-tokenized WORD HISTOGRAM weighted by occurrence count, never
    * over the corpus again — one token shuffle up front, then every
    * round touches only |vocab| rows. Per round:
    *
    *   1. adjacent symbol pairs explode map-side from each histogram
    *      row (freq-weighted, every adjacent position counted);
    *   2. pair counts partial-aggregate into a tiny table, and the
    *      argmax — tie-broken (count desc, lhs asc, rhs asc) for
    *      determinism — arrives via TakeOrdered(1): ONE driver row
    *      per round, the same bounded pull as connected components'
    *      per-level head();
    *   3. the winning rule applies to the histogram as a map-side
    *      greedy left-to-right fold (same kernel shape as
    *      [[bpeTokensHof]]; a merge can never create a NEW match at or
    *      before its own position — merged = lhs+rhs is strictly
    *      longer than either side — so the fold equals repeated
    *      leftmost merging, which is what the oracle replays).
    *
    * Returns the learned table: (rank, lhs, rhs, pair_count), rank
    * 1-based in learn order. Stops early if no pair remains. */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges > 0, "need nMerges > 0")
    val spark = df.sparkSession
    // let AQE right-size the PERSISTED histogram's partitioning for
    // the duration of training: with the default (conf off) the cache
    // pins the full shuffle fan-out, and every one of the ~3 jobs per
    // merge round pays shuffle.partitions near-empty tasks over a
    // |vocab|-row table (measured ~20% of q91). Scoped — set/restore
    // around training — so no other operator's plan contract shifts.
    // Scale-adaptive by construction: AQE coalesces from observed
    // sizes, so a genuinely large histogram keeps its parallelism.
    val aqeCacheKey = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    val aqeCachePrior = spark.conf.getOption(aqeCacheKey)
    spark.conf.set(aqeCacheKey, "true")
    try bpeTrainBody(df, textCol, nMerges)
    finally aqeCachePrior match {
      case Some(v) => spark.conf.set(aqeCacheKey, v)
      case None    => spark.conf.unset(aqeCacheKey)
    }
  }

  private def bpeTrainBody(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    var hist = df.select(explode(bpeishTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"), col("freq"))
      .persist()
    val learned = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    try {
      for (rank <- 1 to nMerges if learned.size == rank - 1) {
        // slice-based pair builder: slice(…, 1, size-1) is empty for
        // 1-symbol rows (sequence(0, size-2) would DESCEND there)
        val pairs = hist
          .select(col("freq"), explode(expr(
            "transform(slice(syms, 1, size(syms) - 1), (x, i) -> " +
              "named_struct('lhs', x, 'rhs', syms[i + 1]))")).as("p"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("lhs"), col("rhs"))
          .limit(1).collect()
        pairs.headOption.foreach { row =>
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          learned += ((rank, l, r, c))
          val (ll, rl, ml) = (lit(l), lit(r), lit(l + r))
          val prev = hist
          hist = prev.select(
            aggregate(col("syms"), array().cast("array<string>"),
              (acc, x) => when(
                size(acc) > 0 && element_at(acc, -1) === ll && x === rl,
                concat(slice(acc, lit(1), size(acc) - 1), array(ml)))
                .otherwise(concat(acc, array(x)))).as("syms"),
            col("freq"))
            .persist()
          // materialize the new round before dropping its parent
          hist.count()
          prev.unpersist(false)
        }
      }
    } finally hist.unpersist(false)
    import spark.implicits._
    learned.toSeq.toDF("rank", "lhs", "rhs", "pair_count").orderBy(col("rank"))
  }

  /** Language-ID stopword lists (hit-count-argmax heuristic). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "fur", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "no", "si", "una", "por", "para"))

  /** Count of tokens present in `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Per-language stopword hits + predicted language (argmax with
    * deterministic tie-break en > de > fr > es; all-zero → "unknown"). */
  def langId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // tokens materialized in their own projection: four hit-counters
    // reference them, and an inlined split would re-run per reference
    val t = col("toks")
    df.select(col(idCol), tokens(col(textCol)).as("toks")).select(col(idCol),
      hitCount(t, stopwords("en")).as("en_hits"),
      hitCount(t, stopwords("de")).as("de_hits"),
      hitCount(t, stopwords("fr")).as("fr_hits"),
      hitCount(t, stopwords("es")).as("es_hits"))
      .withColumn("predicted_lang",
        when(col("en_hits") === 0 && col("de_hits") === 0 &&
             col("fr_hits") === 0 && col("es_hits") === 0, lit("unknown"))
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits") &&
                col("en_hits") >= col("es_hits"), lit("en"))
          .when(col("de_hits") >= col("fr_hits") && col("de_hits") >= col("es_hits"), lit("de"))
          .when(col("fr_hits") >= col("es_hits"), lit("fr"))
          .otherwise(lit("es")))
  }

  /** TRAINED character-trigram language ID (Cavnar & Trenkle 1994,
    * "N-Gram-Based Text Categorization" — the public n-gram design;
    * fastText's character n-grams carry the same signal). Each
    * language's profile is its top trigrams with integer per-million
    * frequency weights ([[graft.functions.LangIdTrigramTable]],
    * generated by `tools/langid_train_table.py` with the training
    * corpus embedded); a document's score per language is the exact
    * integer sum of profile weights over its trigrams, argmax wins
    * with declaration-order tie-break, all-zero → "unknown".
    *
    * Differential vs [[langId]] (the stopword argmax kept for its S-row
    * parity): trigrams see MORPHOLOGY, not just function words — a
    * document with few or misspelled stopwords still scores on
    * characteristic letter sequences, and close language pairs
    * (es/pt/it) separate on sequences stopword lists share. ExtSpec
    * pins fixtures where the stopword form returns "unknown" or
    * misattributes and the trigram form is right.
    *
    * Plan shape: ONE fused codegen kernel per row
    * ([[graft.functions.LangIdScores]] — normalize + trigrams + table
    * lookups in a single pass over a direct-indexed 32768-slot packed
    * table), so the whole operator is a shuffle-free projection
    * (PlanSpec-pinned). [[langIdNgramJoined]] is the built-in-only
    * declarative twin — trigram explode → broadcast model join →
    * per-doc aggregation — kept for the ExtSpec equality differential
    * (the windowHashesHof pattern). Exact integer arithmetic end to
    * end — the DuckDB oracle inlines the same table and must
    * hash-match. */
  def langIdNgram(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val langs = graft.functions.LangIdTrigramTable.languages
    val scored = df.select(col(idCol),
      graft.functions.TextFunctions.langIdScores(col(textCol)).as("__s"))
      // NULL text -> NULL scores array; coalesce to 0 so the argmax
      // lands on "unknown" exactly like the joined twin and the oracle
      .select(col(idCol) +: langs.zipWithIndex.map { case (l, i) =>
        coalesce(element_at(col("__s"), i + 1), lit(0L)).as(s"${l}_score") }: _*)
    withPredictedLang(scored, langs)
  }

  private def withPredictedLang(scored: DataFrame, langs: Seq[String]): DataFrame = {
    def pick(rem: List[String]): Column = rem match {
      case l :: Nil => lit(l)
      case l :: rest =>
        when(rest.map(r => col(s"${l}_score") >= col(s"${r}_score")).reduce(_ && _),
          lit(l)).otherwise(pick(rest))
      case Nil => lit("unknown")
    }
    scored.withColumn("predicted_lang",
      when(langs.map(l => col(s"${l}_score") === 0L).reduce(_ && _), lit("unknown"))
        .otherwise(pick(langs.toList)))
  }

  /** The built-in-only declarative twin of [[langIdNgram]] (ExtSpec
    * asserts row equality): per-trigram explode, broadcast join of the
    * model, one per-document aggregation shuffle. Correct and
    * distributed, but it fans every document out to ~one row per
    * CHARACTER — the fan-out the fused kernel exists to avoid. */
  private[graft] def langIdNgramJoined(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val langs = graft.functions.LangIdTrigramTable.languages
    val model = broadcast(
      graft.functions.LangIdTrigramTable.entries.toDF("lang", "gram", "w"))
    val grams = df
      .select(col(idCol), concat(lit(" "),
        regexp_replace(lower(col(textCol)), "[^a-z]+", " "), lit(" ")).as("t"))
      // guard: Spark's sequence(1, n) steps BACKWARDS for n < 1, so
      // short strings need the explicit empty array
      .select(col(idCol), explode_outer(
        when(length(col("t")) >= lit(3),
          expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"))
          .otherwise(array())).as("gram"))
    val scored = grams.join(model, Seq("gram"), "left_outer")
      .groupBy(col(idCol))
      .agg(coalesce(sum(when(col("lang") === langs.head, col("w"))), lit(0L))
          .as(s"${langs.head}_score"),
        langs.tail.map(l =>
          coalesce(sum(when(col("lang") === l, col("w"))), lit(0L))
            .as(s"${l}_score")): _*)
    withPredictedLang(scored, langs)
  }

  /** Quality signals: char/token counts, punctuation ratio, English
    * stopword ratio. Ratios of exact integer counts produce identical
    * IEEE doubles in any engine, so rounding is oracle-safe. */
  def qualityScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val toks = col("toks")
    df.select(col(idCol), t, tokens(t).as("toks")).select(col(idCol),
      length(t).as("n_chars_measured"),
      size(toks).as("n_tokens"),
      round(length(regexp_replace(t, "[^.!?,;:]", "")).cast("double") / length(t), 6)
        .as("punct_ratio"),
      round(hitCount(toks, stopwords("en")).cast("double") / size(toks), 6)
        .as("stopword_ratio"))
  }

  /** Longest equal-run length in the SORTED token array — the max
    * occurrence count of any single token, in O(n log n) per row
    * instead of the O(|distinct| × n) count-per-distinct-token scan.
    * SQL-parsed lambda (struct field access inside Column-API lambdas
    * does not resolve; see the round-1 gotcha). */
  private[graft] val maxTokenRunSql =
    """aggregate(array_sort(toks),
      |  named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
      |  (st, x) -> named_struct(
      |    'prev', x,
      |    'run', if(x <=> st.prev, st.run + 1, 1),
      |    'best', greatest(st.best, if(x <=> st.prev, st.run + 1, 1))),
      |  st -> st.best)""".stripMargin

  /** Reference formulation of the top-word count (count every distinct
    * token, take the max) — kept for the ExtSpec differential. */
  def topWordCountNaive(toks: Column): Column =
    array_max(transform(array_distinct(toks), d => size(filter(toks, t => t === d))))

  /** Gopher-style repetition signals: duplicated-bigram ratio (what
    * fraction of word bigrams are repeats) and top-word ratio (how
    * much of the document is its single most frequent token).
    * High values flag boilerplate/spam for corpus filtering.
    *
    * Per-row array expressions, no explode/shuffle; the top-word count
    * is a sorted-run aggregate (O(n log n) per row — asserted equal to
    * the count-per-distinct formulation in ExtSpec); the tokens array
    * is materialized once per row in its own projection (multiply
    * referenced). */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = col("toks")
    val bigrams = Dedup.shinglesFromTokens(toks, 2)
    Par.spread(df).select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), toks, size(toks).as("n_tokens"),
        when(size(toks) < 2, lit(0)).otherwise(size(toks) - 1).as("n_bigrams"),
        when(size(toks) < 2, lit(0))
          .otherwise(size(array_distinct(bigrams))).as("n_distinct_bigrams"),
        expr(maxTokenRunSql).as("top_word_count"))
      .select(col(idCol), col("n_tokens"), col("n_bigrams"),
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(round(lit(1.0) -
            col("n_distinct_bigrams").cast("double") / col("n_bigrams"), 6))
          .as("dup_bigram_ratio"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("top_word_count").cast("double") / col("n_tokens"), 6))
          .as("top_word_ratio"))
  }

  /** Unigram-rarity quality signals — the integer-exact stand-in for
    * LM-perplexity scoring: build the corpus vocabulary (token →
    * occurrence count), then per document report its rarest token's
    * count and the mean token frequency. Low min/mean = jargon, OOV
    * junk, or genuinely novel text; high = templated boilerplate.
    *
    * Two shuffles, the classic TF-IDF shape: one groupBy(token) to
    * build the vocab, one token-keyed join back (vocab is corpus-sized
    * — at 100 TB it shuffle-joins; Catalyst broadcasts it when small),
    * then a groupBy(doc). All-integer arithmetic until the final mean
    * (exact-int division), so every engine rounds identically. */
  def rarityStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toked = Par.spread(df).select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val vocab = toked.groupBy(col("tok")).agg(count(lit(1)).as("tok_freq"))
    toked
      .join(vocab, Seq("tok"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        min(col("tok_freq")).as("rarest_freq"),
        round(sum(col("tok_freq")).cast("double") / count(lit(1)), 6).as("mean_freq"))
  }

  /** Bigram-LM quality scoring — the CCNet-style perplexity filter
    * (Wenzek et al.: score web text under a LM trained on a trusted
    * slice; high perplexity = junk, low = boilerplate-ish). The LM is
    * add-one-smoothed over bigrams with a `<s>` BOS context:
    *
    *   P(w | prev) = (c(prev, w) + 1) / (c(prev) + V + 1)
    *
    * where counts come from the `trainPred` slice of the corpus and
    * V = distinct train tokens (+1 reserves mass for unseen words).
    * Every document (train and held-out) is scored with its bigram
    * count, unseen-bigram count, mean negative log-likelihood and
    * perplexity.
    *
    * Determinism: the per-document log-prob sum is a sequential fold
    * over the POSITION-SORTED probability list (`aggregate` over
    * `array_sort(collect_list(struct(pos, lnp)))`), not a float SUM
    * whose addition order varies with shuffle arrival — so the score
    * is bit-stable run to run, and an engine-independent oracle can
    * replay the same fold (ln() engines differ by ~1 ulp; the
    * round(6) grain absorbs that).
    *
    * Scale shape: bigram extraction is map-side (one posexplode); LM
    * counts are two groupBys with partial aggregation; scoring is two
    * token-keyed joins (Catalyst broadcasts the LM when it is small,
    * shuffle-joins when corpus-sized) plus one doc-keyed groupBy. The
    * vocab size is a one-row aggregate broadcast-cross-joined — no
    * driver collect anywhere. */
  def lmScore(df: DataFrame, textCol: String, idCol: String,
              trainPred: Column): DataFrame = {
    val big = Par.spread(df).select(col(idCol), tokens(col(textCol)).as("toks"))
      // SQL-parsed lambda: struct field building + toks[i-1] indexing
      // inside Column-API lambdas does not resolve (round-1 gotcha)
      .select(col(idCol), posexplode(expr(
        "transform(toks, (x, i) -> named_struct(" +
          "'prev', if(i = 0, '<s>', toks[i - 1]), 'cur', x))")).as(Seq("pos0", "b")))
      .select(col(idCol), (col("pos0") + 1).as("pos"),
        col("b.prev").as("prev"), col("b.cur").as("cur"))
    val train = big.filter(trainPred)
    // context counts and vocab size derive from the BIGRAM counts
    // (c(prev) = Σ_w c(prev,w); V = |distinct cur|), and the bigram
    // table is PERSISTED: column pruning would otherwise specialize
    // each consumer's exchange (vocab needs only `cur`) and defeat
    // exchange reuse, re-tokenizing the corpus three times. With the
    // cache there are exactly two corpus passes in the plan — LM
    // build + scoring (PlanSpec asserts it). The persisted table is
    // vocab²-bounded, tiny next to the corpus. KNOWN CACHE RESIDUE:
    // the returned frame is lazy and corpus-sized, so there is no
    // safe point inside this function to unpersist (bm25's eager
    // trick needs a result-sized output); the blocks are
    // observed-bigram-bounded and evictable (MEMORY_AND_DISK), and a
    // caller looping over lmScore should spark.catalog.clearCache()
    // between runs.
    val bigramCounts = train.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c_big")).persist()
    val ctxCounts = bigramCounts.groupBy(col("prev")).agg(sum(col("c_big")).as("c_ctx"))
    val vocab = bigramCounts.agg((countDistinct(col("cur")) + 1).as("vsz"))
    big
      .join(bigramCounts, Seq("prev", "cur"), "left")
      .join(ctxCounts, Seq("prev"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("pos"),
        when(col("c_big").isNull, 1).otherwise(0).as("unseen"),
        log((coalesce(col("c_big"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c_ctx"), lit(0L)) + col("vsz"))).as("lnp"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("unseen")).as("n_unseen"),
        expr("aggregate(transform(array_sort(collect_list(struct(pos, lnp)))," +
          " x -> x.lnp), 0.0D, (acc, x) -> acc + x)").as("lp_sum"))
      .select(col(idCol), col("n_bigrams"), col("n_unseen"),
        round(-col("lp_sum") / col("n_bigrams"), 6).as("avg_nll"),
        round(exp(-col("lp_sum") / col("n_bigrams")), 3).as("ppl"))
  }

  /** C4-style boilerplate removal: drop every LINE (sentence) that
    * occurs in more than `maxDocFreq` distinct documents, and
    * reassemble each document from its surviving lines in original
    * order. Navigation chrome, cookie banners, and template sentences
    * repeat across pages; real content doesn't.
    *
    * Shape: posexplode lines → distinct-per-doc groupBy(line) for
    * document frequencies → token... line-keyed join back → filter →
    * groupBy(doc) reassembling via array_sort over (pos, line) structs
    * (collect_list order is partition-dependent; the sort restores
    * original positions deterministically). Two shuffles on the line
    * hash + one on doc id — no driver involvement, no quadratic step. */
  def stripBoilerplate(df: DataFrame, textCol: String, idCol: String,
                       maxDocFreq: Int, sep: String = ". "): DataFrame = {
    val lines = Par.spread(df)
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
    val docFreq = lines.select(col(idCol), col("line")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("doc_freq"))
    lines
      .join(docFreq, Seq("line"))
      .filter(col("doc_freq") <= maxDocFreq)
      .groupBy(col(idCol))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("clean_text"),
        count(lit(1)).as("n_lines_kept"))
  }

  /** Overlapping token-window chunking — the embedding-pipeline
    * pre-pass (RAG indexing, long-doc encoders): each document fans
    * out to windows of `windowTokens` tokens advancing by `stride`
    * (stride < window ⇒ overlap). The last window is the final
    * partial tail; documents shorter than one window emit exactly one
    * chunk. Pure per-row array expressions + one explode — 1:N
    * fan-out, no shuffle, no state. */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
                    windowTokens: Int, stride: Int): DataFrame = {
    require(windowTokens > 0 && stride > 0 && stride <= windowTokens,
      "need 0 < stride <= windowTokens")
    val toks = col("toks")
    val nChunks = when(size(toks) <= windowTokens, lit(1))
      .otherwise(ceil((size(toks) - windowTokens).cast("double") / stride).cast("int") + 1)
    Par.spread(df).select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), toks,
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ",
            slice(toks, i * stride + 1, lit(windowTokens))))).as(Seq("chunk_no", "chunk")))
      // the chunk's token count is closed-form from the window
      // geometry — no re-tokenization of the string just built
      .select(col(idCol), col("chunk_no"), col("chunk"),
        least(lit(windowTokens), size(col("toks")) - col("chunk_no") * stride)
          .as("chunk_tokens"))
  }

  /** BM25 keyword search (Robertson/Sparck-Jones; the Lucene-form
    * idf) — the retrieval scorer a curation pipeline uses for
    * quality-by-query filtering and decontamination triage:
    *
    *   score(d, Q) = Σ_{t∈Q} ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
    *                 · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    *
    * Scale shape: the corpus is scanned twice, both map-side — once
    * for the one-row (N, avgdl) aggregate, once exploding tokens with
    * the query-term `isin` filter applied AT the explode (only rows
    * mentioning a query term survive to the first shuffle). Document
    * frequencies aggregate over the filtered term postings (≤|Q|
    * rows) and broadcast back, as does the stats row — the only
    * corpus-sized shuffle is the (doc, term) tf groupBy over matching
    * postings. Top-k plans as TakeOrderedAndProject.
    *
    * Determinism: tf/df/dl/N are exact integers; avgdl is one exact
    * long sum over one long count; the per-document score folds its
    * per-term contributions in term order (`aggregate` over
    * `array_sort(collect_list(struct(tok, ts)))`), never a
    * shuffle-order float SUM — so an engine-independent oracle replays
    * the identical fold and round(6) absorbs ln() ulp skew. */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 10, eager: Boolean = false): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val docs = Par.spread(df).select(col(idCol), tokens(col(textCol)).as("toks"))
    // one-row corpus stats; exact-int avg so every engine divides the
    // same two integers
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(size(col("toks"))).cast("double") / count(lit(1))).as("avgdl"))
    // persisted: tf and df both consume the matched postings; without
    // the cache each re-tokenizes the corpus (the q89 exchange-reuse
    // lesson). The cached table holds only query-term matches — tiny
    // next to the corpus at any scale
    val postings = docs
      .select(col(idCol), size(col("toks")).as("dl"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .persist()
    val tf = postings.groupBy(col(idCol), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = postings.select(col(idCol), col("tok")).distinct()
      .groupBy(col("tok")).agg(count(lit(1)).as("df_t"))
    val scored = tf.join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("tok"),
        (log(lit(1.0) + (col("n_docs") - col("df_t") + lit(0.5)) /
          (col("df_t") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))).as("ts"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        expr("aggregate(transform(array_sort(collect_list(struct(tok, ts))), " +
          "x -> x.ts), 0.0D, (acc, x) -> acc + x)").as("raw"))
      .select(col(idCol), col("n_terms"), round(col("raw"), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
    if (!eager) scored // lazy form: caller owns the postings cache
    else {
      // eagerly materialize the top-k (bounded: ≤ topK rows — a
      // deliberate driver pull of result-sized, not corpus-sized,
      // data) so the postings cache can be RELEASED before returning;
      // without this, repeated bm25 calls (q93, q101, bench loops)
      // accumulate cached blocks with no handle for the caller to
      // free them. eager=false keeps the full lazy plan for the
      // PlanSpec shape contract — the eager path executes that exact
      // plan via collect().
      val out = scored.collect()
      postings.unpersist(blocking = false)
      val spark = df.sparkSession
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.toIndexedSeq, 1), scored.schema)
    }
  }

  /** Exact corpus heavy hitters through a Misra-Gries candidate gate —
    * the two-pass production shape for "which tokens dominate the
    * corpus" at a scale where the full token histogram is itself too
    * large to shuffle cheaply.
    *
    * Pass 1 runs a Misra-Gries summary of `sketchSize` counters over
    * each partition's token stream (mapPartitions — genuinely
    * imperative per-partition state) and emits only each partition's
    * surviving candidates: ≤ sketchSize rows per partition instead of
    * one row per token occurrence. The MG guarantee makes the union a
    * SUPERSET of every token with global frequency > N/sketchSize —
    * if freq(x) > Σᵢ nᵢ/k then freq_i(x) > nᵢ/k in some partition i
    * (pigeonhole), and an item seen more than nᵢ/k times cannot be
    * decremented to zero by nᵢ total arrivals.
    *
    * Pass 2 recounts the candidates EXACTLY (broadcast semi-join gate
    * on the same token stream, then a partial-agg groupBy whose input
    * is already candidate-only) and keeps those with freq > N/
    * sketchSize. N comes from the SKETCH pass: each partition's MG
    * summary also emits its token count (one extra row per
    * partition), and N is their sum — so the corpus is tokenized
    * exactly TWICE (sketch + recount), never a third time for the
    * global count (PlanSpec pins the two-scan shape). The sketch
    * output is persisted — ≤ sketchSize+1 rows per partition, nothing
    * next to the corpus — so its two consumers (candidate set, N)
    * don't each re-run the pass. Sketch internals (partition
    * boundaries, decrement order) affect only which FALSE candidates
    * get recounted and discarded — the output is the exact
    * deterministic heavy-hitter set, which is why it can face a plain
    * GROUP-BY/HAVING oracle. Same gate-then-exact pattern as the
    * Bloom-gated incremental dedup (q84). `eager` materializes the
    * (≤ sketchSize rows) result and releases the sketch cache —
    * eager=false keeps the lazy plan for shape contracts. */
  def heavyHitters(df: DataFrame, textCol: String,
                   sketchSize: Int = 64, eager: Boolean = false): DataFrame = {
    require(sketchSize > 1, "need sketchSize > 1")
    val spark = df.sparkSession
    import spark.implicits._
    val toked = df.select(explode(tokens(col(textCol))).as("tok"))
    // sketch pass: per-partition MG candidates (is_total=false, cnt
    // unused) plus ONE per-partition token-count row (is_total=true)
    val sketch = toked.as[String].mapPartitions { it =>
      var n = 0L
      val counters = new scala.collection.mutable.HashMap[String, Long]
      it.foreach { t =>
        n += 1L
        if (counters.contains(t)) counters(t) += 1L
        else if (counters.size < sketchSize - 1) counters(t) = 1L
        else {
          // decrement-all step: drop every counter by one, evict
          // zeros (keys snapshotted — no mutation mid-iteration)
          counters.keys.toArray.foreach { k =>
            val c = counters(k) - 1L
            if (c == 0L) counters.remove(k) else counters(k) = c
          }
        }
      }
      counters.keysIterator.map(k => (k, 0L, false)) ++ Iterator(("", n, true))
    }.toDF("tok", "cnt", "is_total").persist()
    // materialize the cache NOW: the candidate and total consumers
    // below both land in broadcast subqueries, and Spark runs
    // broadcast exchanges concurrently — two cache misses racing
    // would each run the sketch pass (SKEWBENCH measured the corpus
    // tokenized twice for it). One cheap job, then both hit cache.
    sketch.count()
    val candidates = sketch.filter(!col("is_total")).select(col("tok")).distinct()
    val total = sketch.filter(col("is_total")).agg(sum(col("cnt")).as("n_tokens"))
    val result = toked
      .join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * sketchSize > col("n_tokens"))
      .select(col("tok"), col("freq"),
        round(col("freq").cast("double") / col("n_tokens"), 6).as("share"))
      .orderBy(col("freq").desc, col("tok"))
    if (!eager) result
    else {
      // result is ≤ sketchSize rows by the MG bound — a result-sized
      // driver pull, releasing the sketch cache (the bm25 pattern)
      val out = result.collect()
      sketch.unpersist(blocking = false)
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.toIndexedSeq, 1), result.schema)
    }
  }

  /** Document fingerprint: md5 of whitespace-normalized, lowercased,
    * punctuation-stripped text — the cheap exact-after-normalization
    * dedup key. Backed by the fused single-pass
    * [[graft.functions.NormalizedFingerprint]] expression;
    * [[fingerprintHof]] is the built-in chain with identical output. */
  def fingerprint(text: Column): Column =
    graft.functions.TextFunctions.normFingerprint(text)

  /** Built-in-only formulation of [[fingerprint]] — two regex passes
    * over the full text; kept as the reference semantics the custom
    * expression is asserted against (ExtSpec). */
  def fingerprintHof(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")))
}
