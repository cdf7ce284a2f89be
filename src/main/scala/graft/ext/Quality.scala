package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates and table statistics.
  *
  * The reference DECLARES this surface without shipping it: its README
  * lists "Integrate Great Expectations … after the Bronze→Silver job"
  * under Further Action (ref: README.md:21-22) and docker-compose
  * mounts a `great_expectations` dir that does not exist in the repo
  * (ref: docker-compose.yml:155). These ops close that aspirational
  * gap in-engine: row-level expectations evaluated in ONE pass
  * (conditional aggregates, map-side partials — no per-rule scan), a
  * quarantine split for the failed rows, and ANALYZE-style per-column
  * statistics (the CBO/data-skipping inputs Delta and Hive collect).
  */
object Quality {

  /** A named row-level expectation: `pred` true ⇒ the row passes.
    * NULL predicate results count as FAILURES (SQL three-valued logic
    * would otherwise let `col > 0` silently pass NULL rows — the
    * standard data-quality gotcha, pinned by spec). */
  case class Expectation(name: String, pred: Column)

  /** Evaluate all expectations in ONE corpus pass: each rule becomes a
    * conditional-sum aggregate, so the scan/partial-agg cost is paid
    * once regardless of rule count. Returns one row per rule,
    * `(expectation, n_rows, n_fail, pass_rate)`, in rule order. */
  def check(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "need at least one expectation")
    // rule names are spliced into a stack() SQL literal and a backtick
    // identifier — keep them word-shaped rather than escaping edge cases
    expectations.foreach(e => require(e.name.matches("[A-Za-z0-9_]+"),
      s"expectation name must be [A-Za-z0-9_]+, got '${e.name}'"))
    val aggs = count(lit(1)).as("n_rows") +:
      expectations.map(e =>
        sum(when(coalesce(e.pred, lit(false)), 0L).otherwise(1L)).as(s"__fail_${e.name}"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // one aggregated row fans out to one row per rule — stack() is a
    // constant-width projection, no second pass over the data
    val stacked = expectations.map(e =>
      s"'${e.name}', `__fail_${e.name}`").mkString(", ")
    wide.select(col("n_rows"),
      expr(s"stack(${expectations.length}, $stacked) AS (expectation, n_fail)"))
      .select(col("expectation"), col("n_rows"), col("n_fail"),
        round((col("n_rows") - col("n_fail")).cast("double") / col("n_rows"), 6)
          .as("pass_rate"))
  }

  /** Split rows into (passed, quarantined): a row fails if ANY
    * expectation rejects it; quarantined rows carry the failing rule
    * names in rule order as `failed_expectations`. One map-side pass —
    * the array is built per row from the same predicates, no join. */
  def quarantine(df: DataFrame, expectations: Seq[Expectation]): (DataFrame, DataFrame) = {
    require(expectations.nonEmpty, "need at least one expectation")
    val failedNames = filter(
      array(expectations.map(e =>
        when(coalesce(e.pred, lit(false)), lit(null).cast("string"))
          .otherwise(lit(e.name))): _*),
      x => x.isNotNull)
    val tagged = df.withColumn("failed_expectations", failedNames)
    (tagged.filter(size(col("failed_expectations")) === 0).drop("failed_expectations"),
      tagged.filter(size(col("failed_expectations")) > 0))
  }

  /** ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS role: per-column
    * row/null/distinct counts and min/max (rendered as strings so one
    * report covers mixed types). One aggregate over the table; the
    * multiple exact COUNT(DISTINCT)s plan through Catalyst's Expand
    * (one shuffle carrying n_cols replicas of the distinct keys) —
    * the exact form is the oracle-checkable one; production at 100 TB
    * would flip ndv to approx_count_distinct on the same shape.
    * Callers with float columns should mind engine formatting and
    * pre-round; the catalog query sticks to int/string columns. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"column name must be [A-Za-z0-9_]+ for the stack() splice, got '$c'"))
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      countDistinct(col(c)).as(s"__ndv_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', `__nulls_$c`, `__ndv_$c`, `__min_$c`, `__max_$c`").mkString(", ")
    wide.select(col("n_rows"),
      expr(s"stack(${cols.length}, $stacked) AS (col_name, n_nulls, ndv, min_str, max_str)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("ndv"),
        col("min_str"), col("max_str"))
  }
}
