package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.ext.Versioned

/** The SQL serve of the change feed — Delta's `table_changes(...)`
  * spelling for the manifest store:
  *
  * {{{
  *   SELECT * FROM versioned_table_changes('/path/to/table', 0, 3, 'k1,k2')
  * }}}
  *
  * One feed row set per commit in (vFrom, vTo], each tagged
  * `_commit_version` ([[Versioned.changeFeed]]): feeds RECORDED at
  * write time serve O(feed); spans without a recorded feed derive.
  * A TABLE-VALUED function rather than a CALL procedure deliberately:
  * the feed is DATA-sized (procedures return driver-materialized
  * outcome rows), and a TVF composes — filter, join, aggregate over
  * the changes like any relation. Registered per session
  * ([[VersionedFunctions.register]], idempotent) or via
  * `spark.sql.extensions=graft.sql.GraftSqlExtensions`.
  *
  * Arguments are literals (path, vFrom, vTo, keysCsv) — the feed's
  * shape (schema) depends on them, so they must be known at analysis
  * time, which is also when Spark resolves a TVF. */
object VersionedFunctions {

  val changesIdent: FunctionIdentifier = FunctionIdentifier("versioned_table_changes")

  val changesInfo: ExpressionInfo = new ExpressionInfo(
    "graft.sql.VersionedFunctions", null, "versioned_table_changes",
    "_FUNC_(path, vFrom, vTo, keysCsv) - the change feed of the versioned table at " +
      "`path` over commits (vFrom, vTo], keyed on the comma-separated `keysCsv`; " +
      "one row set per commit, tagged _commit_version.", "", "", "", "", "", "", "")

  val changesBuilder: Seq[Expression] => LogicalPlan = { exprs =>
    def lit(i: Int, what: String): Any = exprs(i) match {
      case Literal(v, _) if v != null => v
      case other => throw new IllegalArgumentException(
        s"versioned_table_changes argument $i ($what) must be a non-null literal, got $other")
    }
    require(exprs.length == 4,
      s"versioned_table_changes(path, vFrom, vTo, keysCsv) takes 4 arguments, got ${exprs.length}")
    val path = lit(0, "path").toString
    val vFrom = lit(1, "vFrom").toString.toInt
    val vTo = lit(2, "vTo").toString.toInt
    val keys = lit(3, "keysCsv").toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "versioned_table_changes needs at least one key column")
    val spark = SparkSession.active
    Versioned.changeFeed(spark, path, vFrom, vTo, keys).queryExecution.analyzed
  }

  /** Idempotent per-session registration (the registry keeps one
    * builder per identifier; re-registering replaces it). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.tableFunctionRegistry.registerFunction(
      changesIdent, changesInfo, changesBuilder)
}

/** `spark.sql.extensions=graft.sql.GraftSqlExtensions` — the
  * conf-wired form of the same registration, for sessions built
  * before any graft code runs. */
class GraftSqlExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectTableFunction((VersionedFunctions.changesIdent,
      VersionedFunctions.changesInfo, VersionedFunctions.changesBuilder))
}
