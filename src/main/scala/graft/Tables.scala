package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (`TESTDATA.md`).
  *
  * All engine entry points funnel through here so session-level
  * requirements are applied uniformly:
  *
  *   - `spark.sql.legacy.parquet.nanosAsLong=true`: `events.parquet`
  *     carries `TIMESTAMP(NANOS)` which Spark's Parquet reader rejects
  *     by default; with the flag it surfaces as epoch-nanos `LongType`
  *     and [[Tables.eventsWithTs]] derives a proper timestamp column.
  *   - ANSI off: the reference runs Spark 3.3 semantics (SURVEY.md §4.3)
  *     where malformed casts yield NULL instead of throwing.
  */
object Tables {
  /** Confs every graft session needs; safe to set at runtime. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.functions.VectorFunctions.register(spark)
    graft.functions.TextFunctions.register(spark)
    graft.plans.GraftExtensions.install(spark)
    spark
  }

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$sfDir/$table.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events` with `ts` normalized to a TimestampType `event_ts`
    * column at microsecond precision (Spark's native resolution).
    * The driver has shipped `events.parquet` with `ts` as both
    * TIMESTAMP(NANOS) (surfacing as epoch-nanos LongType under the
    * legacy flag) and TIMESTAMP(MICROS) (surfacing as TIMESTAMP_NTZ),
    * so the conversion dispatches on the read schema; the oracle side
    * needs no twin because DuckDB's `epoch_ns()` accepts either
    * physical precision. */
  def eventsWithTs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = events(s, d)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` = exact integral division; `/` would detour through
        // double and lose low bits at 1e18-scale epoch nanos.
        raw.withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // NTZ wall-clock == UTC instant under the pinned UTC session
        raw.withColumn("event_ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
}
