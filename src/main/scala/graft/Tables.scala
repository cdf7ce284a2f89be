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
    graft.hadoop.FastLocalFs.install(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.functions.VectorFunctions.register(spark)
    graft.functions.TextFunctions.register(spark)
    graft.plans.GraftExtensions.install(spark)
    spark
  }

  /** Inferred schema per table path, cached for the JVM. The driver
    * testdata is immutable, but every bare `spark.read.parquet(path)`
    * re-runs footer schema inference — a Spark JOB (plus a gzipped
    * hadoop-conf broadcast) per DataFrame creation, ~25–50 ms at
    * local[32], paid by every `Tables.X` call of every query of every
    * bench pass. The FIRST read of a path keeps Spark's own inference
    * (so the cached schema is bit-identical to what inference
    * returns, nullability included); later reads pass it explicitly,
    * which parquet documents as the skip-inference fast path. This is
    * metadata caching (like Spark's own file-listing cache), not
    * result caching: every query still computes from the parquet
    * bytes. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    configure(spark)
    val path = s"$sfDir/$table.parquet"
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, df.schema)
      df
    }
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
