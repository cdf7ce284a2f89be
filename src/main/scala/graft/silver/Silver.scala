package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze→Silver table transforms — Scala ports of the reference's
  * process_* functions (ref: mnt/airflow/scripts/bronze_to_silver_on_minio.py:64-111),
  * re-expressed Spark-first (wide selects, explicit schemas, no driver
  * round-trips). Each is `DataFrame => DataFrame` on the raw Yelp shape
  * (FIXTURES.md §A).
  */
object Silver {

  /** ref: bronze_to_silver_on_minio.py:64-76.
    * Flattens+cleans `attributes`/`hours` structs, splits day hours into
    * open/close, casts `is_open` 0/1 → boolean. The reference's nested
    * re-parse step (b2s:74-75) is dead code (paths are renamed with `_`
    * before the check) — we intentionally do NOT re-parse (SURVEY.md §7.5).
    */
  def processBusiness(raw: DataFrame): DataFrame = {
    val structCols = raw.schema.fields.collect {
      case f if f.dataType.isInstanceOf[StructType] => f.name
    }.toSeq
    val flat = Clean.cleanJsonColumns(raw, structCols)
    val hourCols = flat.columns.filter(_.startsWith("hours_")).toSeq
    val withHours = flat.select(
      flat.columns.toSeq.map(col) ++ hourCols.flatMap(Clean.hourColumns): _*)
    withHours
      .drop(hourCols: _*)
      .withColumn("is_open", col("is_open").cast(BooleanType))
  }

  /** ref: bronze_to_silver_on_minio.py:78-86.
    * Comma-split the packed checkin date string, explode to one row per
    * checkin, parse timestamps (leading spaces trimmed by the cast),
    * derive year/month partition columns. */
  def processCheckins(raw: DataFrame): DataFrame =
    raw
      .withColumn("date_array", split(col("date"), ","))
      .drop("date")
      .withColumn("date", explode(col("date_array")))
      .drop("date_array")
      .withColumn("date", to_timestamp(trim(col("date"))))
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))

  /** ref: bronze_to_silver_on_minio.py:87-106.
    * `elite`/`friends` CSV strings → arrays with the `""`→NULL guard
    * (split("", ",") would yield [""] — the guard keeps counts at 0),
    * plus size-based counts and timestamp parse of `yelping_since`. */
  def processUsers(raw: DataFrame): DataFrame =
    raw
      .withColumn("elite_years",
        when(col("elite") === "", lit(null).cast(ArrayType(StringType)))
          .otherwise(split(col("elite"), ",")))
      .drop("elite")
      .withColumn("friends_list",
        when(col("friends") === "", lit(null).cast(ArrayType(StringType)))
          .otherwise(split(col("friends"), ",\\s*")))
      .drop("friends")
      .withColumn("yelping_since", to_timestamp(col("yelping_since")))
      .withColumn("elite_years_count",
        when(col("elite_years").isNull, lit(0)).otherwise(size(col("elite_years"))))
      .withColumn("friends_count",
        when(col("friends_list").isNull, lit(0)).otherwise(size(col("friends_list"))))

  /** ref: bronze_to_silver_on_minio.py:108-111 (shared by reviews and tips). */
  def processReviewsAndTips(raw: DataFrame): DataFrame =
    raw
      .withColumn("date", to_timestamp(col("date")))
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
}
