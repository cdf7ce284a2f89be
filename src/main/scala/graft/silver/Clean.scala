package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze→Silver cleaning primitives.
  *
  * Semantics match the reference's cleaning stage
  * (ref: mnt/airflow/scripts/bronze_to_silver_on_minio.py:6-62) but are
  * re-expressed as one wide `select` per table instead of 40+ chained
  * `withColumn`s (each `withColumn` is a fresh Project node; a single
  * select keeps analyzer cost flat — SURVEY.md §7.5).
  */
object Clean {

  /** Recursive walk of a StructType to dotted leaf paths
    * (ref: bronze_to_silver_on_minio.py:6-15). */
  def flattenSchema(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => flattenSchema(st, path)
        case _ => Seq(path)
      }
    }

  /** The per-value string-cleaning chain applied to every flattened
    * attribute column (ref: bronze_to_silver_on_minio.py:27-33):
    *   1. strip Python-2 `u'…'` / `'…'` repr wrappers (regex `^u?'|'?$`)
    *   2. substring-replace True→true / False→false (NOT word-bounded —
    *      preserved exactly for oracle parity)
    *   3. case-insensitive literal "none" → NULL
    */
  def cleanStringValue(c: Column): Column =
    graft.functions.TextFunctions.cleanString(c)

  /** Built-in-only formulation of [[cleanStringValue]] — the reference
    * semantics the fused [[graft.functions.CleanedString]] expression
    * is asserted bit-identical to (SilverSpec/PropertySpec). Three
    * regex passes per value; the fused form is one scan. */
  def cleanStringValueChain(c: Column): Column = {
    val stripped = regexp_replace(c, "^u?'|'?$", "")
    val boolNorm = regexp_replace(regexp_replace(stripped, "True", "true"), "False", "false")
    when(lower(boolNorm) === "none", lit(null).cast(StringType)).otherwise(boolNorm)
  }

  /** Flatten nested struct columns into `parent_child` (lowercased)
    * top-level string columns, each passed through [[cleanStringValue]]
    * (ref: bronze_to_silver_on_minio.py:17-34). Non-struct columns pass
    * through untouched. */
  def cleanJsonColumns(df: DataFrame, structCols: Seq[String]): DataFrame = {
    val flat: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      if (structCols.contains(f.name)) {
        flattenSchema(StructType(Seq(f)), "").map { path =>
          val out = path.replace(".", "_").toLowerCase
          cleanStringValue(col(path).cast(StringType)).as(out)
        }
      } else Seq(col(f.name))
    }
    df.select(flat: _*)
  }

  /** Split `"HH:MM-HH:MM"` day-hours strings into open/close columns
    * (ref: bronze_to_silver_on_minio.py:56-62). Returns the extra
    * columns to append for one `hours_<day>` column. */
  def hourColumns(dayCol: String): Seq[Column] = {
    val base = dayCol.stripPrefix("hours_")
    val parts = split(col(dayCol), "-")
    Seq(
      parts.getItem(0).as(s"${base}_opening_time"),
      parts.getItem(1).as(s"${base}_closing_time"))
  }

  /** Is the (string) column JSON-object-shaped? Static predicate form of
    * the reference's driver-side `limit(1).collect()` probe
    * (ref: bronze_to_silver_on_minio.py:36-43). We keep a row-level
    * expression so the decision can be made without a driver round-trip. */
  def looksLikeJsonObject(c: Column): Column =
    c.isNotNull && c.startsWith("{") && c.endsWith("}")

  /** Parse JSON-shaped string columns into structs with an explicit
    * schema — the deterministic replacement for the reference's
    * sample-then-`schema_of_json` flow (ref: b2s:45-54; SURVEY.md §7.5).
    * Values that do not parse become NULL (PERMISSIVE mode). */
  def parseJsonColumn(df: DataFrame, colName: String, schema: DataType): DataFrame =
    df.withColumn(colName, from_json(col(colName), schema))

  /** Behavior-faithful port of the reference's sampling flow
    * (ref: bronze_to_silver_on_minio.py:45-54): probe one JSON-shaped
    * value (`limit(1).collect()` — a deliberate driver round-trip,
    * exactly like the original), derive the struct type with
    * `schema_of_json`, parse with `from_json`; with no JSON-shaped
    * sample the column becomes a typed NULL string (b2s:53). Prefer
    * [[parseJsonColumn]] with a static schema in new code — this
    * exists for reference parity on unknown columns. */
  def parseJsonColumnSampled(df: DataFrame, colName: String): DataFrame =
    df.filter(looksLikeJsonObject(col(colName))).select(col(colName))
      .limit(1).collect().headOption match {
      case Some(row) =>
        val ddl = df.sparkSession.range(1)
          .select(schema_of_json(lit(row.getString(0))).as("s"))
          .head().getString(0)
        df.withColumn(colName, from_json(col(colName), ddl, Map.empty[String, String]))
      case None =>
        df.withColumn(colName, lit(null).cast(StringType))
    }
}
