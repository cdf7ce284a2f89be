package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ext.Versioned

/** The `format("graft")` BATCH entry point — Delta's
  * `spark.read.format("delta").load(path)` idiom for the versioned
  * store, serving the SAME tiered table as the catalog (skipping
  * index, partitioned manifest index, dv masks, column mapping):
  *
  * {{{
  *   spark.read.format("graft").load(dir)                             // latest
  *   spark.read.format("graft").option("versionAsOf", 3).load(dir)    // travel
  *   spark.read.format("graft").option("timestampAsOf",
  *     "2026-08-16 00:00:00").load(dir)                               // by clock
  *   df.write.format("graft").mode("append").save(dir)                // commit
  *   df.write.format("graft").mode("overwrite").save(dir)             // version
  * }}}
  *
  * Reads and writes to an EXISTING chain only: creating a table here
  * would need the df schema at inferSchema time, which the TableProvider
  * seam never supplies — create with [[Versioned.createTable]],
  * SQL `CREATE TABLE`, or a first [[Versioned.writeVersion]], then this
  * surface serves it. Writes route through the table's manifest-commit
  * WriteBuilder (append = commutative OCC append, overwrite = next
  * overwrite version) — never a direct file write.
  *
  * `timestampAsOf` takes `yyyy-MM-dd HH:mm:ss[.fff]` (session-zone
  * free: resolved against the recorded in-commit clocks, which are
  * epoch instants) or epoch MILLIseconds. */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def dirOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).map(_.stripSuffix("/")).map(raw =>
      new org.apache.hadoop.fs.Path(raw).toUri.getPath).getOrElse(
      throw new IllegalArgumentException(
        "format(\"graft\") needs a path: .load(dir) / .save(dir) or .option(\"path\", dir)"))

  private def versionOf(spark: SparkSession, dir: String,
                        options: CaseInsensitiveStringMap): Option[String] = {
    val byVersion = Option(options.get("versionAsOf")).map(_.trim)
    val byTs = Option(options.get("timestampAsOf")).map(_.trim)
    require(byVersion.isEmpty || byTs.isEmpty,
      "give versionAsOf OR timestampAsOf, not both")
    byVersion.orElse(byTs.map { raw =>
      val millis =
        if (raw.forall(_.isDigit)) raw.toLong
        else java.sql.Timestamp.valueOf(raw).getTime
      Versioned.versionAsOfTimestamp(spark, dir, millis).getOrElse(
        throw new IllegalArgumentException(
          s"no version of $dir committed at or before $raw")).toString
    })
  }

  private def tableFor(options: CaseInsensitiveStringMap): Table = {
    val spark = SparkSession.active
    val dir = dirOf(options)
    VersionedTableLoader.tableForPath(spark, dir,
      versionOf(spark, dir, options), display = "graft")
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    tableFor(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    tableFor(new CaseInsensitiveStringMap(properties))

  // time travel options change what a path serves — the table is not
  // purely path-determined, so Spark must not cache/share it by path
  override def supportsExternalMetadata(): Boolean = false
}
