package graft.sql

import org.apache.spark.sql.{SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ext.Versioned

/** The `format("graft")` entry point — Delta's
  * `format("delta")` idiom for the versioned store, serving the SAME
  * tiered table as the catalog (skipping index, partitioned manifest
  * index, dv masks, column mapping), batch AND streaming:
  *
  * {{{
  *   spark.read.format("graft").load(dir)                             // latest
  *   spark.read.format("graft").option("versionAsOf", 3).load(dir)    // travel
  *   spark.read.format("graft").option("timestampAsOf",
  *     "2026-08-16 00:00:00").load(dir)                               // by clock
  *   df.write.format("graft").mode("append").save(dir)                // commit
  *   df.write.format("graft").mode("overwrite").save(dir)             // version
  *   spark.readStream.format("graft").load(dir)                       // source
  *   df.writeStream.format("graft").option("checkpointLocation", c)
  *     .start(dir)                                                    // sink
  * }}}
  *
  * Batch reads and writes serve an EXISTING chain only: creating a
  * table here would need the df schema at inferSchema time, which the
  * TableProvider seam never supplies — create with
  * [[Versioned.createTable]], SQL `CREATE TABLE`, a first
  * [[Versioned.writeVersion]], or a streaming sink's first epoch, then
  * this surface serves it. Writes route through the table's
  * manifest-commit WriteBuilder (append = commutative OCC append,
  * overwrite = next overwrite version) — never a direct file write.
  *
  * STREAMING rides the same name: the class also carries the V1
  * stream provider seams, delegating to [[VersionedStreamProvider]]
  * (admission control, startingVersion, readChangeFeed, the
  * exactly-once txn sink — the whole contract, documented there).
  * Spark's resolution makes the split itself: `readStream`/
  * `writeStream` probe the DSv2 table for MICRO_BATCH_READ /
  * STREAMING_WRITE, find batch-only capabilities, and fall back to
  * these V1 seams — so one `format("graft")` string serves all four
  * directions, exactly Delta's surface. A streaming SINK pointed at a
  * not-yet-created chain must survive that probe (its first epoch
  * CREATES the chain), so a missing chain serves an
  * [[UncreatedGraftTable]] placeholder — zero capabilities, never
  * scannable — instead of refusing at inferSchema.
  *
  * `timestampAsOf` takes `yyyy-MM-dd HH:mm:ss[.fff]` or epoch
  * MILLIseconds. A wall-clock string is resolved in
  * `spark.sql.session.timeZone` — the SAME zone SQL
  * `TIMESTAMP AS OF '<s>'` resolves its literal in (both route
  * through Catalyst's `stringToTimestamp`), NOT the JVM default —
  * and then compared against the recorded in-commit clocks, which
  * are epoch instants. Time travel is a BATCH notion — a stream
  * refuses both options (use `startingVersion`). */
class GraftDataSource extends TableProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {

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
        else {
          // session zone, not the JVM default: the option must pick the
          // same version as SQL `TIMESTAMP AS OF` for the same string,
          // whatever zone the cluster JVMs happen to run in
          val zone = org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
            spark.sessionState.conf.sessionLocalTimeZone)
          val micros = org.apache.spark.sql.catalyst.util.DateTimeUtils
            .stringToTimestamp(
              org.apache.spark.unsafe.types.UTF8String.fromString(raw), zone)
            .getOrElse(throw new IllegalArgumentException(
              s"timestampAsOf: cannot parse '$raw' as a timestamp " +
                "(yyyy-MM-dd HH:mm:ss[.fff] or epoch millis)"))
          Math.floorDiv(micros, 1000L)
        }
      Versioned.versionAsOfTimestamp(spark, dir, millis).getOrElse(
        throw new IllegalArgumentException(
          s"no version of $dir committed at or before $raw")).toString
    })
  }

  private def tableFor(options: CaseInsensitiveStringMap): Table = {
    val spark = SparkSession.active
    val dir = dirOf(options)
    if (Versioned.latestVersion(spark, dir).isEmpty) new UncreatedGraftTable(dir)
    else VersionedTableLoader.tableForPath(spark, dir,
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

  // ---- streaming: the V1 seams Spark falls back to when the DSv2
  // table above reports batch-only capabilities ----

  private def streamProvider = new VersionedStreamProvider

  private def refuseTravel(parameters: Map[String, String]): Unit = {
    val travel = Seq("versionAsOf", "timestampAsOf").filter(k =>
      parameters.keys.exists(_.equalsIgnoreCase(k)))
    require(travel.isEmpty,
      s"${travel.mkString("/")} is a batch read option — a stream has no " +
        "as-of point; start the feed at a commit with startingVersion instead")
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    refuseTravel(parameters)
    (shortName(),
      streamProvider.sourceSchema(sqlContext, schema, providerName, parameters)._2)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    refuseTravel(parameters)
    streamProvider.createSource(sqlContext, metadataPath, schema, providerName,
      parameters)
  }

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink =
    streamProvider.createSink(sqlContext, parameters, partitionColumns, outputMode)
}

/** What `format("graft")` serves for a path with NO committed
  * versions: a placeholder. It exists so the streaming-sink
  * resolution path (which probes the DSv2 table before falling back
  * to the V1 sink whose first epoch CREATES the chain) doesn't die at
  * inferSchema. It CLAIMS batch-read capability only so a batch read
  * refuses at scan planning with the informative message below —
  * capability-less, Spark's V1 fallback would surface the opaque
  * "not a valid Spark SQL Data Source" instead. Writes against it
  * refuse at analysis (no write capability) — the streaming sink
  * never consults it past the STREAMING_WRITE probe. */
private[sql] class UncreatedGraftTable(dir: String)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  override def name(): String = s"graft:$dir"
  override def schema(): StructType = new StructType()
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    throw new IllegalArgumentException(
      s"$dir has no versions committed yet — nothing to read. CREATE TABLE, " +
        "Versioned.createTable, a first writeVersion, or a streaming sink's " +
        "first epoch creates the chain; format(\"graft\") then serves it")
}
