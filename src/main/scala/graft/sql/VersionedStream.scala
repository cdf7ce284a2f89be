package graft.sql

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.ext.Versioned

/** Delta's STREAMING SOURCE role for the manifest store: treat a
  * versioned table as an unbounded stream of its appends —
  *
  * {{{
  *   spark.readStream.format("graft.sql.VersionedStreamProvider")
  *     .option("path", dir).load()
  * }}}
  *
  * Offsets are VERSION NUMBERS; a micro-batch serves exactly the data
  * dirs that manifests (start, end] added. Commit atomicity does the
  * heavy lifting: a writer's files are invisible until its manifest
  * lands, so the stream can NEVER observe half a commit — the exact
  * property a raw file-watcher source over the same directory lacks
  * (it would stream uncommitted and orphaned writer files; measured
  * in StreamingSpec).
  *
  * Semantics mirror Delta's source contract:
  *   - the FIRST batch serves the full table as of stream start
  *     through the MASKED read (pre-stream deletes are subtracted —
  *     they were never served rows);
  *   - subsequent batches serve appended dirs only;
  *   - a non-append commit in the offset range — overwrite or restore,
  *     i.e. a version that DROPPED dirs — fails the stream (the
  *     appends-only premise broke; Delta raises the same);
  *   - a DELETE (a deletion-vector entry whose KEY CONTENT changed —
  *     dv compaction merges dirs without changing the mask and must
  *     not read as a phantom delete) fails unless
  *     `.option("ignoreDeletes", "true")` — masked rows already
  *     served cannot be unserved, which is precisely Delta's
  *     ignoreDeletes contract. With the option set, dv additions are
  *     skipped and appended data keeps flowing (note the RAW appended
  *     rows flow, pre-mask — the stream is an append feed, not a
  *     snapshot serve).
  *
  * The schema is FROZEN at stream start (recorded manifest schema);
  * later evolved dirs read through it — extra columns ignored,
  * missing columns null-backfilled — the streaming-contract behavior.
  *
  * Scale shape: getOffset is one manifest listing; each batch is one
  * multi-path parquet scan over only the NEW dirs, planned with the
  * frozen schema (zero footer reads). No state beyond the offset. */
class VersionedStreamProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  /** Delta's STREAMING SINK role — `writeStream.format(...)` straight
    * into the versioned store, EXACTLY-ONCE:
    *
    * {{{
    *   df.writeStream.format("graft.sql.VersionedStreamProvider")
    *     .option("path", dir).option("checkpointLocation", ckpt)
    *     .start()
    * }}}
    *
    * Each micro-batch is one atomic append commit that ALSO records
    * `txn:<batchId>:<appId>` in the manifest
    * ([[Versioned.writeVersionStreamBatch]]). After a crash between
    * the sink commit and the engine's own offset commit, the restarted
    * query re-delivers that epoch — the manifest's recorded batch id
    * detects the replay and the sink skips it without writing a byte:
    * at-least-once delivery + idempotent commit = exactly-once, the
    * published Delta sink design, with no sink-side state file (the
    * manifest IS the state). `appId` defaults to the query's
    * checkpoint location (stable across restarts — the engine's
    * batchId sequence is only meaningful per checkpoint); override
    * with `.option("txnAppId", …)` when two queries share one table
    * from distinct checkpoints. Append mode = commutative append
    * commit (concurrent batch writers all land, OCC retry); Complete
    * mode = overwrite commit per epoch; Update refuses (this store
    * has MERGE for that, via foreachBatch + Upsert). */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' is required"))
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "versioned sink needs a stable writer id: set checkpointLocation (usual) " +
          "or option 'txnAppId'"))
    val mode = outputMode match {
      case m if m == OutputMode.Append()   => org.apache.spark.sql.SaveMode.Append
      case m if m == OutputMode.Complete() => org.apache.spark.sql.SaveMode.Overwrite
      case other => throw new IllegalArgumentException(
        s"versioned sink supports Append and Complete, got $other — Update-mode " +
          "upserts go through foreachBatch + graft.gold.Upsert (MERGE)")
    }
    // `writeStream.partitionBy(...)` makes the sink commit each epoch
    // hive-laid-out — the first batch may CREATE the partitioned
    // chain, and appends must match the recorded spec like any
    // partitioned write
    new VersionedStreamSink(sqlContext.sparkSession, dir, appId, mode,
      partitionColumns)
  }

  private def resolveSchema(spark: SparkSession, dir: String): StructType = {
    val v = Versioned.latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"no versions at $dir — commit one before streaming from it"))
    Versioned.versionInfo(spark, dir, v).schema
      .getOrElse(Versioned.readVersion(spark, dir, v).schema)
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' is required"))
    (shortName(), schema.getOrElse(resolveSchema(sqlContext.sparkSession, dir)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException("option 'path' is required"))
    new VersionedStreamSource(spark, dir,
      schema.getOrElse(resolveSchema(spark, dir)),
      ignoreDeletes = parameters.get("ignoreDeletes").exists(_.toBoolean))
  }
}

/** One micro-batch = one manifest commit; see createSink for the
  * exactly-once contract. The incoming DataFrame carries the
  * streaming (incremental) plan — it is re-wrapped over the SAME
  * distributed rows as a batch plan (no driver materialization)
  * before the ordinary versioned write path runs. */
private[sql] class VersionedStreamSink(spark: SparkSession, dir: String,
                                       appId: String,
                                       mode: org.apache.spark.sql.SaveMode,
                                       partCols: Seq[String] = Seq.empty) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // data.sparkSession, not the construction-time session: the
    // engine runs batches on a cloned session with stream-scoped confs
    val batch = org.apache.spark.sql.classic.GraftStreamShim
      .batchFrom(data.sparkSession, data, data.schema)
    Versioned.writeVersionStreamBatch(batch, dir, appId, batchId, mode,
      partCols = partCols)
    ()
  }

  override def toString: String = s"VersionedStreamSink[$dir, appId=$appId]"
}

private[sql] case class VersionOffset(v: Long)
  extends org.apache.spark.sql.execution.streaming.Offset {
  override def json(): String = v.toString
}

private[sql] class VersionedStreamSource(spark: SparkSession, dir: String,
                                         frozenSchema: StructType,
                                         ignoreDeletes: Boolean) extends Source {

  override def schema: StructType = frozenSchema

  override def getOffset: Option[org.apache.spark.sql.execution.streaming.Offset] =
    Versioned.latestVersion(spark, dir).map(v => VersionOffset(v.toLong))

  private def versionOf(o: org.apache.spark.sql.execution.streaming.Offset): Int =
    o match {
      case VersionOffset(v) => v.toInt
      case other            => other.json().trim.toInt // restart: SerializedOffset
    }

  override def getBatch(start: Option[org.apache.spark.sql.execution.streaming.Offset],
                        end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    val endV = versionOf(end)
    val endInfo = Versioned.versionInfo(spark, dir, endV)
    val endDirs = endInfo.dataDirs.toSet
    val batch = start.map(versionOf) match {
      case None =>
        // first batch: the full table as of stream start, served
        // through the MASKED read — deletes that predate the stream
        // were never "served rows", so the initial snapshot must
        // subtract them exactly like any other read (Delta's initial
        // snapshot does the same); columns projected to the frozen
        // stream schema
        import org.apache.spark.sql.functions.col
        Versioned.readVersion(spark, dir, endV)
          .select(frozenSchema.fieldNames.map(col).toSeq: _*)
      case Some(startV) =>
        val startInfo = Versioned.versionInfo(spark, dir, startV)
        val startDirs = startInfo.dataDirs.toSet
        val dropped = startDirs -- endDirs
        if (dropped.nonEmpty) throw new IllegalStateException(
          s"versioned stream at $dir hit a non-append commit between v$startV and " +
            s"v$endV (${dropped.size} data dir(s) dropped — overwrite or restore). " +
          "Streaming serves appends only; restart the stream from the new state.")
        // scoped dvs (SQL DELETEs) never merge, so a set change is a
        // real DELETE — no content-compare fallback needed
        if (!ignoreDeletes &&
            ((startInfo.dvDirs != endInfo.dvDirs &&
              !sameDvContent(startInfo.dvDirs, endInfo.dvDirs)) ||
             startInfo.scopedDvs != endInfo.scopedDvs))
          throw new IllegalStateException(
            s"versioned stream at $dir hit a DELETE between v$startV and v$endV; " +
              "rows already served cannot be unserved. Pass " +
              "option ignoreDeletes=true to keep streaming appends past deletes.")
        val newDirs = endInfo.dataDirs.filterNot(startDirs.contains)
        if (newDirs.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], frozenSchema)
        else {
          // manifest-aware subset read, RAW (pre-mask — the stream is
          // an append feed): serves partitioned chains correctly (the
          // files don't hold partition columns; a plain schema'd read
          // would emit them as null) and plans from manifest bytes
          import org.apache.spark.sql.functions.col
          Versioned.readVersionDirs(spark, dir, endV, newDirs.toSet, applyDv = false)
            .select(frozenSchema.fieldNames.map(col).toSeq: _*)
        }
    }
    // the engine asserts isStreaming on the returned plan — stamp it
    // the way FileStreamSource does
    org.apache.spark.sql.classic.GraftStreamShim.streamingFrom(spark, batch, frozenSchema)
  }

  /** Deletion-vector equality by CONTENT, not by directory name:
    * [[Versioned.compactDeletionVectors]] merges dv dirs WITHOUT
    * changing the mask, and routine maintenance must not kill running
    * consumers as a phantom DELETE. Only consulted when the dir sets
    * differ (rare); key sets are broadcast-sized by the dv contract,
    * so the comparison is two tiny reads. */
  private def sameDvContent(a: Seq[(String, Seq[String])],
                            b: Seq[(String, Seq[String])]): Boolean = {
    // keys compared in their NATIVE type — a cast-to-string comparison
    // would collide a NULL key with the literal string "null", letting
    // a real mask change read as equal and a genuine DELETE stream
    // past consumers without ignoreDeletes. NULL keys are excluded
    // outright: the mask is an anti-join / set-contains on the key, and
    // null never matches either, so a null entry changes no read — it
    // must not read as a phantom DELETE here.
    def keySets(dv: Seq[(String, Seq[String])]): Map[String, Set[Any]] =
      dv.groupBy(_._1).map { case (k, es) =>
        k -> spark.read.parquet(es.flatMap(_._2): _*)
          .select(org.apache.spark.sql.functions.col(k)).na.drop()
          .distinct().collect().map(_.get(0)).toSet
      }.filter(_._2.nonEmpty) // an empty key set masks nothing
    keySets(a) == keySets(b)
  }

  override def stop(): Unit = ()

  override def toString: String = s"VersionedStreamSource[$dir]"
}
