package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.Path

/** Delta time travel's role for plain parquet: a versioned table whose
  * every write is a new immutable VERSION, readable forever (until
  * pruned) via `readVersion(dir, v)` — `SELECT … VERSION AS OF n`.
  *
  * Layout (ref: the reference gets this from Delta's `_delta_log`,
  * `mnt/spark-conf/spark-defaults.conf:13`):
  *
  * {{{
  *   dir/_versions/00000000.manifest   one line per live data dir
  *   dir/v00000000_data/part-*.parquet immutable; never rewritten
  *   dir/v00000002_dv/part-*.parquet   deletion vector: keys masked
  *                                     out of v2+ reads (line format
  *                                     `dv:<keyCol>:<dirName>`)
  * }}}
  *
  * Each write lands its rows in a fresh `v<N>_data` directory, then
  * commits by publishing `_versions/<N>.manifest` through a
  * [[CommitProtocol]] — the manifest's appearance IS the commit
  * point. [[RenameCommit]] (default) stages and renames: atomic on
  * HDFS semantics, best-effort pre-check on POSIX. On object stores
  * — the reference's own substrate (S3A/MinIO,
  * ref: mnt/spark-conf/spark-defaults.conf:4-10), where rename is
  * copy+delete — pass [[PutIfAbsentCommit]]: the manifest is
  * published by a conditional create with NO rename on the commit
  * path, so the crash-window guarantees hold there too.
  * An overwrite manifest lists only its own data dir; an
  * append manifest lists the previous version's dirs plus its own —
  * so old versions stay readable from the SAME immutable files and an
  * append never rewrites history (storage cost is one copy per
  * distinct file, like Delta's add-file actions, NOT one copy per
  * version). A crash before the manifest rename leaves an orphaned
  * data dir no reader references; [[pruneVersions]] reclaims those
  * along with expired versions.
  *
  * Concurrency: version numbers are claimed by the manifest commit —
  * put-if-absent fails on an existing destination under BOTH
  * protocols, surfacing concurrent writers instead of silently
  * dropping one (single-writer is the
  * expectation, as in the reference's Airflow `max_active_runs=1`,
  * `mnt/airflow/dags/yelp_pipeline.py:21`).
  *
  * Scale shape: manifests are line lists of directories (bytes per
  * version); reads plan ONE multi-path parquet scan over the listed
  * dirs — partition pruning, pushdown, and vectorized read all apply
  * unchanged. No driver state beyond the manifest read.
  */
object Versioned {

  private val VDIR = "_versions"

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(dir: String, v: Int) =
    new Path(dir, f"$VDIR/$v%08d.manifest")

  private val ManifestName = """(\d{1,10})\.manifest""".r

  /** Versions committed so far, ascending (empty for a fresh dir).
    * Only names that are EXACTLY `<digits>.manifest` count: staging
    * files, editor droppings, or anything else a crashed writer left
    * beside the manifests must not crash the lister or masquerade as
    * a committed version. */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val (fs, root) = fsFor(spark, dir)
    val vdir = new Path(root, VDIR)
    if (!fs.exists(vdir)) Seq.empty
    else fs.listStatus(vdir).map(_.getPath.getName)
      .collect { case ManifestName(digits) => digits.toInt }
      .sorted.toSeq
  }

  def latestVersion(spark: SparkSession, dir: String): Option[Int] =
    versions(spark, dir).lastOption

  private def readManifest(spark: SparkSession, dir: String, v: Int): Seq[String] = {
    val (fs, _) = fsFor(spark, dir)
    val mp = manifestPath(dir, v)
    require(fs.exists(mp), s"no version $v at $dir")
    val in = fs.open(mp)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** A manifest line is either a bare data-dir name or a deletion
    * vector, `dv:<keyCol>:<dirName>` — a parquet dir of keys whose
    * rows are masked out of every read of this version. */
  private sealed trait Entry { def name: String }
  private final case class DataEntry(name: String) extends Entry
  private final case class DvEntry(keyCol: String, name: String) extends Entry

  private def parseEntry(line: String): Entry =
    if (line.startsWith("dv:")) {
      val rest = line.drop(3)
      val i = rest.indexOf(':')
      require(i > 0 && i < rest.length - 1,
        s"malformed deletion-vector manifest line: $line")
      DvEntry(rest.substring(0, i), rest.substring(i + 1))
    } else DataEntry(line)

  private def entries(spark: SparkSession, dir: String, v: Int): Seq[Entry] =
    readManifest(spark, dir, v).map(parseEntry)

  /** Commit `df` as the next version. `SaveMode.Overwrite` starts the
    * table state from this write alone; `SaveMode.Append` extends the
    * previous version's file set. Returns the committed version.
    * `protocol` picks the commit primitive for the storage:
    * [[RenameCommit]] (HDFS/POSIX, the default) or
    * [[PutIfAbsentCommit]] (object stores — conditional put, no
    * rename anywhere on the commit path). */
  def writeVersion(df: DataFrame, dir: String,
                   mode: SaveMode = SaveMode.Overwrite,
                   protocol: CommitProtocol = RenameCommit): Int =
    writeVersionWith(df.sparkSession, dir, protocol, mode)(tmp =>
      df.write.mode(SaveMode.ErrorIfExists).parquet(tmp))

  /** [[writeVersion]] with a caller-supplied data writer — the
    * [[ManifestStore]] rewrite hook: `write` receives the immutable
    * data-dir path for the new version and must produce the complete
    * parquet state there; the version becomes visible only when the
    * manifest commits through `protocol` afterwards. */
  def writeVersionWith(spark: SparkSession, dir: String,
                       protocol: CommitProtocol = RenameCommit,
                       mode: SaveMode = SaveMode.Overwrite)
                      (write: String => Unit): Int = {
    require(mode == SaveMode.Overwrite || mode == SaveMode.Append,
      s"versioned writes are Overwrite or Append, got $mode")
    val (fs, root) = fsFor(spark, dir)
    val prev = latestVersion(spark, dir)
    val v = prev.map(_ + 1).getOrElse(0)
    require(mode == SaveMode.Overwrite || prev.nonEmpty,
      "cannot Append to a table with no versions")
    // the nonce makes the data dir unique PER ATTEMPT (Delta writes
    // uniquely-named files for the same reason): two writers racing
    // the same version number each write their own dir, the manifest
    // claim picks the winner, and the loser's dir is an invisible
    // orphan for [[pruneVersions]] — without it the loser would
    // clobber the winner's in-flight data. A crashed attempt's dir is
    // equally invisible (no manifest references it) and needs no
    // clearing for the retry, which gets a fresh nonce.
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val dataDir = f"v$v%08d_data_$nonce"
    val dataPath = new Path(root, dataDir)
    // data first (invisible until the manifest lands) …
    write(dataPath.toString)
    val dirs = mode match {
      case SaveMode.Append => readManifest(spark, dir, prev.get) :+ dataDir
      case _               => Seq(dataDir)
    }
    // … then the atomic manifest commit publishes it
    commitManifest(spark, dir, v, dirs, protocol)
    v
  }

  /** The commit point, factored so the conflict guard is directly
    * testable: publish the manifest through the protocol's atomic
    * put-if-absent. Losing the claim (an existing manifest for `v`)
    * surfaces the concurrent writer instead of silently dropping one
    * — under [[RenameCommit]] via the HDFS rename-to-existing
    * failure (best-effort pre-check on POSIX), under
    * [[PutIfAbsentCommit]] via the conditional create itself. */
  private[graft] def commitManifest(spark: SparkSession, dir: String, v: Int,
                                    dirs: Seq[String],
                                    protocol: CommitProtocol = RenameCommit): Unit = {
    val (fs, root) = fsFor(spark, dir)
    fs.mkdirs(new Path(root, VDIR))
    val bytes = (dirs.mkString("\n") + "\n").getBytes("UTF-8")
    if (!protocol.putIfAbsent(fs, manifestPath(dir, v), bytes))
      throw new IllegalStateException(
        s"version $v at $dir was committed concurrently — retry the write")
  }

  /** Absolute paths of every dir the NEWEST version references — data
    * dirs AND deletion-vector dirs (both are part of the live state a
    * retention pass must not reclaim; older versions' dirs coexist on
    * disk until pruned). */
  def liveDataDirs(spark: SparkSession, dir: String): Seq[String] = {
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    entries(spark, dir, v).map(e => new Path(new Path(dir), e.name).toString)
  }

  /** Delta deletion vectors' role (public design: DELETE marks rows
    * dead in a sidecar instead of rewriting data files): commit a new
    * version that references the SAME immutable data dirs plus a
    * small parquet dir of deleted KEYS. No data file is touched —
    * DELETE costs one key-set write + one manifest commit regardless
    * of table size, and time travel to any pre-delete version still
    * sees the rows. Reads of this and later versions anti-join the
    * key set (broadcast-sized against a 100 TB table). The mask is
    * KEY-level, not positional: an append that re-introduces a
    * deleted key stays masked until a physical rewrite — the contract
    * erasure workloads (GDPR) actually want, where a re-crawled row
    * must STAY deleted; Delta's positional vectors make the opposite
    * choice. The next Overwrite version (upsert, compaction) applies
    * the mask physically — its writer reads through [[readVersion]],
    * which already subtracts the keys — and drops the dv references;
    * [[pruneVersions]] then reclaims the dv dirs. Returns the new
    * version id. */
  def deleteByKeys(spark: SparkSession, dir: String, keys: DataFrame, keyCol: String,
                   protocol: CommitProtocol = RenameCommit): Int = {
    require(keyCol.matches("[A-Za-z0-9_]+"),
      s"keyCol must be word-shaped (it is embedded in the manifest), got '$keyCol'")
    val (fs, root) = fsFor(spark, dir)
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val v = prev + 1
    // unique per attempt for the same racing-writer reason as
    // writeVersionWith's data dirs
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val dvDir = f"v$v%08d_dv_$nonce"
    val dvPath = new Path(root, dvDir)
    keys.select(org.apache.spark.sql.functions.col(keyCol)).distinct()
      .write.mode(SaveMode.ErrorIfExists).parquet(dvPath.toString)
    commitManifest(spark, dir, v,
      readManifest(spark, dir, prev) :+ s"dv:$keyCol:$dvDir", protocol)
    v
  }

  /** `VERSION AS OF v`: one multi-path parquet scan over the version's
    * data dirs, minus the keys of its deletion vectors (one anti-join
    * per distinct key column — key sets are tiny next to the data, so
    * the join broadcasts). `mergeSchema` is on: an append chain may
    * span schema evolution (a later append adds a column), and the
    * default single-footer schema would SILENTLY drop the newer
    * columns from a read — the union schema with null backfill is the
    * only correct answer for a multi-version scan (Delta serves it
    * from its log; plain parquet pays a footer read per file). */
  def readVersion(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val es = entries(spark, dir, v)
    def abs(name: String) = new Path(new Path(dir), name).toString
    val base = spark.read.option("mergeSchema", "true")
      .parquet(es.collect { case DataEntry(n) => abs(n) }: _*)
    es.collect { case DvEntry(k, n) => (k, abs(n)) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .foldLeft(base) { case (df, (k, dvs)) =>
        df.join(
          spark.read.parquet(dvs.map(_._2): _*)
            .select(org.apache.spark.sql.functions.col(k)).distinct(),
          Seq(k), "left_anti")
      }
  }

  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    readVersion(spark, dir, v)
  }

  /** Bounded optimistic retry for commits that lost a version-number
    * race: re-reads the new latest state and re-attempts at the next
    * number. Safe ONLY for COMMUTATIVE operations — append and
    * delete-by-keys extend whatever the latest manifest is, so the
    * retried commit means the same thing after the concurrent write
    * as before it. */
  private def withCommitRetry[T](maxAttempts: Int)(attempt: () => T): T = {
    require(maxAttempts >= 1, "need at least one attempt")
    var n = 1
    while (true) {
      try return attempt()
      catch {
        case e: IllegalStateException
            if e.getMessage != null &&
              e.getMessage.contains("committed concurrently") &&
              n < maxAttempts =>
          n += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Multi-writer APPEND (Delta's optimistic-concurrency role,
    * simplified honestly): appends commute with concurrent appends
    * and deletes, so a lost manifest race retries at the next version
    * — each attempt writes a fresh uniquely-named data dir, losers'
    * dirs stay invisible until pruned, and no writer can clobber
    * another's files. OVERWRITE deliberately has no retrying twin:
    * it replaces state it has not seen, so a lost race must surface
    * to the caller (who may no longer want the overwrite at all) —
    * the same reason Delta fails conflicting non-commutative commits.
    *
    * Multi-writer safety holds exactly when the protocol's
    * putIfAbsent is ATOMIC on the storage: [[PutIfAbsentCommit]]
    * everywhere (conditional PUT / hardlink), [[RenameCommit]] only
    * under HDFS semantics where rename-to-existing FAILS. On POSIX,
    * RenameCommit's rename silently REPLACES, so two local racers can
    * both "win" and one commit is lost — measured (the racing spec
    * fails under local RenameCommit by design of POSIX, passes under
    * PutIfAbsentCommit); local RenameCommit keeps its documented
    * single-writer caveat. */
  def appendVersionWithRetry(df: DataFrame, dir: String,
                             protocol: CommitProtocol = RenameCommit,
                             maxAttempts: Int = 16): Int =
    withCommitRetry(maxAttempts)(() =>
      writeVersion(df, dir, SaveMode.Append, protocol))

  /** Multi-writer [[deleteByKeys]] — key-masking commutes with
    * concurrent appends and other key deletes, so the same bounded
    * retry applies. */
  def deleteByKeysWithRetry(spark: SparkSession, dir: String,
                            keys: DataFrame, keyCol: String,
                            protocol: CommitProtocol = RenameCommit,
                            maxAttempts: Int = 16): Int =
    withCommitRetry(maxAttempts)(() =>
      deleteByKeys(spark, dir, keys, keyCol, protocol))

  /** Delta `RESTORE TABLE … TO VERSION AS OF v` role: commit version
    * v's FILE LIST as the newest version — no data is copied or
    * rewritten (the manifest re-references v's immutable dirs), and
    * the restore itself is a new version, so it is also undoable.
    * Returns the new version id. */
  def restoreVersion(spark: SparkSession, dir: String, v: Int): Int = {
    val dirs = readManifest(spark, dir, v) // validates v exists
    val next = latestVersion(spark, dir).get + 1
    commitManifest(spark, dir, next, dirs)
    next
  }

  case class PruneStats(versionsDropped: Seq[Int], dirsDeleted: Seq[String])

  /** Delta `VACUUM`'s retention half for the versioned store: drop all
    * but the newest `keepLast` manifests, then delete every data dir
    * no SURVIVING manifest references — which also reclaims orphans
    * from writes that crashed before their commit rename. Append-chain
    * dirs shared with a kept version survive. Idempotent. */
  def pruneVersions(spark: SparkSession, dir: String, keepLast: Int): PruneStats = {
    require(keepLast >= 1, "must keep at least one version")
    val (fs, root) = fsFor(spark, dir)
    // a never-written table (or bare root with no _versions) has
    // nothing to prune — listing it would throw FileNotFoundException,
    // contradicting the idempotent/safe-any-time contract
    if (!fs.exists(root) || !fs.exists(new Path(root, VDIR)))
      return PruneStats(Seq.empty, Seq.empty)
    val all = versions(spark, dir)
    val (drop, keep) = all.splitAt(math.max(0, all.length - keepLast))
    // live names span BOTH dir kinds: a deletion-vector dir referenced
    // by a surviving manifest is load-bearing (reclaiming it would
    // resurrect deleted rows)
    val live = keep.flatMap(entries(spark, dir, _)).map(_.name).toSet
    drop.foreach(v => fs.delete(manifestPath(dir, v), false))
    val dead = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.matches("""v\d{8}_(data|dv)(_[0-9a-f]{8})?""") &&
        !live.contains(p.getName))
    dead.foreach(fs.delete(_, true))
    // staging files from commits that crashed between create and
    // rename are invisible to readers but never self-clean
    fs.listStatus(new Path(root, VDIR)).map(_.getPath)
      .filter(_.getName.startsWith(".tmp-"))
      .foreach(fs.delete(_, false))
    PruneStats(drop, dead.map(_.getName).toSeq)
  }
}
