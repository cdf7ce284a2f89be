package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.hadoop.fs.Path

/** Delta time travel's role for plain parquet: a versioned table whose
  * every write is a new immutable VERSION, readable forever (until
  * pruned) via `readVersion(dir, v)` — `SELECT … VERSION AS OF n`.
  *
  * Layout (ref: the reference gets this from Delta's `_delta_log`,
  * `mnt/spark-conf/spark-defaults.conf:13`):
  *
  * {{{
  *   dir/_versions/00000000.manifest   control file, one line per fact
  *   dir/v00000000_data/part-*.parquet immutable; never rewritten
  *   dir/v00000002_dv/part-*.parquet   deletion vector: keys masked
  *                                     out of v2+ reads (line format
  *                                     `dv:<keyCol>:<dirName>`)
  * }}}
  *
  * A manifest file is either FULL STATE or an O(delta) INCREMENT
  * against its parent (`parent:<v>` + add/remove ops — see the delta
  * section in the object body): appends write only what changed, a
  * full checkpoint lands every `spark.graft.manifest.checkpointInterval`
  * commits (and on every overwrite), and readers resolve deltas by
  * folding over the parent's cached resolution — Delta's log/checkpoint
  * shape, which retires the last O(table) metadata cost per commit.
  *
  * A resolved manifest carries these line kinds (Delta's log actions,
  * reduced to the minimum this store needs):
  *
  *   - `<dirName>` — a live data dir (Delta `add`).
  *   - `dv:<keyCol>:<dirName>` — a deletion vector (key-mask sidecar).
  *   - `schema:<StructType.json>` — the version's UNION schema,
  *     recorded at commit time (Delta `metaData`). Reads apply it with
  *     `.schema(...)`, so planning touches NO parquet footer — the
  *     pre-round-8 `mergeSchema` read paid a plan-time footer-merge
  *     job over every referenced file on every read, which at 100 TB /
  *     10⁶ files is a cluster job before the first task of the actual
  *     query. Manifests without a schema line (written before this
  *     format) still read correctly via the mergeSchema fallback.
  *   - `stats:<dirName>:{"rows":N,"cols":{…}}` — per-dir column
  *     min/max/null-count, harvested from the parquet FOOTERS of the
  *     just-written dir at commit time (the writer already paid for
  *     those statistics; this lifts them one level so PLANNING can
  *     skip whole dirs without opening a single footer — Delta's
  *     data-skipping role). [[readVersionSkipping]] consults them.
  *
  * Each write lands its rows in a fresh `v<N>_data` directory, then
  * commits by publishing `_versions/<N>.manifest` through a
  * [[CommitProtocol]] — the manifest's appearance IS the commit
  * point. [[PutIfAbsentCommit]] (the default) publishes by a
  * conditional create: atomic on object stores (S3 `If-None-Match: *`
  * — the reference's own substrate, S3A/MinIO,
  * ref: mnt/spark-conf/spark-defaults.conf:4-10), emulated exactly on
  * local POSIX via hardlink, and delegating to stage-and-rename on
  * HDFS where that is the atomic primitive. [[RenameCommit]] remains
  * the explicit opt-in for pure-HDFS deployments; it is no longer the
  * default because POSIX rename silently replaces an existing
  * destination, so two local racers could both "win" — a lost update
  * the racing spec MEASURES. Safety is the default; the faster
  * single-writer rename is the documented choice.
  *
  * An overwrite manifest lists only its own data dir; an
  * append manifest lists the previous version's dirs plus its own —
  * so old versions stay readable from the SAME immutable files and an
  * append never rewrites history (storage cost is one copy per
  * distinct file, like Delta's add-file actions, NOT one copy per
  * version). A crash before the manifest commit leaves an orphaned
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
  * Scale shape: manifests are line lists of directories plus one
  * schema and per-dir stats (bytes per version); reads plan ONE
  * multi-path parquet scan over the listed dirs — partition pruning,
  * pushdown, and vectorized read all apply unchanged, and the
  * recorded schema means planning reads no data at all. No driver
  * state beyond the manifest read.
  */
object Versioned {

  private val VDIR = "_versions"

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The parquet schema of a versioned sidecar: `(_file, _pos)` rows
    * of a positional deletion vector — known by construction, so its
    * reads never pay schema inference. */
  private[graft] val PdvDirSchema: StructType = StructType(Seq(
    StructField("_file", org.apache.spark.sql.types.StringType),
    StructField("_pos", org.apache.spark.sql.types.LongType)))

  /** Spark schema of parquet dir(s), read DRIVER-SIDE from the first
    * footer found — what `spark.read.parquet(dirs).schema` infers
    * (mergeSchema=false: one representative footer), WITHOUT the
    * footer-reading Spark job (and its serialized-hadoop-conf
    * broadcast) that inference launches per call. The versioned
    * layer needs a schema once per COMMIT (footer harvest of the
    * just-written dir) and once per SIDECAR read (dv key sets,
    * recorded change feeds); the per-call job overhead — measured
    * 30–60 ms each at local[32] — dominated the multi-commit
    * protocol meters (optimization guide §1.2: remove work, then
    * tune). Spark-written files carry the exact Spark schema as
    * footer key-value JSON, the same source inference prefers;
    * foreign files fall back to MessageType conversion under the
    * session's parquet semantics. */
  private[graft] def parquetSchemaDriver(spark: SparkSession, dirs: Seq[String]): StructType = {
    val conf = org.apache.spark.sql.GraftSqlShims.sessionHadoopConf(spark)
    def firstFile(p: Path, fs: org.apache.hadoop.fs.FileSystem): Option[Path] = {
      val st = fs.listStatus(p).sortBy(_.getPath.getName.toString)
      st.collectFirst {
        case s if !s.isDirectory && s.getPath.getName.endsWith(".parquet") => s.getPath
      }.orElse(st.iterator.filter(_.isDirectory)
        .flatMap(d => firstFile(d.getPath, fs)).nextOption())
    }
    val head = dirs.iterator.flatMap { d =>
      val p = new Path(d)
      firstFile(p, p.getFileSystem(conf))
    }.nextOption().getOrElse(throw new IllegalArgumentException(
      s"no parquet files under ${dirs.mkString(", ")}"))
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(head, conf))
    try {
      val fmd = reader.getFooter.getFileMetaData
      Option(fmd.getKeyValueMetaData.get("org.apache.spark.sql.parquet.row.metadata"))
        .flatMap(j => scala.util.Try(
          org.apache.spark.sql.types.DataType.fromJson(j)
            .asInstanceOf[StructType]).toOption)
        .getOrElse(new org.apache.spark.sql.execution.datasources.parquet
          .ParquetToSparkSchemaConverter(conf).convert(fmd.getSchema))
    } finally reader.close()
  }

  /** [[parquetSchemaDriver]] applied as an explicit read schema: the
    * no-inference-job replacement for `spark.read.parquet(dirs…)` on
    * engine-written dirs. */
  private[graft] def readParquetNoInfer(spark: SparkSession, dirs: Seq[String]): DataFrame =
    spark.read.schema(parquetSchemaDriver(spark, dirs)).parquet(dirs: _*)

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

  /** One manifest line. Data and dv lines carry directory names; the
    * schema line carries the version's union schema; a stats line
    * carries one data dir's column statistics. */
  private[ext] sealed trait Line
  private final case class DataEntry(name: String) extends Line
  private final case class DvEntry(keyCol: String, name: String) extends Line
  /** A deletion vector SCOPED to the data dirs present when the
    * delete committed (`dvs:<keyCol>:<dvDir>:<d1,d2,…>`) — SQL DELETE
    * semantics: the statement removes the rows that exist NOW, so a
    * later INSERT of a masked key is visible (dirs committed after
    * the delete are outside the scope). The unscoped [[DvEntry]] keeps
    * the library's key-level erasure contract (GDPR: a re-appended
    * key STAYS masked); [[graft.sql.VersionedCatalog]]'s DELETE
    * routes here so SQL users get SQL semantics. */
  private final case class ScopedDvEntry(keyCol: String, name: String,
                                         scope: Seq[String]) extends Line
  /** A POSITIONAL deletion vector (`pdv:<dirName>`) — Delta's
    * row-index deletion-vector role. The dir holds parquet rows
    * `(_file STRING, _pos BIGINT)`: `_file` in the manifest's own
    * file spelling (`<dataDirName>/<fileSubpath>`, or the absolute
    * path for adopted/cloned refs — exactly [[planDataFiles]]'
    * output), `_pos` the row's 0-based index within that parquet
    * file. Any filter-expressible DELETE — range, multi-column,
    * string predicates — commits as ONE such sidecar plus one
    * manifest line: NO data file is rewritten (the key-set
    * [[DvEntry]]/[[ScopedDvEntry]] forms cover only one-column
    * equality/IN). Positions are inherently file-scoped, so SQL
    * DELETE's "rows that exist now" semantics need no scope list: a
    * file committed later is untouched by construction, and a
    * removed file's entries are inert. Reads subtract by
    * `(file, row_index)` using Spark's own parquet row-index
    * generation (correct under row-group pruning, so predicate
    * pushdown survives — the property the whole design rests on);
    * rewrites/compaction apply the mask physically and retire the
    * line. Size contract: `spark.graft.dv.maxPositions`. */
  private final case class PdvEntry(name: String) extends Line
  private final case class SchemaEntry(schema: StructType) extends Line
  /** Delta `SetTransaction`'s role: the highest streaming batch id a
    * given writer (appId) has committed. Written by
    * [[writeVersionStreamBatch]], carried forward by appends, and the
    * idempotence check a restarted streaming query's replayed epoch
    * fails against — exactly-once without any sink-side state file.
    * Format `txn:<batchId>:<appId>` (batch first: appIds may contain
    * colons — they default to checkpoint paths). */
  private final case class TxnEntry(batchId: Long, appId: String) extends Line
  /** One SOURCE FILE already loaded by COPY INTO (`ingest:<absPath>`)
    * — the per-file idempotence ledger (Delta COPY INTO's role): a
    * re-run skips every path recorded here. Carried by appends inside
    * prevLines and by data overwrites explicitly (like txn watermarks
    * — maintenance must never re-open the exactly-once window);
    * REPLACE TABLE resets it with the rest of the definition. */
  private final case class IngestEntry(path: String) extends Line
  /** The table's partition columns, in order (`partition:<c1,c2>`).
    * A partitioned version's data dirs hold hive-layout subtrees
    * (`dataDir/col=value/part-*.parquet`); the recorded union schema
    * carries the partition columns LAST (Spark's read order), the
    * per-file stats record each file's partition values as min=max
    * bounds derived from its subpath, and reads serve through the
    * partition-aware [[ManifestFileIndex]] so `PartitionFilters`
    * prune at plan time — the reference's own partition-pruning idiom
    * (ref: mnt/spark/apps/bronze_to_silver.py:143-151) composed with
    * time travel. */
  private final case class PartitionEntry(cols: Seq[String]) extends Line
  /** A change feed RECORDED at write time (Delta CDF's `_change_data`
    * role): `dirName` holds the classified diff from `vFrom` to `vTo`
    * over `keys`, written by [[writeVersionWithChangeFeed]] in the
    * same commit as the new state. [[changesBetween]] serves it
    * instead of re-deriving (O(feed) instead of O(both versions) for
    * every repeated CDC consumer); manifests without a matching line
    * fall back to the derive path. Format
    * `changes:<vFrom>:<vTo>:<k1,k2>:<dirName>`. */
  private final case class ChangesEntry(vFrom: Int, vTo: Int, keys: Seq[String],
                                        name: String) extends Line
  /** An enforced CHECK constraint (Delta CHECK-constraint role):
    * `constraint:<name>:<predicateSql>`. SQL semantics — a row
    * violates only when the predicate evaluates FALSE (NULL passes).
    * Constraints ride every commit (append AND overwrite: they are
    * table definition, not data), every WRITE validates its new dir
    * against them before the manifest commit, and Spark's own
    * analyzer additionally enforces them plan-side on SQL writes
    * (the table reports them via DSv2 `Table.constraints()`). */
  private final case class ConstraintEntry(name: String, predicateSql: String) extends Line
  /** An enforced NOT NULL column constraint (`notnull:<col>`): every
    * write validates the new dir holds no null for the column — from
    * the footer harvest's null counts in the passing case, so
    * enforcement usually costs zero extra IO — and a write whose
    * files LACK the column refuses too (the union-schema read would
    * null-backfill it). The SQL catalog additionally reports the
    * column non-nullable through the table schema, so Spark's ANSI
    * store assignment injects the plan-side runtime check on SQL
    * writes. Like CHECK constraints, NOT NULL is table definition:
    * carried by appends and data overwrites, dropped by REPLACE
    * TABLE, versioned like everything else (time travel to a
    * pre-constraint version serves a nullable column). */
  private final case class NotNullEntry(col: String) extends Line

  /** COLUMN MAPPING (Delta column-mapping 'name' mode's role, top-level
    * columns): `colmap:<logical>=<physical>,…` — the singleton line
    * mapping each RENAMED column's logical (user-facing) name to the
    * physical name its bytes carry in every parquet file of the chain.
    * A rename is then a METADATA-ONLY commit: the files, their footer
    * stats, the deletion-vector key columns, and the NOT NULL lines
    * all keep the PHYSICAL name — the whole internal pipeline stays
    * physical — and exactly two boundaries translate: reads rename
    * physical→logical as their final projection (predicate pushdown
    * and column pruning translate back automatically through the
    * alias), and DataFrame writes rename logical→physical before any
    * byte lands ([[toPhysical]]). Identity entries are never stored;
    * an OVERWRITE starts the physical layout fresh from its own files
    * and drops the line. */
  private final case class ColMapEntry(entries: Seq[(String, String)]) extends Line

  /** BLOOM-INDEX DECLARATION (`bloomcol:<physCol>:<bits>`): the table's
    * one declared point-lookup column — every commit from then on
    * builds a [[Bloom]] filter per new file (one column-pruned scan of
    * the new dir, O(delta)) and stores it in the manifest, so an
    * EqualTo/In on the column prunes FILES whose min/max ranges all
    * overlap the key — the interleaved-key layout bounds cannot touch.
    * Table definition: carried by appends and data overwrites, dropped
    * by REPLACE TABLE. */
  private final case class BloomColEntry(col: String, bits: Int) extends Line

  /** One data dir's per-file blooms for the declared column. Two
    * serializations, one in-memory shape:
    *
    *   - INLINE (`bloom:<dir>:<col>:<file>=<base64>,…`), `sidecar`
    *     None — small dirs keep the store's zero-metadata-call plan
    *     contract;
    *   - SIDECAR (`bloomref:<dir>:<col>:<absolute sidecar path>`),
    *     `sidecar` Some — once a dir's blob payload crosses
    *     `spark.graft.bloom.sidecarMinBytes` the blobs move to an
    *     immutable content-addressed file under `_versions/blooms/`
    *     and the manifest carries ONE line. Without this a 10⁶-file
    *     chain at the default 32 KiB blob is a ~44 GB manifest that
    *     every checkpoint re-writes; with it the manifest stays
    *     O(dirs) and each sidecar is read once per JVM (cached — the
    *     file is immutable, its name is its content hash).
    *
    * Replaced wholesale when a file rewrite trims the dir (the trim
    * drops the ref: content changed ⇒ new sidecar or back inline);
    * dropped with the dir. [[pruneVersions]] reclaims local sidecars
    * no surviving manifest references. */
  private final case class BloomEntry(dir: String, col: String,
                                      files: Map[String, Array[Byte]],
                                      sidecar: Option[String] = None) extends Line

  /** IDENTITY high-water mark (`hwm:<physCol>:<next>`): the NEXT
    * value a `GENERATED … AS IDENTITY` assignment may use. Advanced
    * in the SAME atomic commit as the data it covers (the claim IS
    * the OCC), monotone in the step's direction, initialized to the
    * declared start at CREATE. Identity values may have GAPS (the
    * distributed assignment trades density for zero extra jobs,
    * Delta's documented contract); they never repeat. */
  private final case class HwmEntry(col: String, next: Long) extends Line

  /** The FORMAT-VERSION gate (`protocol:<n>`) — Delta's protocol
    * action's role. The manifest format has accreted ~20 line types
    * across rounds; without a recorded version the first line type a
    * FUTURE writer adds would hit an older reader's fallthrough and
    * parse as garbage instead of a clean refusal. Every commit stamps
    * the writer's protocol (at the same single seam as `ts:`); a
    * reader meeting a HIGHER number — or any unknown `<word>:` line
    * type, the belt to this suspender — refuses with "upgrade
    * required" rather than misread committed state. Bump
    * [[SupportedProtocol]] exactly when a change would make an older
    * reader WRONG (new line type, changed line semantics) — never for
    * additive metadata an old reader can safely ignore. */
  private final case class ProtocolEntry(n: Int) extends Line

  /** The highest manifest protocol this build reads and the one it
    * writes. History: 1 = every format through round 15 (the strict
    * parser and the stamp itself landed together — all earlier
    * manifests are protocol-1 shaped and read unchanged). */
  private[ext] val SupportedProtocol = 1

  /** A PROTOCOL FEATURE declaration (`feature:<name>:required|optional`)
    * — Delta's reader/writer table-feature role: independent format
    * features gate independently instead of forcing a linear protocol
    * bump. A reader meeting a REQUIRED feature it does not support
    * refuses NAMING it (misreading committed state is never an
    * option); an unsupported OPTIONAL feature is carried verbatim and
    * ignored (it declares something a reader may exploit, never
    * something it must understand). Features are stamped by the first
    * commit that uses them (positional deletion vectors stamp `pdv`),
    * ride appends and file rewrites with the lines they gate, and
    * retire through the explicit [[dropTableFeature]] — which refuses
    * while the feature is still in use. An OVERWRITE resets them
    * together with the gated lines themselves: manifests here are
    * FULL self-describing state, so unlike Delta's shared log a
    * post-overwrite manifest genuinely contains nothing the feature
    * gates, while time travel to gated versions re-reads their own
    * declarations. Readers from builds predating this line type
    * refuse it through the strict unknown-line gate, so the clean
    * upgrade-required message still reaches them. */
  private[ext] final case class FeatureEntry(name: String,
                                             required: Boolean) extends Line

  /** The protocol features this build understands. */
  private[ext] val SupportedFeatures: Set[String] = Set("pdv", "ingest")

  /** The IN-COMMIT timestamp (`ts:<epochMillis>`) — Delta's
    * inCommitTimestamps role. `TIMESTAMP AS OF` resolved by file
    * MODIFICATION time breaks the moment the log leaves one
    * filesystem's custody: object-store copies, backup restores, and
    * clones all reset mtime, and multi-writer clock skew can make it
    * non-monotone. The commit seam stamps every manifest with a
    * RECORDED clock instead, forced monotone against the parent
    * (`max(now, parent+1)`); readers fall back to mtime only for
    * manifests that predate the line. */
  private final case class TsEntry(millis: Long) extends Line

  /** One TABLE PROPERTY (`prop:<key>:<value>`) — Delta's
    * TBLPROPERTIES role. Keys are dotted-word-shaped (they embed in
    * the manifest), values one-line; properties REPLACE by key, drop
    * with `-prop:<key>`, survive data overwrites like constraints
    * (table definition, not data) and reset on REPLACE TABLE. The
    * engine itself consults `graft.autoCompact.*` and
    * `graft.optimizeWrite.enabled` here when the session conf doesn't
    * override — Delta's delta.autoOptimize.* idiom. */
  private[ext] final case class PropEntry(key: String, value: String) extends Line

  /** The DATA-CHANGE=FALSE marker (`rearrange:1`) — Delta's
    * `dataChange=false` file-action role, version-scoped. Present in
    * version v's resolved lines ⟺ v's commit REARRANGED bytes without
    * changing served content (small-dir compaction, partition-scoped
    * compaction/Z-order): files moved, rows didn't. Streaming sources
    * skip such versions instead of failing the appends-only premise,
    * and change feeds emit nothing for them. The flag never inherits:
    * delta resolution strips the parent's before folding ops, full
    * manifests drop it at the commit seam (clone/restore render old
    * state), and checkpoints carry it only for the flagged version
    * itself. */
  private final case class RearrangeEntry() extends Line

  /** One data dir's statistics — dir-aggregate rows/col bounds plus
    * the per-FILE list reads plan from. Two serializations, one
    * in-memory shape (the [[BloomEntry]] sidecar pattern):
    *
    *   - INLINE (`stats:<dir>:<json>`), `sidecar` None — small dirs
    *     keep the zero-metadata-call contract;
    *   - SIDECAR (`statsref:<dir>:<absolute path>`), `sidecar` Some —
    *     once a dir's stats JSON crosses
    *     `spark.graft.stats.sidecarMinBytes` the payload moves to an
    *     immutable content-addressed file under `_versions/stats/`
    *     and the manifest carries ONE line. This is the LAST O(files)
    *     metadata surface: at 10⁶ files the inline form is tens of MB
    *     of JSON re-written every checkpoint and parsed per JVM
    *     (Delta's answer is the parquet checkpoint + v2 sidecars).
    *
    * Unlike a bloom blob, the file list is LOAD-BEARING (reads plan
    * from it; a trimmed dir's physical files include REMOVED ones), so
    * a missing sidecar REFUSES the parse rather than degrade — the
    * Delta-honest posture for required metadata. Shallow AND deep
    * clones copy stats sidecars into the target (they are small), so
    * only external interference can orphan one. */
  private[ext] final case class StatsEntry(name: String, rows: Long,
                                           cols: Map[String, ColStats],
                                           files: Seq[FileStats],
                                           sidecar: Option[String] = None) extends Line

  /** Footer-aggregated statistics of one column over one data dir.
    * `min`/`max` are canonical strings in the column's comparison
    * domain ([[Skipping.canonicalOf]]); None when the dir holds no
    * non-null value for the column. `nulls` is None when any footer
    * lacked a null count (statistics unusable → never skip on it). */
  private[ext] final case class ColStats(min: Option[String], max: Option[String],
                                         nulls: Option[Long])

  /** One parquet file of a data dir, as the manifest records it:
    * name + size (so reads plan with zero filesystem metadata calls)
    * plus the file's OWN row count and column bounds — Delta's
    * per-add-file stats role. Dir-granular min/max cannot prune
    * inside a single large commit (at 100 TB one append is thousands
    * of files spanning the full key range); per-file bounds let
    * [[ManifestFileIndex.listFiles]] drop individual files of a
    * surviving dir. `rows` is None for entries recorded before the
    * per-file-stats format — such files are always read. */
  private[ext] final case class FileStats(name: String, bytes: Long,
                                          rows: Option[Long],
                                          cols: Map[String, ColStats])

  private def parseLine(line: String): Line =
    if (line.startsWith("schema:"))
      SchemaEntry(org.apache.spark.sql.types.DataType
        .fromJson(line.drop(7)).asInstanceOf[StructType])
    else if (line.startsWith("stats:")) {
      val rest = line.drop(6)
      val i = rest.indexOf(':')
      require(i > 0, s"malformed stats manifest line: $line")
      val (rows, cols, files) = StatsJson.parse(rest.substring(i + 1))
      StatsEntry(rest.substring(0, i), rows, cols, files)
    } else if (line.startsWith("statsref:")) {
      // dir names are ':'-free (commit-time guards); the TAIL is the
      // sidecar's absolute scheme-free path, taken whole
      val rest = line.drop(9)
      val i = rest.indexOf(':')
      require(i > 0 && i < rest.length - 1,
        s"malformed stats-sidecar manifest line: $line")
      val (rows, cols, files) = loadStatsSidecar(rest.substring(i + 1))
      StatsEntry(rest.substring(0, i), rows, cols, files,
        Some(rest.substring(i + 1)))
    } else if (line.startsWith("changes:")) {
      val parts = line.drop(8).split(":", 4)
      require(parts.length == 4, s"malformed change-feed manifest line: $line")
      ChangesEntry(parts(0).toInt, parts(1).toInt,
        parts(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq, parts(3))
    } else if (line.startsWith("constraint:")) {
      val rest = line.drop(11)
      val i = rest.indexOf(':')
      require(i > 0 && i < rest.length - 1,
        s"malformed constraint manifest line: $line")
      ConstraintEntry(rest.substring(0, i), rest.substring(i + 1))
    } else if (line.startsWith("partition:")) {
      PartitionEntry(line.drop(10).split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    } else if (line.startsWith("txn:")) {
      val rest = line.drop(4)
      val i = rest.indexOf(':')
      require(i > 0 && i < rest.length - 1,
        s"malformed transaction manifest line: $line")
      TxnEntry(rest.substring(0, i).toLong, rest.substring(i + 1))
    } else if (line.startsWith("notnull:")) {
      val c = line.drop(8)
      require(c.nonEmpty, s"malformed not-null manifest line: $line")
      NotNullEntry(c)
    } else if (line.startsWith("hwm:")) {
      val rest = line.drop(4)
      val i = rest.lastIndexOf(':')
      require(i > 0 && i < rest.length - 1,
        s"malformed identity high-water-mark manifest line: $line")
      HwmEntry(rest.substring(0, i), rest.substring(i + 1).toLong)
    } else if (line.startsWith("ts:")) {
      TsEntry(line.drop(3).trim.toLong)
    } else if (line.startsWith("prop:")) {
      val rest = line.drop(5)
      val i = rest.indexOf(':')
      require(i > 0, s"malformed table-property manifest line: $line")
      PropEntry(rest.substring(0, i), rest.substring(i + 1))
    } else if (line.startsWith("rearrange:")) {
      RearrangeEntry()
    } else if (line.startsWith("protocol:")) {
      val n = line.drop(9).trim.toInt
      if (n > SupportedProtocol) throw new IllegalStateException(
        s"this table was written with graft manifest protocol $n; this reader " +
          s"supports protocol $SupportedProtocol — upgrade the engine before " +
          "reading (refusing is the contract: misparsing a newer format risks " +
          "silently wrong state)")
      ProtocolEntry(n)
    } else if (line.startsWith("bloomcol:")) {
      val rest = line.drop(9)
      val i = rest.lastIndexOf(':')
      require(i > 0 && i < rest.length - 1,
        s"malformed bloom-column manifest line: $line")
      BloomColEntry(rest.substring(0, i), rest.substring(i + 1).toInt)
    } else if (line.startsWith("bloom:")) {
      val parts = line.drop(6).split(":", 3)
      // the FILE-LIST tail may be empty — a dir that is all-null in
      // the declared column has no per-file bloom (nothing to hash),
      // renders as `bloom:<dir>:<col>:`, and the one-sided skipping
      // contract already treats a bloom-less file as "keep". Refusing
      // the empty tail here made such a committed manifest unreadable.
      require(parts.length == 3 && parts(0).nonEmpty && parts(1).nonEmpty,
        s"malformed bloom manifest line: $line")
      BloomEntry(parts(0), parts(1),
        parts(2).split(',').iterator.filter(_.nonEmpty).map { e =>
          // the separator is the LAST '=' before the blob: a hive
          // subpath file name legally contains '=' ("bucket=0/part-…"),
          // while a base64 BODY never does ('=' is only trailing
          // padding, stripped before the search)
          var k = e.length
          while (k > 0 && e.charAt(k - 1) == '=') k -= 1
          val j = e.lastIndexOf('=', k - 1)
          require(j > 0, s"malformed bloom file entry: $e")
          e.substring(0, j) -> Bloom.fromBase64(e.substring(j + 1))
        }.toMap)
    } else if (line.startsWith("bloomref:")) {
      // dir and col are ':'-free (commit-time guards); the TAIL is the
      // sidecar's absolute path, taken whole (split limit 3)
      val parts = line.drop(9).split(":", 3)
      require(parts.length == 3 && parts.forall(_.nonEmpty),
        s"malformed bloom-sidecar manifest line: $line")
      BloomEntry(parts(0), parts(1), loadBloomSidecar(parts(2)), Some(parts(2)))
    } else if (line.startsWith("colmap:")) {
      ColMapEntry(line.drop(7).split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { e =>
        val i = e.indexOf('=')
        require(i > 0 && i < e.length - 1, s"malformed column-mapping manifest line: $line")
        (e.substring(0, i), e.substring(i + 1))
      })
    } else if (line.startsWith("dvs:")) {
      val parts = line.drop(4).split(":", 3)
      require(parts.length == 3 && parts.forall(_.nonEmpty),
        s"malformed scoped deletion-vector manifest line: $line")
      ScopedDvEntry(parts(0), parts(1),
        parts(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    } else if (line.startsWith("dv:")) {
      val rest = line.drop(3)
      val i = rest.indexOf(':')
      require(i > 0 && i < rest.length - 1,
        s"malformed deletion-vector manifest line: $line")
      DvEntry(rest.substring(0, i), rest.substring(i + 1))
    } else if (line.startsWith("pdv:")) {
      val n = line.drop(4)
      require(n.nonEmpty, s"malformed positional deletion-vector manifest line: $line")
      PdvEntry(n)
    } else if (line.startsWith("ingest:")) {
      val p = line.drop(7)
      require(p.nonEmpty, s"malformed ingest-ledger manifest line: $line")
      IngestEntry(p)
    } else if (line.startsWith("feature:")) {
      val parts = line.drop(8).split(":", 2)
      require(parts.length == 2 && parts(0).nonEmpty &&
        (parts(1) == "required" || parts(1) == "optional"),
        s"malformed protocol-feature manifest line: $line")
      val required = parts(1) == "required"
      if (required && !SupportedFeatures.contains(parts(0)))
        throw new IllegalStateException(
          s"this table requires the manifest protocol feature '${parts(0)}', which " +
            s"this reader does not support (has: ${SupportedFeatures.toSeq.sorted.mkString(", ")}) " +
            "— upgrade the engine before reading (refusing is the contract: " +
            "misparsing state written under an unknown required feature risks " +
            "silently wrong results)")
      FeatureEntry(parts(0), required)
    } else if (line.matches("[A-Za-z][A-Za-z0-9_.-]*:.*")) {
      // STRICT fallthrough: a word-shaped `<kind>:` prefix this reader
      // does not know is a FUTURE line type, never a data dir — data
      // entries are machine-named `v%08d_<kind>_<nonce>` or colon-free
      // absolute paths (commit-time guards), so they can never match.
      // Treating the line as a phantom DataEntry (the old fallthrough)
      // would at best fail the read on a missing dir and at worst
      // serve a WRONG dir set.
      throw new IllegalStateException(
        s"unknown manifest entry type '${line.takeWhile(_ != ':')}:' — written " +
          s"by a newer graft (this reader supports manifest protocol " +
          s"$SupportedProtocol); upgrade the engine before reading this table")
    } else DataEntry(line)

  /** Parsed-manifest LRU cache. Sound because a committed manifest is
    * IMMUTABLE: the put-if-absent claim is its only writer, restore
    * commits a NEW version, and only prune/drop ever delete one (both
    * evict — within THIS JVM; a foreign driver dropping and
    * re-creating a table at the same path is the one staleness
    * window, the same one Delta's snapshot cache accepts, and it
    * surfaces as a read error on the vanished dirs, never as silent
    * wrong rows). The cost this removes is real at scale — one SQL
    * read consults the manifest several times (load → versionInfo →
    * serving index), and with per-file stats at 10⁶ files a manifest
    * is tens of MB whose parse should happen once per JVM, not once
    * per plan step.
    *
    * Bounded by WEIGHT, not entry count: an entry's weight is its
    * recorded file-stats count (the dominant allocation — a
    * 10⁶-file manifest must not be multiplied by an entry-count
    * bound). Eviction keeps at least the most recently used entry, so
    * one huge hot manifest still caches. */
  private val manifestCacheMaxWeight = 2L * 1000 * 1000 // total cached FileStats entries
  private var manifestCacheWeight = 0L
  private val manifestCache =
    new java.util.LinkedHashMap[String, (Seq[Line], Long)](128, 0.75f, true)

  private def lineWeight(ls: Seq[Line]): Long =
    ls.iterator.map {
      case s: StatsEntry => 1L + s.files.length
      // a bloom blob is ~hundreds of FileStats-equivalents of memory
      case b: BloomEntry => 1L + b.files.valuesIterator.map(_.length.toLong).sum / 64
      case _ => 1L
    }.sum

  /** Cache keys are the FILESYSTEM-QUALIFIED manifest path: the same
    * table addressed through equivalent-but-different spellings
    * (scheme-qualified vs plain, trailing slash) must fill and evict
    * under ONE key, or a prune/drop through one spelling would leave
    * the other spelling serving a deleted version's cached parse. */
  private def cacheKey(spark: SparkSession, dir: String, v: Int): String = {
    val (fs, _) = fsFor(spark, dir)
    fs.makeQualified(manifestPath(dir, v)).toString
  }

  // ───────────── O(delta) manifests: incremental commits ─────────────
  // A manifest file is either FULL STATE (the original format: every
  // line a fact) or a DELTA against its parent — first line
  // `parent:<v>`, then ops. At 10⁶ files with per-file stats a full
  // manifest is tens of MB; re-serializing it on EVERY append made
  // each commit's metadata write O(table). A delta commit writes only
  // what changed (Delta Lake's log is O(delta) JSON actions for the
  // same reason), and every Nth commit — plus every overwrite, which
  // starts the state fresh anyway — is a FULL checkpoint bounding the
  // resolution chain. Readers are untouched above the parser: [[lines]]
  // resolves a delta by folding its ops over the parent's RESOLVED
  // lines (cached, so the fold happens once per JVM per version).
  //
  // Delta ops:
  //   `+<rendered line>`   add, with replace-by-key semantics per kind
  //                        (schema/partition replace the singleton;
  //                        txn replaces the same appId; stats replaces
  //                        the same dir; constraint replaces the same
  //                        name; a data dir adds if absent)
  //   `-data:<dir>`        drop a data dir AND its stats entry
  //   `-dv:<dir>`          drop a deletion-vector entry by dir name
  //   `-txn:<appId>`       drop a writer's txn watermark
  //   `-constraint:<name>` drop a CHECK constraint
  //
  // Checkpoints are SIDECARS (`<v>.checkpoint` beside `<v>.manifest`),
  // not alternate manifest contents: the manifest that claimed a
  // version is immutable, while a checkpoint is DERIVED state that can
  // be (re)created any time from the chain — which is what lets
  // [[pruneVersions]] keep its exact keepLast contract: before
  // dropping a kept delta's parents it materializes the boundary
  // version's checkpoint, then reclaims. Delta's `_delta_log` has the
  // same json-actions + parquet-checkpoint split.

  /** A checkpoint sidecar lands every `interval` commits
    * (`spark.graft.manifest.checkpointInterval`, default 10; ≤1 =
    * every commit), bounding every resolution chain. Overwrite
    * commits need none: their manifests are full state already. */
  private def checkpointInterval(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.manifest.checkpointInterval")
      .map(_.toInt).getOrElse(10)

  private def checkpointDue(spark: SparkSession, v: Int): Boolean = {
    val i = checkpointInterval(spark)
    i <= 1 || (i > 0 && v % i == 0)
  }

  private def checkpointPath(dir: String, v: Int) =
    new Path(dir, f"$VDIR/$v%08d.checkpoint")

  /** Bytes above which [[writeCheckpoint]] SPILLS heavy inline
    * payloads into the content-addressed stats/bloom sidecars
    * (`spark.graft.checkpoint.spillBytes`, default 4 MiB). The
    * checkpoint is the one metadata blob re-written every
    * checkpointInterval commits and re-parsed per JVM; per-dir
    * sidecars are immutable and cached ACROSS checkpoints, so
    * spilling bounds the recurring cost to O(dirs) lines + O(changed
    * dirs) sidecar reads — Delta's json-log + parquet-checkpoint
    * split, expressed in this store's sidecar idiom. */
  private def checkpointSpillBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.checkpoint.spillBytes")
      .map(_.toLong).getOrElse(4L * 1024 * 1024)

  /** Materialize a version's resolved state as its checkpoint sidecar.
    * Derived data, so losing the put-if-absent race just means another
    * writer checkpointed the same (immutable) content first.
    *
    * A checkpoint over [[checkpointSpillBytes]] spills its LARGEST
    * inline stats/bloom payloads to sidecar files until it fits —
    * largest-first, not wholesale, so a long tail of small dirs stays
    * inline instead of becoming thousands of tiny sidecar files. The
    * per-dir thresholds already externalize big single commits at
    * write time; this seam catches the accumulation case (many small
    * dirs whose inline lines are individually cheap but collectively
    * tens of MB re-rendered every checkpoint). */
  private def writeCheckpoint(spark: SparkSession, dir: String, v: Int,
                              fullLines: Seq[Line], protocol: CommitProtocol): Unit = {
    val (fs, _) = fsFor(spark, dir)
    def render(ls: Seq[Line]) =
      (ls.map(renderLine).mkString("\n") + "\n").getBytes("UTF-8")
    val budget = checkpointSpillBytes(spark)
    var out = fullLines
    var bytes = render(out)
    if (bytes.length > budget) {
      val sized = out.map(l => renderLine(l).length + 1L)
      val spillable = out.zipWithIndex.collect {
        case (s: StatsEntry, i) if s.sidecar.isEmpty && s.files.nonEmpty => (i, sized(i))
        case (b: BloomEntry, i) if b.sidecar.isEmpty && b.files.nonEmpty => (i, sized(i))
      }.sortBy(-_._2)
      var total = sized.sum
      val spill = scala.collection.mutable.Set[Int]()
      val it = spillable.iterator
      while (total > budget && it.hasNext) {
        val (i, sz) = it.next()
        spill += i
        total -= math.max(0L, sz - 120L) // a ref line replaces the payload
      }
      if (spill.nonEmpty) {
        val arr = out.toArray
        spill.foreach { i =>
          arr(i) = arr(i) match {
            case s: StatsEntry => externalizeStats(spark, dir, Seq(s), force = true).head
            case b: BloomEntry => externalizeBlooms(spark, dir, Seq(b), force = true).head
            case other         => other
          }
        }
        out = arr.toSeq
        bytes = render(out)
      }
    }
    protocol.putIfAbsent(fs, checkpointPath(dir, v), bytes)
    ()
  }

  /** The parent version of a DELTA manifest, None for a full one —
    * read from the first line only (prune consults this without
    * paying a full parse). */
  private def manifestParent(spark: SparkSession, dir: String, v: Int): Option[Int] = {
    val (fs, _) = fsFor(spark, dir)
    val in = fs.open(manifestPath(dir, v))
    try {
      val br = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      Option(br.readLine()).map(_.trim).filter(_.startsWith("parent:"))
        .map(_.drop(7).trim.toInt)
    } finally in.close()
  }

  /** Fold one delta manifest's ops over the parent's resolved lines.
    * The parent's rearrange flag strips FIRST — it describes the
    * parent's own commit, never this one's; a rearrange commit
    * re-adds it through its `+rearrange:1` op. */
  private def applyOps(base: Seq[Line], ops: Seq[String]): Seq[Line] =
    ops.foldLeft(base.filterNot(_.isInstanceOf[RearrangeEntry])) { (acc, op) =>
      if (op.startsWith("+")) parseLine(op.drop(1)) match {
        case s: SchemaEntry    => s +: acc.filterNot(_.isInstanceOf[SchemaEntry])
        case p: PartitionEntry => p +: acc.filterNot(_.isInstanceOf[PartitionEntry])
        case t: TxnEntry       => acc.filterNot {
          case TxnEntry(_, a) => a == t.appId; case _ => false } :+ t
        case s: StatsEntry     => acc.filterNot {
          case e: StatsEntry => e.name == s.name; case _ => false } :+ s
        case c: ConstraintEntry => acc.filterNot {
          case e: ConstraintEntry => e.name.equalsIgnoreCase(c.name); case _ => false } :+ c
        case nn: NotNullEntry  => acc.filterNot {
          case e: NotNullEntry => e.col.equalsIgnoreCase(nn.col); case _ => false } :+ nn
        case h: HwmEntry       => acc.filterNot {
          case e: HwmEntry => e.col.equalsIgnoreCase(h.col); case _ => false } :+ h
        case t: TsEntry        => t +: acc.filterNot(_.isInstanceOf[TsEntry])
        case p: PropEntry      => acc.filterNot {
          case e: PropEntry => e.key.equalsIgnoreCase(p.key); case _ => false } :+ p
        case p: ProtocolEntry  => p +: acc.filterNot(_.isInstanceOf[ProtocolEntry])
        case f: FeatureEntry   => acc.filterNot {
          case e: FeatureEntry => e.name.equalsIgnoreCase(f.name); case _ => false } :+ f
        case cm: ColMapEntry   => acc.filterNot(_.isInstanceOf[ColMapEntry]) :+ cm
        case bc: BloomColEntry => acc.filterNot {
          case e: BloomColEntry => e.col.equalsIgnoreCase(bc.col); case _ => false } :+ bc
        case b: BloomEntry     => acc.filterNot {
          case e: BloomEntry => e.dir == b.dir && e.col.equalsIgnoreCase(b.col)
          case _ => false } :+ b
        case d: DataEntry      => if (acc.contains(d)) acc else acc :+ d
        case i: IngestEntry    => if (acc.contains(i)) acc else acc :+ i
        case other             => acc :+ other // dv, changes: plain adds
      } else if (op.startsWith("-data:")) {
        val n = op.drop(6)
        acc.filterNot {
          case DataEntry(e)       => e == n
          case s: StatsEntry      => s.name == n
          case b: BloomEntry      => b.dir == n
          case _ => false
        }
      } else if (op.startsWith("-bloomcol:")) {
        // undeclare ONE column: its declaration and its blobs drop;
        // other declared columns' blooms stay live
        val c = op.drop(10)
        acc.filterNot {
          case e: BloomColEntry => e.col.equalsIgnoreCase(c)
          case e: BloomEntry    => e.col.equalsIgnoreCase(c)
          case _ => false
        }
      } else if (op.startsWith("-bloomcol")) {
        // undeclaring (all columns) drops every (now-stale) blob with it
        acc.filterNot(l => l.isInstanceOf[BloomColEntry] || l.isInstanceOf[BloomEntry])
      } else if (op.startsWith("-bloom:")) {
        val n = op.drop(7)
        acc.filterNot { case b: BloomEntry => b.dir == n; case _ => false }
      } else if (op.startsWith("-dv:")) {
        val n = op.drop(4)
        acc.filterNot {
          case DvEntry(_, e) => e == n
          case ScopedDvEntry(_, e, _) => e == n
          case PdvEntry(e) => e == n
          case _ => false
        }
      } else if (op.startsWith("-txn:")) {
        val a = op.drop(5)
        acc.filterNot { case TxnEntry(_, e) => e == a; case _ => false }
      } else if (op == "-ingest") {
        // forget the WHOLE COPY INTO ledger (retention reset): the
        // next copyInto re-considers every source file
        acc.filterNot(_.isInstanceOf[IngestEntry])
      } else if (op.startsWith("-constraint:")) {
        val n = op.drop(12)
        acc.filterNot { case ConstraintEntry(e, _) => e.equalsIgnoreCase(n); case _ => false }
      } else if (op.startsWith("-prop:")) {
        val k = op.drop(6)
        acc.filterNot { case PropEntry(e, _) => e.equalsIgnoreCase(k); case _ => false }
      } else if (op.startsWith("-feature:")) {
        val n = op.drop(9)
        acc.filterNot { case FeatureEntry(e, _) => e.equalsIgnoreCase(n); case _ => false }
      } else if (op.startsWith("-notnull:")) {
        val c = op.drop(9)
        acc.filterNot { case NotNullEntry(e) => e.equalsIgnoreCase(c); case _ => false }
      } else if (op.startsWith("-hwm:")) {
        val c = op.drop(5) // the identity column was dropped
        acc.filterNot { case HwmEntry(e, _) => e.equalsIgnoreCase(c); case _ => false }
      } else if (op == "-colmap") {
        acc.filterNot(_.isInstanceOf[ColMapEntry]) // rename chain folded back to identity
      } else throw new IllegalStateException(s"malformed delta-manifest op: $op")
    }

  /** Resolve one version to its full line set: a checkpoint sidecar
    * parses directly; so does a full manifest; a delta folds over the
    * parent's (cached) resolution. */
  private def resolveManifest(spark: SparkSession, dir: String, v: Int): Seq[Line] = {
    val (fs, _) = fsFor(spark, dir)
    val cp = checkpointPath(dir, v)
    if (fs.exists(cp)) {
      val in = fs.open(cp)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).map(parseLine).toList
      finally in.close()
    } else {
      val raw = readManifest(spark, dir, v)
      raw.headOption.filter(_.startsWith("parent:")) match {
        case None => raw.map(parseLine)
        case Some(head) =>
          val parent = head.drop(7).trim.toInt
          applyOps(lines(spark, dir, parent), raw.tail)
      }
    }
  }

  /** Commit a non-overwrite child version as a DELTA manifest (parent
    * + ops), and land the periodic checkpoint sidecar when due. The
    * manifest commit is the atomic claim; a crash before the sidecar
    * lands costs nothing (resolution folds the chain). */
  private def commitChild(spark: SparkSession, dir: String, v: Int, parent: Int,
                          fullLines: => Seq[Line], ops: => Seq[String],
                          protocol: CommitProtocol): Unit = {
    val opsV = ops
    val ts = commitManifest(spark, dir, v, s"parent:$parent" +: opsV, protocol)
    // the sidecar must carry the same in-commit clock (and protocol
    // stamp) the manifest was stamped with — a checkpoint-resolved
    // read and a fold-resolved read of the same version answer
    // TIMESTAMP AS OF alike and gate alike. The rearrange flag is
    // version-scoped: the checkpoint carries it iff THIS commit's ops
    // declared it — an inherited one (the parent was the rearrange)
    // strips, matching the fold resolution.
    if (checkpointDue(spark, v)) {
      val rearr: Seq[Line] =
        if (opsV.exists(_.startsWith("+rearrange:"))) Seq(RearrangeEntry())
        else Seq.empty
      writeCheckpoint(spark, dir, v,
        TsEntry(ts) +: ProtocolEntry(SupportedProtocol) +:
          (rearr ++ fullLines.filterNot(l =>
            l.isInstanceOf[TsEntry] || l.isInstanceOf[ProtocolEntry] ||
              l.isInstanceOf[RearrangeEntry])), protocol)
    }
  }

  private def addOp(l: Line): String = "+" + renderLine(l)

  private def lines(spark: SparkSession, dir: String, v: Int): Seq[Line] = {
    val key = cacheKey(spark, dir, v)
    manifestCache.synchronized(Option(manifestCache.get(key))) match {
      case Some((cached, _)) => cached
      case None =>
        val parsed = resolveManifest(spark, dir, v)
        val w = lineWeight(parsed)
        manifestCache.synchronized {
          if (manifestCache.put(key, (parsed, w)) == null) manifestCacheWeight += w
          val it = manifestCache.entrySet().iterator()
          while (manifestCacheWeight > manifestCacheMaxWeight && manifestCache.size() > 1
                 && it.hasNext) {
            val eldest = it.next()
            if (eldest.getKey != key) {
              manifestCacheWeight -= eldest.getValue._2
              it.remove()
            }
          }
        }
        parsed
    }
  }

  /** Drop cached parses for versions that no longer exist ([[pruneVersions]],
    * [[dropTableChain]]) — serving a deleted manifest from cache would
    * resurrect a pruned version's file list. */
  private def evictManifestCache(spark: SparkSession, dir: String,
                                 vs: Iterable[Int]): Unit =
    manifestCache.synchronized {
      vs.foreach { v =>
        val removed = manifestCache.remove(cacheKey(spark, dir, v))
        if (removed != null) manifestCacheWeight -= removed._2
      }
    }

  // ───────────── bloom sidecar files (manifest stays O(dirs)) ─────────────

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.ext.Versioned")

  /** Per-dir blob payload (rendered bytes) at or above which
    * [[externalizeBlooms]] moves the blobs to a sidecar file. The
    * default keeps a dir's manifest share under ~256 KiB (~6 files at
    * the default 32 KiB blob) — small tables stay zero-metadata-call,
    * large commits stop growing the manifest with file count. */
  private def bloomSidecarMinBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.bloom.sidecarMinBytes")
      .map(_.toLong).getOrElse(256L * 1024)

  private def bloomsDirPath(root: Path) = new Path(root, s"$VDIR/blooms")

  /** Sidecar parse cache. Sound because sidecar files are IMMUTABLE —
    * content-addressed names, written once, never rewritten (a trim
    * writes a NEW sidecar). Bounded by blob bytes; one hot entry
    * always stays. */
  private val bloomSidecarCacheMaxBytes = 256L * 1024 * 1024
  private var bloomSidecarCacheBytes = 0L
  private val bloomSidecarCache =
    new java.util.LinkedHashMap[String, (Map[String, Array[Byte]], Long)](64, 0.75f, true)

  /** Read one sidecar (cached). A MISSING sidecar degrades to an empty
    * map with a warning rather than bricking the table: blooms are
    * one-sided skipping metadata — no bloom means every file is read,
    * never a wrong row. The case is reachable only by external
    * interference (the documented clone caveat: the SOURCE owns a
    * cloned ref's file and its prune may reclaim it). The failure is
    * NOT cached, so a restored file heals on the next parse. */
  private def loadBloomSidecar(path: String): Map[String, Array[Byte]] = {
    bloomSidecarCache.synchronized(Option(bloomSidecarCache.get(path))) match {
      case Some((cached, _)) => cached
      case None =>
        val spark = SparkSession.active
        val p = new Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val parsed: Option[Map[String, Array[Byte]]] =
          try {
            val in = fs.open(p)
            try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines()
              .filter(_.nonEmpty).map { e =>
                var k = e.length
                while (k > 0 && e.charAt(k - 1) == '=') k -= 1
                val j = e.lastIndexOf('=', k - 1)
                require(j > 0, s"malformed bloom sidecar entry in $path: $e")
                e.substring(0, j) -> Bloom.fromBase64(e.substring(j + 1))
              }.toMap)
            finally in.close()
          } catch {
            case _: java.io.FileNotFoundException =>
              log.warn(s"bloom sidecar $path is missing — point-lookup skipping " +
                "degrades to reading every file of its dir (results stay exact); " +
                "was the clone SOURCE pruned?")
              None
          }
        parsed match {
          case None => Map.empty
          case Some(m) =>
            val w = m.valuesIterator.map(_.length.toLong).sum
            bloomSidecarCache.synchronized {
              if (bloomSidecarCache.put(path, (m, w)) == null) bloomSidecarCacheBytes += w
              val it = bloomSidecarCache.entrySet().iterator()
              while (bloomSidecarCacheBytes > bloomSidecarCacheMaxBytes &&
                     bloomSidecarCache.size() > 1 && it.hasNext) {
                val eldest = it.next()
                if (eldest.getKey != path) {
                  bloomSidecarCacheBytes -= eldest.getValue._2
                  it.remove()
                }
              }
            }
            m
        }
    }
  }

  /** Move heavy inline bloom entries to sidecar files — called at
    * every seam that CREATES blobs (per-commit build, backfill,
    * rewrite trim/replacement), before the entry renders into a
    * manifest. Entries already carrying a ref pass through (the file
    * exists and is immutable); light entries stay inline. The write
    * is tmp + rename so the content-addressed name only ever appears
    * COMPLETE, and losing a same-name race is benign (same hash =
    * same bytes). */
  private def externalizeBlooms(spark: SparkSession, dir: String,
                                entries: Seq[Line],
                                force: Boolean = false): Seq[Line] = {
    lazy val minBytes = bloomSidecarMinBytes(spark)
    entries.map {
      case b @ BloomEntry(_, _, files, None) if files.nonEmpty =>
        val payload = files.iterator.map { case (f, bits) =>
          f.length + 2L + 4L * ((bits.length + 2) / 3)
        }.sum
        if (!force && payload < minBytes) b
        else {
          val body = (files.toSeq.sortBy(_._1)
            .map { case (f, bb) => s"$f=${Bloom.toBase64(bb)}" }.mkString("\n") + "\n")
            .getBytes("UTF-8")
          val hash = java.security.MessageDigest.getInstance("SHA-256")
            .digest(body).take(16).map("%02x".format(_)).mkString
          val (fs, root) = fsFor(spark, dir)
          val target = new Path(bloomsDirPath(root), s"$hash.bloom")
          if (!fs.exists(target)) {
            fs.mkdirs(target.getParent)
            val tmp = new Path(target.getParent,
              s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
            val out = fs.create(tmp, false)
            try out.write(body) finally out.close()
            if (!fs.rename(tmp, target)) {
              // lost the race to an identical writer — their bytes serve
              fs.delete(tmp, false)
              require(fs.exists(target), s"bloom sidecar rename to $target failed")
            }
          }
          b.copy(sidecar = Some(fs.makeQualified(target).toUri.getPath))
        }
      case other => other
    }
  }

  // ───────────── stats sidecar files (manifest stays O(dirs)) ─────────────

  /** Per-dir stats-JSON bytes at or above which [[externalizeStats]]
    * moves the payload to a sidecar file. The default (256 KiB, a few
    * hundred files' worth of JSON) keeps small tables zero-metadata-
    * call while a large commit stops growing the manifest with file
    * count. */
  private def statsSidecarMinBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.stats.sidecarMinBytes")
      .map(_.toLong).getOrElse(256L * 1024)

  private def statsDirPath(root: Path) = new Path(root, s"$VDIR/stats")

  /** Sidecar parse cache — sound because the files are IMMUTABLE
    * (content-addressed, written once; a trim writes a NEW sidecar).
    * Weighted by recorded file count, the same unit as the manifest
    * cache; one hot entry always stays. */
  private val statsSidecarCacheMaxFiles = 2L * 1000 * 1000
  private var statsSidecarCacheFiles = 0L
  private val statsSidecarCache =
    new java.util.LinkedHashMap[String, ((Long, Map[String, ColStats], Seq[FileStats]), Long)](
      64, 0.75f, true)

  /** Read one stats sidecar (cached). A MISSING file REFUSES with the
    * remedy named — unlike a bloom blob, the file list is what reads
    * PLAN from, and a silent fallback to directory listing would serve
    * rows a CoW rewrite already removed from a trimmed dir. */
  private def loadStatsSidecar(path: String): (Long, Map[String, ColStats], Seq[FileStats]) = {
    statsSidecarCache.synchronized(Option(statsSidecarCache.get(path))) match {
      case Some((cached, _)) => cached
      case None =>
        val spark = SparkSession.active
        val p = new Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val parsed =
          try {
            val in = fs.open(p)
            try StatsJson.parse(
              scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
            finally in.close()
          } catch {
            case _: java.io.FileNotFoundException =>
              throw new IllegalStateException(
                s"stats sidecar $path is MISSING — the manifest's per-file lists " +
                  "live there and reads plan from them, so this table cannot be " +
                  "served exactly. Restore the file, or re-create the state it " +
                  "described (was a foreign table's prune pointed at this tree?)")
          }
        statsSidecarCache.synchronized {
          val w = 1L + parsed._3.length
          if (statsSidecarCache.put(path, (parsed, w)) == null)
            statsSidecarCacheFiles += w
          val it = statsSidecarCache.entrySet().iterator()
          while (statsSidecarCacheFiles > statsSidecarCacheMaxFiles &&
                 statsSidecarCache.size() > 1 && it.hasNext) {
            val eldest = it.next()
            if (eldest.getKey != path) {
              statsSidecarCacheFiles -= eldest.getValue._2
              it.remove()
            }
          }
        }
        parsed
    }
  }

  /** Move heavy inline stats entries to sidecar files — called at
    * every seam that CREATES a stats line (commit harvest, CONVERT,
    * backfill, rewrite trim/replacement), before the entry renders
    * into a manifest. Entries already carrying a ref pass through
    * (immutable file, exists); light entries stay inline. tmp+rename
    * so the content-addressed name only ever appears COMPLETE; losing
    * a same-name race is benign (same hash = same bytes). */
  private def externalizeStats(spark: SparkSession, dir: String,
                               entries: Seq[Line],
                               force: Boolean = false): Seq[Line] = {
    lazy val minBytes = statsSidecarMinBytes(spark)
    entries.map {
      case s @ StatsEntry(_, rows, cols, files, None) if files.nonEmpty =>
        val json = StatsJson.render(rows, cols, files)
        if (!force && json.length < minBytes) s
        else {
          val body = (json + "\n").getBytes("UTF-8")
          val hash = java.security.MessageDigest.getInstance("SHA-256")
            .digest(body).take(16).map("%02x".format(_)).mkString
          val (fs, root) = fsFor(spark, dir)
          val target = new Path(statsDirPath(root), s"$hash.stats")
          if (!fs.exists(target)) {
            fs.mkdirs(target.getParent)
            val tmp = new Path(target.getParent,
              s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
            val out = fs.create(tmp, false)
            try out.write(body) finally out.close()
            if (!fs.rename(tmp, target)) {
              fs.delete(tmp, false)
              require(fs.exists(target), s"stats sidecar rename to $target failed")
            }
          }
          s.copy(sidecar = Some(fs.makeQualified(target).toUri.getPath))
        }
      case other => other
    }
  }

  private def renderLine(l: Line): String = l match {
    case DataEntry(n)      => n
    case DvEntry(k, n)     => s"dv:$k:$n"
    case ScopedDvEntry(k, n, sc) => s"dvs:$k:$n:${sc.mkString(",")}"
    case PdvEntry(n)       => s"pdv:$n"
    case FeatureEntry(n, req) => s"feature:$n:${if (req) "required" else "optional"}"
    case SchemaEntry(s)    => s"schema:${s.json}"
    case TxnEntry(b, a)    => s"txn:$b:$a"
    case IngestEntry(p)    => s"ingest:$p"
    case PartitionEntry(cs) => s"partition:${cs.mkString(",")}"
    case ConstraintEntry(n, sql) => s"constraint:$n:$sql"
    case NotNullEntry(c)   => s"notnull:$c"
    case HwmEntry(c, n)    => s"hwm:$c:$n"
    case TsEntry(ms)       => s"ts:$ms"
    case PropEntry(k, v)   => s"prop:$k:$v"
    case RearrangeEntry()  => "rearrange:1"
    case ProtocolEntry(n)  => s"protocol:$n"
    case ColMapEntry(es)   => s"colmap:${es.map { case (l, p) => s"$l=$p" }.mkString(",")}"
    case BloomColEntry(c, bits) => s"bloomcol:$c:$bits"
    case BloomEntry(d, c, _, Some(ref)) => s"bloomref:$d:$c:$ref"
    case BloomEntry(d, c, fs, None) => s"bloom:$d:$c:" +
      fs.toSeq.sortBy(_._1).map { case (f, b) => s"$f=${Bloom.toBase64(b)}" }.mkString(",")
    case ChangesEntry(f, t, ks, n) => s"changes:$f:$t:${ks.mkString(",")}:$n"
    case StatsEntry(n, _, _, _, Some(ref)) => s"statsref:$n:$ref"
    case StatsEntry(n, r, c, f, None) => s"stats:$n:${StatsJson.render(r, c, f)}"
  }

  /** The recorded union schema of a version, if its manifest carries
    * one (every manifest committed by this code does; manifests from
    * the pre-schema format fall back to mergeSchema on read). */
  def recordedSchema(spark: SparkSession, dir: String, v: Int): Option[StructType] =
    lines(spark, dir, v).collectFirst { case SchemaEntry(s) => s }

  // ───────────── column mapping (rename without rewrite) ─────────────

  private def colMapOf(ls: Seq[Line]): Map[String, String] =
    ls.collectFirst { case ColMapEntry(es) => es.toMap }.getOrElse(Map.empty)

  /** The column mapping of a version: LOGICAL (user-facing) name →
    * PHYSICAL (in-file) name, renamed columns only. Empty for a table
    * that was never renamed (or whose last overwrite reset the
    * physical layout). */
  def columnMapping(spark: SparkSession, dir: String, v: Int): Map[String, String] =
    colMapOf(lines(spark, dir, v))

  /** The version's schema under its LOGICAL column names — what a
    * user of the table sees. [[recordedSchema]] stays the PHYSICAL
    * truth (it must keep matching the files and the footer stats). */
  def logicalSchema(spark: SparkSession, dir: String, v: Int): Option[StructType] = {
    val ls = lines(spark, dir, v)
    ls.collectFirst { case SchemaEntry(s) => toLogicalSchema(s, colMapOf(ls)) }
  }

  private[graft] def toLogicalSchema(s: StructType, m: Map[String, String]): StructType =
    if (m.isEmpty) s
    else {
      val inv = m.map(_.swap)
      StructType(s.fields.map(f => inv.get(f.name).map(l => f.copy(name = l)).getOrElse(f)))
    }

  private[graft] def toPhysicalSchema(s: StructType, m: Map[String, String]): StructType =
    if (m.isEmpty) s
    else StructType(s.fields.map(f => f.copy(name = m.getOrElse(f.name, f.name))))

  /** Final read-boundary projection: physical→logical. A pure rename
    * (one Project of aliases), so Catalyst pushes filters and prunes
    * columns straight through it down to the physical scan. */
  private def toLogicalDf(df: DataFrame, m: Map[String, String]): DataFrame =
    if (m.isEmpty) df
    else {
      val inv = m.map(_.swap)
      df.toDF(df.columns.map(c => inv.getOrElse(c, c)): _*)
    }

  /** Write-boundary translation: rename a LOGICAL-named DataFrame to
    * the chain's PHYSICAL column names before any byte lands. Refuses
    * a column whose (logical) name is OCCUPIED as another column's
    * physical storage name — appending it would silently serve its
    * values under the other column after the union-schema merge (the
    * re-add-after-rename collision Delta's id-mapping exists to
    * prevent; this store prevents it by refusal). */
  private[graft] def toPhysical(df: DataFrame, m: Map[String, String]): DataFrame = {
    if (m.isEmpty) return df
    val inv = m.map(_.swap)
    df.columns.foreach { c =>
      require(m.contains(c) || !inv.contains(c),
        s"column name '$c' is occupied as the physical storage name of logical column " +
          s"'${inv.getOrElse(c, c)}' — add it under a different name")
    }
    df.toDF(df.columns.map(c => m.getOrElse(c, c)): _*)
  }

  // ───────────── GENERATED columns (GENERATED ALWAYS AS (expr)) ─────────────

  /** The field-metadata key Spark's DDL uses for `GENERATED ALWAYS AS`
    * (GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY). Spark
    * validates the expression at CREATE time (deterministic, no
    * subqueries, references only non-generated columns) and stores it
    * here; the STORE owns the semantics — [[withGeneratedColumns]]
    * computes an omitted column at the df write seams, and every
    * commit validates value <=> expr like an implicit CHECK, so a
    * DSv2-staged rewrite can never silently diverge from the
    * declaration. */
  private[graft] val GenerationKey = "GENERATION_EXPRESSION"

  /** (field name in `schema`'s own name space, generation SQL) of
    * every generated column. The SQL text speaks LOGICAL names. */
  private[graft] def generatedColumnsOf(schema: StructType): Seq[(String, String)] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(GenerationKey) =>
        f.name -> f.metadata.getString(GenerationKey)
    }

  /** Spark's own field-metadata keys for `GENERATED … AS IDENTITY`
    * (IdentityColumn.IDENTITY_INFO_*): the parsed start/step/
    * explicit-insert policy rides the schema the manifest records,
    * exactly like GENERATION_EXPRESSION — the declaration IS schema. */
  private val IdStartKey = "identity.start"
  private val IdStepKey = "identity.step"
  private val IdAllowKey = "identity.allowExplicitInsert"

  private[graft] def identityMetadata(base: org.apache.spark.sql.types.Metadata,
                                      start: Long, step: Long,
                                      allowExplicitInsert: Boolean)
      : org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder().withMetadata(base)
      .putLong(IdStartKey, start).putLong(IdStepKey, step)
      .putBoolean(IdAllowKey, allowExplicitInsert).build()

  /** One declared identity column: field name in the schema's own
    * name space + the parsed spec. `GENERATED ALWAYS` refuses
    * explicit values at the df entry points; `BY DEFAULT` accepts
    * them (uniqueness among EXPLICIT values is the caller's contract,
    * as in Delta — the mark only guarantees generated values never
    * collide with anything already assigned or accepted). */
  private[graft] final case class IdentitySpec(col: String, start: Long, step: Long,
                                               allowExplicitInsert: Boolean)

  private[graft] def identityColumnsOf(schema: StructType): Seq[IdentitySpec] =
    schema.fields.toSeq.collect {
      case f if f.metadata.contains(IdStartKey) && f.metadata.contains(IdStepKey) =>
        IdentitySpec(f.name, f.metadata.getLong(IdStartKey),
          f.metadata.getLong(IdStepKey),
          f.metadata.contains(IdAllowKey) && f.metadata.getBoolean(IdAllowKey))
    }

  /** The shared df write-entry preparation, ONE manifest resolve for
    * both duties: fill OMITTED generated columns whose dependencies
    * the df carries (SQL inserts arrive complete and are validated
    * instead; a df also missing a DEPENDENCY leaves the column absent
    * — an append's union read serves null there, which the null-safe
    * validation accepts, and an overwrite retires the declaration),
    * then translate logical→physical when the write lands beside a
    * renamed chain's files. */
  private def prepareWrite(df: DataFrame, dir: String,
                           translate: Boolean): (DataFrame, Option[Int]) =
    latestVersion(df.sparkSession, dir).fold((df, Option.empty[Int])) { v =>
      val ls = lines(df.sparkSession, dir, v)
      val cmap = colMapOf(ls)
      val logical = ls.collectFirst { case SchemaEntry(s) => toLogicalSchema(s, cmap) }
      val filled = logical.fold(df) { s =>
        generatedColumnsOf(s)
          .filterNot { case (n, _) => df.columns.exists(_.equalsIgnoreCase(n)) }
          .filter { case (_, sql) => constraintRefCols(df.sparkSession, sql)
            .forall(r => df.columns.exists(_.equalsIgnoreCase(r))) }
          .foldLeft(df) { case (d, (n, sql)) =>
            d.withColumn(n, org.apache.spark.sql.functions.expr(sql)
              .cast(s(n).dataType))
          }
      }
      // GENERATED … AS IDENTITY: NULL values of an identity column
      // assign DISTRIBUTED — id = hwm + step · monotonically_
      // increasing_id() — zero extra jobs (no count pass, no global
      // sort; Delta's documented may-have-gaps contract,
      // deliberately: an exact per-partition offset pass would
      // recompute the whole input lineage once more, which at 100 TB
      // doubles the insert). NULL is the omission signal because it
      // is what Spark's own analyzer pads when a SQL INSERT lists
      // the other columns (the V1 seam never sees the column list);
      // a library df that omits the column entirely gets it added.
      // GENERATED ALWAYS refuses non-null explicit values IN the
      // assignment expression (raise_error fires inside the single
      // write pass — no validation job); BY DEFAULT keeps them.
      // Uniqueness against concurrent writers: the commit refuses
      // when its parent is not the version this assignment read
      // (identityBasis below), and the retry wrappers re-fill.
      var idBasis: Option[Int] = None
      val withIds = logical.fold(filled) { s =>
        identityColumnsOf(s).foldLeft(filled) { (d, spec) =>
          import org.apache.spark.sql.functions.{coalesce, concat, lit,
            monotonically_increasing_id, raise_error, when, col => fcol}
          val phys = cmap.getOrElse(spec.col, spec.col)
          val base = ls.collectFirst {
            case HwmEntry(c, n) if c.equalsIgnoreCase(phys) => n
          }.getOrElse(spec.start)
          val dt = s(spec.col).dataType
          val assignedRaw = lit(base) + lit(spec.step) * monotonically_increasing_id()
          // BIGINT casts are the identity (declarations refuse anything
          // narrower). A LEGACY chain that declared INT before the
          // refusal gets an in-pass range guard instead of a silent
          // mod-2³² wrap: partition p's offset is step·p·2³³, which any
          // non-zero p pushes out of the int range — the raise_error
          // fires inside the single write pass, no validation job
          val assigned =
            if (dt == org.apache.spark.sql.types.LongType) assignedRaw.cast(dt)
            else when(assignedRaw.between(Int.MinValue.toLong, Int.MaxValue.toLong),
                assignedRaw.cast(dt))
              .otherwise(raise_error(concat(
                lit(s"identity column '${spec.col}' is ${dt.simpleString} and the " +
                  "assigned value "),
                assignedRaw.cast("string"),
                lit(" leaves its range — the distributed assignment needs BIGINT; " +
                  "redeclare the column (Delta's identity contract)")))
                .cast(dt))
          idBasis = Some(v)
          if (!d.columns.exists(_.equalsIgnoreCase(spec.col)))
            d.withColumn(spec.col, assigned)
          else if (spec.allowExplicitInsert)
            d.withColumn(spec.col, coalesce(fcol(spec.col), assigned))
          else
            d.withColumn(spec.col, when(fcol(spec.col).isNotNull,
              raise_error(concat(
                lit(s"column '${spec.col}' is GENERATED ALWAYS AS IDENTITY — " +
                  "explicit values refuse (got "),
                fcol(spec.col).cast("string"),
                lit("); omit the column, or declare GENERATED BY DEFAULT")))
                .cast(dt))
              .otherwise(assigned))
        }
      }
      (if (translate) toPhysical(withIds, cmap) else withIds, idBasis)
    }

  /** Stats maps are keyed by PHYSICAL names (they come from parquet
    * footers); the explicit skipping APIs take filters in LOGICAL
    * names — rekey the stats (and rename the schema) instead of
    * rewriting every filter tree. */
  private def rekeyToLogical(cols: Map[String, ColStats],
                             m: Map[String, String]): Map[String, ColStats] =
    if (m.isEmpty) cols
    else {
      val inv = m.map(_.swap)
      cols.map { case (k, v) => inv.getOrElse(k, k) -> v }
    }

  /** `ALTER TABLE … RENAME COLUMN`'s role, WITHOUT a rewrite — the gap
    * Delta closes with column mapping: one METADATA-ONLY commit that
    * updates the logical→physical mapping; no data file, stats line,
    * deletion vector, or NOT NULL line changes (they all keep the
    * physical name). Time travel to a pre-rename version serves the
    * old name; an overwrite later resets the physical layout and
    * drops the mapping.
    *
    * Honest refusals: partition columns (the hive layout and the
    * partition index are keyed on the physical dir names), chains
    * whose manifests lack per-dir file lists (run backfill_stats
    * first — the serving tiers below assume the file-listed index),
    * columns a CHECK constraint reads (the stored predicate SQL is
    * logical text this commit cannot rewrite), and a target name that
    * already exists — as a logical column OR as another column's
    * physical storage name (the resurrect-collision guard). */
  def renameColumns(spark: SparkSession, dir: String,
                    renames: Seq[(String, String)],
                    protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    require(renames.nonEmpty, "no columns to rename")
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    val physical = ls.collectFirst { case SchemaEntry(s) => s }.getOrElse(
      throw new IllegalArgumentException(
        s"cannot rename columns of a pre-schema manifest at $dir — commit once to record the schema"))
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val dataDirs = ls.collect { case DataEntry(n) => n }
    require(dataDirs.forall(n => stats.get(n).exists(_.files.nonEmpty)),
      s"cannot rename columns at $dir: manifest lacks per-dir file lists — " +
        "run backfillStats (CALL system.backfill_stats) to upgrade the chain first")
    val prior = colMapOf(ls)
    val logical = toLogicalSchema(physical, prior)
    var m = prior
    // CHECK constraints and GENERATION expressions FOLLOW the rename
    // (Delta's behavior): their stored SQL is LOGICAL text, rewritten
    // through the mapping in the same metadata-only commit
    var constraints = ls.collect { case c: ConstraintEntry => c }
    val rewrittenConstraints = scala.collection.mutable.LinkedHashSet.empty[String]
    var physSchema = physical
    var genRewritten = false
    renames.foreach { case (from, to) =>
      require(to.nonEmpty && !to.exists(c => c == ',' || c == '=' || c == ':' ||
          c == '\n' || c == '\r'),
        s"new column name '$to' must not contain , = : or line breaks " +
          "(it is embedded in the line-based manifest)")
      val logicalNow = toLogicalSchema(physical, m)
      val resolved = logicalNow.fieldNames.find(_.equalsIgnoreCase(from)).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$from' in ${logicalNow.fieldNames.mkString(",")}"))
      // DATA columns of a partitioned chain rename fine (the hive
      // layout never encodes them); a PARTITION column's physical name
      // is baked into every `col=value` path segment and the partition
      // index — that one still refuses
      require(!partCols.exists(_.equalsIgnoreCase(resolved)),
        s"cannot rename PARTITION column '$resolved' — its physical name is the " +
          "hive directory layout itself; rewrite instead (REPLACE TABLE … AS SELECT)")
      require(!logicalNow.fieldNames.exists(_.equalsIgnoreCase(to)),
        s"column '$to' already exists")
      require(!physical.fieldNames.exists(n => n.equalsIgnoreCase(to) &&
          !n.equalsIgnoreCase(m.getOrElse(resolved, resolved))),
        s"'$to' is the physical storage name of another column — pick a different name")
      constraints = constraints.map { case c @ ConstraintEntry(cn, sql) =>
        if (constraintRefCols(spark, sql).contains(resolved.toLowerCase)) {
          rewrittenConstraints += cn
          ConstraintEntry(cn, renameInConstraintSql(spark, sql, resolved, to))
        } else c
      }
      physSchema = StructType(physSchema.fields.map { f =>
        if (f.metadata.contains(GenerationKey) &&
            constraintRefCols(spark, f.metadata.getString(GenerationKey))
              .contains(resolved.toLowerCase)) {
          genRewritten = true
          f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(GenerationKey, renameInConstraintSql(spark,
              f.metadata.getString(GenerationKey), resolved, to))
            .build())
        } else f
      })
      val phys = m.getOrElse(resolved, resolved)
      // the PHYSICAL name embeds in the comma-delimited colmap line
      // too (the files legally carry names the logical validation
      // above never saw — Spark 4 parquet writes columns named
      // 'a:b'): a comma or line break would commit a line the parser
      // refuses, bricking the table, and the parse-side entry trim
      // would mangle edge whitespace — refuse, never corrupt, the
      // same guard deleteByKeysCore applies to translated dv keys
      require(!phys.exists(c => c == ',' || c == '\n' || c == '\r') && phys == phys.trim,
        s"the physical storage name '$phys' of '$from' cannot be column-mapped — " +
          "it would corrupt the comma-delimited manifest line; rewrite the column " +
          "(REPLACE TABLE … AS SELECT) to a plain name instead")
      m = (m - resolved) ++ (if (to == phys) Map.empty[String, String] else Map(to -> phys))
    }
    val v = prev + 1
    val constraintByName = constraints.map(c => c.name -> c).toMap
    val (newLines0, ops0) =
      if (m.isEmpty) (ls.filterNot(_.isInstanceOf[ColMapEntry]), Seq("-colmap"))
      else {
        val cm = ColMapEntry(m.toSeq.sortBy(_._1))
        (ls.filterNot(_.isInstanceOf[ColMapEntry]) :+ cm, Seq(addOp(cm)))
      }
    val newLines = newLines0.map {
      case c: ConstraintEntry => constraintByName(c.name)
      case s: SchemaEntry if genRewritten => SchemaEntry(physSchema)
      case other => other
    }
    val ops = ops0 ++
      constraints.filter(c => rewrittenConstraints.contains(c.name)).map(addOp) ++
      (if (genRewritten) Seq(addOp(SchemaEntry(physSchema))) else Seq.empty)
    commitChild(spark, dir, v, prev, newLines, ops, protocol)
    v
  }

  // ───────────── bloom-filter file skipping (see [[Bloom]]) ─────────────

  /** Declare the table's bloom-indexed point-lookup column and
    * backfill a per-file bloom for every live dir (the only time the
    * index reads old data — one column-pruned scan per batch; every
    * later commit builds its own dir's blooms at write time,
    * O(delta)). Integral/string DATA columns only — a PARTITION
    * column's values already prune from manifest bytes; partitioned
    * chains declare on a data column and the bloom prunes files
    * WITHIN the surviving partitions (the needle-in-100-TB lookup on
    * a non-partition key).
    *
    * The backfill is CHUNKED: dirs group into batches of at most
    * `spark.graft.bloom.backfillFilesPerCommit` recorded files
    * (default 10 000), each batch one scan job + one commit — the
    * driver holds one batch of bitsets at a time (~312 MiB at the
    * default 32 KiB blob), never one per live file of a 10⁶-file
    * table. The DECLARATION rides the first commit, so every file is
    * served correctly throughout (a file whose batch has not landed
    * simply has no bloom yet — the one-sided contract reads it), and
    * a write racing between batches builds its own blooms at commit
    * time as usual. Returns the final committed version. */
  def declareBloomColumn(spark: SparkSession, dir: String, col: String,
                         bits: Int = Bloom.defaultBits,
                         protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    require(bits >= 64 && bits % 8 == 0,
      s"bloom bits must be a positive multiple of 8, got $bits")
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    val physical = ls.collectFirst { case SchemaEntry(s) => s }.getOrElse(
      throw new IllegalArgumentException(s"no recorded schema at $dir"))
    val cmap = colMapOf(ls)
    val logical = toLogicalSchema(physical, cmap)
    val resolved = logical.fieldNames.find(_.equalsIgnoreCase(col)).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$col' in ${logical.fieldNames.mkString(",")}"))
    val phys = cmap.getOrElse(resolved, resolved)
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    require(!partCols.exists(_.equalsIgnoreCase(phys)),
      s"'$resolved' is a PARTITION column — its values prune from manifest bytes " +
        "already; declare the bloom on a data column")
    require(Bloom.supportedType(physical(phys).dataType),
      s"bloom columns are integral or string; '$resolved' is ${physical(phys).dataType}")
    // the PHYSICAL name embeds in the ':'-delimited bloomcol/bloom
    // lines — refuse what the format cannot carry (the dv-key guard's
    // sibling), never commit a manifest that fails to parse back
    require(!phys.exists(c => c == ':' || c == ',' || c == '\n' || c == '\r') &&
        phys == phys.trim,
      s"the physical storage name '$phys' of '$resolved' cannot carry a bloom " +
        "declaration (it is embedded in the line-based manifest); rewrite the " +
        "column (REPLACE TABLE … AS SELECT) to a plain name first")
    val decl = BloomColEntry(phys, bits)
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val liveDirs = ls.collect { case DataEntry(n) => n }
    // the per-commit cap bounds the DRIVER-transient bitset pull, so
    // its default derives from BYTES, not a file count — a bare file
    // cap would silently scale the pull with `bits` (10⁴ files is
    // 320 MB at the default 32 KiB blob but 2.5 GB at 2²¹ bits). An
    // explicit backfillFilesPerCommit still wins; the 2¹⁶ file
    // ceiling bounds the name-list side when blobs are tiny.
    val batchLimit = math.max(1,
      spark.conf.getOption("spark.graft.bloom.backfillFilesPerCommit")
        .map(_.toInt).getOrElse {
          val bytesCap = spark.conf.getOption("spark.graft.bloom.backfillBytesPerCommit")
            .map(_.toLong).getOrElse(256L * 1024 * 1024)
          math.min(1L << 16, math.max(1L, bytesCap / (bits / 8))).toInt
        })
    def weight(n: String) = stats.get(n).map(_.files.length).getOrElse(batchLimit)
    val batches = liveDirs.foldLeft(Vector.empty[(Vector[String], Int)]) {
      case (acc, n) =>
        val w = weight(n)
        acc.lastOption match {
          case Some((b, bw)) if bw + w <= batchLimit =>
            acc.init :+ (b :+ n, bw + w)
          case _ => acc :+ (Vector(n), w)
        }
    }.map(_._1)
    def buildEntries(batch: Seq[String]): Seq[Line] = {
      val built = Bloom.buildBlooms(spark,
        batch.map(n => n -> new Path(new Path(dir), n).toString),
        physical, phys, bits)
      externalizeBlooms(spark, dir,
        batch.map(n => BloomEntry(n, phys, built.getOrElse(n, Map.empty))))
    }
    // first commit: the declaration + the first batch (an empty table
    // commits the declaration alone). The ops START by retiring any
    // prior declaration OF THIS COLUMN and its old blobs (a stale
    // bitset left live would answer the new build's lookups with
    // false negatives); OTHER declared columns' declarations and
    // blooms stay untouched — bloom indexes are per-column, and a
    // table may declare several (Delta's per-column bloom indexes).
    val first: Seq[Line] = decl +: batches.headOption.map(buildEntries).getOrElse(Seq.empty)
    def notThisCol(l: Line): Boolean = l match {
      case e: BloomColEntry => !e.col.equalsIgnoreCase(phys)
      case e: BloomEntry    => !e.col.equalsIgnoreCase(phys)
      case _ => true
    }
    var v = prev + 1
    commitChild(spark, dir, v, prev,
      ls.filter(notThisCol) ++ first,
      s"-bloomcol:$phys" +: first.map(addOp), protocol)
    // remaining batches: one bounded build + commit each; each commit
    // is a child of the CURRENT latest, so a concurrent append between
    // batches keeps its own (write-time) blooms
    batches.drop(1).foreach { batch =>
      val entries = buildEntries(batch)
      val base = latestVersion(spark, dir).get
      val cur = lines(spark, dir, base)
      val names = batch.toSet
      commitChild(spark, dir, base + 1, base,
        cur.filterNot { case b: BloomEntry =>
          names.contains(b.dir) && b.col.equalsIgnoreCase(phys); case _ => false } ++
          entries,
        entries.map(addOp), protocol)
      v = base + 1
    }
    v
  }

  /** Drop a bloom declaration (and its blobs) — metadata-only.
    * `col = None` drops EVERY declared column (the original
    * whole-index undeclare); a named column drops only its own
    * declaration and blooms, other columns stay live. */
  def dropBloomColumn(spark: SparkSession, dir: String,
                      col: Option[String] = None,
                      protocol: CommitProtocol = PutIfAbsentCommit): Option[Int] = {
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    val phys = col.map { c =>
      val cmap = colMapOf(ls)
      cmap.getOrElse(
        cmap.keys.find(_.equalsIgnoreCase(c)).getOrElse(c), c)
    }
    val victim: Line => Boolean = phys match {
      case None => l => l.isInstanceOf[BloomColEntry] || l.isInstanceOf[BloomEntry]
      case Some(p) => {
        case e: BloomColEntry => e.col.equalsIgnoreCase(p)
        case e: BloomEntry    => e.col.equalsIgnoreCase(p)
        case _ => false
      }
    }
    if (!ls.exists { case e: BloomColEntry => victim(e); case _ => false }) None
    else {
      val v = prev + 1
      commitChild(spark, dir, v, prev,
        ls.filterNot(victim),
        Seq(phys.fold("-bloomcol")(p => s"-bloomcol:$p")), protocol)
      Some(v)
    }
  }

  /** The FIRST declared bloom column (LOGICAL name) and its per-file
    * bits — kept for single-index observers; see [[bloomColumns]]. */
  def bloomColumn(spark: SparkSession, dir: String, v: Int): Option[(String, Int)] =
    bloomColumns(spark, dir, v).headOption

  /** Every declared bloom column (LOGICAL names) with its per-file
    * bits, in manifest order. */
  def bloomColumns(spark: SparkSession, dir: String, v: Int): Seq[(String, Int)] = {
    val ls = lines(spark, dir, v)
    val inv = colMapOf(ls).map(_.swap)
    ls.collect { case BloomColEntry(c, bits) => (inv.getOrElse(c, c), bits) }
  }

  // ───────────── shallow CLONE (zero-copy table fork) ─────────────

  /** Delta `CREATE TABLE … SHALLOW CLONE src`'s role: create `targetDir`
    * as a NEW chain whose v0 manifest references the SOURCE version's
    * data (and deletion-vector, and bloom) state by ABSOLUTE path — no
    * byte of data copies. The clone then lives its own life: appends
    * land local dirs beside the foreign refs, copy-on-write rewrites
    * replace foreign files at manifest granularity (the source's bytes
    * are never touched), and the clone's own retention reclaims ONLY
    * local dirs — [[pruneVersions]] deletes from a listing of the
    * clone's root, where a foreign ref never appears.
    *
    * The inherited Delta caveat, verbatim: the SOURCE owns the shared
    * files. VACUUM/prune/DROP on the source reclaims data a clone
    * still references — run the clone's own OPTIMIZE (compact) to
    * localize it first if the source's lifecycle is shorter.
    *
    * Honest bounds: source and target must share one filesystem
    * namespace, addressed by COLON-FREE absolute paths (the line-based
    * manifest splits several line kinds on ':'; within one default
    * filesystem — HDFS or an object store alike — scheme-free absolute
    * paths are the normal form). SQL-DELETE scoped masks group by dir
    * NAME, which a foreign ref cannot carry — apply them physically
    * (overwrite/compact) before cloning. Writer txn watermarks and
    * recorded change feeds do not clone (they speak the source's
    * writer ids and version numbers). */
  def cloneTable(spark: SparkSession, sourceDir: String, targetDir: String,
                 version: Option[Int] = None,
                 protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    val srcV = version.getOrElse(latestVersion(spark, sourceDir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $sourceDir")))
    require(versions(spark, sourceDir).contains(srcV),
      s"no version $srcV at $sourceDir")
    require(latestVersion(spark, targetDir).isEmpty,
      s"target $targetDir already exists — DROP it, or clone elsewhere")
    val (srcFs, srcRoot) = fsFor(spark, sourceDir)
    val (tgtFs, _) = fsFor(spark, targetDir)
    // the one-namespace bound is ENFORCED, not just documented: a
    // cross-filesystem ref would strip its scheme/authority and
    // silently resolve inside the target's filesystem
    require(srcFs.getUri == tgtFs.getUri,
      s"clone source and target must share one filesystem namespace; " +
        s"got ${srcFs.getUri} vs ${tgtFs.getUri}")
    val rootAbs = srcFs.makeQualified(srcRoot).toUri.getPath
    require(!rootAbs.contains(":") && !rootAbs.contains(","),
      s"clone sources are addressed by colon/comma-free absolute paths within one " +
        s"filesystem namespace; got '$rootAbs'")
    val ls = lines(spark, sourceDir, srcV)
    require(!ls.exists(_.isInstanceOf[ScopedDvEntry]),
      s"$sourceDir@v$srcV carries SQL-DELETE scoped masks, which group by local dir " +
        "name — apply them physically (INSERT OVERWRITE the read, or compact) first")
    require(!ls.exists(_.isInstanceOf[PdvEntry]),
      s"$sourceDir@v$srcV carries positional deletion vectors, whose file refs are " +
        "root-relative — apply them physically (INSERT OVERWRITE the read, or " +
        "compact) first, or deep clone")
    def abs(n: String) =
      if (n.startsWith("/")) n else s"${rootAbs.stripSuffix("/")}/$n"
    // stats sidecars COPY into the clone (KB-scale metadata, one small
    // file per large dir): the file lists are load-bearing, so leaving
    // them as refs into the source's tree would extend the shallow-
    // clone caveat from "skipping degrades" (blooms) to "reads refuse"
    // the moment the source prunes. Content-addressed names make the
    // copy idempotent and collision-free.
    val (tgtFs2, tgtRoot) = fsFor(spark, targetDir)
    val tgtStatsDir = statsDirPath(tgtRoot)
    def localizeStats(s: StatsEntry): StatsEntry = s.sidecar match {
      case None => s.copy(name = abs(s.name))
      case Some(ref) =>
        val target = new Path(tgtStatsDir, new Path(ref).getName)
        if (!tgtFs2.exists(target)) {
          tgtFs2.mkdirs(tgtStatsDir)
          org.apache.hadoop.fs.FileUtil.copy(srcFs, new Path(ref), tgtFs2, target,
            false, true, spark.sparkContext.hadoopConfiguration)
        }
        s.copy(name = abs(s.name),
          sidecar = Some(tgtFs2.makeQualified(target).toUri.getPath))
    }
    val cloned: Seq[Line] = ls.flatMap {
      case DataEntry(n)      => Some(DataEntry(abs(n)))
      case s: StatsEntry     => Some(localizeStats(s))
      case DvEntry(k, n)     => Some(DvEntry(k, abs(n)))
      case b: BloomEntry     => Some(b.copy(dir = abs(b.dir)))
      case _: TxnEntry       => None // the source's writers' replay guards
      case _: ChangesEntry   => None // speaks the source's version numbers
      case other             => Some(other) // schema/partition/colmap/notnull/constraint/bloomcol
    }
    commitManifest(spark, targetDir, 0, cloned.map(renderLine), protocol)
    0
  }

  /** Delta `CREATE TABLE … DEEP CLONE src`'s role: a FULLY INDEPENDENT
    * fork — every referenced byte (data files, deletion vectors, bloom
    * sidecars) COPIES into the target, which then shares nothing with
    * the source: vacuum, prune, or DROP the source and the clone
    * serves on. This retires the shallow clone's documented caveat
    * (the source owns a shallow ref's files and its prune may reclaim
    * them) at the price of the copy.
    *
    * The copy is a SPARK JOB — the file list comes from the manifest
    * (per-file stats lists; dirs without one fall back to a driver
    * listing), and tasks stream each file src→dst, so cloning a
    * 100 TB table is cluster-wide IO, not a driver loop. Because
    * bytes move through streams (not manifest refs), deep clone also
    * lifts two shallow-clone restrictions: the target may live on a
    * DIFFERENT filesystem namespace (the migration story), and
    * SQL-DELETE scoped masks clone fine — local dir names are
    * preserved, so their scopes stay valid; masks apply in the clone
    * exactly as in the source. Absolute refs (a shallow-cloned or
    * converted source) localize under deterministic names, every
    * keyed line (stats, dv, scoped-dv scopes, blooms) rewritten
    * through the same map.
    *
    * Carried: schema, partition spec, stats (file names unchanged —
    * skipping works immediately), constraints, NOT NULL, column
    * mapping, identity marks, bloom declaration + blobs/sidecars.
    * Dropped like the shallow clone: txn watermarks and recorded
    * change feeds (they speak the source's writer ids and version
    * numbers). The clone starts its OWN history at version 0 with a
    * fresh in-commit timestamp. */
  /** (bytesCopied, filesSkipped) of the LAST deep-clone copy job in
    * this JVM — a test seam for the resume contract, not an API. */
  @volatile private[graft] var lastDeepCloneCounts: (Long, Long) = (0L, 0L)

  def cloneTableDeep(spark: SparkSession, sourceDir: String, targetDir: String,
                     version: Option[Int] = None,
                     protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    val srcV = version.getOrElse(latestVersion(spark, sourceDir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $sourceDir")))
    require(versions(spark, sourceDir).contains(srcV),
      s"no version $srcV at $sourceDir")
    require(latestVersion(spark, targetDir).isEmpty,
      s"target $targetDir already exists — DROP it, or clone elsewhere")
    val (srcFs, srcRoot) = fsFor(spark, sourceDir)
    val (tgtFs, tgtRoot) = fsFor(spark, targetDir)
    val rootAbs = srcFs.makeQualified(srcRoot).toString
    val tgtAbs = tgtFs.makeQualified(tgtRoot).toString
    val ls = lines(spark, sourceDir, srcV)
    def abs(n: String) =
      if (n.startsWith("/")) srcFs.makeQualified(new Path(n)).toString
      else s"${rootAbs.stripSuffix("/")}/$n"

    // every referenced dir localizes: local names keep themselves
    // (scoped-dv scopes reference them), absolute refs get a
    // deterministic content-addressed local name
    val dirRefs = (ls.collect { case DataEntry(n) => n } ++
      ls.collect { case DvEntry(_, n) => n } ++
      ls.collect { case ScopedDvEntry(_, n, _) => n } ++
      ls.collect { case PdvEntry(n) => n }).distinct
    // a positional dv's `_file` refs survive the deep clone only
    // because LOCAL dir names map to themselves; an adopted/absolute
    // data ref renames, which would orphan any position pointing into
    // it — refuse that (rare) combination with the same remedy as the
    // shallow clone
    require(!ls.exists(_.isInstanceOf[PdvEntry]) ||
        ls.collect { case DataEntry(n) => n }.forall(!_.startsWith("/")),
      s"$sourceDir@v$srcV carries positional deletion vectors over adopted " +
        "(absolute-ref) data dirs, which the deep clone renames — apply the masks " +
        "physically (INSERT OVERWRITE the read, or compact) first")
    def md8(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val nameMap: Map[String, String] = dirRefs.map { r =>
      r -> (if (r.startsWith("/")) s"v00000000_adopted_${md8(r)}" else r)
    }.toMap
    // rewritten refs keep the store's scheme-free absolute-path form
    // (`toUri.getPath`, what externalizeBlooms writes): pruneVersions'
    // sidecar reclaim compares refs in exactly that spelling — a
    // scheme-qualified ref would never match and the copied sidecar
    // would age out as garbage. Scheme-free refs resolve on the
    // DEFAULT filesystem only, so a cross-namespace target INLINES
    // the blobs instead (they are already parsed in memory; the
    // clone's own next declare/backfill re-externalizes if heavy).
    val refsRoundTrip = tgtFs.getUri ==
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration).getUri
    val tgtPathAbs = tgtFs.makeQualified(tgtRoot).toUri.getPath
    val sidecarRefs =
      if (!refsRoundTrip) Seq.empty
      else ls.collect { case BloomEntry(_, _, _, Some(ref)) => ref }.distinct
    val sidecarMap: Map[String, String] = sidecarRefs.map { ref =>
      ref -> s"${tgtPathAbs.stripSuffix("/")}/$VDIR/blooms/${new Path(ref).getName}"
    }.toMap
    // stats sidecars copy the same way (same-namespace targets); a
    // cross-namespace target re-externalizes them INTO the target
    // below instead — the file lists are load-bearing and must never
    // stay refs into the source's tree on a deep clone
    val statsRefs =
      if (!refsRoundTrip) Seq.empty
      else ls.collect { case StatsEntry(_, _, _, _, Some(ref)) => ref }.distinct
    val statsMap: Map[String, String] = statsRefs.map { ref =>
      ref -> s"${tgtPathAbs.stripSuffix("/")}/$VDIR/stats/${new Path(ref).getName}"
    }.toMap

    // the copy list: (src file, dst file) — manifest-served for
    // stats-listed data dirs (zero listing), driver-listed for dv
    // dirs and pre-file-list dirs (small / legacy)
    val stats = ls.collect { case s: StatsEntry => s.name -> s }.toMap
    val copies = scala.collection.mutable.ArrayBuffer[(String, String)]()
    dirRefs.foreach { ref =>
      val srcDir = abs(ref)
      val dstDir = s"${tgtAbs.stripSuffix("/")}/${nameMap(ref)}"
      stats.get(ref).filter(_.files.nonEmpty) match {
        case Some(st) =>
          st.files.foreach(f => copies += ((s"$srcDir/${f.name}", s"$dstDir/${f.name}")))
        case None =>
          val srcDirPath = new Path(srcDir)
          val base = srcFs.makeQualified(srcDirPath).toString.stripSuffix("/") + "/"
          val it = srcFs.listFiles(srcDirPath, true)
          while (it.hasNext) {
            val st = it.next()
            val full = st.getPath.toString
            require(full.startsWith(base), s"listing escaped $base: $full")
            copies += ((full, s"$dstDir/${full.stripPrefix(base)}"))
          }
      }
    }
    sidecarRefs.foreach(ref => copies += ((ref, sidecarMap(ref))))
    statsRefs.foreach(ref => copies += ((ref, statsMap(ref))))

    // distributed copy: tasks stream each file; cross-namespace is
    // fine (both ends resolve their own filesystem from the conf).
    // RESUMABLE: the commit lands only after every byte, so a crashed
    // 100 TB clone leaves files but no manifest — the re-run must not
    // start from zero. Each task skips a destination that already
    // exists with the SOURCE's length (source files are immutable and
    // content moves whole-file, so equal length = completed copy; a
    // crashed partial is shorter and re-copies with overwrite). The
    // skip check is a per-file metadata call INSIDE the task —
    // distributed, never a driver loop.
    if (copies.nonEmpty) {
      val sc = spark.sparkContext
      val bc = sc.broadcast(new Skipping.SerConf(sc.hadoopConfiguration))
      val copied = sc.longAccumulator("graft.deepClone.bytesCopied")
      val skipped = sc.longAccumulator("graft.deepClone.filesSkipped")
      val slices = math.max(1, math.min(copies.length, sc.defaultParallelism * 4))
      val prev = sc.getLocalProperty("spark.job.description")
      sc.setJobDescription(s"graft: deep clone copy (${copies.length} files)")
      try {
        sc.parallelize(copies.toSeq, slices).foreach { case (s, d) =>
          val conf = bc.value.value
          val sp = new Path(s)
          val dp = new Path(d)
          val sfs = sp.getFileSystem(conf)
          val dfs = dp.getFileSystem(conf)
          val srcLen = sfs.getFileStatus(sp).getLen
          val done =
            try dfs.getFileStatus(dp).getLen == srcLen
            catch { case _: java.io.FileNotFoundException => false }
          if (done) skipped.add(1L)
          else {
            if (!org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp,
                false, true, conf))
              throw new java.io.IOException(s"deep clone copy failed: $s -> $d")
            copied.add(srcLen)
          }
        }
        if (skipped.value > 0)
          log.info(s"deep clone $sourceDir -> $targetDir resumed: " +
            s"${skipped.value} of ${copies.length} files were already complete; " +
            s"${copied.value} bytes copied this run")
        lastDeepCloneCounts = (copied.value, skipped.value)
      } finally {
        sc.setJobDescription(prev)
        bc.destroy()
      }
    }

    val cloned: Seq[Line] = ls.flatMap {
      case DataEntry(n)       => Some(DataEntry(nameMap(n)))
      case s: StatsEntry      =>
        val renamed = s.copy(name = nameMap.getOrElse(s.name, s.name))
        Some(
          if (refsRoundTrip) renamed.copy(sidecar = renamed.sidecar.map(statsMap))
          else externalizeStats(spark, targetDir,
            Seq(renamed.copy(sidecar = None))).head.asInstanceOf[StatsEntry])
      case DvEntry(k, n)      => Some(DvEntry(k, nameMap(n)))
      case ScopedDvEntry(k, n, sc0) =>
        Some(ScopedDvEntry(k, nameMap(n), sc0.map(x => nameMap.getOrElse(x, x))))
      case PdvEntry(n)        => Some(PdvEntry(nameMap(n)))
      case b: BloomEntry      => Some(b.copy(dir = nameMap.getOrElse(b.dir, b.dir),
        sidecar = if (refsRoundTrip) b.sidecar.map(sidecarMap) else None))
      case _: TxnEntry        => None // the source's writers' replay guards
      case _: ChangesEntry    => None // speaks the source's version numbers
      case other              => Some(other)
    }
    commitManifest(spark, targetDir, 0, cloned.map(renderLine), protocol)
    0
  }

  // ───────────── CONVERT in place (adopt plain parquet) ─────────────

  /** Delta `CONVERT TO DELTA`'s role: adopt an existing PLAIN parquet
    * directory as version 0 of a versioned chain IN PLACE — one footer
    * harvest (the stats/skipping upgrade every migration wants anyway)
    * plus one manifest commit; zero bytes move. The v0 manifest
    * references the directory by ABSOLUTE path exactly like a shallow
    * [[cloneTable]] ref, so every later operation — appends, CoW
    * rewrites, deletes, OPTIMIZE, time travel — works unchanged: new
    * versions land nonce'd dirs BESIDE the adopted files, and
    * [[pruneVersions]] (which reclaims only `v########_*` children)
    * can never touch the originals. The flip side, documented like the
    * clone caveat: once an overwrite or compaction retires the adopted
    * files from every kept version, prune does NOT reclaim them —
    * delete the originals by hand when the pre-convert layout is no
    * longer wanted.
    *
    * A hive-partitioned directory converts by declaring its partition
    * columns (their types come from Spark's own inference and must be
    * hive-path-exact); the per-file stats then record each file's
    * partition values and the partitioned manifest index serves
    * PartitionFilters pruning immediately. Refusals, never surprises:
    * an already-versioned dir, hive `col=value` segments without the
    * declaration (the union read would null-fill the partition
    * columns), and parquet inside HIDDEN subtrees (a crashed writer's
    * `_temporary` leftovers would silently join the table — clean
    * first). */
  def convertParquetDir(spark: SparkSession, dir: String,
                        partCols: Seq[String] = Seq.empty,
                        protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    val (fs, root) = fsFor(spark, dir)
    require(fs.exists(root), s"no directory at $dir")
    require(latestVersion(spark, dir).isEmpty,
      s"$dir is already a versioned chain — CONVERT adopts plain parquet only")
    val rootAbs = fs.makeQualified(root).toUri.getPath
    require(!rootAbs.contains(":") && !rootAbs.contains(","),
      s"converted tables are addressed by colon/comma-free absolute paths " +
        s"(the line-based manifest embeds them); got '$rootAbs'")
    val hiddenHits = scala.collection.mutable.ArrayBuffer.empty[String]
    var anyParquet = false
    var anyHiveSegment = false
    var anyNested = false
    def walk(p: Path, hidden: Boolean, depth: Int): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        val h = hidden || n.startsWith("_") || n.startsWith(".")
        if (st.isDirectory) {
          if (n.contains('=') && !h) anyHiveSegment = true
          walk(st.getPath, h, depth + 1)
        } else if (n.endsWith(".parquet")) {
          if (h) hiddenHits += st.getPath.toString
          else { anyParquet = true; if (depth > 0) anyNested = true }
        }
      }
    walk(root, hidden = false, depth = 0)
    require(hiddenHits.isEmpty,
      s"$dir holds parquet inside hidden staging subtrees (${hiddenHits.head}, " +
        s"${hiddenHits.length} total) — a reader must never see a crashed " +
        "writer's leftovers; clean them first")
    require(anyParquet, s"no parquet files under $dir — nothing to convert")
    require(partCols.nonEmpty || !anyHiveSegment,
      s"$dir is hive-partitioned (col=value subdirs) — declare the partition " +
        "columns, or the union read would null-fill them")
    // nested NON-hive parquet would silently miss the flat footer
    // harvest (top-level listing): the committed stats would claim 0
    // of those rows and value-predicate reads would prune dirs that
    // hold data. Refuse; a flat parquet table has flat files.
    require(partCols.nonEmpty || !anyNested,
      s"$dir holds parquet in NESTED subdirectories without a hive layout — " +
        "CONVERT adopts flat or hive-partitioned tables only; flatten or " +
        "declare the partition columns")
    val inferred = asNullable(spark.read.parquet(dir).schema)
    partCols.foreach { c =>
      require(inferred.fieldNames.contains(c),
        s"partition column '$c' not in inferred schema ${inferred.fieldNames.mkString(",")}")
      require(Skipping.partitionableType(inferred(c).dataType),
        s"partition column '$c' has type ${inferred(c).dataType} — hive-path-exact " +
          "types only (string/int/long/short/byte/date/boolean)")
    }
    // recorded read order: data columns first, partition columns last
    val schema = StructType(
      inferred.fields.filterNot(f => partCols.contains(f.name)) ++
        partCols.map(c => inferred(c)))
    val (rows, cols, files) =
      if (partCols.isEmpty) Skipping.collectDirStats(spark, root, schema)
      else Skipping.collectDirStatsPartitioned(spark, root, schema,
        StructType(partCols.map(c => schema(c))))
    val v0: Seq[Line] = Seq(SchemaEntry(schema)) ++
      (if (partCols.nonEmpty) Seq(PartitionEntry(partCols)) else Seq.empty) ++
      (DataEntry(rootAbs) +:
        externalizeStats(spark, dir, Seq(StatsEntry(rootAbs, rows, cols, files))))
    commitManifest(spark, dir, 0, v0.map(renderLine), protocol)
    0
  }

  /** Delta `COPY INTO`'s role: idempotent file ingestion into an
    * EXISTING versioned table. Lists the source's data files (hidden
    * subtrees skipped, extension matched to `format`), skips every
    * path already in the table's ingest ledger (`ingest:` lines),
    * reads EXACTLY the fresh files, aligns them to the target's
    * logical schema BY NAME with store-assignment casts (a source
    * column the target lacks refuses; omitted target columns fall to
    * the identity/default fill and the NOT NULL gate), and commits
    * ONE append whose manifest atomically records the loaded paths —
    * so a crashed or re-run ingestion never double-loads a file, with
    * no sink-side state beyond the manifest itself. The ledger rides
    * overwrites like txn watermarks (maintenance never re-opens the
    * window), resets with REPLACE TABLE, and is retired explicitly by
    * [[forgetIngestHistory]]. The first ingest stamps the `ingest`
    * protocol feature (optional: readers without it still serve the
    * data correctly).
    *
    * Scale shape: the listing is one recursive enumeration of the
    * SOURCE (the same O(source files) every engine pays), the
    * skip-set check is set arithmetic on the driver, and the read is
    * a plain distributed scan of only the fresh files. The ledger
    * grows O(total ingested files) in the manifest — the checkpoint
    * spill bounds the recurring blob, and [[forgetIngestHistory]] is
    * the retention valve once a source prefix is retired.
    *
    * Returns (filesLoaded, rowsLoaded, version); None when every
    * listed file is already ingested. */
  def copyInto(spark: SparkSession, dir: String, source: String,
               format: String = "parquet",
               schema: Option[StructType] = None,
               options: Map[String, String] = Map.empty,
               protocol: CommitProtocol = PutIfAbsentCommit,
               maxAttempts: Int = 16): Option[(Int, Long, Int)] = {
    val fmt = format.trim.toLowerCase(java.util.Locale.ROOT)
    val exts = fmt match {
      case "parquet" => Seq(".parquet")
      case "json"    => Seq(".json", ".jsonl", ".json.gz")
      case "csv"     => Seq(".csv", ".csv.gz", ".tsv")
      case other => throw new IllegalArgumentException(
        s"copyInto supports parquet/json/csv, got '$other'")
    }
    val (srcFs, srcRoot) = fsFor(spark, source)
    require(srcFs.exists(srcRoot), s"no source directory at $source")
    val found = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: Path): Unit = srcFs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        if (st.isDirectory) walk(st.getPath)
        else if (exts.exists(n.endsWith)) {
          val spelled = uriPathOf(srcFs.makeQualified(st.getPath).toString)
          require(!spelled.contains("\n") && !spelled.contains("\r"),
            s"source file path embeds a newline — the line-based ledger cannot " +
              s"record it: $spelled")
          found += spelled
        }
      }
    }
    walk(srcRoot)
    if (found.isEmpty) return None
    withCommitRetry(maxAttempts) { () =>
      val prev = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(
          s"COPY INTO needs an existing table at $dir — CREATE it first " +
            "(the target schema governs the alignment)"))
      val ls = lines(spark, dir, prev)
      val loaded = ls.collect { case IngestEntry(p) => p }.toSet
      val fresh = found.toSeq.filterNot(loaded).sorted
      if (fresh.isEmpty) None
      else {
        val cmap = colMapOf(ls)
        val logical = ls.collectFirst { case SchemaEntry(s) =>
          toLogicalSchema(s, cmap) }.getOrElse(throw new IllegalArgumentException(
            s"COPY INTO at $dir needs a recorded schema — commit once to record it"))
        val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }
          .getOrElse(Seq.empty)
        var reader = spark.read.format(fmt).options(options)
        schema.foreach(s => reader = reader.schema(s))
        val raw = reader.load(fresh: _*)
        val unknown = raw.columns.filterNot(c =>
          logical.fieldNames.exists(_.equalsIgnoreCase(c)))
        require(unknown.isEmpty,
          s"COPY INTO source carries column(s) the target lacks: " +
            s"${unknown.mkString(", ")} — ALTER TABLE ... ADD COLUMNS first, " +
            "or project them away in a staging view")
        val present = logical.fields.filter(f =>
          raw.columns.exists(_.equalsIgnoreCase(f.name)))
        require(present.nonEmpty, s"COPY INTO source shares no column with $dir")
        require(partCols.forall(pc => present.exists(_.name.equalsIgnoreCase(pc))),
          s"COPY INTO into the partitioned table $dir needs the partition " +
            s"column(s) ${partCols.mkString(", ")} present in the source")
        val aligned = raw.select(present.toSeq.map { f =>
          org.apache.spark.sql.functions
            .col(raw.columns.find(_.equalsIgnoreCase(f.name)).get)
            .cast(f.dataType).as(f.name)
        }: _*)
        val feat: Seq[Line] =
          if (ls.exists { case FeatureEntry(n, _) => n.equalsIgnoreCase("ingest")
                          case _ => false }) Seq.empty
          else Seq(FeatureEntry("ingest", required = false))
        val extra = feat ++ fresh.map(IngestEntry)
        val (out, idFilled) = prepareWrite(aligned, dir, translate = true)
        // the basis pins the LEDGER read: anything committed between
        // the skip-set read and the claim refuses (phrase-matched by
        // withCommitRetry), and the retry re-reads the ledger — two
        // racing copyInto runs can never both load a file
        val basis = idFilled.orElse(Some(prev))
        val v = writeVersionCore(spark, dir, protocol, SaveMode.Append,
          txn = None,
          partitionBy = if (partCols.isEmpty) None
            else Some(StructType(partCols.map(c => logical(c)))),
          extraLines = extra, identityBasis = basis) { tmp =>
          val w = optimizeWriteShape(out, dir, partCols).write
            .mode(SaveMode.ErrorIfExists)
          (if (partCols.isEmpty) w else w.partitionBy(partCols: _*)).parquet(tmp)
        }.get
        maintenanceTick(spark, dir, protocol)
        val added = addedDataDirs(spark, dir, v)
          .map(a => a.substring(a.lastIndexOf('/') + 1)).toSet
        val rows = lines(spark, dir, v).collect {
          case s: StatsEntry if added.contains(s.name) => s.rows }.sum
        Some((fresh.length, rows, v))
      }
    }
  }

  /** Retire the COPY INTO ledger in one metadata commit (the
    * retention valve — and the precondition for dropping the `ingest`
    * protocol feature): the next [[copyInto]] re-considers every
    * source file, so forget only once a source prefix is itself
    * retired or re-loading is intended. Returns the committed
    * version; None when the ledger is already empty. */
  def forgetIngestHistory(spark: SparkSession, dir: String,
                          protocol: CommitProtocol = PutIfAbsentCommit,
                          maxAttempts: Int = 16): Option[Int] =
    withCommitRetry(maxAttempts) { () =>
      val prev = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no versions at $dir"))
      val ls = lines(spark, dir, prev)
      if (!ls.exists(_.isInstanceOf[IngestEntry])) None
      else {
        val v = prev + 1
        commitChild(spark, dir, v, prev,
          ls.filterNot(_.isInstanceOf[IngestEntry]), Seq("-ingest"), protocol)
        Some(v)
      }
    }

  /** Commit `df` as the next version. `SaveMode.Overwrite` starts the
    * table state from this write alone; `SaveMode.Append` extends the
    * previous version's file set. Returns the committed version.
    * `protocol` picks the commit primitive for the storage:
    * [[PutIfAbsentCommit]] (the safe-everywhere default) or
    * [[RenameCommit]] (opt-in for HDFS deployments). */
  def writeVersion(df: DataFrame, dir: String,
                   mode: SaveMode = SaveMode.Overwrite,
                   protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    // omitted GENERATED columns fill, and a renamed chain's APPEND
    // lands PHYSICAL column names (an overwrite resets the physical
    // layout from its own files and needs no translation —
    // writeVersionCore drops the mapping): one manifest resolve
    val (out, idFilled) = prepareWrite(df, dir, translate = mode == SaveMode.Append)
    val v = writeVersionCore(df.sparkSession, dir, protocol, mode, txn = None,
      identityBasis = idFilled)(tmp =>
      optimizeWriteShape(out, dir, Seq.empty).write
        .mode(SaveMode.ErrorIfExists).parquet(tmp)).get
    maintenanceTick(df.sparkSession, dir, protocol)
    v
  }

  /** [[toPhysical]] against the chain's CURRENT mapping (no-op when
    * the table was never renamed or does not exist yet). */
  private def toPhysicalLatest(df: DataFrame, dir: String): DataFrame =
    latestVersion(df.sparkSession, dir)
      .map(v => toPhysical(df, colMapOf(lines(df.sparkSession, dir, v))))
      .getOrElse(df)

  /** [[writeVersion]] with a caller-supplied data writer — the
    * [[ManifestStore]] rewrite hook: `write` receives the immutable
    * data-dir path for the new version and must produce the complete
    * parquet state there; the version becomes visible only when the
    * manifest commits through `protocol` afterwards.
    *
    * The commit also records (a) the version's union schema and (b)
    * the new dir's column min/max/null stats, both harvested from the
    * parquet footers of the JUST-WRITTEN dir — cost O(files in this
    * commit), never O(table) — so reads plan with zero footer access
    * and selective reads can skip whole dirs. */
  def writeVersionWith(spark: SparkSession, dir: String,
                       protocol: CommitProtocol = PutIfAbsentCommit,
                       mode: SaveMode = SaveMode.Overwrite)
                      (write: String => Unit): Int =
    writeVersionCore(spark, dir, protocol, mode, txn = None)(write).get

  /** Exactly-once STREAMING sink commit (Delta's (appId, batchId)
    * idempotent-txn design, public in the Delta paper/docs): commit
    * `df` as the next version AND record `txn:<batchId>:<appId>` in
    * the same atomic manifest. A replayed epoch — checkpoint restore
    * re-delivering a batch the sink already committed — is detected
    * from the manifest (same appId, batchId ≤ recorded) and skipped
    * BEFORE any data is written; the check re-runs inside every OCC
    * retry, so a replay can't slip in behind a concurrent commit.
    * Append-mode batches commute with concurrent appends/deletes
    * (bounded retry); Complete-mode overwrites surface a lost race
    * like every overwrite. Returns the committed version, or None for
    * a skipped replay. */
  def writeVersionStreamBatch(df: DataFrame, dir: String, appId: String,
                              batchId: Long, mode: SaveMode = SaveMode.Append,
                              protocol: CommitProtocol = PutIfAbsentCommit,
                              maxAttempts: Int = 16,
                              partCols: Seq[String] = Seq.empty): Option[Int] = {
    require(appId.nonEmpty, "appId must be non-empty")
    val attempt: () => Option[Int] =
      if (partCols.isEmpty) { () =>
        // re-resolve the column mapping (and fill omitted GENERATED
        // columns) PER ATTEMPT: a concurrent rename between OCC
        // retries must not leave this batch's files under stale names
        val (out, idFilled) = prepareWrite(df, dir, translate = mode == SaveMode.Append)
        writeVersionCore(df.sparkSession, dir, protocol, mode,
          txn = Some((appId, batchId)), identityBasis = idFilled)(tmp =>
          optimizeWriteShape(out, dir, Seq.empty).write
            .mode(SaveMode.ErrorIfExists).parquet(tmp))
      } else { () =>
        // PARTITIONED sink (`writeStream.partitionBy(...)`): each
        // batch lands hive-laid-out inside its commit's data dir —
        // the first batch may CREATE the partitioned chain, appends
        // must match the recorded spec as for any partitioned write.
        // An EMPTY batch needs care: a partitionBy write of zero rows
        // produces no files at all (no partition values to name the
        // dirs), so Append skips it outright (nothing to land —
        // exactly-once holds by vacuity) and Complete commits the
        // empty state METADATA-ONLY, schema + spec + txn watermark.
        // fill omitted GENERATED columns + translate PER ATTEMPT, same
        // boundary as every append entry point (the partition column
        // may itself be generated); the TRANSLATED schema names equal
        // the logical ones for partition columns (never renamed)
        val (out, idFilled) = prepareWrite(df, dir, translate = mode == SaveMode.Append)
        val schema = out.schema
        partCols.foreach { c =>
          require(schema.fieldNames.contains(c),
            s"partition column '$c' not in ${schema.fieldNames.mkString(",")}")
          require(Skipping.partitionableType(schema(c).dataType),
            s"partition column '$c' has type ${schema(c).dataType} — hive-path-exact " +
              "types only (string/int/long/short/byte/date/boolean)")
        }
        if (out.isEmpty) {
          if (mode == SaveMode.Append) None
          else emptyPartitionedStreamCommit(df.sparkSession, dir, appId, batchId,
            schema, partCols, protocol)
        } else {
          writeVersionCore(df.sparkSession, dir, protocol, mode,
            txn = Some((appId, batchId)),
            partitionBy = Some(StructType(partCols.map(c => schema(c)))),
            identityBasis = idFilled)(tmp =>
            optimizeWriteShape(out, dir, partCols).write
              .partitionBy(partCols: _*).mode(SaveMode.ErrorIfExists).parquet(tmp))
        }
      }
    val r =
      if (mode == SaveMode.Append) withCommitRetry(maxAttempts)(attempt)
      else attempt()
    // the epoch stream is THE small-file generator autoCompact exists
    // for — tick after every committed (not replayed/empty) epoch
    if (r.nonEmpty) maintenanceTick(df.sparkSession, dir, protocol)
    r
  }

  /** Complete-mode empty epoch on a partitioned sink: the overwrite
    * that truncates — recorded schema, partition spec, constraints
    * carried, txn watermark, zero data dirs. */
  private def emptyPartitionedStreamCommit(spark: SparkSession, dir: String,
                                           appId: String, batchId: Long,
                                           schema: StructType, partCols: Seq[String],
                                           protocol: CommitProtocol): Option[Int] = {
    val prev = latestVersion(spark, dir)
    val replay = prev.exists(p => lines(spark, dir, p).collectFirst {
      case TxnEntry(b, a) if a == appId => b }.exists(batchId <= _))
    if (replay) return None
    val ordered = StructType(
      schema.fields.filterNot(f => partCols.contains(f.name)) ++
        partCols.map(c => schema(c)))
    val carried = prev.toSeq.flatMap(p =>
      lines(spark, dir, p).collect {
        case c: ConstraintEntry => c
        // other writers' replay guards ride through this overwrite too
        case t: TxnEntry if t.appId != appId => t
      })
    val v = prev.map(_ + 1).getOrElse(0)
    commitManifest(spark, dir, v,
      (SchemaEntry(asNullable(ordered)) +:
        (Seq[Line](PartitionEntry(partCols)) ++ carried :+
          TxnEntry(batchId, appId))).map(renderLine), protocol)
    Some(v)
  }

  /** Claim a data-dir NAME for a write whose bytes an external engine
    * will produce (the DSv2 row-level ReplaceData write): nonce'd and
    * invisible until [[commitStagedOverwrite]] publishes it — the same
    * lifecycle as every writeVersion data dir (a crashed or aborted
    * write leaves an orphan for [[pruneVersions]]). */
  private[graft] def stageDataDir(spark: SparkSession, dir: String): String = {
    val v = latestVersion(spark, dir).map(_ + 1).getOrElse(0)
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    f"v$v%08d_data_$nonce" // the digits are cosmetic; nothing parses them
  }

  /** Publish a dir staged by [[stageDataDir]] (bytes already written)
    * as the next OVERWRITE version: footer harvest + schema recording
    * + atomic manifest commit — the post-write half of writeVersion.
    * A lost version race surfaces (overwrite semantics). */
  private[graft] def commitStagedOverwrite(spark: SparkSession, dir: String,
                                           dataDir: String,
                                           protocol: CommitProtocol = PutIfAbsentCommit): Int =
    writeVersionCore(spark, dir, protocol, SaveMode.Overwrite, txn = None,
      preWritten = Some(dataDir))(_ => ()).get

  /** FILE-GRANULAR copy-on-write commit (Delta's rewrite-touched-files
    * role): publish a new version that removes exactly the `removed`
    * files (dirName → file names within it) and adds the pre-written
    * `replacementDir`, carrying every untouched file VERBATIM — the
    * manifest ops are O(touched files), and a selective SQL UPDATE
    * stops being a whole-table rewrite. Partially-consumed dirs keep
    * their DataEntry with a shrunk file list and re-aggregated bounds;
    * fully-consumed dirs drop. Deletion vectors, constraints, txn
    * watermarks, partition spec, and schema all carry unchanged.
    *
    * Concurrency: commutes with concurrent appends and key-deletes
    * over DISJOINT files (bounded OCC retry — the reason a
    * file-granular commit beats the overwrite it replaces, which
    * serialized against every append). Two conflicts surface instead
    * of retrying: (a) a file being replaced is no longer in the live
    * set (someone else rewrote it — the scan's snapshot is stale) and
    * (b) the deletion-vector set changed since the rewrite's scan
    * applied it (`dvSnapshot`) — the replacement rows would silently
    * undo the concurrent delete.
    *
    * Returns the committed version, or None when nothing was removed
    * and nothing added (a no-op DML statement commits no version). */
  /** `exclusivePartitions`: canonical partition tuples this rewrite
    * claims EXCLUSIVELY (dynamic partition overwrite) — any live file
    * in a claimed partition that is not in `removed` is a concurrent
    * write the statement has not seen, and surfaces as a conflict
    * instead of silently surviving the overwrite. */
  private[graft] def commitFileRewrite(spark: SparkSession, dir: String,
                                       removed: Map[String, Set[String]],
                                       replacementDir: Option[String],
                                       partCols: Seq[String],
                                       dvSnapshot: Seq[(String, String)],
                                       protocol: CommitProtocol = PutIfAbsentCommit,
                                       maxAttempts: Int = 16,
                                       exclusivePartitions: Set[Seq[Option[String]]] =
                                         Set.empty,
                                       preHarvested: Option[(Long, Map[String, ColStats], Seq[FileStats])] =
                                         None,
                                       identityBasis: Option[Int] = None,
                                       // REPLACE WHERE's WriteSerializable leg: (the basis
                                       // version's data-dir names, the predicate's pushed
                                       // conjuncts in LOGICAL names, the predicate text).
                                       // A dir committed concurrently whose stats cannot
                                       // EXCLUDE the predicate conflicts — 'replace where X'
                                       // must not commit past appended rows matching X
                                       replaceConflict: Option[(Set[String],
                                         Seq[org.apache.spark.sql.sources.Filter], String)] =
                                         None,
                                       // a pre-written change-feed dir (keys, dirName) to
                                       // record in the SAME commit — the rewrite's version
                                       // numbers are known only inside the retry, so the
                                       // ChangesEntry is stamped here
                                       changeFeed: Option[(Seq[String], String)] =
                                         None,
                                       // false = the rewrite PRESERVES served content
                                       // (compaction, Z-order): the commit stamps the
                                       // version-scoped `rearrange:1` flag so streaming
                                       // sources skip it and change feeds emit nothing —
                                       // Delta's dataChange=false
                                       dataChange: Boolean = true,
                                       // true = the rewrite covered EVERY live file with
                                       // the masks applied physically, so the dv lines
                                       // retire with the files they masked (the
                                       // whole-table OPTIMIZE contract). A PARTIAL
                                       // rewrite must keep them — untouched dirs still
                                       // need the mask.
                                       dropDvs: Boolean = false,
                                       // a pre-written POSITIONAL-dv sidecar committed
                                       // WITH the rewrite (the delta-based UPDATE/MERGE/
                                       // DELETE commit shape: mask + append, zero file
                                       // removal): (staged sidecar dir, masked files per
                                       // data dir — each must still be live at commit,
                                       // or the positions would point at files a
                                       // concurrent rewrite replaced)
                                       addPdv: Option[(String, Map[String, Set[String]])] =
                                         None): Option[Int] = {
    val removedNonEmpty = removed.filter(_._2.nonEmpty)
    if (removedNonEmpty.isEmpty && replacementDir.isEmpty && addPdv.isEmpty) return None
    val (fs, root) = fsFor(spark, dir)
    val v0 = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val schema = schemaOf(spark, dir, v0)
    // the sidecar's positions, from the just-written footers (metadata
    // only): empty → no mask line (the dir is deleted); over the size
    // contract → refuse whole (the reader ships the set with the task
    // binary, exactly the deleteWhere contract)
    val pdvEntry: Option[Line] = addPdv.flatMap { case (nd, _) =>
      val p = new Path(root, nd)
      val nPos = Skipping.collectDirStats(spark, p, asNullable(StructType(Seq(
        StructField("_file", org.apache.spark.sql.types.StringType),
        StructField("_pos", org.apache.spark.sql.types.LongType)))))._1
      if (nPos == 0L) { fs.delete(p, true); None }
      else {
        val cap = maxDvPositions(spark)
        if (nPos > cap) {
          fs.delete(p, true)
          replacementDir.foreach(rd => fs.delete(new Path(root, rd), true))
          throw new IllegalArgumentException(
            s"row-level rewrite: $nPos deleted positions exceeds the positional " +
              s"deletion-vector size contract (spark.graft.dv.maxPositions=$cap). " +
              "Every mask reader ships the position set with the task binary; a " +
              "change this size belongs in a copy-on-write rewrite — re-run with " +
              "spark.graft.rowops.mode=cow")
        }
        Some(PdvEntry(nd))
      }
    }
    // harvest + constraint-validate the replacement ONCE — its content
    // is snapshot-determined, not manifest-determined, so retries
    // reuse it (a caller that already harvested the staged dir passes
    // the result through rather than paying the footer sweep twice)
    val newEntries: Seq[Line] = replacementDir.toSeq.flatMap { nd =>
      val p = new Path(root, nd)
      val (rows, cols, files) = preHarvested.getOrElse {
        if (partCols.isEmpty) {
          val s = asNullable(parquetSchemaDriver(spark, Seq(p.toString)))
          Skipping.collectDirStats(spark, p, s)
        } else Skipping.collectDirStatsPartitioned(spark, p, schema,
          StructType(partCols.map(c => schema(c))))
      }
      // an all-rows-deleted rewrite can still land one 0-row part
      // file (the writer's task artifact): reference nothing — the
      // removal ops ARE the whole change
      if (rows == 0L) { fs.delete(p, true); Seq.empty }
      else {
        // a bloom-indexed table's replacement dir gets its own blobs,
        // one per DECLARED column (same O(delta) scans as any commit)
        val bloom = externalizeBlooms(spark, dir, lines(spark, dir, v0)
          .collect { case b: BloomColEntry => b }.map { b =>
            BloomEntry(nd, b.col,
              Bloom.buildDirBlooms(spark, p.toString, schema, b.col, b.bits))
          })
        (DataEntry(nd) +:
          externalizeStats(spark, dir, Seq(StatsEntry(nd, rows, cols, files)))) ++ bloom
      }
    }
    if (removedNonEmpty.isEmpty && newEntries.isEmpty && pdvEntry.isEmpty) return None
    val validatedConstraints =
      lines(spark, dir, v0).collect { case c: ConstraintEntry => c }
    val rewriteGenCols = generatedColumnsOf(schema)
    if ((validatedConstraints.nonEmpty || rewriteGenCols.nonEmpty) && newEntries.nonEmpty) {
      import org.apache.spark.sql.functions.{coalesce, expr, lit, not, col => fcol}
      // constraint/generation SQL is LOGICAL text (it follows
      // renames); the staged files carry PHYSICAL names — evaluate
      // under logical, the same boundary writeVersionCore applies
      val cmapHere = colMapOf(lines(spark, dir, v0))
      val invHere = cmapHere.map(_.swap)
      val staged = toLogicalDf(
        spark.read.schema(schema)
          .parquet(new Path(root, replacementDir.get).toString),
        cmapHere)
      validatedConstraints.foreach { c =>
        require(staged.filter(not(coalesce(expr(c.predicateSql), lit(true)))).isEmpty,
          s"rewrite of $dir violates CHECK constraint '${c.name}' " +
            s"(${c.predicateSql}); nothing was committed")
      }
      // GENERATED columns hold through row-level rewrites too: an
      // UPDATE/MERGE that produced value != expr refuses (update the
      // generated column consistently, or update through a path that
      // recomputes it). One combined job in the passing case.
      if (rewriteGenCols.nonEmpty) {
        def violatesGen(n: String, sql: String) =
          not(fcol(invHere.getOrElse(n, n)) <=> expr(sql))
        if (!staged.filter(rewriteGenCols.map((violatesGen _).tupled).reduce(_ || _)).isEmpty) {
          val (n, sql) = rewriteGenCols.find { case (cn, csql) =>
            !staged.filter(violatesGen(cn, csql)).isEmpty }.get
          throw new IllegalArgumentException(
            s"rewrite of $dir violates GENERATED column '${invHere.getOrElse(n, n)}' " +
              s"= ($sql); nothing was committed")
        }
      }
    }
    // NOT NULL columns: the replacement's footer harvest already holds
    // the null counts — same zero-IO check as writeVersionCore's
    newEntries.collectFirst { case s: StatsEntry => s }.foreach { st =>
      lines(spark, dir, v0).collect { case n: NotNullEntry => n }.foreach { nn =>
        val violated = st.rows > 0 && (st.cols.get(nn.col) match {
          case None     => true
          case Some(cs) => cs.nulls match {
            case Some(n) => n > 0
            case None =>
              !spark.read.schema(schema)
                .parquet(new Path(root, replacementDir.get).toString)
                .filter(org.apache.spark.sql.functions.col(nn.col).isNull).isEmpty
          }
        })
        require(!violated,
          s"rewrite of $dir violates NOT NULL constraint on '${nn.col}'; " +
            "nothing was committed")
      }
    }
    def conflict(msg: String) = throw new IllegalStateException(
      s"file rewrite at $dir $msg — the rewrite's snapshot is stale; re-run the statement")
    withCommitRetry(maxAttempts) { () =>
      val prev = latestVersion(spark, dir).get
      val ls = lines(spark, dir, prev)
      val stats = ls.collect { case s: StatsEntry => s.name -> s }.toMap
      // every file being replaced must still be live, byte-identical
      removedNonEmpty.foreach { case (d, files) =>
        val have = stats.get(d).map(_.files.map(_.name).toSet).getOrElse(Set.empty)
        val gone = files -- have
        if (gone.nonEmpty) conflict(s"lost ${gone.size} file(s) of $d to a concurrent rewrite")
      }
      // …and every file the new positional mask points into: positions
      // are per file CONTENT — a concurrent rewrite that replaced a
      // masked file would leave the mask aimed at bytes that no longer
      // serve, silently resurrecting (or re-deleting) the wrong rows
      if (pdvEntry.nonEmpty) addPdv.foreach { case (_, masked) =>
        masked.foreach { case (d, files) =>
          val have = stats.get(d).map(_.files.map(_.name).toSet).getOrElse(Set.empty)
          val gone = files -- have
          if (gone.nonEmpty)
            conflict(s"lost ${gone.size} position-masked file(s) of $d to a concurrent rewrite")
        }
      }
      // names normalize to their LAST segment: a cloned chain's dv
      // refs are absolute, the snapshot's were taken through the same
      // last-segment view (versionInfo serves absolute dirs either way)
      def seg(n: String) = n.substring(n.lastIndexOf('/') + 1)
      val dvNow = ls.collect {
        case DvEntry(k, n) => (k, seg(n))
        case ScopedDvEntry(k, n, _) => (k, seg(n))
        case PdvEntry(n) => (PdvSnapshotKey, seg(n))
      }
      if (dvNow.toSet != dvSnapshot.map { case (k, n) => (k, seg(n)) }.toSet)
        conflict("saw the deletion-vector set change under it")
      if (ls.collect { case c: ConstraintEntry => c }.toSet != validatedConstraints.toSet)
        conflict("saw the CHECK constraints change under it")
      if (ls.collect { case n: NotNullEntry => n }.toSet !=
          lines(spark, dir, v0).collect { case n: NotNullEntry => n }.toSet)
        conflict("saw the NOT NULL constraints change under it")
      val prevPart = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
      if (prevPart != partCols)
        conflict(s"saw the partition spec change to ${prevPart.mkString(",")}")
      replaceConflict.foreach { case (basis, filters, predSql) =>
        val cmapNow = colMapOf(ls)
        val logicalNow = toLogicalSchema(
          ls.collectFirst { case SchemaEntry(s) => s }.getOrElse(schema), cmapNow)
        val newcomers = ls.collect {
          case s: StatsEntry if !basis.contains(s.name) => s }
        // a newcomer survives only when some pushed conjunct PROVES it
        // holds no matching row; an untranslatable predicate (no
        // conjuncts) keeps every newcomer — conservative, like Delta
        val overlapping = newcomers.filterNot(st =>
          filters.exists(f => Skipping.excludes(st.rows,
            rekeyToLogical(st.cols, cmapNow), logicalNow, f)))
        if (overlapping.nonEmpty) conflict(
          s"saw ${overlapping.length} concurrently-committed dir(s) whose rows may " +
            s"match the replace predicate ($predSql) — a REPLACE WHERE must not " +
            "commit past concurrent writes it would have replaced")
      }
      if (exclusivePartitions.nonEmpty) {
        val foreign = ls.collect { case s: StatsEntry => s }.flatMap { st =>
          val mine = removedNonEmpty.getOrElse(st.name, Set.empty)
          st.files.filterNot(f => mine.contains(f.name)).filter(f =>
            exclusivePartitions.contains(partCols.map(c => f.cols.get(c).flatMap(_.min))))
        }
        if (foreign.nonEmpty)
          conflict(s"saw ${foreign.length} file(s) land concurrently in a partition " +
            "this statement overwrites")
      }
      val v = prev + 1
      val ops = Seq.newBuilder[String]
      val bloomByDir = ls.collect { case b: BloomEntry => b }.groupBy(_.dir)
      val replacedStats = removedNonEmpty.flatMap { case (d, files) =>
        val st = stats(d)
        val remaining = st.files.filterNot(f => files.contains(f.name))
        if (remaining.isEmpty) { ops += s"-data:$d"; None }
        else {
          val (rows, cols, _) = Skipping.aggregateDir(schema, remaining)
          // a trim's content changed ⇒ the old sidecar (if any) drops
          // and the survivor re-externalizes if still heavy — the
          // orphaned file ages out through pruneVersions
          val replaced = externalizeStats(spark, dir,
            Seq(StatsEntry(d, rows, cols, remaining))).head.asInstanceOf[StatsEntry]
          ops += addOp(replaced)
          Some(d -> replaced)
        }
      }
      // a trimmed dir's bloom line sheds the removed files' blobs with
      // it (a stale blob is only wasted bytes — the file is gone from
      // the stats list — but the manifest must not grow garbage). The
      // trim DROPS any sidecar ref (content changed; sidecars are
      // immutable) and re-externalizes if still heavy — the old
      // sidecar orphans and pruneVersions reclaims it
      val trimmedBlooms = replacedStats.keySet.flatMap { d =>
        bloomByDir.getOrElse(d, Seq.empty).map { b =>
          val keep = replacedStats(d).files.map(_.name).toSet
          val trimmed = externalizeBlooms(spark, dir, Seq(
            b.copy(files = b.files.filter { case (f, _) => keep.contains(f) },
              sidecar = None))).head.asInstanceOf[BloomEntry]
          ops += addOp(trimmed)
          (d, b.col) -> trimmed
        }
      }.toMap
      newEntries.foreach(l => ops += addOp(l))
      // IDENTITY high-water marks advance with the rewrite commit: a
      // MERGE-inserted (or dynamic-overwrite-filled) value above the
      // mark moves it, so later generated values can never collide.
      // A dynamic overwrite whose FILL basis went stale under a
      // concurrent commit aborts like every other stale-snapshot
      // conflict (each retry attempt re-reads the mark; the staged
      // values do not change, so a moved mark is unrecoverable here).
      identityBasis.foreach { b =>
        if (prev != b) conflict(
          s"filled identity values against version $b but the table is at $prev")
      }
      val hwmRw: Seq[Line] = identityColumnsOf(schema).flatMap { spec =>
        val base = ls.collectFirst {
          case HwmEntry(c, n) if c.equalsIgnoreCase(spec.col) => n
        }.getOrElse(spec.start)
        val bounds = newEntries.collectFirst { case s: StatsEntry => s }
          .flatMap(_.cols.get(spec.col)).filter(_.min.nonEmpty)
          .map(cs => (cs.min.get.toLong, cs.max.get.toLong))
        val next = bounds.fold(base) { case (mn, mx) =>
          if (spec.step > 0) math.max(base, Math.addExact(mx, spec.step))
          else math.min(base, Math.addExact(mn, spec.step))
        }
        if (next == base) None else Some(HwmEntry(spec.col, next))
      }
      hwmRw.foreach(l => ops += addOp(l))
      // the recorded feed speaks THIS commit's version numbers —
      // derived content is basis-exact (the conflict checks above
      // refuse anything that would make it stale)
      val feedLines: Seq[Line] = changeFeed.toSeq.map { case (ks, nd) =>
        ChangesEntry(prev, v, ks, nd) }
      feedLines.foreach(l => ops += addOp(l))
      // the first positional mask on a chain STAMPS the protocol
      // feature, exactly like deleteWhere's sidecar commit
      val featRw: Seq[Line] =
        if (pdvEntry.isEmpty || ls.exists {
              case FeatureEntry(n, _) => n.equalsIgnoreCase("pdv"); case _ => false })
          Seq.empty
        else Seq(FeatureEntry("pdv", required = true))
      featRw.foreach(l => ops += addOp(l))
      pdvEntry.foreach(l => ops += addOp(l))
      if (!dataChange) ops += addOp(RearrangeEntry())
      val droppedDvNames: Set[String] =
        if (!dropDvs) Set.empty
        else ls.collect {
          case DvEntry(_, n)          => n
          case ScopedDvEntry(_, n, _) => n
          case PdvEntry(n)            => n
        }.toSet
      droppedDvNames.foreach(n => ops += s"-dv:$n")
      val emptied = removedNonEmpty.keySet -- replacedStats.keySet
      val fullLines = ls.flatMap {
        case DataEntry(n) if emptied.contains(n) => None
        case s: StatsEntry if emptied.contains(s.name) => None
        case s: StatsEntry if replacedStats.contains(s.name) => Some(replacedStats(s.name))
        case b: BloomEntry if emptied.contains(b.dir) => None
        case b: BloomEntry if trimmedBlooms.contains((b.dir, b.col)) =>
          Some(trimmedBlooms((b.dir, b.col)))
        case h: HwmEntry if hwmRw.exists {
          case e: HwmEntry => e.col.equalsIgnoreCase(h.col); case _ => false } => None
        case DvEntry(_, n) if droppedDvNames.contains(n) => None
        case ScopedDvEntry(_, n, _) if droppedDvNames.contains(n) => None
        case PdvEntry(n) if droppedDvNames.contains(n) => None
        case other => Some(other)
      } ++ newEntries ++ hwmRw ++ feedLines ++ featRw ++ pdvEntry.toSeq
      commitChild(spark, dir, v, prev, fullLines, ops.result(), protocol)
      Some(v)
    }
  }

  /** DYNAMIC PARTITION OVERWRITE (the reference pipeline's
    * `partitionOverwriteMode=dynamic` semantics, on the versioned
    * store): replace exactly the partitions PRESENT IN the staged
    * hive-laid-out dir, carry every other partition's files verbatim,
    * as ONE file-granular commit. The touched tuples come from the
    * staged dir's own harvest; the victim files from manifest bytes;
    * and the commit claims the touched partitions EXCLUSIVELY — a
    * file landed concurrently in one of them surfaces as a conflict
    * (the statement replaces state it has not seen), while appends to
    * untouched partitions commute. Returns the committed version,
    * None when the staged dir holds no rows (an empty dynamic
    * overwrite replaces nothing — the staged dir is deleted). */
  private[graft] def commitDynamicPartitionOverwrite(spark: SparkSession, dir: String,
                                                     stagedHive: String,
                                                     partCols: Seq[String],
                                                     protocol: CommitProtocol = PutIfAbsentCommit,
                                                     identityBasis: Option[Int] = None)
      : Option[Int] = {
    val (fs, root) = fsFor(spark, dir)
    val v0 = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, v0)
    val prevPart = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    require(prevPart == partCols,
      s"dynamic overwrite partitioning ${partCols.mkString(",")} does not match " +
        s"the table's ${prevPart.mkString(",")}")
    val schema = schemaOf(spark, dir, v0)
    val partSchema = StructType(partCols.map(c => schema(c)))
    val stagedPath = new Path(root, stagedHive)
    val harvested =
      Skipping.collectDirStatsPartitioned(spark, stagedPath, schema, asNullable(partSchema))
    val (rows, _, stagedFiles) = harvested
    if (rows == 0L) { fs.delete(stagedPath, true); return None }
    def tupleOf(f: FileStats) = partCols.map(c => f.cols.get(c).flatMap(_.min))
    val touched = stagedFiles.map(tupleOf).toSet
    val stats = ls.collect { case s: StatsEntry => s.name -> s }.toMap
    val dataDirs = ls.collect { case DataEntry(n) => n }
    require(dataDirs.forall(n => stats.get(n).exists(_.files.nonEmpty)),
      s"dynamic partition overwrite at $dir needs manifest file lists — run backfillStats")
    val victims = dataDirs.map { d =>
      d -> stats(d).files.filter(f => touched.contains(tupleOf(f))).map(_.name).toSet
    }.filter(_._2.nonEmpty).toMap
    val dvSnapshot = ls.collect {
      case DvEntry(k, n) => (k, n)
      case ScopedDvEntry(k, n, _) => (k, n)
      case PdvEntry(n) => (PdvSnapshotKey, n)
    }
    commitFileRewrite(spark, dir, victims, Some(stagedHive), partCols, dvSnapshot,
      protocol, exclusivePartitions = touched, preHarvested = Some(harvested),
      identityBasis = identityBasis)
  }

  /** [[writeVersionPartitioned]] with DYNAMIC overwrite semantics:
    * only the partitions present in `df` are replaced; all others
    * carry verbatim. Returns the committed version, None for an
    * empty input. */
  def writeVersionPartitionedDynamic(df: DataFrame, dir: String, partCols: Seq[String],
                                     protocol: CommitProtocol = PutIfAbsentCommit)
      : Option[Int] = {
    require(partCols.nonEmpty, "partCols must be non-empty")
    val spark = df.sparkSession
    val staged = stageDataDir(spark, dir)
    // omitted GENERATED columns (identity included) fill first;
    // staged files land BESIDE the chain's existing files — a renamed
    // chain needs them in PHYSICAL names like any append
    val (outDyn, idFilledDyn) = prepareWrite(df, dir, translate = true)
    optimizeWriteShape(outDyn, dir, partCols).write
      .partitionBy(partCols: _*).mode(SaveMode.ErrorIfExists)
      .parquet(new Path(new Path(dir), staged).toString)
    val r = commitDynamicPartitionOverwrite(spark, dir, staged, partCols, protocol,
      identityBasis = idFilledDyn)
    if (r.nonEmpty) maintenanceTick(spark, dir, protocol)
    r
  }

  /** The ATOMIC CTAS / RTAS commit (the StagingTableCatalog seam):
    * publish a staged dir — bytes already written by the SQL insert,
    * hive-laid-out when `partCols` is non-empty — as version 0
    * (`fresh = true`, CREATE TABLE AS SELECT: a racing creator makes
    * the v0 claim itself fail) or as the next overwrite version
    * (`fresh = false`, REPLACE TABLE AS SELECT: the replace IS a
    * version, so the pre-replace table still time-travels). A staged
    * dir with no parquet content (empty CTAS result, REPLACE TABLE
    * without a select) commits METADATA-ONLY: the declared schema and
    * partition spec with zero data dirs — the same empty-table shape
    * [[createTable]] commits. */
  private[graft] def commitStagedTable(spark: SparkSession, dir: String,
                                       stagedDir: String, declared: StructType,
                                       partCols: Seq[String], fresh: Boolean,
                                       protocol: CommitProtocol = PutIfAbsentCommit,
                                       replaceDefinition: Boolean = true): Int = {
    val (fs, root) = fsFor(spark, dir)
    val stagedPath = new Path(root, stagedDir)
    val hasContent = fs.exists(stagedPath) &&
      CommitFiles.parquetUnder(spark, Seq(stagedPath.toString)).nonEmpty
    if (hasContent) {
      val partitionBy =
        if (partCols.isEmpty) None
        else Some(StructType(partCols.map(c => declared(c))))
      writeVersionCore(spark, dir, protocol, SaveMode.Overwrite, txn = None,
        partitionBy = partitionBy, preWritten = Some(stagedDir),
        requireFresh = fresh, replaceDefinition = replaceDefinition)(_ => ()).get
    } else if (fresh) {
      // CTAS nullability follows the file-source convention: the
      // query's schema lands fully-nullable (a literal-derived
      // non-nullable column is an artifact of the query, not a
      // declared contract — NOT NULL comes from explicit CREATE TABLE
      // column syntax or CALL system.set_not_null)
      createTable(spark, dir, asNullable(declared), partCols, protocol)
    } else {
      // empty REPLACE over an existing chain: a metadata-only
      // overwrite version — schema (and spec) kept, zero data dirs.
      // RTAS (`replaceDefinition`) starts the new table without the
      // old constraints; a DATA rewrite that removed every row keeps
      // them — the table's contract survives its own truncation
      val prev = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no versions at $dir to replace"))
      // txn watermarks survive even an RTAS: they guard a WRITER's
      // replay, not the table's definition — a stream whose epoch was
      // committed before the replace must still skip its re-delivery
      // the empty state records the LOGICAL schema and no mapping
      // (there are no files left to name), so carried NOT NULL lines
      // (physical-keyed) rename to logical with it
      val prevInv = colMapOf(lines(spark, dir, prev)).map(_.swap)
      val carried = lines(spark, dir, prev).collect { case t: TxnEntry => t } ++
        (if (replaceDefinition) Seq.empty[Line]
         else lines(spark, dir, prev).collect {
           case c: ConstraintEntry => c
           case n: NotNullEntry => NotNullEntry(prevInv.getOrElse(n.col, n.col))
           case p: PropEntry => p
         })
      val ordered =
        if (partCols.isEmpty) declared
        else StructType(declared.fields.filterNot(f => partCols.contains(f.name)) ++
          partCols.map(c => declared(c)))
      val ls: Seq[Line] = SchemaEntry(asNullable(ordered)) +:
        ((if (partCols.isEmpty) Seq.empty[Line] else Seq[Line](PartitionEntry(partCols))) ++
          carried)
      val v = prev + 1
      commitManifest(spark, dir, v, ls.map(renderLine), protocol)
      v
    }
  }

  /** The newest batch id `appId` has committed to `dir`, from manifest
    * bytes (None for a writer the table has never seen). */
  def lastCommittedBatch(spark: SparkSession, dir: String, appId: String): Option[Long] =
    latestVersion(spark, dir).flatMap(v =>
      lines(spark, dir, v).collectFirst { case TxnEntry(b, a) if a == appId => b })

  /** [[writeVersion]] with PARTITION COLUMNS: rows land hive-laid-out
    * (`dataDir/col=value/part-*.parquet`) inside the commit's single
    * immutable data dir, the manifest records the partition spec and
    * each file's partition values as exact per-file bounds, and reads
    * serve through the partition-aware [[ManifestFileIndex]] — a
    * filter on a partition column prunes as `PartitionFilters` at
    * plan time from manifest bytes, composed with time travel, dv
    * masks, and the value-stats skipping (one evaluator: a partition
    * value IS a min=max stat). Appends must use the same partition
    * columns; mixing partitioned and unpartitioned commits in one
    * chain refuses. Partition column types are the hive-path-exact
    * set (string/int/long/short/byte/date/boolean). */
  def writeVersionPartitioned(df: DataFrame, dir: String, partCols: Seq[String],
                              mode: SaveMode = SaveMode.Overwrite,
                              protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    require(partCols.nonEmpty, "partCols must be non-empty — use writeVersion")
    // omitted GENERATED columns fill first (they may BE the partition
    // columns — partition-by-derived-date is the canonical use); a
    // renamed chain's APPEND lands PHYSICAL column names (partition
    // columns are never renamed, so partCols needs no translation)
    val (out, idFilled) = prepareWrite(df, dir, translate = mode == SaveMode.Append)
    val schema = out.schema
    partCols.foreach { c =>
      require(schema.fieldNames.contains(c), s"partition column '$c' not in ${schema.fieldNames.mkString(",")}")
      require(Skipping.partitionableType(schema(c).dataType),
        s"partition column '$c' has type ${schema(c).dataType} — hive-path-exact " +
          "types only (string/int/long/short/byte/date/boolean)")
    }
    // recorded read order: data columns first, partition columns last
    // (what Spark's partitioned reader emits)
    val partSchema = StructType(partCols.map(c => schema(c)))
    val v = writeVersionCore(df.sparkSession, dir, protocol, mode, txn = None,
      partitionBy = Some(partSchema), identityBasis = idFilled)(tmp =>
      optimizeWriteShape(out, dir, partCols).write
        .partitionBy(partCols: _*).mode(SaveMode.ErrorIfExists).parquet(tmp)).get
    maintenanceTick(df.sparkSession, dir, protocol)
    v
  }

  /** Delta OPTIMIZE WRITE's role — reshape a batch about to land so
    * its file count tracks the AQE advisory size instead of the
    * query's shuffle shape (a 200-task aggregate otherwise lands 200
    * files PER COMMIT, and a month of commits is a small-file fleet).
    * Conf-gated, default off: `spark.graft.optimizeWrite.enabled=true`.
    * The implementation is the engine's own REBALANCE hint — AQE sizes
    * the output partitions to
    * `spark.sql.adaptive.advisoryPartitionSizeInBytes` (the file-size
    * target) and SPLITS skewed ones, which is Delta's optimized-writes
    * bin-packing done by the optimizer this library already rides.
    * Partitioned writes rebalance BY the partition columns so each
    * hive partition's rows converge onto few writer tasks (without
    * this every task writes a sliver of every partition:
    * tasks × partitions files per commit). */
  private def optimizeWriteShape(out: DataFrame, dir: String,
                                 partCols: Seq[String]): DataFrame = {
    val conf = out.sparkSession.conf
    // session conf wins both ways; else the TABLE PROPERTY
    // `graft.optimizeWrite.enabled` (Delta's autoOptimize layering)
    if (!effectiveSetting(out.sparkSession, dir,
        "spark.graft.optimizeWrite.enabled", "graft.optimizeWrite.enabled")
        .exists(_.toBoolean)) out
    // REBALANCE is an AQE feature; without AQE the hint plans a plain
    // shuffle to spark.sql.shuffle.partitions — MORE files, not fewer.
    // A streaming sink's cloned session is the case that matters
    // (ResolveWriteToStream force-disables AQE there): fall through to
    // the batch's natural shape and let the autoCompact tick absorb
    // the fragments instead.
    else if (!conf.getOption("spark.sql.adaptive.enabled").forall(_.toBoolean)) out
    else if (partCols.nonEmpty) out.hint("rebalance", partCols: _*)
    else out.hint("rebalance")
  }

  /** BOUNDED small-dir compaction — Delta AUTO COMPACT's role as a
    * library op. Coalesces up to `maxDirs` of the SMALLEST live data
    * dirs, each under `targetBytes`, into one rewritten dir (masked
    * read: dv'd rows apply physically on the way through), committed
    * FILE-GRANULARLY so it commutes with concurrent appends to
    * untouched dirs. Cost is O(bytes of the picked dirs), never
    * O(table) — the property that lets the post-commit tick run after
    * every streaming epoch without becoming the epoch. Legacy dirs
    * without manifest file lists never qualify (removal is
    * file-granular); a healthy table pays one manifest read. Returns
    * the committed version, None when fewer than `minDirs` qualify. */
  def compactSmallDirs(spark: SparkSession, dir: String,
                       targetBytes: Long = 128L * 1024 * 1024,
                       minDirs: Int = 8, maxDirs: Int = 64,
                       protocol: CommitProtocol = PutIfAbsentCommit): Option[Int] = {
    require(minDirs >= 2, "minDirs must be at least 2 — compacting one dir is a no-op")
    require(targetBytes > 0 && maxDirs >= minDirs,
      s"need targetBytes > 0 and maxDirs >= minDirs, got $targetBytes/$maxDirs/$minDirs")
    val v0 = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls0 = lines(spark, dir, v0)
    val physSchema = ls0.collectFirst { case SchemaEntry(s) => s }.getOrElse(
      throw new IllegalArgumentException(
        s"compactSmallDirs at $dir needs a recorded schema — run backfillStats"))
    val partCols = ls0.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    val stats = ls0.collect { case e: StatsEntry => e.name -> e }.toMap
    val weighed = ls0.collect { case DataEntry(n) => n }
      .flatMap(n => stats.get(n).filter(_.files.nonEmpty)
        .map(s => (n, s.files.map(_.bytes).sum)))
    val small = weighed.filter(_._2 < targetBytes).sortBy(_._2).take(maxDirs)
    if (small.length < minDirs) return None
    val (fs, root) = fsFor(spark, dir)
    val removed = small.map { case (n, _) => n -> stats(n).files.map(_.name).toSet }.toMap
    val candPaths = small.map { case (n, _) => new Path(root, n).toString }.toSet
    val cmap = colMapOf(ls0)
    val nOut = math.max(1, math.ceil(small.map(_._2).sum.toDouble / targetBytes).toInt)
    val payload = toPhysical(
        readVersionDirs(spark, dir, v0, candPaths, applyDv = true), cmap)
      .select(physSchema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
      .coalesce(nOut)
    val staged = stageDataDir(spark, dir)
    val stagedPath = new Path(root, staged)
    val w = payload.write.mode(SaveMode.ErrorIfExists)
    (if (partCols.isEmpty) w else w.partitionBy(partCols: _*)).parquet(stagedPath.toString)
    val dvSnapshot = ls0.collect {
      case DvEntry(k, n)          => (k, n)
      case ScopedDvEntry(k, n, _) => (k, n)
      case PdvEntry(n)            => (PdvSnapshotKey, n)
    }
    try commitFileRewrite(spark, dir, removed, Some(staged), partCols, dvSnapshot,
      protocol, dataChange = false)
    catch { case t: Throwable => fs.delete(stagedPath, true); throw t }
  }

  /** Whole-table CONTENT-PRESERVING rewrite (flat chains) as a
    * file-granular dataChange=false commit — the flat OPTIMIZE /
    * Z-ORDER seam. `shape` rearranges the masked read (repartition,
    * Morton sort); the commit removes every prior file, adds the
    * staged dir, and stamps the rearrange flag, so it COMMUTES with
    * concurrent appends (they surface as a bounded OCC retry, not a
    * lost overwrite race) and downstream STREAMS skip it. Deletion
    * vectors RETIRE with the commit (the masked read applied every
    * mask physically and the rewrite covered every file — the
    * whole-table OPTIMIZE contract: "overwrite or compact to apply
    * the mask physically" keeps holding). Returns None when the
    * manifest predates file lists or the table is empty — callers
    * fall back to the legacy overwrite. */
  private[ext] def rewriteAllAsRearrange(spark: SparkSession, dir: String,
                                         protocol: CommitProtocol)
                                        (shape: DataFrame => DataFrame): Option[Int] = {
    val v0 = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls0 = lines(spark, dir, v0)
    val physSchema = ls0.collectFirst { case SchemaEntry(s) => s }.getOrElse(return None)
    val partCols = ls0.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    require(partCols.isEmpty,
      s"$dir is partitioned — rewrite through the partition-shaped path")
    val removed =
      try allLiveFilesMap(spark, dir, v0)
      catch { case _: IllegalArgumentException => return None }
    if (removed.valuesIterator.forall(_.isEmpty)) return None
    val (fs, root) = fsFor(spark, dir)
    val cmap = colMapOf(ls0)
    val payload = toPhysical(shape(readVersion(spark, dir, v0)), cmap)
      .select(physSchema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    val staged = stageDataDir(spark, dir)
    val stagedPath = new Path(root, staged)
    payload.write.mode(SaveMode.ErrorIfExists).parquet(stagedPath.toString)
    val dvSnapshot = ls0.collect {
      case DvEntry(k, n)          => (k, n)
      case ScopedDvEntry(k, n, _) => (k, n)
      case PdvEntry(n)            => (PdvSnapshotKey, n)
    }
    try commitFileRewrite(spark, dir, removed, Some(staged), Seq.empty, dvSnapshot,
      protocol, dataChange = false, dropDvs = true)
    catch { case t: Throwable => fs.delete(stagedPath, true); throw t }
  }

  /** Delta `FSCK REPAIR TABLE`'s role: find manifest references to
    * data files GONE from storage (out-of-band deletion, a botched
    * restore, a partial copy) and — with `repair = true` — commit one
    * file-granular version dropping exactly those references, so
    * reads stop dying on FileNotFound. The rows were lost either way;
    * the repair makes the loss EXPLICIT, versioned, and
    * time-travel-auditable (the pre-repair version still names them).
    * Existence probes dispatch as a Spark job at or above
    * `spark.graft.fsck.distributedMinFiles` (default 64) referenced
    * files — never an O(table) driver loop. A dir emptied by the
    * repair drops from the manifest, and a downstream STREAM correctly
    * fails on it (data it may not have served vanished — that is a
    * data change, nothing like a rearrangement). Returns the missing
    * (dirName, fileName) pairs; empty = clean, and nothing commits. */
  def fsck(spark: SparkSession, dir: String, repair: Boolean = false,
           protocol: CommitProtocol = PutIfAbsentCommit): Seq[(String, String)] = {
    val v0 = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, v0)
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val (fs, root) = fsFor(spark, dir)
    val expected = ls.collect { case DataEntry(n) => n }.flatMap { d =>
      stats.get(d).toSeq.flatMap(_.files.map(f =>
        (d, f.name, new Path(new Path(root, d), f.name).toString)))
    }
    val minFiles = spark.conf.getOption("spark.graft.fsck.distributedMinFiles")
      .map(_.toInt).getOrElse(64)
    val missing: Seq[(String, String)] =
      if (expected.length < math.max(1, minFiles))
        expected.collect { case (d, n, p) if !fs.exists(new Path(p)) => (d, n) }
      else {
        val sc = spark.sparkContext
        val bc = sc.broadcast(new Skipping.SerConf(sc.hadoopConfiguration))
        val slices = math.max(1, math.min(expected.length, sc.defaultParallelism * 4))
        val prev = sc.getLocalProperty("spark.job.description")
        sc.setJobDescription(s"graft: fsck existence probe (${expected.length} files)")
        try sc.parallelize(expected, slices).filter { case (_, _, p) =>
            val hp = new Path(p)
            !hp.getFileSystem(bc.value.value).exists(hp)
          }.map { case (d, n, _) => (d, n) }.collect().toSeq.sorted
        finally { sc.setJobDescription(prev); bc.destroy() }
      }
    if (repair && missing.nonEmpty) {
      val removed = missing.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
      val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
      val dvSnapshot = ls.collect {
        case DvEntry(k, n)          => (k, n)
        case ScopedDvEntry(k, n, _) => (k, n)
        case PdvEntry(n)            => (PdvSnapshotKey, n)
      }
      commitFileRewrite(spark, dir, removed, None, partCols, dvSnapshot, protocol)
    }
    missing
  }

  /** The TABLE PROPERTIES of version `v` — Delta's TBLPROPERTIES.
    * Versioned like everything else: travel to an old version and its
    * recorded properties serve. */
  def tableProperties(spark: SparkSession, dir: String, v: Int): Map[String, String] =
    lines(spark, dir, v).collect { case PropEntry(k, x) => k -> x }.toMap

  /** `ALTER TABLE … SET TBLPROPERTIES`: one metadata commit replacing
    * the named keys (case-insensitively), everything else verbatim.
    * Keys are dotted-word-shaped, values one-line — both embed in the
    * manifest. Returns the committed version. */
  def setTableProperties(spark: SparkSession, dir: String,
                         props: Map[String, String],
                         protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    require(props.nonEmpty, "SET TBLPROPERTIES needs at least one key")
    props.foreach { case (k, x) =>
      require(k.matches("[A-Za-z0-9_.\\-]+"),
        s"property key must be dotted-word-shaped (it embeds in the manifest), got '$k'")
      require(!x.exists(c => c == '\n' || c == '\r'),
        s"property value for '$k' must be one line")
    }
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    val entries = props.toSeq.sortBy(_._1).map { case (k, x) => PropEntry(k, x) }
    val fullLines = ls.filterNot {
      case e: PropEntry => props.keys.exists(_.equalsIgnoreCase(e.key))
      case _ => false
    } ++ entries
    val v = prev + 1
    commitChild(spark, dir, v, prev, fullLines, entries.map(addOp), protocol)
    v
  }

  /** `ALTER TABLE … UNSET TBLPROPERTIES`: drop the named keys (missing
    * keys are a no-op — the UNSET IF EXISTS contract). Returns the
    * committed version, None when nothing matched (no empty commit). */
  def unsetTableProperties(spark: SparkSession, dir: String, keys: Seq[String],
                           protocol: CommitProtocol = PutIfAbsentCommit): Option[Int] = {
    require(keys.nonEmpty, "UNSET TBLPROPERTIES needs at least one key")
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    val present = keys.filter(k => ls.exists {
      case e: PropEntry => e.key.equalsIgnoreCase(k); case _ => false })
    if (present.isEmpty) return None
    val fullLines = ls.filterNot {
      case e: PropEntry => present.exists(_.equalsIgnoreCase(e.key))
      case _ => false
    }
    val v = prev + 1
    commitChild(spark, dir, v, prev, fullLines,
      present.sorted.map(k => s"-prop:$k"), protocol)
    Some(v)
  }

  /** A tuning knob's EFFECTIVE value: the session conf when set (the
    * operator's explicit override, both directions), else the table
    * property, else None — Delta's conf-over-TBLPROPERTIES layering
    * for its autoOptimize knobs. */
  private def effectiveSetting(spark: SparkSession, dir: String,
                               confKey: String, propKey: String): Option[String] =
    spark.conf.getOption(confKey).orElse(
      try latestVersion(spark, dir).flatMap(v =>
        tableProperties(spark, dir, v).collectFirst {
          case (k, x) if k.equalsIgnoreCase(propKey) => x })
      catch { case scala.util.control.NonFatal(_) => None })

  /** Was version `v` a content-preserving REARRANGEMENT (dataChange =
    * false: compaction, Z-order)? Streaming sources skip such versions
    * instead of failing the appends-only premise; change feeds emit
    * nothing for them. */
  private[graft] def isRearrange(spark: SparkSession, dir: String, v: Int): Boolean =
    lines(spark, dir, v).exists(_.isInstanceOf[RearrangeEntry])

  /** The data dirs version `v` ADDED over `v-1` (absolute paths, in
    * v's list order) — the streaming source's serving unit: offsets
    * index per-version deltas, so a rearrangement (which removes dirs
    * and adds its coalesced one) can't shift anything already served.
    * A rearrange version's delta is EMPTY by definition — its added
    * dir holds only rows the original dirs already served. */
  private[graft] def addedDataDirs(spark: SparkSession, dir: String, v: Int)
      : Seq[String] = {
    if (v < 0) return Seq.empty
    if (isRearrange(spark, dir, v)) return Seq.empty
    def abs(n: String) = new Path(new Path(dir), n).toString
    val cur = lines(spark, dir, v).collect { case DataEntry(n) => n }
    if (v == 0) cur.map(abs)
    else {
      val prev = lines(spark, dir, v - 1).collect { case DataEntry(n) => n }.toSet
      cur.filterNot(prev).map(abs)
    }
  }

  /** Version `v`'s live files restricted to dirs that are NOT part of
    * the clustered base — the selection seam of an INCREMENTAL
    * OPTIMIZE. A dir belongs to the clustered base iff the commit
    * that ADDED it was a content-preserving rearrangement
    * (dataChange=false: a previous OPTIMIZE/Z-order/compaction
    * produced it); everything else — plain appends, CoW replacement
    * dirs — is the increment a cadenced OPTIMIZE rewrites. Dir
    * lineage is read from the retained manifest chain only; a dir
    * whose adding commit was pruned away classifies conservatively as
    * unclustered (re-clustering preserved content is wasted work,
    * never wrong work). Returns dirName → file names; empty when the
    * whole table is clustered base. */
  private[graft] def unclusteredLiveFiles(spark: SparkSession, dir: String, v: Int)
      : Map[String, Set[String]] = {
    val ls = lines(spark, dir, v)
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val liveDirs = ls.collect { case DataEntry(n) => n }
    require(liveDirs.forall(n => stats.get(n).exists(_.files.nonEmpty)),
      s"incremental OPTIMIZE at $dir needs manifest file lists for every data dir — " +
        "run backfillStats to upgrade pre-file-list manifests")
    val avail = versions(spark, dir).filter(_ <= v).toSet
    val clustered = avail.iterator
      .filter(w => w > 0 && avail.contains(w - 1) && isRearrange(spark, dir, w))
      .flatMap { w =>
        val prev = lines(spark, dir, w - 1).collect { case DataEntry(n) => n }.toSet
        lines(spark, dir, w).collect { case DataEntry(n) => n }.filterNot(prev)
      }.toSet
    liveDirs.filterNot(clustered)
      .map(d => d -> stats(d).files.map(_.name).toSet).toMap
  }

  /** [[dirAdmission]] restricted to version `v`'s ADDED dirs — the
    * admission weights of one version's delta. */
  private[graft] def dirAdmissionDelta(spark: SparkSession, dir: String, v: Int)
      : IndexedSeq[DirAdmission] = {
    val added = addedDataDirs(spark, dir, v).toSet
    if (added.isEmpty) IndexedSeq.empty
    else dirAdmission(spark, dir, v).filter(d => added.contains(d.absDir))
  }

  /** The post-commit maintenance tick every write path fires:
    * auto-clustering first (when declared, it merges AND Morton-
    * clusters the increment — small files included), then auto
    * compaction for tables that only declared that. Each section is
    * independently gated and independently failure-isolated. */
  private def maintenanceTick(spark: SparkSession, dir: String,
                              protocol: CommitProtocol): Unit = {
    autoClusterTick(spark, dir, protocol)
    autoCompactTick(spark, dir, protocol)
  }

  /** Post-commit AUTO CLUSTER tick (Delta liquid clustering's
    * cadence, property-driven): when the table (or session) declares
    * `graft.autoCluster.columns`, a successful write probes the
    * UNCLUSTERED increment from manifest bytes — O(dirs) driver
    * arithmetic, no job — and once it passes
    * `graft.autoCluster.minBytes` (default 256 MiB) Morton-clusters
    * exactly that increment via
    * [[Maintenance.zorderVersionedIncremental]]: an O(increment)
    * dataChange=false rearrange that streams skip and concurrent
    * appends commute with. The triggering write has already
    * committed, so a tick failure drops with a warning and the next
    * write re-probes. No recursion: the rearrange commits through
    * commitFileRewrite, which never ticks. */
  private def autoClusterTick(spark: SparkSession, dir: String,
                              protocol: CommitProtocol): Unit = {
    val cols = effectiveSetting(spark, dir, "spark.graft.autoCluster.columns",
        "graft.autoCluster.columns")
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    if (cols.isEmpty) return
    try {
      val minBytes = effectiveSetting(spark, dir,
        "spark.graft.autoCluster.minBytes", "graft.autoCluster.minBytes")
        .map(_.toLong).getOrElse(256L * 1024 * 1024)
      val bits = effectiveSetting(spark, dir,
        "spark.graft.autoCluster.bits", "graft.autoCluster.bits")
        .map(_.toInt).getOrElse(16)
      // target output file size (Delta's file-size tuning role):
      // the increment re-lands as ceil(bytes / targetBytes) files
      val targetBytes = effectiveSetting(spark, dir,
        "spark.graft.autoCluster.targetBytes", "graft.autoCluster.targetBytes")
        .map(_.toLong).getOrElse(128L * 1024 * 1024)
      latestVersion(spark, dir).foreach { v =>
        val victims = unclusteredLiveFiles(spark, dir, v)
        val bytes =
          if (victims.valuesIterator.forall(_.isEmpty)) 0L
          else fileBytesOf(spark, dir, v, victims)
        if (bytes >= math.max(1L, minBytes)) {
          Maintenance.zorderVersionedIncremental(spark, dir, cols,
            nFiles = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong).toInt,
            bits = bits, protocol = protocol)
          ()
        }
      }
    } catch {
      case scala.util.control.NonFatal(t) => log.warn(
        s"autoCluster tick at $dir dropped (${t.getClass.getSimpleName}: " +
          s"${t.getMessage}) — the write that triggered it already committed; " +
          "the next write re-probes")
    }
  }

  /** Post-commit AUTO COMPACT tick (Delta autoCompact's role): when
    * `spark.graft.autoCompact.enabled=true`, a successful write probes
    * the manifest and coalesces the smallest fragments via
    * [[compactSmallDirs]] (knobs: `spark.graft.autoCompact.targetBytes`
    * default 128 MiB, `.minDirs` default 8, `.maxDirs` default 64).
    * The user's write has ALREADY committed when the tick runs, so a
    * tick failure — an OCC loss to a concurrent writer, a legacy
    * manifest — must not fail the write that triggered it: it drops,
    * and the next write re-probes. */
  private def autoCompactTick(spark: SparkSession, dir: String,
                              protocol: CommitProtocol): Unit = {
    // session conf wins both ways; else the TABLE PROPERTY
    // `graft.autoCompact.enabled` (Delta's autoOptimize layering)
    if (!effectiveSetting(spark, dir, "spark.graft.autoCompact.enabled",
        "graft.autoCompact.enabled").exists(_.toBoolean))
      return
    def num(k: String, d: Long) =
      effectiveSetting(spark, dir, s"spark.graft.autoCompact.$k",
        s"graft.autoCompact.$k").map(_.toLong).getOrElse(d)
    try {
      compactSmallDirs(spark, dir,
        targetBytes = num("targetBytes", 128L * 1024 * 1024),
        minDirs = num("minDirs", 8L).toInt,
        maxDirs = num("maxDirs", 64L).toInt,
        protocol = protocol)
      ()
    } catch {
      case scala.util.control.NonFatal(t) => log.warn(
        s"autoCompact tick at $dir dropped (${t.getClass.getSimpleName}: " +
          s"${t.getMessage}) — the write that triggered it already committed; " +
          "the next write re-probes")
    }
  }

  private def writeVersionCore(spark: SparkSession, dir: String,
                               protocol: CommitProtocol, mode: SaveMode,
                               txn: Option[(String, Long)],
                               partitionBy: Option[StructType] = None,
                               extraLines: Seq[Line] = Seq.empty,
                               preWritten: Option[String] = None,
                               requireFresh: Boolean = false,
                               replaceDefinition: Boolean = false,
                               identityBasis: Option[Int] = None)
                              (write: String => Unit): Option[Int] = {
    require(mode == SaveMode.Overwrite || mode == SaveMode.Append,
      s"versioned writes are Overwrite or Append, got $mode")
    val (fs, root) = fsFor(spark, dir)
    val prev = latestVersion(spark, dir)
    // an atomic-CREATE commit (staged CTAS): the table must still not
    // exist. This check is advisory; the real guard is the manifest
    // claim below — v is 0 here, so a racing creator's v0 makes the
    // put-if-absent itself fail
    if (requireFresh) require(prev.isEmpty,
      s"table $dir was created concurrently — retry as REPLACE, or drop it")
    // IDENTITY assignment basis: the fill read the high-water mark of
    // a specific version; if anything committed since, the assigned
    // values may collide with the interloper's — refuse BEFORE any
    // byte is written and let the retry wrappers re-fill. (The
    // version claim below closes the remaining window: a commit that
    // lands after this check makes the put-if-absent itself fail.)
    identityBasis.foreach { b =>
      if (!prev.contains(b)) throw new IllegalStateException(
        s"identity assignment at $dir was based on version $b but the table is " +
          s"now at ${prev.getOrElse(-1)} — committed concurrently — retry the write")
    }
    val v = prev.map(_ + 1).getOrElse(0)
    // a streaming sink's first batch may CREATE the table; a plain
    // library Append to a non-existent table stays an error (it
    // extends state the caller assumed exists)
    require(mode == SaveMode.Overwrite || prev.nonEmpty || txn.nonEmpty,
      "cannot Append to a table with no versions")
    // replay guard BEFORE any data write: a batch this appId already
    // committed (batchId ≤ recorded) is an exact re-delivery after a
    // checkpoint restore — skipping it IS the exactly-once contract
    val replay = txn.exists { case (appId, batchId) =>
      prev.exists(p => lines(spark, dir, p).collectFirst {
        case TxnEntry(b, a) if a == appId => b }.exists(batchId <= _))
    }
    if (replay) return None
    // the nonce makes the data dir unique PER ATTEMPT (Delta writes
    // uniquely-named files for the same reason): two writers racing
    // the same version number each write their own dir, the manifest
    // claim picks the winner, and the loser's dir is an invisible
    // orphan for [[pruneVersions]] — without it the loser would
    // clobber the winner's in-flight data. A crashed attempt's dir is
    // equally invisible (no manifest references it) and needs no
    // clearing for the retry, which gets a fresh nonce.
    // a partitioned chain stays partitioned the same way: appends with
    // a different (or no) spec would mix layouts one read can't serve
    val prevPart = prev.flatMap(p =>
      lines(spark, dir, p).collectFirst { case PartitionEntry(cs) => cs })
    if (mode == SaveMode.Append && prev.nonEmpty) {
      val want = partitionBy.map(_.fieldNames.toSeq)
      require(prevPart == want,
        s"append partitioning ${want.getOrElse("none")} does not match the table's " +
          s"${prevPart.getOrElse("none")} — overwrite to change the layout")
    }
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val dataDir = preWritten.getOrElse(f"v$v%08d_data_$nonce")
    val dataPath = new Path(root, dataDir)
    // data first (invisible until the manifest lands) — already on
    // disk for a staged (ReplaceData) commit …
    if (preWritten.isEmpty) write(dataPath.toString)
    // footer harvest of the new dir only: schema + stats
    val (dirSchema, harvested) = partitionBy match {
      case Some(ps) =>
        // read-back infers partition columns (appended last); their
        // TYPES are pinned to the caller's declaration, not to what
        // the path values happen to parse as
        // driver-side footer read — no schema-inference job per
        // commit; hive layout strips partition values into paths so
        // only data columns come back, partition fields append below
        val inferred = parquetSchemaDriver(spark, Seq(dataPath.toString))
        val s = asNullable(StructType(
          inferred.fields.filterNot(f => ps.fieldNames.contains(f.name)) ++ ps.fields))
        (s, Skipping.collectDirStatsPartitioned(spark, dataPath, s, asNullable(ps)))
      case None =>
        val s = asNullable(parquetSchemaDriver(spark, Seq(dataPath.toString)))
        (s, Skipping.collectDirStats(spark, dataPath, s))
    }
    val (rows, colStats, dirFiles) = harvested
    // the chain's column mapping (logical→physical), empty when never
    // renamed. An APPEND's staged files must carry PHYSICAL names —
    // the df entry points translate ([[toPhysical]]); a raw
    // writeVersionWith callback that wrote a mapped LOGICAL name is
    // refused here (the union merge would otherwise record it as a
    // NEW column and its values would vanish from the logical view)
    val chainMap = prev.map(p => colMapOf(lines(spark, dir, p))).getOrElse(Map.empty)
    if (mode == SaveMode.Append && chainMap.nonEmpty) {
      dirSchema.fieldNames.find(n => chainMap.get(n).exists(_ != n)).foreach { n =>
        if (preWritten.isEmpty) fs.delete(dataPath, true)
        throw new IllegalArgumentException(
          s"append to $dir staged column '$n', which is a RENAMED logical name — " +
            s"files must carry the physical name '${chainMap(n)}'; write through " +
            "writeVersion/appendVersionWithRetry (they translate) instead of a raw callback")
      }
    }
    // parquet footers round-trip Spark field metadata, so a df read
    // FROM a generated table and written elsewhere would smuggle its
    // GENERATION_EXPRESSION into the new chain and silently turn on
    // enforcement the user never declared — generation is DDL, so the
    // footer-derived schema is STRIPPED of it here and the definition
    // re-enters only through the legitimate carriers (an append's
    // union keeps the prior fields; an overwrite's re-attach below)
    val dirSchemaClean = StructType(dirSchema.fields.map { f =>
      if (!f.metadata.contains(GenerationKey) && !f.metadata.contains(IdStartKey)) f
      else f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).remove(GenerationKey)
        .remove(IdStartKey).remove(IdStepKey).remove(IdAllowKey).build())
    })
    val newSchema0 = (mode, prev) match {
      case (SaveMode.Append, Some(p)) => unionSchema(schemaOf(spark, dir, p), dirSchemaClean)
      case _                          => dirSchemaClean
    }
    // do the STAGED files carry the chain's physical names? Appends do
    // (translated entry points + the guard above); a staged
    // (preWritten) overwrite does too — its bytes come from the
    // catalog's physical-named writer; a PLAIN overwrite starts the
    // physical layout fresh from its own files, so the mapping is
    // dropped and its carried NOT NULL lines rename to logical below
    val stagedPhysical = mode == SaveMode.Append || preWritten.nonEmpty
    val stagedMap = if (stagedPhysical) chainMap else Map.empty[String, String]
    val invChain = chainMap.map(_.swap)
    // column DEFAULTs are table definition carried as FIELD METADATA
    // (CURRENT_DEFAULT / EXISTS_DEFAULT): an append's union keeps the
    // prior fields (metadata included); a DATA overwrite re-attaches
    // them to its footer-derived fields here — only REPLACE TABLE
    // (replaceDefinition) starts without them
    val newSchema = (mode, prev) match {
      case (SaveMode.Overwrite, Some(p)) if !replaceDefinition =>
        val priorMd = schemaOf(spark, dir, p).fields.map { f =>
          (if (stagedPhysical) f.name else invChain.getOrElse(f.name, f.name)) -> f.metadata
        }.toMap
        StructType(newSchema0.fields.map { f =>
          priorMd.get(f.name) match {
            case Some(md) if md.contains("CURRENT_DEFAULT") || md.contains("EXISTS_DEFAULT") ||
                md.contains(GenerationKey) || md.contains(IdStartKey) =>
              val mb = new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(f.metadata)
              if (md.contains("CURRENT_DEFAULT"))
                mb.putString("CURRENT_DEFAULT", md.getString("CURRENT_DEFAULT"))
              if (md.contains("EXISTS_DEFAULT"))
                mb.putString("EXISTS_DEFAULT", md.getString("EXISTS_DEFAULT"))
              // IDENTITY is table definition like DEFAULTs: a data
              // overwrite keeps the declaration (and its hwm line
              // rides the definition-carry below) — REPLACE TABLE
              // starts clean
              if (md.contains(IdStartKey)) {
                mb.putLong(IdStartKey, md.getLong(IdStartKey))
                mb.putLong(IdStepKey, md.getLong(IdStepKey))
                if (md.contains(IdAllowKey))
                  mb.putBoolean(IdAllowKey, md.getBoolean(IdAllowKey))
              }
              // GENERATED ALWAYS AS is table definition like DEFAULTs:
              // a data overwrite re-attaches it to its footer-derived
              // fields (REPLACE TABLE starts clean). An overwrite
              // whose data OMITS a dependency column retires the
              // declaration with it (the bloom-declaration precedent)
              // — the expression could never evaluate again
              if (md.contains(GenerationKey) &&
                  constraintRefCols(spark, md.getString(GenerationKey)).forall(r =>
                    // the expression text is LOGICAL; staged-physical
                    // overwrites carry physical field names
                    newSchema0.fieldNames.exists(n =>
                      (if (stagedPhysical) invChain.getOrElse(n, n) else n)
                        .equalsIgnoreCase(r))))
                mb.putString(GenerationKey, md.getString(GenerationKey))
              f.copy(metadata = mb.build())
            case _ => f
          }
        })
      case _ => newSchema0
    }
    // enforced CHECK constraints: validate the JUST-WRITTEN dir before
    // the commit — O(delta), one combined job in the passing case; a
    // violation deletes the still-invisible dir and refuses, so a bad
    // write never becomes a version. SQL writes are additionally
    // refused plan-side by Spark's own CheckInvariant injection (the
    // catalog reports the constraints); this is the uniform backstop
    // every library path shares. NULL predicate results PASS (the SQL
    // CHECK contract). Read under the union schema so a constraint on
    // a column this commit's files lack evaluates over nulls.
    // `replaceDefinition` (REPLACE TABLE … AS SELECT): the statement
    // replaces the table DEFINITION, not just its rows — the old
    // constraints neither validate the new rows (they may not even
    // resolve against the new schema) nor survive into the new table.
    // Every DATA write (insert, overwrite, row-level rewrite) keeps
    // validating and carrying them.
    val activeConstraints =
      if (replaceDefinition) Seq.empty
      else prev.toSeq.flatMap(p =>
        lines(spark, dir, p).collect { case c: ConstraintEntry => c })
    if (activeConstraints.nonEmpty) {
      import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
      def violates(c: ConstraintEntry) =
        not(coalesce(expr(c.predicateSql), lit(true)))
      // constraint predicates are LOGICAL sql text; the staged files
      // are physical — validate under the logical names
      val staged = toLogicalDf(
        spark.read.schema(newSchema).parquet(dataPath.toString), stagedMap)
      if (!staged.filter(activeConstraints.map(violates).reduce(_ || _)).isEmpty) {
        val culprit = activeConstraints.find(c =>
          !staged.filter(violates(c)).isEmpty).get
        if (preWritten.isEmpty) fs.delete(dataPath, true)
        throw new IllegalArgumentException(
          s"write to $dir violates CHECK constraint '${culprit.name}' " +
            s"(${culprit.predicateSql}); nothing was committed")
      }
    }
    // GENERATED columns: value <=> expr on every committed row — the
    // implicit-CHECK backstop that covers ALL write paths (the df
    // entry points compute omitted columns; a DSv2-staged write that
    // produced a mismatching value refuses here instead of silently
    // diverging from the declaration). Null-safe: a null expression
    // result must be stored as null. REPLACE TABLE starts a fresh
    // definition, so nothing prior applies — the declared schema's own
    // metadata (if any) still validates.
    val genCols = generatedColumnsOf(newSchema)
    if (genCols.nonEmpty && rows > 0) {
      import org.apache.spark.sql.functions.{expr, not, col => fcol}
      val stagedG = toLogicalDf(
        spark.read.schema(newSchema).parquet(dataPath.toString), stagedMap)
      def logicalName(n: String) = if (stagedPhysical) invChain.getOrElse(n, n) else n
      def violatesGen(n: String, sql: String) =
        not(fcol(logicalName(n)) <=> expr(sql))
      // ONE combined job in the passing case (the CHECK pattern); the
      // culprit is identified only on violation
      if (!stagedG.filter(genCols.map((violatesGen _).tupled).reduce(_ || _)).isEmpty) {
        val (n, sql) = genCols.find { case (cn, csql) =>
          !stagedG.filter(violatesGen(cn, csql)).isEmpty }.get
        if (preWritten.isEmpty) fs.delete(dataPath, true)
        throw new IllegalArgumentException(
          s"write to $dir violates GENERATED column '${logicalName(n)}' = ($sql) — " +
            "provide the computed value, or omit the column on a library write " +
            "(it fills itself); nothing was committed")
      }
    }
    // NOT NULL columns: validate the JUST-WRITTEN dir from its footer
    // harvest — zero extra IO in the passing case (null counts are
    // already in hand); a dir whose files LACK the column refuses too
    // (the union-schema read would null-backfill it); only an
    // untrusted footer (no null count) pays a scan of the new dir.
    val activeNotNull =
      if (replaceDefinition) Seq.empty
      else prev.toSeq.flatMap(p =>
        lines(spark, dir, p).collect { case n: NotNullEntry => n })
    if (activeNotNull.nonEmpty && rows > 0) {
      activeNotNull.foreach { nn =>
        // notnull lines are keyed PHYSICAL; a fresh overwrite's staged
        // files (and harvested stats) use the logical names
        val effCol = if (stagedPhysical) nn.col else invChain.getOrElse(nn.col, nn.col)
        val violated = colStats.get(effCol) match {
          case None                          => true // column absent from the dir
          case Some(cs) => cs.nulls match {
            case Some(n)                     => n > 0
            case None =>
              !spark.read.schema(newSchema).parquet(dataPath.toString)
                .filter(org.apache.spark.sql.functions.col(effCol).isNull).isEmpty
          }
        }
        if (violated) {
          if (preWritten.isEmpty) fs.delete(dataPath, true)
          throw new IllegalArgumentException(
            s"write to $dir violates NOT NULL constraint on '$effCol'; " +
              "nothing was committed")
        }
      }
    }
    // constraints are table DEFINITION, not data: an overwrite
    // replaces the rows but keeps the contract (appends carry them
    // inside prevLines below)
    val carriedConstraints = (mode, prev) match {
      case (SaveMode.Overwrite, Some(_)) =>
        // a fresh overwrite drops the column mapping (logical IS the
        // new physical), so its carried NOT NULL lines rename with it
        val nn = if (stagedPhysical) activeNotNull
                 else activeNotNull.map(n => NotNullEntry(invChain.getOrElse(n.col, n.col)))
        nn ++ activeConstraints
      case _ => Seq.empty
    }
    // table PROPERTIES are definition too: a data overwrite keeps
    // them, REPLACE TABLE resets them, appends carry inside prevLines
    val carriedProps: Seq[Line] = (mode, prev) match {
      case (SaveMode.Overwrite, Some(p)) if !replaceDefinition =>
        lines(spark, dir, p).collect { case pr: PropEntry => pr }
      case _ => Seq.empty
    }
    // the mapping itself: appends carry it inside prevLines; a STAGED
    // overwrite (catalog CoW rewrite — its files are physical-named)
    // carries it explicitly, restricted to columns still present; a
    // plain overwrite drops it (fresh layout)
    val carriedColMap: Seq[Line] = (mode, preWritten) match {
      case (SaveMode.Overwrite, Some(_)) if !replaceDefinition && chainMap.nonEmpty =>
        val kept = chainMap.toSeq.sortBy(_._1)
          .filter { case (_, phys) => newSchema.fieldNames.contains(phys) }
        if (kept.isEmpty) Seq.empty else Seq(ColMapEntry(kept))
      case _ => Seq.empty
    }
    // txn watermarks are WRITER bookkeeping, not data: an overwrite
    // (INSERT OVERWRITE, UPDATE/MERGE rewrite, zorder, compact) must
    // not erase another writer's (appId, batchId) replay guard, or a
    // checkpoint-recovery replay after the maintenance commit would
    // re-commit an already-committed epoch and duplicate rows — the
    // reason Delta retains SetTransaction app versions across commits.
    // Only the committing writer's own watermark is replaced (below).
    val carriedTxns = (mode, prev) match {
      case (SaveMode.Overwrite, Some(p)) =>
        lines(spark, dir, p).collect {
          case t: TxnEntry if !txn.exists(_._1 == t.appId) => t
        }
      case _ => Seq.empty
    }
    // the COPY INTO ledger is writer bookkeeping like txn watermarks:
    // a data overwrite keeps it (or a maintenance rewrite would
    // re-open the per-file exactly-once window); REPLACE TABLE resets
    // it with the definition; appends carry it inside prevLines
    val carriedIngests: Seq[Line] = (mode, prev) match {
      case (SaveMode.Overwrite, Some(p)) if !replaceDefinition =>
        lines(spark, dir, p).collect { case i: IngestEntry => i }
      case _ => Seq.empty
    }
    // … and its protocol stamp rides with it (a feature flag carries
    // through a data overwrite exactly when its subject lines do)
    val carriedFeatures: Seq[Line] = (mode, prev) match {
      case (SaveMode.Overwrite, Some(p)) if carriedIngests.nonEmpty =>
        lines(spark, dir, p).collect {
          case f: FeatureEntry if f.name.equalsIgnoreCase("ingest") => f }
      case _ => Seq.empty
    }
    // IDENTITY high-water marks: advance in the SAME atomic claim as
    // the data (the version's put-if-absent IS the OCC — the basis
    // check at the top of this commit plus the claim make a stale
    // assignment impossible). Explicit BY DEFAULT values above the
    // mark advance it too — generated values can then never collide
    // with them; explicit values below it leave it unchanged.
    val idSpecsCore = identityColumnsOf(newSchema)
    // a FRESH identity declaration (no prior hwm line — a df whose
    // schema carries the identity metadata creating or re-defining a
    // table) holds to the same BIGINT-only contract as createTable;
    // legacy chains that declared INT before the refusal keep working
    // through prepareWrite's in-pass range guard
    idSpecsCore.foreach { spec =>
      val preDeclared = (if (replaceDefinition) None else prev).exists(p =>
        lines(spark, dir, p).exists {
          case HwmEntry(c, _) => c.equalsIgnoreCase(spec.col); case _ => false })
      require(preDeclared ||
          newSchema(spec.col).dataType == org.apache.spark.sql.types.LongType,
        s"identity column '${spec.col}' must be BIGINT, got " +
          s"${newSchema(spec.col).dataType} — a narrower cast collapses the " +
          "distributed assignment's partition offsets mod 2³² into duplicate ids")
    }
    val hwmLines: Seq[Line] = idSpecsCore.map { spec =>
      val base = (if (replaceDefinition) None else prev).flatMap(p =>
        lines(spark, dir, p).collectFirst {
          case HwmEntry(c, n) if c.equalsIgnoreCase(spec.col) => n
        }).getOrElse(spec.start)
      val bounds: Option[(Long, Long)] =
        if (rows == 0) None
        else colStats.get(spec.col) match {
          case Some(cs) if cs.min.nonEmpty =>
            Some((cs.min.get.toLong, cs.max.get.toLong))
          case Some(cs) if cs.nulls.isDefined => None // trusted all-null dir
          case None => None // column absent from this commit's files
          case Some(_) => // untrusted footer: one bounded agg over the new dir
            val r = spark.read.schema(newSchema).parquet(dataPath.toString)
              .agg(org.apache.spark.sql.functions.min(spec.col).cast("long"),
                org.apache.spark.sql.functions.max(spec.col).cast("long")).head()
            if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
        }
      val next = bounds.fold(base) { case (mn, mx) =>
        if (spec.step > 0) math.max(base, Math.addExact(mx, spec.step))
        else math.min(base, Math.addExact(mn, spec.step))
      }
      HwmEntry(spec.col, next)
    }
    val prevLines = (mode, prev) match {
      case (SaveMode.Append, Some(p)) => lines(spark, dir, p).filterNot {
        case _: SchemaEntry => true
        case _: PartitionEntry => true // re-added fresh below
        // this writer's txn watermark is being replaced; other
        // writers' watermarks ride along
        case TxnEntry(_, a) => txn.exists(_._1 == a)
        // re-emitted fresh below (the advanced mark replaces it)
        case h: HwmEntry => hwmLines.exists {
          case e: HwmEntry => e.col.equalsIgnoreCase(h.col); case _ => false }
        case _ => false
      }
      case _ => Seq.empty
    }
    val stats = externalizeStats(spark, dir,
      Seq(StatsEntry(dataDir, rows, colStats, dirFiles))).head.asInstanceOf[StatsEntry]
    // declared bloom columns: build this commit's per-file blooms,
    // one column-pruned scan of the NEW dir per declaration —
    // O(delta), only when the table opted in. A fresh overwrite
    // re-keys each declaration to the logical name like the NOT NULL
    // lines (the mapping drops).
    val prevBloomDecls = prev.toSeq.flatMap(p =>
        lines(spark, dir, p).collect { case b: BloomColEntry => b })
      .filter(_ => !replaceDefinition)
    val bloomDecls = prevBloomDecls.map { b =>
      if (stagedPhysical) b else BloomColEntry(invChain.getOrElse(b.col, b.col), b.bits)
    }.filter(b => newSchema.fieldNames.contains(b.col))
      // an overwrite whose data omits a declared column retires that
      // declaration with the column (building a bloom over a missing
      // column would fail every later write); appends keep it — the
      // union schema always carries the prior columns
    val bloomLines: Seq[Line] =
      if (rows > 0 && bloomDecls.nonEmpty)
        externalizeBlooms(spark, dir, bloomDecls.map(b => BloomEntry(dataDir, b.col,
          Bloom.buildDirBlooms(spark, dataPath.toString, newSchema, b.col, b.bits))))
      else Seq.empty
    // appends carry the declarations inside prevLines; an overwrite
    // (which resets the line set) re-adds them here
    val carriedBloomDecl: Seq[Line] = (mode, prev) match {
      case (SaveMode.Overwrite, Some(_)) => bloomDecls
      case _ => Seq.empty
    }
    val newLines = SchemaEntry(newSchema) +:
      (partitionBy.map(ps => PartitionEntry(ps.fieldNames.toSeq)).toSeq ++
        prevLines ++ carriedConstraints ++ carriedProps ++ carriedColMap ++
        carriedBloomDecl ++ carriedTxns ++ carriedIngests ++ carriedFeatures ++
        hwmLines ++
        txn.map { case (a, b) => TxnEntry(b, a) } ++ extraLines ++ bloomLines :+
        DataEntry(dataDir) :+ stats)
    // … then the atomic manifest commit publishes it. An APPEND
    // publishes O(delta) ops — schema only when the union CHANGED,
    // this writer's txn watermark, the new dir + its stats — never a
    // re-serialization of the whole table's file list; an OVERWRITE is
    // a full manifest (it resets the state: the checkpoint is free).
    (mode, prev) match {
      case (SaveMode.Append, Some(p)) =>
        val ops = Seq.newBuilder[String]
        if (!recordedSchema(spark, dir, p).contains(newSchema))
          ops += addOp(SchemaEntry(newSchema))
        txn.foreach { case (a, b) => ops += addOp(TxnEntry(b, a)) }
        extraLines.foreach(l => ops += addOp(l))
        bloomLines.foreach(l => ops += addOp(l))
        hwmLines.foreach(l => ops += addOp(l)) // replace-by-col semantics
        ops += addOp(DataEntry(dataDir))
        ops += addOp(stats)
        commitChild(spark, dir, v, p, newLines, ops.result(), protocol)
      case _ =>
        commitManifest(spark, dir, v, newLines.map(renderLine), protocol)
    }
    Some(v)
  }

  /** A version's schema: the recorded one where present, else derived
    * ONCE from the data dirs via mergeSchema (legacy manifests — the
    * next commit records the union, upgrading the table in place). */
  private def schemaOf(spark: SparkSession, dir: String, v: Int): StructType =
    recordedSchema(spark, dir, v).getOrElse {
      val dataDirs = lines(spark, dir, v).collect {
        case DataEntry(n) => new Path(new Path(dir), n).toString }
      asNullable(spark.read.option("mergeSchema", "true").parquet(dataDirs: _*).schema)
    }

  /** Fully-nullable normalization, RECURSIVE: append chains null-
    * backfill at every nesting level, and the same logical type can
    * arrive with different inner-field nullability (parquet round-trip
    * vs typed Dataset) — comparing un-normalized types would
    * spuriously reject an append that changes nothing. */
  private def asNullable(s: StructType): StructType =
    nullableOf(s).asInstanceOf[StructType]

  private def nullableOf(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
    dt match {
      case st: StructType => StructType(st.fields.map(f =>
        StructField(f.name, nullableOf(f.dataType), nullable = true, f.metadata)))
      case at: org.apache.spark.sql.types.ArrayType =>
        org.apache.spark.sql.types.ArrayType(nullableOf(at.elementType), containsNull = true)
      case mt: org.apache.spark.sql.types.MapType =>
        org.apache.spark.sql.types.MapType(nullableOf(mt.keyType),
          nullableOf(mt.valueType), valueContainsNull = true)
      case other => other
    }

  /** Union-with-null-backfill schema for an append chain: `a`'s fields
    * in order, then `b`'s additions. Evolution in this store ADDS or
    * DROPS columns (the S8/q111 semantics); a same-name field must
    * keep its type — a type change needs a rewrite, not an append. */
  /** The widenings this store serves METADATA-ONLY: Spark 4's parquet
    * readers (vectorized included) promote narrower physical values to
    * these read types natively, AND the manifest's canonical min/max
    * strings stay EXACT under the promotion (every byte/short/int is
    * exact as long or double). float→double is deliberately absent:
    * a float's canonical decimal re-parsed as double differs from the
    * widened value in the last bits, which would break the skipping
    * contract's one-sidedness — that change rewrites instead. */
  private def legalWidening(from: org.apache.spark.sql.types.DataType,
                            to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType | DoubleType) => true
      case (ShortType, IntegerType | LongType | DoubleType) => true
      case (IntegerType, LongType | DoubleType) => true
      case _ => false
    }
  }

  private def unionSchema(a: StructType, b: StructType): StructType = {
    val aNames = a.fieldNames.toSet
    b.fields.filter(f => aNames.contains(f.name)).foreach { f =>
      val prior = nullableOf(a(f.name).dataType)
      // a NARROWER incoming dir is fine after a type widening — the
      // recorded (wider) type keeps serving it, exactly how the
      // pre-widening files already read
      require(prior == nullableOf(f.dataType) ||
          legalWidening(nullableOf(f.dataType), prior),
        s"append changes type of column '${f.name}' ($prior -> ${f.dataType}); " +
          "widen via alterTableAtomic/ALTER COLUMN … TYPE, or overwrite")
    }
    StructType(a.fields ++ b.fields.filterNot(f => aNames.contains(f.name)))
  }

  /** The commit point, factored so the conflict guard is directly
    * testable: publish the manifest through the protocol's atomic
    * put-if-absent. Losing the claim (an existing manifest for `v`)
    * surfaces the concurrent writer instead of silently dropping one
    * — under [[PutIfAbsentCommit]] via the conditional create itself,
    * under [[RenameCommit]] via the HDFS rename-to-existing failure
    * (best-effort pre-check on POSIX). */
  /** Returns the in-commit timestamp stamped on the manifest, so the
    * delta path's checkpoint sidecar can carry the same clock. */
  private[graft] def commitManifest(spark: SparkSession, dir: String, v: Int,
                                    dirs: Seq[String],
                                    protocol: CommitProtocol = PutIfAbsentCommit): Long = {
    val (fs, root) = fsFor(spark, dir)
    fs.mkdirs(new Path(root, VDIR))
    // stamp the IN-COMMIT timestamp at the single commit seam, forced
    // monotone against the parent — every commit path (append delta,
    // overwrite, clone, restore, convert) carries it. Any ts the
    // caller's line set brought along (clone/restore render old
    // state) is dropped first: the stamp is THIS commit's clock, not
    // the copied history's.
    // the protocol stamp shares the seam: every commit declares the
    // format version it wrote (caller-carried stamps drop for the
    // same reason the ts does — clone/restore render old state)
    // the version-scoped rearrange flag drops from FULL line sets the
    // same way (clone/restore render a flagged version's old state);
    // a delta commit's own `+rearrange:1` op survives untouched
    val body = dirs.filterNot(l => l.startsWith("ts:") || l.startsWith("+ts:") ||
      l.startsWith("protocol:") || l.startsWith("+protocol:") ||
      l.startsWith("rearrange:"))
    val parentTs =
      if (v == 0) None
      else try lines(spark, dir, v - 1).collectFirst { case TsEntry(m) => m }
      catch { case _: Exception => None }
    val ts = math.max(System.currentTimeMillis(), parentTs.fold(Long.MinValue)(_ + 1L))
    val stamped = body.headOption.filter(_.startsWith("parent:")) match {
      case Some(h) => h +: s"+ts:$ts" +: s"+protocol:$SupportedProtocol" +: body.tail
      case None    => s"ts:$ts" +: s"protocol:$SupportedProtocol" +: body
    }
    val bytes = (stamped.mkString("\n") + "\n").getBytes("UTF-8")
    if (!protocol.putIfAbsent(fs, manifestPath(dir, v), bytes))
      throw new IllegalStateException(
        s"version $v at $dir was committed concurrently — retry the write")
    // a SUCCESSFUL claim proves any cached parse under this key
    // described a DELETED file (a raw `rm -r` of a chain followed by
    // re-creation at the same path — CONVERT, CREATE — is the one
    // drop path that cannot evict for itself); serving it would
    // resurrect the old chain's file list. A v0 claim means the WHOLE
    // prior chain is gone — its higher versions may be cached too,
    // and a time-travel read would serve them without touching disk
    if (v == 0) evictManifestCacheDir(spark, dir)
    else evictManifestCache(spark, dir, Seq(v))
    ts
  }

  /** Drop every cached parse of any manifest under `dir` — the
    * fresh-chain (v0) claim path. */
  private def evictManifestCacheDir(spark: SparkSession, dir: String): Unit = {
    val (fs, root) = fsFor(spark, dir)
    val prefix = fs.makeQualified(new Path(root, VDIR)).toString + "/"
    manifestCache.synchronized {
      val it = manifestCache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.startsWith(prefix)) {
          manifestCacheWeight -= e.getValue._2
          it.remove()
        }
      }
    }
  }

  /** Absolute paths of every dir the NEWEST version references — data
    * dirs AND deletion-vector dirs (both are part of the live state a
    * retention pass must not reclaim; older versions' dirs coexist on
    * disk until pruned). */
  def liveDataDirs(spark: SparkSession, dir: String): Seq[String] = {
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    lines(spark, dir, v).collect {
      case DataEntry(n)  => new Path(new Path(dir), n).toString
      case DvEntry(_, n) => new Path(new Path(dir), n).toString
      case ScopedDvEntry(_, n, _) => new Path(new Path(dir), n).toString
      case PdvEntry(n)   => new Path(new Path(dir), n).toString
    }
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
  /** The deletion-vector size contract, ENFORCED (not just documented):
    * every dv reader — the library anti-join's broadcast plan, the
    * DSv2 in-reader mask, the stream source's content compare — pulls
    * the key set to the driver or broadcasts it, so a mask is only
    * sound while the key set is small next to the table. This cap
    * turns the silent scale cliff (a 10⁸-key delete OOMing a reader
    * with no pointer at the contract) into a refusal AT DELETE TIME
    * that names the alternative: apply the delete physically via an
    * overwrite commit (`writeVersion(readLatest().join(keys,
    * "left_anti"), dir)` — one rewrite, no mask). Configurable per
    * session via `spark.graft.dv.maxKeys`. */
  def maxDvKeys(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.dv.maxKeys").map(_.toLong).getOrElse(10L * 1000 * 1000)

  def deleteByKeys(spark: SparkSession, dir: String, keys: DataFrame, keyCol: String,
                   protocol: CommitProtocol = PutIfAbsentCommit): Int =
    deleteByKeysCore(spark, dir, keys, keyCol, protocol, scoped = false)

  /** [[deleteByKeys]] with SQL DELETE semantics: the mask is SCOPED to
    * the data dirs present at commit time, so rows appended AFTER the
    * delete — including a re-INSERT of a masked key — are visible
    * (the reference's SQL DELETE removes current rows only). The SQL
    * catalog's DELETE routes here; the unscoped form stays the
    * library's key-level erasure contract. */
  def deleteByKeysScoped(spark: SparkSession, dir: String, keys: DataFrame, keyCol: String,
                         protocol: CommitProtocol = PutIfAbsentCommit): Int =
    deleteByKeysCore(spark, dir, keys, keyCol, protocol, scoped = true)

  def deleteByKeysScopedWithRetry(spark: SparkSession, dir: String,
                                  keys: DataFrame, keyCol: String,
                                  protocol: CommitProtocol = PutIfAbsentCommit,
                                  maxAttempts: Int = 16): Int =
    withCommitRetry(maxAttempts)(() =>
      deleteByKeysCore(spark, dir, keys, keyCol, protocol, scoped = true))

  private def deleteByKeysCore(spark: SparkSession, dir: String, keys: DataFrame,
                               keyCol0: String, protocol: CommitProtocol,
                               scoped: Boolean): Int = {
    require(keyCol0.matches("[A-Za-z0-9_]+"),
      s"keyCol must be word-shaped (it is embedded in the manifest), got '$keyCol0'")
    val (fs, root) = fsFor(spark, dir)
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    // the caller names the LOGICAL column; the dv line, the dv
    // parquet's column, and every mask join run PHYSICAL — one
    // translation here keeps deletes working across renames. The
    // TRANSLATED name is re-validated: it is the one embedded in the
    // colon-delimited dv line (a physical name with ':' would parse
    // back as a different key + dir — refuse, never corrupt)
    val keyCol = colMapOf(lines(spark, dir, prev)).getOrElse(keyCol0, keyCol0)
    require(keyCol.matches("[A-Za-z0-9_]+"),
      s"the physical storage name '$keyCol' of '$keyCol0' is not word-shaped — " +
        "deletion vectors embed it in the line-based manifest; rewrite the column " +
        "(REPLACE TABLE AS SELECT) to a plain name first")
    // a scoped delete against a table with no data dirs masks nothing
    // (there are no "current rows"): nothing to commit
    if (scoped && !lines(spark, dir, prev).exists(_.isInstanceOf[DataEntry]))
      return prev
    val v = prev + 1
    // unique per attempt for the same racing-writer reason as
    // writeVersionWith's data dirs
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val dvDir = f"v$v%08d_dv_$nonce"
    val dvPath = new Path(root, dvDir)
    val keyDf = keys.select(
      org.apache.spark.sql.functions.col(keyCol0).as(keyCol)).distinct()
    keyDf.write.mode(SaveMode.ErrorIfExists).parquet(dvPath.toString)
    // size guard BEFORE the commit (footer row count of the
    // just-written key set — metadata only): an oversized mask is
    // refused while it is still an invisible orphan dir, never after
    // readers depend on it
    val nKeys = Skipping.collectDirStats(spark, dvPath,
      asNullable(keyDf.schema))._1
    val cap = maxDvKeys(spark)
    if (nKeys > cap) {
      fs.delete(dvPath, true)
      throw new IllegalArgumentException(
        s"deleteByKeys: $nKeys distinct keys exceeds the deletion-vector size " +
          s"contract (spark.graft.dv.maxKeys=$cap). Every dv reader broadcasts the " +
          "key set; a mask this size belongs in a physical rewrite instead: " +
          "writeVersion(readLatest(dir).join(keys, Seq(keyCol), \"left_anti\"), dir)")
    }
    // schema and stats lines ride along unchanged: a delete touches
    // no data dir, so neither the union schema nor any dir's stats
    // move — the delta commit is ONE dv line. A scoped delete
    // snapshots the CURRENT data dirs: that is its statement-time
    // "rows that exist now".
    val dv: Line =
      if (scoped) ScopedDvEntry(keyCol, dvDir,
        lines(spark, dir, prev).collect { case DataEntry(n) => n })
      else DvEntry(keyCol, dvDir)
    commitChild(spark, dir, v, prev,
      lines(spark, dir, prev) :+ dv, Seq(addOp(dv)), protocol)
    v
  }

  /** Positional-deletion-vector size contract: the ceiling on TOTAL
    * recorded `(file, pos)` pairs per delete — every positional mask
    * reader pulls the set to the driver and ships it with the task
    * binary (the [[maxDvKeys]] shape, sorted-long arrays instead of a
    * key hash set). Session override `spark.graft.dv.maxPositions`. */
  def maxDvPositions(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.dv.maxPositions").map(_.toLong)
      .getOrElse(10L * 1000 * 1000)

  /** ANY-predicate DELETE as a POSITIONAL deletion vector — Delta's
    * row-index DV role, the one row-level operation the key-set masks
    * cannot express. `DELETE FROM t WHERE price < 10 AND cat = 'x'`
    * on a 100 TB table becomes: (1) one candidate-file selection from
    * the manifest's per-file stats (zero IO), (2) one scan of JUST
    * those files recording `_metadata.row_index` per matching row —
    * Spark's own parquet row-index generation, (3) one small
    * `(_file, _pos)` parquet sidecar + one manifest line. NO data
    * file is rewritten; time travel to pre-delete versions serves the
    * rows; compaction/OPTIMIZE later applies the mask physically and
    * retires it. Returns the committed version, or None when no row
    * matched (a no-op DELETE commits nothing).
    *
    * The predicate is ANSI SQL over the table's (logical) columns.
    * Size contract: [[maxDvPositions]] — a delete past it belongs in
    * a copy-on-write rewrite (SQL UPDATE/DELETE's group-based path,
    * or INSERT OVERWRITE of the complement read) and refuses with
    * that remedy. */
  def deleteWhere(spark: SparkSession, dir: String, predicateSql: String,
                  protocol: CommitProtocol = PutIfAbsentCommit,
                  maxAttempts: Int = 16): Option[Int] =
    withCommitRetry(maxAttempts) { () =>
      deleteWhereCore(spark, dir, Left(predicateSql), protocol)
    }

  /** [[deleteWhere]] over pre-translated V1 filters (LOGICAL names) —
    * the SQL catalog's non-key DELETE routes here. */
  private[graft] def deleteWherePositional(spark: SparkSession, dir: String,
                                           filters: Seq[org.apache.spark.sql.sources.Filter],
                                           protocol: CommitProtocol = PutIfAbsentCommit,
                                           maxAttempts: Int = 16): Option[Int] =
    withCommitRetry(maxAttempts) { () =>
      deleteWhereCore(spark, dir, Right(filters), protocol)
    }

  /** A V1 filter as a Column predicate — the mirror of Spark's
    * catalyst→sources translation for the handful of node kinds
    * [[graft.sql]]'s DELETE routing admits. None for a kind outside
    * that set (the router then refuses the statement to the
    * copy-on-write path rather than delete the wrong rows). */
  private[graft] def filterToColumn(f: org.apache.spark.sql.sources.Filter): Option[Column] = {
    import org.apache.spark.sql.functions.{col, lit, not}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v)            => Some(col(a) === lit(v))
      case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
      case GreaterThan(a, v)        => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v)           => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
      case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a)                => Some(col(a).isNull)
      case IsNotNull(a)             => Some(col(a).isNotNull)
      case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
      case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
      case StringContains(a, v)     => Some(col(a).contains(v))
      case AlwaysTrue               => Some(lit(true))
      case AlwaysFalse              => Some(lit(false))
      case And(l, r) => for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc && rc
      case Or(l, r)  => for (lc <- filterToColumn(l); rc <- filterToColumn(r)) yield lc || rc
      case Not(c)    => filterToColumn(c).map(not)
      case _         => None
    }
  }

  private def deleteWhereCore(spark: SparkSession, dir: String,
                              predicate: Either[String, Seq[org.apache.spark.sql.sources.Filter]],
                              protocol: CommitProtocol): Option[Int] = {
    import org.apache.spark.sql.functions.{col, expr, lit, when}
    val (fs, root) = fsFor(spark, dir)
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    val schema = ls.collectFirst { case SchemaEntry(s) => s }.getOrElse(
      throw new IllegalStateException(
        s"positional DELETE at $dir needs a recorded schema — this manifest " +
          "predates the schema line; rewrite the table (INSERT OVERWRITE) to upgrade"))
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val dataDirs = ls.collect { case DataEntry(n) => n }
    if (dataDirs.isEmpty) return None // no current rows: nothing to delete
    require(dataDirs.forall(n => stats.get(n).exists(_.files.nonEmpty)),
      s"positional DELETE at $dir needs manifest file lists for every data dir — " +
        "run backfillStats to upgrade pre-file-list manifests")
    require(!schema.fieldNames.contains(PdvFileCol) && !schema.fieldNames.contains(PdvPosCol),
      s"positional DELETE reserves the column names $PdvFileCol/$PdvPosCol")
    val cmap = colMapOf(ls)
    // the predicate in both forms: a Column for the row filter
    // (LOGICAL space — the scan renames physical→logical first) and
    // LOGICAL V1 conjuncts for the stats-based candidate-file prune
    val (predCol, logFilters) = predicate match {
      case Right(filters) =>
        val cols = filters.map(f => filterToColumn(f).getOrElse(
          throw new IllegalArgumentException(
            s"positional DELETE cannot express filter $f")))
        (cols.reduceOption(_ && _).getOrElse(lit(true)), filters)
      case Left(sql) =>
        // resolve through the table's own read so names, types, and
        // coercions mean exactly what the same WHERE means in a query
        import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Expression}
        val analyzed = readVersion(spark, dir, prev).filter(expr(sql))
          .queryExecution.analyzed
        def conjuncts(e: Expression): Seq[Expression] = e match {
          case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
          case o          => Seq(o)
        }
        val cond = analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition }
        (expr(sql),
          cond.toSeq.flatMap(conjuncts).flatMap(e =>
            org.apache.spark.sql.execution.datasources.GraftFilterShim.translate(e)))
    }
    // candidate FILES from per-file stats (one-sided: a kept file may
    // still match nothing); no translatable conjunct → every file
    val cand: Map[String, Set[String]] =
      rowLevelCandidateFiles(spark, dir, prev, logFilters).getOrElse(
        dataDirs.map(d => d -> stats(d).files.map(_.name).toSet).toMap)
    if (cand.forall(_._2.isEmpty)) return None // stats exclude every file
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    val subsetIndex = manifestPartitioningIndexSubset(spark, dir, prev, cand)
    val dataSchema = StructType(schema.fields.filterNot(f => partCols.contains(f.name)))
    val raw = spark.baseRelationToDataFrame(
      org.apache.spark.sql.execution.datasources.HadoopFsRelation(
        subsetIndex, StructType(partCols.map(schema(_))), dataSchema, None,
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
        Map.empty)(spark))
    val rootUri = rootUriPath(spark, dir)
    // rows scan RAW (pre-mask): re-recording an already-masked row's
    // position is a harmless union — and the raw scan keeps this one
    // job free of the mask joins
    val withMeta = raw.select(col("*"),
      uriPathOfCol(col("_metadata.file_path")).as(PdvFileCol),
      col("_metadata.row_index").as(PdvPosCol))
    val fileCol = col(PdvFileCol)
    val positions = toLogicalDf(withMeta, cmap)
      .filter(predCol)
      .select(
        when(fileCol.startsWith(rootUri + "/"),
          fileCol.substr(lit(rootUri.length + 2), lit(Int.MaxValue)))
          .otherwise(fileCol).as("_file"),
        col(PdvPosCol).cast("long").as("_pos"))
    val v = prev + 1
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val dvDir = f"v$v%08d_pdv_$nonce"
    val dvPath = new Path(root, dvDir)
    positions.write.mode(SaveMode.ErrorIfExists).parquet(dvPath.toString)
    // size + emptiness from the just-written footers (metadata only),
    // decided while the dir is still an invisible orphan
    val nPos = Skipping.collectDirStats(spark, dvPath,
      asNullable(positions.schema))._1
    if (nPos == 0L) { fs.delete(dvPath, true); return None }
    val cap = maxDvPositions(spark)
    if (nPos > cap) {
      fs.delete(dvPath, true)
      throw new IllegalArgumentException(
        s"deleteWhere: $nPos deleted positions exceeds the positional " +
          s"deletion-vector size contract (spark.graft.dv.maxPositions=$cap). Every " +
          "mask reader ships the position set with the task binary; a delete this " +
          "size belongs in a rewrite instead: INSERT OVERWRITE the complement read " +
          "(SELECT * FROM t WHERE NOT (predicate))")
    }
    val pdv: Line = PdvEntry(dvDir)
    // the first positional delete on a chain STAMPS the protocol
    // feature — readers without pdv support then refuse by NAME
    // instead of by raw unknown-line fallthrough
    val feat: Seq[Line] =
      if (ls.exists { case FeatureEntry(n, _) => n.equalsIgnoreCase("pdv")
                      case _ => false }) Seq.empty
      else Seq(FeatureEntry("pdv", required = true))
    commitChild(spark, dir, v, prev, (ls ++ feat) :+ pdv,
      feat.map(addOp) :+ addOp(pdv), protocol)
    Some(v)
  }

  /** The protocol features version `v` declares, as (name, required). */
  def tableFeatures(spark: SparkSession, dir: String, v: Int): Seq[(String, Boolean)] =
    lines(spark, dir, v).collect { case FeatureEntry(n, r) => (n, r) }

  /** Delta `ALTER TABLE … DROP FEATURE`'s role: retire a protocol
    * feature declaration so pre-feature readers can serve the table
    * again. Refuses while the feature is STILL IN USE (a `pdv` drop
    * with live positional dv lines would un-gate readers that would
    * then silently serve deleted rows — apply the masks physically
    * first: compact, or INSERT OVERWRITE the masked read). One
    * metadata commit. Returns the committed version; None when the
    * feature was never declared. */
  def dropTableFeature(spark: SparkSession, dir: String, feature: String,
                       protocol: CommitProtocol = PutIfAbsentCommit,
                       maxAttempts: Int = 16): Option[Int] =
    withCommitRetry(maxAttempts) { () =>
      val prev = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no versions at $dir"))
      val ls = lines(spark, dir, prev)
      if (!ls.exists { case FeatureEntry(n, _) => n.equalsIgnoreCase(feature)
                       case _ => false }) return None
      if (feature.equalsIgnoreCase("pdv"))
        require(!ls.exists(_.isInstanceOf[PdvEntry]),
          s"cannot drop feature 'pdv' at $dir: positional deletion vectors are " +
            "still live — apply them physically first (compact, or INSERT " +
            "OVERWRITE the masked read), then drop the feature")
      if (feature.equalsIgnoreCase("ingest"))
        require(!ls.exists(_.isInstanceOf[IngestEntry]),
          s"cannot drop feature 'ingest' at $dir: the COPY INTO ledger is " +
            "still live — forgetIngestHistory first (re-runs would then " +
            "re-load every source file), then drop the feature")
      val v = prev + 1
      commitChild(spark, dir, v, prev,
        ls.filterNot { case FeatureEntry(n, _) => n.equalsIgnoreCase(feature)
                       case _ => false },
        Seq(s"-feature:$feature"), protocol)
      Some(v)
    }

  /** A delete-heavy table accumulates one dv dir per [[deleteByKeys]]
    * until the next overwrite applies the mask physically. This bounds
    * the chain WITHOUT waiting for that overwrite: merge all dv dirs
    * of the same key column into one distinct key set and commit the
    * result as a new version over the SAME data dirs. Masked reads are
    * identical before and after (set union is the mask either way);
    * pre-compaction versions still time-travel to the un-merged chain;
    * the old dv dirs are reclaimed when those versions are pruned.
    *
    * SCOPED dvs (SQL DELETEs) compact by DIR COVERAGE: a data dir's
    * mask is the union of the keys of every scoped dv whose scope
    * contains it, so grouping the LIVE dirs by which scoped dvs cover
    * them and writing ONE merged dv per coverage group — scope = the
    * group's dirs, keys = the union — preserves every dir's mask
    * exactly while bounding the line count at the number of distinct
    * coverage groups (the same number of union branches the scoped
    * read already plans: [[readVersionFrom]] groups dirs the same
    * way). Dead scope entries (dirs since rewritten away) are trimmed
    * in the process — which itself can unify coverages and shrink the
    * plan's union. Commutes with concurrent appends/deletes, so a lost
    * manifest race retries against the refreshed chain. Returns the
    * new version, or None when nothing would change. */
  def compactDeletionVectors(spark: SparkSession, dir: String,
                             protocol: CommitProtocol = PutIfAbsentCommit,
                             maxAttempts: Int = 16): Option[Int] =
    withCommitRetry(maxAttempts) { () =>
      val (fs, root) = fsFor(spark, dir)
      val prev = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no versions at $dir"))
      val prevLines = lines(spark, dir, prev)
      val dvByKey = prevLines.collect { case e: DvEntry => e }
        .groupBy(_.keyCol).toSeq.sortBy(_._1)
      val liveDirs = prevLines.collect { case DataEntry(n) => n }
      val scopedAll = prevLines.collect { case e: ScopedDvEntry => e }
      // one group per (key column, distinct coverage): every live dir
      // in the group is masked by exactly the same scoped dvs, so one
      // merged dv with keys = their union and scope = the group's dirs
      // serves the group's mask verbatim. Scoped dvs covering NO live
      // dir drop entirely (their masked rows are gone).
      val coverageGroups: Seq[(String, Seq[ScopedDvEntry], Seq[String])] =
        scopedAll.map(_.keyCol).distinct.sorted.flatMap { k =>
          val dvs = scopedAll.filter(_.keyCol == k)
          liveDirs.map(d => d -> dvs.filter(_.scope.contains(d)))
            .filter(_._2.nonEmpty)
            .groupBy(_._2.map(_.name))
            .toSeq.sortBy(_._1.mkString(","))
            .map { case (_, xs) => (k, xs.head._2, xs.map(_._1)) }
        }
      // worth a commit when any plain-dv key column has >1 dir, any
      // coverage group merges >1 scoped dv, or the scoped line set
      // changes shape at all (dead dvs dropped, dead scope entries
      // trimmed)
      val scopedUnchanged =
        coverageGroups.length == scopedAll.length &&
          coverageGroups.forall { case (_, dvs, scope) =>
            dvs.length == 1 && dvs.head.scope == scope }
      val pdvAll = prevLines.collect { case e: PdvEntry => e }
      if (!dvByKey.exists(_._2.length > 1) && scopedUnchanged && pdvAll.length <= 1) None
      else {
        val v = prev + 1
        val ops = Seq.newBuilder[String]
        def mergeDirs(k: String, names: Seq[String]): String = {
          val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
          val dvDir = f"v$v%08d_dv_$nonce"
          readParquetNoInfer(spark, names.map(n => new Path(root, n).toString))
            .select(org.apache.spark.sql.functions.col(k)).distinct()
            .write.mode(SaveMode.ErrorIfExists)
            .parquet(new Path(root, dvDir).toString)
          dvDir
        }
        val merged: Seq[Line] = dvByKey.map { case (k, es) =>
          if (es.length == 1) es.head
          else {
            val dvDir = mergeDirs(k, es.map(_.name))
            es.foreach(e => ops += s"-dv:${e.name}")
            ops += addOp(DvEntry(k, dvDir))
            DvEntry(k, dvDir)
          }
        }
        // verbatim-surviving scoped lines emit no op; everything else
        // is removed by name FIRST (a scope-trim reuses its key dir,
        // and the removal op matches by name) and re-added after
        val scopedOut = coverageGroups.map { case (k, dvs, scope) =>
          if (dvs.length == 1 && dvs.head.scope == scope) (dvs.head, false)
          else {
            // a single-dv group with a stale scope reuses its key dir
            // (trim is metadata-only); multi-dv groups merge key sets
            val dvDir = if (dvs.length == 1) dvs.head.name
              else mergeDirs(k, dvs.map(_.name))
            (ScopedDvEntry(k, dvDir, scope), true)
          }
        }
        val verbatim = scopedOut.collect { case (e, false) => e }.toSet
        scopedAll.filterNot(verbatim).foreach(e => ops += s"-dv:${e.name}")
        scopedOut.collect { case (e, true) => e }.foreach(e => ops += addOp(e))
        // positional dvs merge by (file, pos) union — one sidecar
        // serves every accumulated DELETE's mask verbatim
        val pdvOut: Seq[Line] =
          if (pdvAll.length <= 1) pdvAll
          else {
            val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
            val pdvDir = f"v$v%08d_pdv_$nonce"
            spark.read.schema(PdvDirSchema)
              .parquet(pdvAll.map(e => new Path(root, e.name).toString): _*)
              .select("_file", "_pos").distinct()
              .write.mode(SaveMode.ErrorIfExists)
              .parquet(new Path(root, pdvDir).toString)
            pdvAll.foreach(e => ops += s"-dv:${e.name}")
            ops += addOp(PdvEntry(pdvDir))
            Seq(PdvEntry(pdvDir))
          }
        val kept = prevLines.filterNot(l =>
          l.isInstanceOf[DvEntry] || l.isInstanceOf[ScopedDvEntry] ||
            l.isInstanceOf[PdvEntry]) ++
          merged ++ scopedOut.map(_._1) ++ pdvOut
        commitChild(spark, dir, v, prev, kept, ops.result(), protocol)
        Some(v)
      }
    }

  /** (path, bytes) of every parquet file in the newest version —
    * served from the manifest's recorded file lists where present
    * (zero listing), falling back to a directory listing for dirs
    * that predate the file-list format and for dv dirs (which carry
    * no stats line; their key sets are tiny). */
  private[ext] def liveFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, v)
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    def abs(name: String) = new Path(new Path(dir), name).toString
    val (listed, toList) = ls.collect {
      case DataEntry(n)  => (n, true)
      case DvEntry(_, n) => (n, false)
    }.partition { case (n, isData) => isData && stats.get(n).exists(_.files.nonEmpty) }
    listed.flatMap { case (n, _) =>
      stats(n).files.map(f => (new Path(new Path(abs(n)), f.name).toString, f.bytes))
    } ++ CommitFiles.parquetUnder(spark, toList.map { case (n, _) => abs(n) })
  }

  /** Delta `DESCRIBE HISTORY`'s role: one row per committed version,
    * assembled from manifest BYTES alone (plus one file-status per
    * manifest for the commit time) — no data file is touched.
    * `n_rows` sums the recorded per-dir stats and is NULL when any
    * dir of the version predates stats recording; `n_columns` is the
    * recorded schema's width, NULL for legacy manifests;
    * `committed_at` is the manifest file's mtime (the same clock
    * [[graft.sql.VersionedCatalog]] resolves `TIMESTAMP AS OF`
    * against — honest caveat: filesystem mtimes survive most but not
    * all copies/restores, which is why the VERSION number is the
    * primary travel key). */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val (fs, _) = fsFor(spark, dir)
    import spark.implicits._
    versions(spark, dir).map { v =>
      val ls = lines(spark, dir, v)
      val dataDirs = ls.collect { case DataEntry(n) => n }
      val stats = ls.collect { case s: StatsEntry => s.name -> s.rows }.toMap
      val rows = if (dataDirs.forall(stats.contains)) Some(dataDirs.map(stats).sum)
        else None
      (v,
        new java.sql.Timestamp(commitTimestamp(spark, dir, v)),
        dataDirs.length,
        ls.count(l => l.isInstanceOf[DvEntry] || l.isInstanceOf[ScopedDvEntry] ||
          l.isInstanceOf[PdvEntry]),
        ls.collectFirst { case SchemaEntry(s) => s.fields.length },
        rows,
        ls.exists(_.isInstanceOf[RearrangeEntry]))
    }.toDF("version", "committed_at", "n_data_dirs", "n_dv_dirs", "n_columns",
      "n_rows", "rearranged")
  }

  /** One version's commit clock: the RECORDED in-commit timestamp
    * (`ts:` line — survives object-store copies, restores, clones,
    * and is monotone by construction), falling back to the manifest
    * file's modification time only for manifests that predate the
    * line. */
  def commitTimestamp(spark: SparkSession, dir: String, v: Int): Long =
    lines(spark, dir, v).collectFirst { case TsEntry(m) => m }.getOrElse {
      val (fs, _) = fsFor(spark, dir)
      fs.getFileStatus(manifestPath(dir, v)).getModificationTime
    }

  /** The newest version whose commit clock is at or before `tsMillis`
    * — `TIMESTAMP AS OF` resolution over [[commitTimestamp]]. */
  def versionAsOfTimestamp(spark: SparkSession, dir: String, tsMillis: Long): Option[Int] =
    versions(spark, dir).filter(v => commitTimestamp(spark, dir, v) <= tsMillis)
      .lastOption

  /** Upgrade a pre-round-8 table to the full skipping/schema read path
    * WITHOUT rewriting a byte of data: harvest footer stats for every
    * data dir the current manifest lacks them for, derive-and-record
    * the union schema if absent, and commit the enriched manifest as a
    * new version over the SAME dirs. Cost: one footer sweep of the
    * un-statted dirs (once, ever), one commutative commit — after
    * which reads plan with zero footer access and selective reads
    * skip. Returns the new version, or None when the manifest already
    * carries schema + full stats. */
  def backfillStats(spark: SparkSession, dir: String,
                    protocol: CommitProtocol = PutIfAbsentCommit,
                    maxAttempts: Int = 16): Option[Int] =
    withCommitRetry(maxAttempts) { () =>
      val (_, root) = fsFor(spark, dir)
      val prev = latestVersion(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no versions at $dir"))
      val ls = lines(spark, dir, prev)
      val stats = ls.collect { case s: StatsEntry => s.name -> s }.toMap
      // candidates: dirs with no stats line at all, a stats line from
      // before the file-list format (empty files), or file lists from
      // before the per-FILE-stats format (entries without row counts)
      // — each re-harvests so the newest read path can engage
      val candidates = ls.collect {
        case DataEntry(n) if stats.get(n).forall(st =>
          st.files.isEmpty || st.files.exists(_.rows.isEmpty)) => n }
      val hasSchema = ls.exists(_.isInstanceOf[SchemaEntry])
      // a partitioned chain harvests recursively with its partition
      // spec — the flat harvest would record an empty file list and
      // DOWNGRADE the entry (partitioned reads require file lists)
      val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }
      val harvested = candidates.map { n =>
        val p = new Path(root, n)
        val (rows, cols, dirFiles) = partCols match {
          case Some(cs) =>
            val full = schemaOf(spark, dir, prev)
            Skipping.collectDirStatsPartitioned(spark, p, full,
              StructType(cs.map(c => full(c))))
          case None =>
            val dirSchema = asNullable(spark.read.parquet(p.toString).schema)
            Skipping.collectDirStats(spark, p, dirSchema)
        }
        StatsEntry(n, rows, cols, dirFiles)
      }
      // idempotence: a nested-layout dir (no top-level files) harvests
      // the same empty entry every time — only a real CONTENT change
      // commits (the prior entry may carry a sidecar ref; compare the
      // stats themselves, not the serialization)
      val changed = harvested.exists(h => !stats.get(h.name)
        .exists(p => (p.rows, p.cols, p.files) == (h.rows, h.cols, h.files)))
      if (!changed && hasSchema) None
      else {
        val v = prev + 1
        val schema = schemaOf(spark, dir, prev) // derives once when absent
        val externalized = externalizeStats(spark, dir, harvested)
        val replaced = harvested.map(_.name).toSet
        val kept = ls.filterNot {
          case _: SchemaEntry => true
          case st: StatsEntry => replaced.contains(st.name)
          case _              => false
        }
        commitChild(spark, dir, v, prev,
          SchemaEntry(schema) +: (kept ++ externalized),
          addOp(SchemaEntry(schema)) +: externalized.map(addOp), protocol)
        Some(v)
      }
    }

  /** `VERSION AS OF v`: one multi-path parquet scan over the version's
    * data dirs, minus the keys of its deletion vectors (one anti-join
    * per distinct key column — key sets are tiny next to the data, so
    * the join broadcasts). When the manifest records the schema (every
    * commit from this code), the scan applies it with `.schema(...)`
    * and planning reads NO footer; an append chain spanning schema
    * evolution null-backfills missing columns from the union schema
    * exactly as mergeSchema would, without its per-read footer-merge
    * job. Pre-schema manifests fall back to mergeSchema — correct,
    * with the old plan-time cost, until their next commit records the
    * union. */
  def readVersion(spark: SparkSession, dir: String, v: Int): DataFrame =
    readVersionFrom(spark, dir, lines(spark, dir, v), dataFilter = _ => true)

  /** [[readVersion]] with manifest-level data skipping: dirs whose
    * recorded min/max/null stats PROVE no row can satisfy `filters`
    * (a conjunction) are dropped from the plan entirely — the
    * file-pruning half of Delta data skipping, done on manifest bytes
    * with zero footer reads. The same filters are then applied to the
    * surviving scan (and pushed into parquet by Catalyst as usual),
    * so the result is exact whether or not any dir could be skipped:
    * stats only ever REMOVE provably-empty work. Dirs without stats
    * (legacy) are always read. */
  def readVersionSkipping(spark: SparkSession, dir: String, v: Int,
                          filters: Seq[org.apache.spark.sql.sources.Filter]): DataFrame = {
    val ls = lines(spark, dir, v)
    // filters arrive in LOGICAL names; the stats are keyed physical —
    // rekey the stats once instead of rewriting every filter tree
    val cmap = colMapOf(ls)
    val schema = ls.collectFirst { case SchemaEntry(s) => toLogicalSchema(s, cmap) }
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val keep: String => Boolean = name => stats.get(name) match {
      case Some(st) if schema.nonEmpty =>
        !filters.exists(f =>
          Skipping.excludes(st.rows, rekeyToLogical(st.cols, cmap), schema.get, f))
      case _ => true
    }
    val pred = filters.map(Skipping.toColumn)
      .reduceOption(_ && _)
    pred.fold(readVersionFrom(spark, dir, ls, keep))(p =>
      readVersionFrom(spark, dir, ls, keep).filter(p))
  }

  /** The dirs a skipping read of version `v` would plan — exposed so
    * tests (and operators reporting skip effectiveness) can assert the
    * prune without running the query. */
  private[graft] def planDataDirs(spark: SparkSession, dir: String, v: Int,
                                  filters: Seq[org.apache.spark.sql.sources.Filter]): Seq[String] = {
    val ls = lines(spark, dir, v)
    val cmap = colMapOf(ls)
    val schema = ls.collectFirst { case SchemaEntry(s) => toLogicalSchema(s, cmap) }
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    // a predicate on the SOURCE of a generated partition column
    // derives a partition predicate — skipping-only, never re-applied
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    val all = filters ++ schema.toSeq.flatMap(s =>
      Skipping.derivePartitionFilters(spark, s, partCols, filters))
    ls.collect { case DataEntry(n) => n }.filter { name =>
      stats.get(name) match {
        case Some(st) if schema.nonEmpty =>
          !all.exists(f =>
            Skipping.excludes(st.rows, rekeyToLogical(st.cols, cmap), schema.get, f))
        case _ => true
      }
    }
  }

  /** The FILES a skipping read of version `v` would plan, after both
    * the dir-level and per-file prune — the file-granularity twin of
    * [[planDataDirs]], exposed so tests (and operators reporting skip
    * effectiveness) can assert that a selective filter prunes INSIDE
    * a surviving dir. Returns `dirName/fileName` relative paths. */
  private[graft] def planDataFiles(spark: SparkSession, dir: String, v: Int,
                                   filters: Seq[org.apache.spark.sql.sources.Filter]): Seq[String] = {
    val ls = lines(spark, dir, v)
    val cmap = colMapOf(ls)
    val inv = cmap.map(_.swap)
    val schema = ls.collectFirst { case SchemaEntry(s) => toLogicalSchema(s, cmap) }
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    // declared bloom columns (LOGICAL names for matching the filters)
    // + the per-(col, dir) blobs: the point-lookup prune bounds
    // cannot do — every declared column gets its own consultation
    val bloomColsHere = ls.collect { case BloomColEntry(c, _) => inv.getOrElse(c, c) -> c }
    val blooms = ls.collect { case b: BloomEntry => (b.col, b.dir) -> b.files }.toMap
    def bloomKeeps(dirName: String, fileName: String): Boolean =
      bloomColsHere.forall { case (logicalC, physC) =>
        blooms.get((physC, dirName)).flatMap(_.get(fileName)).forall(bits =>
          !filters.exists(flt => Bloom.excludes(flt, logicalC, bits)))
      }
    // derived generated-partition filters prune FILES too (each file
    // carries its partition values as point stats)
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    val all = filters ++ schema.toSeq.flatMap(s =>
      Skipping.derivePartitionFilters(spark, s, partCols, filters))
    val keptDirs = planDataDirs(spark, dir, v, filters)
    keptDirs.flatMap { name =>
      stats.get(name) match {
        case Some(st) if schema.nonEmpty && st.files.nonEmpty =>
          st.files.filter(f => (f.rows.isEmpty ||
              !all.exists(flt => Skipping.excludes(f.rows.get,
                rekeyToLogical(f.cols, cmap), schema.get, flt))) &&
              bloomKeeps(name, f.name))
            .map(f => s"$name/${f.name}")
        case Some(st) if st.files.nonEmpty => st.files.map(f => s"$name/${f.name}")
        case _ => Seq(name) // unlisted dir: read whole
      }
    }
  }

  /** Scoped-mask dispatch: data dirs group by WHICH scoped deletion
    * vectors cover them (a scoped dv inside its scope behaves exactly
    * like a plain dv, so each group reads through the plain path with
    * the applicable scoped masks appended as dv lines), and the groups
    * union. Dirs committed after a scoped delete are in no scope —
    * the SQL DELETE semantics the scope exists for. Typical shape:
    * one scoped delete → two groups → two manifest-planned scans. */
  private def readVersionFrom(spark: SparkSession, dir: String, ls: Seq[Line],
                              dataFilter: String => Boolean): DataFrame = {
    val scoped = ls.collect { case s: ScopedDvEntry => s }
    if (scoped.isEmpty) return readVersionPlain(spark, dir, ls, dataFilter)
    val plain = ls.filterNot(_.isInstanceOf[ScopedDvEntry])
    val dataEntries = plain.collect { case DataEntry(n) if dataFilter(n) => n }
    val groups = dataEntries
      .groupBy(n => scoped.filter(_.scope.contains(n)))
      .toSeq.sortBy(_._1.map(_.name).mkString(","))
    if (groups.isEmpty) return readVersionPlain(spark, dir, plain, _ => false)
    groups.map { case (applicable, dirs) =>
      val dirSet = dirs.toSet
      val subLs = plain.filter {
        case DataEntry(n) => dirSet.contains(n)
        case _ => true
      } ++ applicable.map(s => DvEntry(s.keyCol, s.name))
      readVersionPlain(spark, dir, subLs, _ => true)
    }.reduce(_.unionByName(_))
  }

  private def readVersionPlain(spark: SparkSession, dir: String, ls: Seq[Line],
                               dataFilter: String => Boolean): DataFrame = {
    def abs(name: String) = new Path(new Path(dir), name).toString
    val recorded = ls.collectFirst { case SchemaEntry(s) => s }
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }
    val dataEntries = ls.collect { case DataEntry(n) if dataFilter(n) => n }
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val fileListed = dataEntries.flatMap(n => stats.get(n).filter(_.files.nonEmpty))
    val base = recorded match {
      case Some(s) if dataEntries.isEmpty =>
        // every dir provably excluded: the empty relation, schema intact
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case Some(s) if partCols.nonEmpty =>
        // partitioned chain: the files hold only data columns (hive
        // layout strips the partition values into the paths), so the
        // read MUST go through the partition-aware manifest index,
        // which regroups files by their recorded partition values and
        // lets Spark's reader re-attach them — plus PartitionFilters
        // pruning at plan time, from manifest bytes
        val names = partCols.get
        require(fileListed.length == dataEntries.length,
          s"partitioned versioned read at $dir needs manifest file lists for every " +
            "data dir — run backfillStats to upgrade pre-file-list manifests")
        val partSchema = StructType(names.map(n => s(n)))
        val dataSchema = StructType(s.fields.filterNot(f => names.contains(f.name)))
        spark.baseRelationToDataFrame(
          org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            new ManifestFileIndex(new Path(dir), s, fileListed, partSchema,
              bloomCols = ls.collect { case BloomColEntry(c, _) => c },
              blooms = ls.collect { case b: BloomEntry => (b.col, b.dir) -> b.files }.toMap),
            partSchema, dataSchema, None,
            new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
            Map.empty)(spark))
      case Some(s) if fileListed.length == dataEntries.length =>
        // the full-manifest read path (Delta's TahoeFileIndex role):
        // every file status is served from manifest bytes — the plan
        // touches NO filesystem metadata, the manifest's file list is
        // the AUTHORITY (a stray file in a data dir is invisible), and
        // the index applies stats skipping to the PUSHED filters of
        // any plain .filter() read, not just the explicit skipping API
        spark.baseRelationToDataFrame(
          org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            new ManifestFileIndex(new Path(dir), s, fileListed,
              bloomCols = ls.collect { case BloomColEntry(c, _) => c },
              blooms = ls.collect { case b: BloomEntry => (b.col, b.dir) -> b.files }.toMap),
            org.apache.spark.sql.types.StructType(Nil), s, None,
            new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
            Map.empty)(spark))
      case Some(s) => spark.read.schema(s).parquet(dataEntries.map(abs): _*)
      case None    => spark.read.option("mergeSchema", "true").parquet(dataEntries.map(abs): _*)
    }
    // POSITIONAL masks ride Spark's own parquet row-index generation:
    // `_metadata.row_index` is computed from row-group metadata, so it
    // stays correct under row-group pruning — pushdown survives the
    // mask. The metadata columns attach at the RELATION (they do not
    // resolve past arbitrary plans), the subtraction is one left-anti
    // join against the small (file, pos) set, broadcast by size.
    val pdvDirs = ls.collect { case PdvEntry(n) => abs(n) }
    val base1 =
      if (pdvDirs.isEmpty || dataEntries.isEmpty) base
      else base.select(org.apache.spark.sql.functions.col("*"),
        uriPathOfCol(org.apache.spark.sql.functions.col("_metadata.file_path"))
          .as(PdvFileCol),
        org.apache.spark.sql.functions.col("_metadata.row_index").as(PdvPosCol))
    val masked = ls.collect { case DvEntry(k, n) => (k, abs(n)) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .foldLeft(base1) { case (df, (k, dvs)) =>
        df.join(
          readParquetNoInfer(spark, dvs.map(_._2))
            .select(org.apache.spark.sql.functions.col(k)).distinct(),
          Seq(k), "left_anti")
      }
    val posMasked =
      if (pdvDirs.isEmpty || dataEntries.isEmpty) masked
      else {
        import org.apache.spark.sql.functions.{broadcast, col}
        val rootUri = rootUriPath(spark, dir)
        val dv = spark.read.schema(PdvDirSchema).parquet(pdvDirs: _*)
          .select(pdvAbsFileCol(col("_file"), rootUri).as("_file"), col("_pos"))
          .distinct()
        masked.join(broadcast(dv),
            masked(PdvFileCol) === dv("_file") && masked(PdvPosCol) === dv("_pos"),
            "left_anti")
          .drop(PdvFileCol, PdvPosCol)
      }
    // the ONE read-boundary translation: everything above (schema,
    // file index, stats, dv keys) ran in physical name space; the
    // final aliasing Project serves the logical names, and pushdown
    // through it translates user predicates back to physical for free
    toLogicalDf(posMasked, colMapOf(ls))
  }

  /** Temp column names the positional-mask join attaches; refused as
    * data columns at delete time, dropped before rows are served. */
  private[ext] val PdvFileCol = "__graft_pdv_file__"
  private[ext] val PdvPosCol = "__graft_pdv_pos__"

  /** The "key column" a positional dv reports in deletion-vector
    * SNAPSHOTS (the rewrite-conflict sets): positional masks have no
    * key column, and '#' keeps the sentinel outside every legal
    * word-shaped column name. */
  private[graft] val PdvSnapshotKey = "#pos"

  /** The scheme-free path of a file URI STRING, keeping any
    * percent-encoding verbatim — `file:///a/b` | `file:/a/b` |
    * `hdfs://nn:8020/a/b` | `/a/b` all yield `/a/b`. The Scala twin
    * of [[uriPathOfCol]]; the two MUST stay in lockstep — positional
    * deletion vectors store `_file` in this spelling and every mask
    * (DataFrame join and DSv2 reader) compares through one of the
    * twins. */
  private[graft] def uriPathOf(s: String): String = {
    val afterAuthority = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)$".r
    val afterScheme = "^[a-zA-Z][a-zA-Z0-9+.-]*:(/.*)$".r
    s match {
      case afterAuthority(p) => p
      case afterScheme(p)    => p
      case other             => other
    }
  }

  /** SQL twin of [[uriPathOf]] for `_metadata.file_path`. */
  private def uriPathOfCol(c: Column): Column = {
    import org.apache.spark.sql.functions.regexp_replace
    regexp_replace(
      regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*/", "/"),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:/", "/")
  }

  /** The table root as a scheme-free absolute path — the prefix
    * positional `_file` refs resolve against. */
  private[graft] def rootUriPath(spark: SparkSession, dir: String): String = {
    val (fs, root) = fsFor(spark, dir)
    fs.makeQualified(root).toUri.getPath.stripSuffix("/")
  }

  /** A positional dv `_file` (manifest spelling) as an absolute
    * scheme-free path: local refs prefix the table root, adopted/
    * cloned refs are already absolute. */
  private def pdvAbsFileCol(c: Column, rootUri: String): Column = {
    import org.apache.spark.sql.functions.{concat, lit, when}
    when(c.startsWith("/"), c).otherwise(concat(lit(rootUri + "/"), c))
  }

  /** Everything the SQL catalog needs to plan one version: the
    * recorded schema (None for pre-schema manifests → mergeSchema
    * fallback), the absolute data dirs, and the deletion vectors
    * grouped by key column. */
  private[graft] final case class VersionInfo(schema: Option[StructType],
                                              dataDirs: Seq[String],
                                              dvDirs: Seq[(String, Seq[String])],
                                              partitionCols: Seq[String] = Seq.empty,
                                              // (keyCol, absolute dv dir, scoped data-dir NAMES)
                                              scopedDvs: Seq[(String, String, Set[String])] =
                                                Seq.empty,
                                              // absolute POSITIONAL dv dirs ((_file,_pos) parquet)
                                              posDvs: Seq[String] = Seq.empty,
                                              notNull: Seq[String] = Seq.empty,
                                              // logical→physical; EVERYTHING else in
                                              // this struct is raw PHYSICAL names —
                                              // the consumer translates where it
                                              // serves users (the SQL catalog's load)
                                              colMap: Map[String, String] = Map.empty)

  private[graft] def versionInfo(spark: SparkSession, dir: String, v: Int): VersionInfo = {
    val ls = lines(spark, dir, v)
    def abs(n: String) = new Path(new Path(dir), n).toString
    VersionInfo(
      ls.collectFirst { case SchemaEntry(s) => s },
      ls.collect { case DataEntry(n) => abs(n) },
      ls.collect { case DvEntry(k, n) => (k, abs(n)) }.groupBy(_._1).toSeq
        .sortBy(_._1).map { case (k, xs) => (k, xs.map(_._2)) },
      ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty),
      ls.collect { case ScopedDvEntry(k, n, sc) => (k, abs(n), sc.toSet) },
      ls.collect { case PdvEntry(n) => abs(n) },
      ls.collect { case NotNullEntry(c) => c },
      colMapOf(ls))
  }

  /** One data dir's weight for streaming admission control. */
  private[graft] final case class DirAdmission(absDir: String, files: Long, bytes: Long)

  /** Per-data-dir admission stats of version `v` — file count and
    * total bytes straight from the manifest's stats lines (ZERO
    * filesystem IO — rate-limiting a 100 TB stream must not list or
    * stat anything), in manifest (append) order. A dir recorded
    * before the per-file-list format counts as one file of unknown
    * (0) size — it still admits, just without a byte weight. The
    * streaming source's `maxFilesPerTrigger` / `maxBytesPerTrigger`
    * admit whole dirs from this list: a dir is one commit's write
    * (the atomicity unit), so it is also the admission unit. */
  private[graft] def dirAdmission(spark: SparkSession, dir: String, v: Int)
      : IndexedSeq[DirAdmission] = {
    val ls = lines(spark, dir, v)
    def abs(n: String) = new Path(new Path(dir), n).toString
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    ls.collect { case DataEntry(n) =>
      val (f, b) = stats.get(n).filter(_.files.nonEmpty)
        .map(e => (e.files.size.toLong, e.files.map(_.bytes).sum))
        .getOrElse((1L, 0L))
      DirAdmission(abs(n), f, b)
    }.toIndexedSeq
  }

  /** The enforced NOT NULL columns of a version, in manifest order,
    * under their LOGICAL names (the lines store the physical ones). */
  def notNullColumns(spark: SparkSession, dir: String, v: Int): Seq[String] = {
    val ls = lines(spark, dir, v)
    val inv = colMapOf(ls).map(_.swap)
    ls.collect { case NotNullEntry(c) => inv.getOrElse(c, c) }
  }

  /** A SUBSET of version `v`'s data dirs (absolute paths), read
    * through the full manifest-aware path — recorded schema,
    * manifest-served file index, PARTITION VALUES re-attached for
    * partitioned chains (a raw `spark.read.schema(...).parquet(dirs)`
    * of a partitioned dir would silently serve the partition columns
    * as null: the files don't hold them). `applyDv = false` serves the
    * dirs RAW, pre-mask — the streaming source's append-feed
    * semantics. */
  private[graft] def readVersionDirs(spark: SparkSession, dir: String, v: Int,
                                     keepAbs: Set[String],
                                     applyDv: Boolean): DataFrame = {
    val ls0 = lines(spark, dir, v)
    val ls = if (applyDv) ls0
      else ls0.filterNot(l => l.isInstanceOf[DvEntry] || l.isInstanceOf[ScopedDvEntry] ||
        l.isInstanceOf[PdvEntry])
    readVersionFrom(spark, dir, ls,
      n => keepAbs.contains(new Path(new Path(dir), n).toString))
  }

  /** The manifest-backed serving index of version `v` for the SQL
    * catalog ([[ManifestPartitioningIndex]] — typed here because the
    * manifest line model is package-private): partition spec (empty
    * for unpartitioned chains), leaf files, and per-file stats all
    * from manifest bytes. None when the manifest predates the
    * file-list format (caller falls back to the listing tier until
    * `backfillStats` upgrades the table); partitioned manifests always
    * carry file lists, so a missing list there is an error. */
  private[graft] def manifestPartitioningIndex(spark: SparkSession, dir: String, v: Int)
      : Option[org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex] = {
    val ls = lines(spark, dir, v)
    val schema = ls.collectFirst { case SchemaEntry(s) => s }.getOrElse(
      throw new IllegalStateException(s"no recorded schema at $dir v$v"))
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val dataDirs = ls.collect { case DataEntry(n) => n }
    if (!dataDirs.forall(n => stats.get(n).exists(_.files.nonEmpty))) {
      if (partCols.nonEmpty) throw new IllegalStateException(
        s"partitioned read at $dir needs manifest file lists — run backfillStats")
      None
    } else Some(new ManifestPartitioningIndex(spark, new Path(dir), schema,
      StructType(partCols.map(c => schema(c))), dataDirs.map(stats),
      bloomCols = ls.collect { case BloomColEntry(c, _) => c },
      blooms = ls.collect { case b: BloomEntry => (b.col, b.dir) -> b.files }.toMap))
  }

  /** The files of version `v` a row-level rewrite of `filters` must
    * treat as its group: the survivors of dir- and per-file stats
    * pruning (one-sided, so every file that COULD hold a matching row
    * is included), as dirName → file names. None when any data dir
    * lacks a manifest file list (legacy tier — the caller falls back
    * to the whole-table group) or when no filter was pushed at all. */
  private[graft] def rowLevelCandidateFiles(spark: SparkSession, dir: String, v: Int,
                                            filters: Seq[org.apache.spark.sql.sources.Filter])
      : Option[Map[String, Set[String]]] = {
    if (filters.isEmpty) return None
    val ls = lines(spark, dir, v)
    if (ls.collectFirst { case SchemaEntry(s) => s }.isEmpty) return None
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val dataDirs = ls.collect { case DataEntry(n) => n }
    // files recorded without per-file bounds are still sound: the
    // prune keeps them as candidates (one-sided), they just rewrite
    if (!dataDirs.forall(n => stats.get(n).exists(_.files.nonEmpty))) return None
    val kept = planDataFiles(spark, dir, v, filters)
    // split each `dirName/fileName` at the DIR-NAME boundary, not the
    // first '/': cloned refs are absolute (slashes inside the name)
    // and hive file entries carry subpaths (slashes inside the file)
    Some(kept.map { rel =>
      val d = dataDirs.filter(n => rel.startsWith(n + "/")).maxBy(_.length)
      (d, rel.stripPrefix(d + "/"))
    }.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet })
  }

  /** The live files of version `v` whose PARTITION VALUES satisfy
    * `predicateSql` — the selection seam of a partition-scoped
    * OPTIMIZE (`CALL system.zorder/compact_files(…, where => …)`).
    * EXACT, not one-sided: the predicate may reference partition
    * columns only (anything else refuses — a data-column predicate
    * cannot decide file membership), and each distinct partition
    * tuple is evaluated through Spark's own analyzer over a local
    * relation (driver-sized: one row per distinct tuple), so type
    * coercion matches what the same WHERE clause means in a query.
    * Returns dirName → file names; empty when nothing matches. */
  private[graft] def partitionScopedFiles(spark: SparkSession, dir: String, v: Int,
                                          predicateSql: String): Map[String, Set[String]] = {
    val ls = lines(spark, dir, v)
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    require(partCols.nonEmpty,
      s"partition-scoped file selection needs a PARTITIONED chain; $dir has no " +
        "partition spec — the unscoped maintenance call rewrites the whole table")
    val schema = ls.collectFirst { case SchemaEntry(s) => s }.getOrElse(
      throw new IllegalStateException(s"no recorded schema at $dir v$v"))
    val parsed = spark.sessionState.sqlParser.parseExpression(predicateSql)
    val refs = parsed.collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.mkString(".")
    }
    require(refs.nonEmpty && refs.forall(n => partCols.exists(_.equalsIgnoreCase(n))),
      s"partition-scoped maintenance takes a predicate over the partition columns " +
        s"(${partCols.mkString(", ")}) only; got '$predicateSql' referencing " +
        s"${refs.mkString(", ")}")
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val dataDirs = ls.collect { case DataEntry(n) => n }
    require(dataDirs.forall(n => stats.get(n).exists(_.files.nonEmpty)),
      s"partition-scoped selection at $dir needs manifest file lists for every " +
        "data dir — run backfillStats to upgrade pre-file-list manifests")
    val partSchema = StructType(partCols.map(c => schema(c)))
    def keyOf(f: FileStats): Seq[Option[String]] =
      partCols.map(c => f.cols.get(c).flatMap(_.min))
    val byKey: Seq[(Seq[Option[String]], Seq[(String, String)])] =
      dataDirs.flatMap(d => stats(d).files.map(f => (keyOf(f), (d, f.name))))
        .groupBy(_._1).toSeq.map { case (k, xs) => (k, xs.map(_._2)) }
    // canonical stats string → the EXTERNAL value the local relation
    // row wants (null partition value stays null → predicate NULL →
    // not selected, standard WHERE semantics)
    import org.apache.spark.sql.types._
    def external(c: String, dt: DataType): Any = dt match {
      case ByteType    => c.toLong.toByte
      case ShortType   => c.toLong.toShort
      case IntegerType => c.toLong.toInt
      case LongType    => c.toLong
      case DateType    => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(c.toLong))
      case StringType  => c
      case BooleanType => c.toBoolean
      case other => throw new IllegalStateException(s"unsupported partition type $other")
    }
    import scala.jdk.CollectionConverters._
    val rows = byKey.zipWithIndex.map { case ((k, _), i) =>
      org.apache.spark.sql.Row.fromSeq(
        partSchema.fields.zip(k).map {
          case (pf, Some(c)) => external(c, pf.dataType)
          case (_, None)     => null
        }.toSeq :+ i)
    }.toList.asJava
    val tupleSchema = StructType(partSchema.fields :+
      org.apache.spark.sql.types.StructField("__graft_tuple_idx", IntegerType, nullable = false))
    val matched = spark.createDataFrame(rows, tupleSchema)
      .filter(org.apache.spark.sql.functions.expr(predicateSql))
      .select("__graft_tuple_idx")
      .collect().map(_.getInt(0)).toSet // driver-sized: one row per distinct tuple
    byKey.zipWithIndex.collect { case ((_, files), i) if matched.contains(i) => files }
      .flatten.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
  }

  /** EVERY live file of version `v`, as dirName → file names — the
    * whole-table selection of a partitioned OPTIMIZE. Requires
    * manifest file lists (backfillStats upgrades legacy chains). */
  private[graft] def allLiveFilesMap(spark: SparkSession, dir: String,
                                     v: Int): Map[String, Set[String]] = {
    val ls = lines(spark, dir, v)
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val dataDirs = ls.collect { case DataEntry(n) => n }
    require(dataDirs.forall(n => stats.get(n).exists(_.files.nonEmpty)),
      s"whole-table file selection at $dir needs manifest file lists for every " +
        "data dir — run backfillStats to upgrade pre-file-list manifests")
    dataDirs.map(d => d -> stats(d).files.map(_.name).toSet).toMap
  }

  /** SHOW PARTITIONS from manifest bytes: one entry per live
    * partition tuple — `col1=v1/col2=v2` hive spelling (null values
    * as the hive default token), file count, exact rows, bytes.
    * Driver-sized: one row per partition, never per file. */
  private[graft] def partitionSummary(spark: SparkSession, dir: String, v: Int)
      : Seq[(String, Int, Long, Long)] = {
    val ls = lines(spark, dir, v)
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    require(partCols.nonEmpty, s"$dir is not partitioned — use detail for table totals")
    val schema = ls.collectFirst { case SchemaEntry(s) => s }.getOrElse(
      throw new IllegalStateException(s"no recorded schema at $dir v$v"))
    val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
    val dataDirs = ls.collect { case DataEntry(n) => n }
    require(dataDirs.forall(n => stats.get(n).exists(_.files.nonEmpty)),
      s"partition summary at $dir needs manifest file lists — run backfillStats")
    def render(tuple: Seq[Option[String]]): String =
      partCols.zip(tuple).map {
        case (c, Some(canon)) =>
          val dt = schema(c).dataType
          val shown = dt match {
            case org.apache.spark.sql.types.DateType =>
              java.time.LocalDate.ofEpochDay(canon.toLong).toString
            case _ => canon
          }
          s"$c=$shown"
        case (c, None) => s"$c=__HIVE_DEFAULT_PARTITION__"
      }.mkString("/")
    dataDirs.flatMap(d => stats(d).files)
      .groupBy(f => partCols.map(c => f.cols.get(c).flatMap(_.min)))
      .toSeq
      .map { case (tuple, files) =>
        (render(tuple), files.length, files.flatMap(_.rows).sum, files.map(_.bytes).sum)
      }
      .sortBy(_._1)
  }

  /** Total bytes of a file selection, from manifest stats alone. */
  private[graft] def fileBytesOf(spark: SparkSession, dir: String, v: Int,
                                 keep: Map[String, Set[String]]): Long = {
    val stats = lines(spark, dir, v).collect { case e: StatsEntry => e.name -> e }.toMap
    keep.iterator.flatMap { case (d, names) =>
      stats.get(d).toSeq.flatMap(_.files.filter(f => names.contains(f.name)).map(_.bytes))
    }.sum
  }

  /** Read a FILE SUBSET of version `v` through the full
    * manifest-aware path — recorded schema, partition values
    * re-attached, deletion vectors applied (scoped masks dispatched
    * per dir group, exactly as any read of the version) — the
    * rewrite-side read of a partition-scoped OPTIMIZE. */
  private[graft] def readVersionFiles(spark: SparkSession, dir: String, v: Int,
                                      keep: Map[String, Set[String]]): DataFrame = {
    val subset = lines(spark, dir, v).flatMap {
      case DataEntry(n) if !keep.get(n).exists(_.nonEmpty) => None
      case s: StatsEntry if keep.get(s.name).exists(_.nonEmpty) =>
        Some(s.copy(files = s.files.filter(f => keep(s.name).contains(f.name))))
      case _: StatsEntry => None
      case other => Some(other)
    }
    readVersionFrom(spark, dir, subset, _ => true)
  }

  /** [[manifestPartitioningIndex]] restricted to a file subset — the
    * serving index of a row-level rewrite's candidate-file scan. */
  private[graft] def manifestPartitioningIndexSubset(spark: SparkSession, dir: String,
                                                     v: Int, keep: Map[String, Set[String]])
      : org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex = {
    val ls = lines(spark, dir, v)
    val schema = ls.collectFirst { case SchemaEntry(s) => s }.getOrElse(
      throw new IllegalStateException(s"no recorded schema at $dir v$v"))
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    val subset = ls.collect {
      case e: StatsEntry if keep.get(e.name).exists(_.nonEmpty) =>
        val names = keep(e.name)
        e.copy(files = e.files.filter(f => names.contains(f.name)))
    }
    new ManifestPartitioningIndex(spark, new Path(dir), schema,
      StructType(partCols.map(c => schema(c))), subset)
  }

  /** Exact (rows, bytes) of version `v` from manifest stats alone —
    * None when any data dir lacks the recorded numbers (legacy). The
    * SQL tier serves these through DSv2 `SupportsReportStatistics` so
    * a join against a small versioned table plans its broadcast UP
    * FRONT instead of waiting for AQE's runtime detour. */
  private[graft] def manifestSizeOf(spark: SparkSession, dir: String,
                                    v: Int): Option[(Long, Long)] = {
    val ls = lines(spark, dir, v)
    val stats = ls.collect { case s: StatsEntry => s.name -> s }.toMap
    val dataDirs = ls.collect { case DataEntry(n) => n }
    if (!dataDirs.forall(stats.contains)) None
    else Some((dataDirs.map(stats(_).rows).sum,
      dataDirs.flatMap(stats(_).files).map(_.bytes).sum))
  }

  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val v = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    readVersion(spark, dir, v)
  }

  /** Delta `table_changes(tab, vFrom, vTo)` role, DERIVED on read: the
    * manifest store keeps no change log (every version is a full
    * state), so the change feed between two versions is recomputed
    * from the versions themselves — one full-outer join on the keys,
    * one explode, the [[graft.gold.Upsert.mergeChanges]] plan shape
    * (never a join per change class). Differences from mergeChanges'
    * MERGE-feed semantics: rows present in both versions with EQUAL
    * values emit NOTHING (a version diff has no "touched but
    * unchanged" notion), and schema evolution between the versions is
    * tolerated — the feed carries the union columns, null-padded per
    * side. Change classes: `insert` (key only in vTo), `delete` (key
    * only in vFrom), `update_preimage`/`update_postimage` (key in
    * both, any value column differs under null-safe equality).
    *
    * At 100 TB the DERIVE path is two manifest-planned scans + one
    * key-partitioned join — the price of not storing a log. Writers
    * that care about repeated CDC consumers record the feed at COMMIT
    * time instead ([[writeVersionWithChangeFeed]], Delta CDF's
    * `_change_data` role): when vTo's manifest carries a recorded
    * feed for exactly this (span, keys), it is served as one O(feed)
    * read and the derive never runs; [[changeFeed]] is the per-commit
    * multi-hop form. [[graft.gold.Upsert.mergeChanges]] (q95) stays
    * the MERGE-side twin. */
  def changesBetween(spark: SparkSession, dir: String, vFrom: Int, vTo: Int,
                     keys: Seq[String]): DataFrame = {
    require(vFrom <= vTo, s"vFrom $vFrom must be <= vTo $vTo")
    // KEYLESS form: a row-tracked table diffs on its stable row ids —
    // Delta's row-tracking payoff. Both endpoints must carry the
    // declaration (a span reaching before enablement has versions
    // whose rows HAVE no ids; refuse with the remedy, never join on a
    // null-backfilled key)
    val effKeys =
      if (keys.nonEmpty) keys
      else {
        def tracked(v: Int) =
          lines(spark, dir, v).collectFirst { case SchemaEntry(s) => s }
            .exists(s => identityColumnsOf(s).exists(_.col.equalsIgnoreCase(RowIdCol)))
        require(tracked(vFrom) && tracked(vTo),
          s"keyless changesBetween needs ROW TRACKING on both endpoints of the " +
            s"span (v$vFrom, v$vTo) at $dir — enableRowTracking first, or pass " +
            "key columns")
        Seq(RowIdCol)
      }
    // a feed RECORDED at vTo's commit for exactly this span and key
    // set serves directly — O(feed) instead of O(both versions)
    recordedChanges(spark, dir, vFrom, vTo, effKeys)
      .getOrElse(diffFeedFrames(
        readVersion(spark, dir, vFrom), readVersion(spark, dir, vTo), effKeys))
  }

  /** The reserved ROW-TRACKING column: a BIGINT identity every
    * row-tracked write assigns and every rewrite carries verbatim. */
  val RowIdCol = "_row_id"

  /** Delta ROW TRACKING's role: give every row a STABLE id —
    * assigned at write, never repeated, carried VERBATIM through
    * copy-on-write rewrites, compaction and Z-order (the rewrites
    * move the rows WITH their columns, and the id is a column) — so
    * [[changesBetween]] works KEYLESS and MERGE-style diffs stop
    * paying the full-outer derive on user keys.
    *
    * Implementation is deliberately a composition of two existing
    * contracts rather than new machinery: `_row_id` is declared a
    * `GENERATED BY DEFAULT AS IDENTITY` BIGINT (the distributed
    * assignment, gap-tolerant and never-repeating, with the
    * high-water mark advanced in the same atomic commit), and the
    * existing rows BACKFILL in one file-granular dataChange=false
    * rewrite (served rows unchanged — pre-existing streams' frozen
    * schemas ignore the new column). Unlike Delta's hidden metadata
    * column the id is VISIBLE in the schema — the honest shape for a
    * library (SELECT * shows it; writers may carry it through
    * explicitly, e.g. a MERGE copying rows).
    *
    * A partitioned chain's backfill re-lands the whole hive tree once
    * (the adoption price, same as Delta's backfill); from then on
    * appends assign incrementally. Returns the backfill version (= the
    * declaration version on an empty table). */
  def enableRowTracking(spark: SparkSession, dir: String,
                        protocol: CommitProtocol = PutIfAbsentCommit,
                        maxAttempts: Int = 16): Int = {
    import org.apache.spark.sql.functions.{coalesce, lit, monotonically_increasing_id, col => fcol}
    val v0 = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls0 = lines(spark, dir, v0)
    val schema0 = ls0.collectFirst { case SchemaEntry(s) => s }.getOrElse(
      throw new IllegalArgumentException(
        s"row tracking at $dir needs a recorded schema — commit once to record it"))
    require(!schema0.fieldNames.exists(_.equalsIgnoreCase(RowIdCol)),
      s"$dir already carries a '$RowIdCol' column — row tracking is enabled, or " +
        "the name is taken")
    // 1. declare: one metadata-only widen; appends from here assign
    addColumns(spark, dir, Seq(org.apache.spark.sql.types.StructField(
      RowIdCol, org.apache.spark.sql.types.LongType, nullable = true,
      identityMetadata(org.apache.spark.sql.types.Metadata.empty,
        start = 0L, step = 1L, allowExplicitInsert = true))), protocol)
    // 2. backfill: every EXISTING row gets its id in one rearrange
    withCommitRetry(maxAttempts) { () =>
      val v = latestVersion(spark, dir).get
      val victims = allLiveFilesMap(spark, dir, v)
      if (victims.valuesIterator.forall(_.isEmpty)) v // empty table: declared is enabled
      else {
        val info = versionInfo(spark, dir, v)
        def nameOf(abs: String) = abs.substring(abs.lastIndexOf('/') + 1)
        val dvSnapshot =
          info.dvDirs.flatMap { case (k, ds) => ds.map(d => (k, nameOf(d))) } ++
            info.scopedDvs.map { case (k, d, _) => (k, nameOf(d)) } ++
            info.posDvs.map(d => (PdvSnapshotKey, nameOf(d)))
        val base = lines(spark, dir, v).collectFirst {
          case HwmEntry(c, n) if c.equalsIgnoreCase(RowIdCol) => n }.getOrElse(0L)
        val staged = stageDataDir(spark, dir)
        val stagedPath = new Path(new Path(dir), staged)
        // a partitioned chain's backfill re-lands the whole hive tree
        // ONCE (adoption price, like Delta's backfill); the commit
        // stays the rearrange every stream skips
        val partCols = info.partitionCols
        val filled = toPhysical(
          readVersionFiles(spark, dir, v, victims)
            .withColumn(RowIdCol, coalesce(fcol(RowIdCol),
              lit(base) + monotonically_increasing_id())),
          columnMapping(spark, dir, v))
        (if (partCols.isEmpty) filled.write
         else filled.write.partitionBy(partCols: _*))
          .mode(SaveMode.ErrorIfExists).parquet(stagedPath.toString)
        // the rewrite commit advances the _row_id high-water mark from
        // the staged footers' bounds — the same atomic-claim contract
        // as every identity write
        commitFileRewrite(spark, dir, victims, Some(staged), partCols,
          dvSnapshot, protocol, dataChange = false).getOrElse(v)
      }
    }
  }

  /** The recorded feed for (vFrom → vTo] over `keys`, if vTo's
    * manifest carries one. */
  private def recordedChanges(spark: SparkSession, dir: String, vFrom: Int,
                              vTo: Int, keys: Seq[String]): Option[DataFrame] =
    lines(spark, dir, vTo).collectFirst {
      case ChangesEntry(f, t, ks, n) if f == vFrom && t == vTo && ks == keys =>
        readParquetNoInfer(spark, Seq(new Path(new Path(dir), n).toString))
    }

  /** True iff [[changesBetween]] over this span would serve a
    * RECORDED feed — exposed so tests pin the serve path. */
  private[graft] def hasRecordedChanges(spark: SparkSession, dir: String,
                                        vFrom: Int, vTo: Int, keys: Seq[String]): Boolean =
    lines(spark, dir, vTo).exists {
      case ChangesEntry(f, t, ks, _) => f == vFrom && t == vTo && ks == keys
      case _ => false
    }

  /** Delta CDF's `table_changes(tab, vFrom, vTo)` MULTI-COMMIT form:
    * one feed row set per commit in (vFrom, vTo], each tagged with its
    * `_commit_version` — recorded feeds served where present, derived
    * per step otherwise. Note the semantic difference from the
    * two-point [[changesBetween]]: a row inserted at v1 and deleted at
    * v2 appears in BOTH steps here, and not at all in the net diff —
    * per-commit history is what CDC consumers replay. */
  def changeFeed(spark: SparkSession, dir: String, vFrom: Int, vTo: Int,
                 keys: Seq[String]): DataFrame = {
    require(vFrom < vTo, s"need at least one commit in the span, got ($vFrom, $vTo]")
    // the CDF metadata contract (batch and stream alike): a LONG
    // `_commit_version` plus `_commit_timestamp` from the recorded
    // in-commit clock (mtime fallback for pre-ts manifests)
    (vFrom + 1 to vTo).map(v =>
      changesBetween(spark, dir, v - 1, v, keys)
        .withColumn("_commit_version", org.apache.spark.sql.functions.lit(v.toLong))
        .withColumn("_commit_timestamp", org.apache.spark.sql.functions.lit(
          new java.sql.Timestamp(commitTimestamp(spark, dir, v)))))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Commit `df` as the next version AND record the classified change
    * feed from the previous latest in the SAME commit — the write-time
    * CDF capture that turns every later [[changesBetween]] over this
    * step from an O(both versions) derive into an O(feed) read. The
    * diff is computed once, at the only moment both states are already
    * in hand; a first commit (no previous version) records nothing
    * (Delta's CDF starts at the second commit too). Overwrite
    * semantics — a lost race surfaces, as for every overwrite. */
  def writeVersionWithChangeFeed(df: DataFrame, dir: String, keys: Seq[String],
                                 protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    val spark = df.sparkSession
    keys.foreach(k => require(k.matches("[A-Za-z0-9_]+"),
      s"key column must be word-shaped (it is embedded in the manifest), got '$k'"))
    latestVersion(spark, dir) match {
      case None => writeVersion(df, dir, SaveMode.Overwrite, protocol)
      case Some(p) =>
        val v = p + 1
        val (_, root) = fsFor(spark, dir)
        val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
        val chDir = f"v$v%08d_changes_$nonce"
        // feed first (invisible until the manifest lands, exactly like
        // the data dir; a lost commit race leaves it an orphan)
        diffFeedFrames(readVersion(spark, dir, p), df, keys)
          .write.mode(SaveMode.ErrorIfExists).parquet(new Path(root, chDir).toString)
        writeVersionCore(spark, dir, protocol, SaveMode.Overwrite, txn = None,
          extraLines = Seq(ChangesEntry(p, v, keys, chDir)))(tmp =>
          df.write.mode(SaveMode.ErrorIfExists).parquet(tmp)).get
    }
  }

  /** Write-time CDF capture for a DELTA-BASED row-level commit
    * (Delta `enableChangeDataFeed`'s role for UPDATE/MERGE/DELETE):
    * when the table (or session) opts in, the merge-on-read commit
    * records the classified change feed alongside its position mask
    * and appended rows, turning every later [[changesBetween]] over
    * the step into an O(feed) read instead of an O(two versions)
    * derive that must also pay the mask. Key resolution:
    * `graft.cdf.keys` (comma-separated) wins; else
    * `graft.cdf.enabled=true` on a ROW-TRACKED table keys the feed on
    * `_row_id`; else no feed (the feed format is keyed — without
    * stable keys there is nothing exact to record). Cost, paid only
    * when enabled: ONE scan of the masked files semi-joined against
    * the (broadcast-small, contract-bounded) sidecar for the
    * pre-images, one read-back of the staged inserts, one small
    * parquet write — all invisible orphans until the manifest lands.
    * Returns the (keys, feedDir) pair for commitFileRewrite's
    * changeFeed leg; None when not enabled. */
  private[graft] def rowOpsFeed(spark: SparkSession, dir: String, v: Int,
                                masked: Option[(String, Map[String, Set[String]])],
                                insertDir: Option[String]): Option[(Seq[String], String)] = {
    import org.apache.spark.sql.functions.{broadcast, col => fcol}
    val explicit = effectiveSetting(spark, dir, "spark.graft.cdf.keys",
        "graft.cdf.keys")
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)
    val enabled = effectiveSetting(spark, dir, "spark.graft.cdf.enabled",
      "graft.cdf.enabled").exists(_.toBoolean)
    if (explicit.isEmpty && !enabled) return None
    val ls = lines(spark, dir, v)
    val cmap = colMapOf(ls)
    val logicalSchema = ls.collectFirst { case SchemaEntry(s) =>
      toLogicalSchema(s, cmap) }.getOrElse(return None)
    val keys =
      if (explicit.nonEmpty) explicit
      else if (identityColumnsOf(logicalSchema)
          .exists(_.col.equalsIgnoreCase(RowIdCol))) Seq(RowIdCol)
      else {
        log.warn(s"graft.cdf.enabled is set at $dir but the table is not " +
          "row-tracked and graft.cdf.keys is unset — no exact keyed feed can " +
          "be recorded; enableRowTracking or set graft.cdf.keys")
        return None
      }
    keys.foreach(k => require(k.matches("[A-Za-z0-9_]+") &&
      logicalSchema.fieldNames.exists(_.equalsIgnoreCase(k)),
      s"CDF key '$k' must be a word-shaped column of $dir"))
    val (_, root) = fsFor(spark, dir)
    val fields = logicalSchema.fieldNames.toSeq
    def emptyLogical =
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        asNullable(logicalSchema))
    // pre-images: the masked files read RAW with addresses, kept to
    // exactly the newly-masked positions (they were live at v by
    // construction — a just-matched row cannot have been pre-masked)
    val pre = masked match {
      case Some((sidecarDir, byDir)) =>
        val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }
          .getOrElse(Seq.empty)
        val physSchema = ls.collectFirst { case SchemaEntry(s) => s }.get
        val subsetIndex = manifestPartitioningIndexSubset(spark, dir, v, byDir)
        val dataSchema = StructType(
          physSchema.fields.filterNot(f => partCols.contains(f.name)))
        val raw = spark.baseRelationToDataFrame(
          org.apache.spark.sql.execution.datasources.HadoopFsRelation(
            subsetIndex, StructType(partCols.map(physSchema(_))), dataSchema, None,
            new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
            Map.empty)(spark))
        val rootUri = rootUriPath(spark, dir)
        import org.apache.spark.sql.functions.{lit, when}
        val fileRaw = uriPathOfCol(fcol("_metadata.file_path"))
        val withMeta = raw.select(fcol("*"),
          when(fileRaw.startsWith(rootUri + "/"),
            fileRaw.substr(lit(rootUri.length + 2), lit(Int.MaxValue)))
            .otherwise(fileRaw).as(PdvFileCol),
          fcol("_metadata.row_index").cast("long").as(PdvPosCol))
        val sc = spark.read.schema(PdvDirSchema)
          .parquet(new Path(root, sidecarDir).toString)
          .select(fcol("_file").as(PdvFileCol), fcol("_pos").cast("long").as(PdvPosCol))
        toLogicalDf(withMeta, cmap)
          .join(broadcast(sc), Seq(PdvFileCol, PdvPosCol), "leftsemi")
          .select(fields.map(fcol): _*)
      case None => emptyLogical
    }
    // post-images: the staged inserts, read back (hive re-lands
    // self-describe their partition values), served logical
    val ins = insertDir match {
      case Some(nd) =>
        toLogicalDf(spark.read.parquet(new Path(root, nd).toString), cmap)
          .select(fields.map(fcol): _*)
      case None => emptyLogical
    }
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val chDir = f"v$v%08d_changes_$nonce"
    diffFeedFrames(pre, ins, keys.map(k =>
        logicalSchema.fieldNames.find(_.equalsIgnoreCase(k)).get))
      .write.mode(SaveMode.ErrorIfExists).parquet(new Path(root, chDir).toString)
    Some((keys.map(k => logicalSchema.fieldNames.find(_.equalsIgnoreCase(k)).get),
      chDir))
  }

  private def diffFeedFrames(oldV: DataFrame, newV: DataFrame,
                             keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{array, col, explode, lit, struct, when}
    keys.foreach(k => require(oldV.columns.contains(k) && newV.columns.contains(k),
      s"key column '$k' must exist in both versions"))
    // union value columns (evolution-tolerant): vFrom's order, then
    // vTo's additions; each side null-pads what it lacks
    val dataCols = (oldV.columns.filterNot(keys.contains) ++
      newV.columns.filterNot(c => keys.contains(c) || oldV.columns.contains(c))).toSeq
    def pad(df: DataFrame, side: String) = dataCols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d.withColumnRenamed(c, s"__${side}_$c")
      else d.withColumn(s"__${side}_$c", lit(null))
    }
    val t = pad(oldV, "t").withColumn("__in_t", lit(1))
    val u = pad(newV, "u").withColumn("__in_u", lit(1))
    def img(side: String, tag: String) =
      struct(dataCols.map(c => col(s"__${side}_$c").as(c)) :+
        lit(tag).as("_change_type"): _*)
    val same = dataCols.map(c => col(s"__t_$c") <=> col(s"__u_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val changes =
      when(col("__in_t").isNull, array(img("u", "insert")))
        .when(col("__in_u").isNull, array(img("t", "delete")))
        .otherwise(array(img("t", "update_preimage"), img("u", "update_postimage")))
    t.join(u, keys, "full_outer")
      // matched-and-EQUAL rows emit nothing: the flag rides beside the
      // explode (an empty-array branch would need a typed empty
      // literal; the filter folds into the same projection)
      .select(keys.map(col) :+ same.as("__same") :+ explode(changes).as("__chg"): _*)
      .filter(!(col("__same") && col("__chg._change_type").startsWith("update")))
      .select(keys.map(col) ++
        (dataCols :+ "_change_type").map(c => col(s"__chg.$c")): _*)
  }

  /** Bounded optimistic retry for commits that lost a version-number
    * race: re-reads the new latest state and re-attempts at the next
    * number. Safe ONLY for COMMUTATIVE operations — append, delete-
    * by-keys, and dv compaction extend whatever the latest manifest
    * is, so the retried commit means the same thing after the
    * concurrent write as before it. */
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
    * (the default) everywhere — conditional PUT on object stores,
    * hardlink on local POSIX — and [[RenameCommit]] only under HDFS
    * semantics where rename-to-existing FAILS. On POSIX,
    * RenameCommit's rename silently REPLACES, so two local racers can
    * both "win" and one commit is lost — measured (the racing spec
    * fails under local RenameCommit by design of POSIX, passes under
    * the default); RenameCommit is therefore opt-in, with its
    * documented single-writer caveat. */
  def appendVersionWithRetry(df: DataFrame, dir: String,
                             protocol: CommitProtocol = PutIfAbsentCommit,
                             maxAttempts: Int = 16): Int =
    withCommitRetry(maxAttempts)(() =>
      writeVersion(df, dir, SaveMode.Append, protocol))

  /** Multi-writer [[writeVersionPartitioned]] append — same
    * commutative-append retry contract as [[appendVersionWithRetry]],
    * for the partitioned chains (the SQL INSERT INTO path). */
  def appendVersionPartitionedWithRetry(df: DataFrame, dir: String,
                                        partCols: Seq[String],
                                        protocol: CommitProtocol = PutIfAbsentCommit,
                                        maxAttempts: Int = 16): Int =
    withCommitRetry(maxAttempts)(() =>
      writeVersionPartitioned(df, dir, partCols, SaveMode.Append, protocol))

  /** Multi-writer [[deleteByKeys]] — key-masking commutes with
    * concurrent appends and other key deletes, so the same bounded
    * retry applies. */
  def deleteByKeysWithRetry(spark: SparkSession, dir: String,
                            keys: DataFrame, keyCol: String,
                            protocol: CommitProtocol = PutIfAbsentCommit,
                            maxAttempts: Int = 16): Int =
    withCommitRetry(maxAttempts)(() =>
      deleteByKeys(spark, dir, keys, keyCol, protocol))

  /** Delta `RESTORE TABLE … TO VERSION AS OF v` role: commit version
    * v's manifest — file list, schema, and stats — as the newest
    * version. No data is copied or rewritten (the manifest
    * re-references v's immutable dirs), and the restore itself is a
    * new version, so it is also undoable. Returns the new version id. */
  def restoreVersion(spark: SparkSession, dir: String, v: Int,
                     protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    // RESOLVED state, written FULL: a restored delta would otherwise
    // depend on a parent chain that retention may later reclaim, and
    // the restore's content is v's state, not a delta against latest
    val resolved = lines(spark, dir, v) // validates v exists
    val next = latestVersion(spark, dir).get + 1
    commitManifest(spark, dir, next, resolved.map(renderLine), protocol)
    next
  }

  // ───────────── SQL DDL: table lifecycle as manifest commits ─────────────

  /** `CREATE TABLE`'s role for the versioned store: commit version 0
    * as a METADATA-ONLY manifest — recorded schema (and partition
    * spec), zero data dirs — so the canonical SQL flow (CREATE TABLE,
    * then INSERT INTO) works without seeding a dummy write through
    * the library first. Reads of the empty version serve the empty
    * relation with the schema intact ([[readVersion]]'s zero-dir
    * case); the first INSERT is an ordinary append commit. Creation
    * is the same put-if-absent claim as every commit, so of two
    * racing CREATEs exactly one wins and the loser surfaces.
    * `partCols` (recorded LAST in the schema — the partitioned read
    * order) make the chain partitioned from birth: every append must
    * match the spec, and partition-column filters prune from manifest
    * bytes as on any partitioned chain. Returns the committed
    * version (always 0). */
  def createTable(spark: SparkSession, dir: String, schema: StructType,
                  partCols: Seq[String] = Seq.empty,
                  protocol: CommitProtocol = PutIfAbsentCommit,
                  constraints: Seq[(String, String)] = Seq.empty,
                  props: Map[String, String] = Map.empty): Int = {
    require(schema.fields.nonEmpty, "cannot create a table with no columns")
    props.foreach { case (k, x) =>
      require(k.matches("[A-Za-z0-9_.\\-]+"),
        s"property key must be dotted-word-shaped (it embeds in the manifest), got '$k'")
      require(!x.exists(c => c == '\n' || c == '\r'),
        s"property value for '$k' must be one line")
    }
    require(latestVersion(spark, dir).isEmpty,
      s"table $dir already exists (has committed versions)")
    constraints.foreach { case (n, sql) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"constraint name must be word-shaped, got '$n'")
      requireOneLine(sql, n)
    }
    partCols.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"partition column '$c' not in ${schema.fieldNames.mkString(",")}")
      require(Skipping.partitionableType(schema(c).dataType),
        s"partition column '$c' has type ${schema(c).dataType} — hive-path-exact " +
          "types only (string/int/long/short/byte/date/boolean)")
    }
    require(partCols.isEmpty || partCols.length < schema.fields.length,
      "a table cannot be partitioned by every column")
    val ordered =
      if (partCols.isEmpty) schema
      else StructType(schema.fields.filterNot(f => partCols.contains(f.name)) ++
        partCols.map(c => schema(c)))
    // non-nullable declared fields become enforced NOT NULL lines (the
    // recorded schema itself stays fully-nullable — append chains
    // null-backfill, and the constraint is what enforces)
    val notNull = ordered.fields.filterNot(_.nullable).map(f => NotNullEntry(f.name))
    // identity declarations open their high-water mark at the start
    // value; the column name embeds in the ':'-split hwm line
    val idSpecs = identityColumnsOf(ordered)
    idSpecs.foreach { s =>
      require(s.step != 0, s"identity column '${s.col}' cannot step by 0")
      require(ordered(s.col).dataType == org.apache.spark.sql.types.LongType,
        s"identity column '${s.col}' must be BIGINT, got ${ordered(s.col).dataType} — " +
          "the distributed assignment is hwm + step·monotonically_increasing_id(), " +
          "whose per-partition offsets (step·partitionId·2³³) collapse mod 2³² after " +
          "a narrower cast: an INT identity silently assigns DUPLICATE ids on any " +
          "multi-partition insert. Delta's identity contract is BIGINT-only too.")
      require(!s.col.exists(c => c == ':' || c == ',' || c == '\n' || c == '\r') &&
          s.col == s.col.trim,
        s"identity column name '${s.col}' cannot carry a high-water-mark line")
      require(!partCols.exists(_.equalsIgnoreCase(s.col)),
        s"identity column '${s.col}' cannot be a partition column (every insert " +
          "would open new partitions)")
    }
    val ls: Seq[Line] = SchemaEntry(asNullable(ordered)) +:
      ((if (partCols.isEmpty) Seq.empty[Line] else Seq[Line](PartitionEntry(partCols))) ++
        notNull ++ constraints.map { case (n, sql) => ConstraintEntry(n, sql) } ++
        idSpecs.map(s => HwmEntry(s.col, s.start)) ++
        props.toSeq.sortBy(_._1).map { case (k, x) => PropEntry(k, x) })
    commitManifest(spark, dir, 0, ls.map(renderLine), protocol)
    0
  }

  /** `DROP TABLE`'s role: delete the chain ROOT — manifests, data and
    * dv dirs, recorded feeds, and any orphans. Guarded: only a dir
    * that IS a versioned chain (has at least one committed manifest)
    * is touched — false for anything else, so a mistyped path can
    * never delete foreign content. Irreversible by design: this is
    * the one lifecycle operation that cannot commit a version,
    * because it removes the manifests a version would live in. */
  def dropTableChain(spark: SparkSession, dir: String): Boolean = {
    val (fs, root) = fsFor(spark, dir)
    val vs = versions(spark, dir)
    evictManifestCache(spark, dir, vs) // a re-created table must not serve the old parse
    vs.nonEmpty && fs.delete(root, true)
  }

  /** Shared shape of the metadata-only schema commits: replace the
    * recorded schema, carry every other manifest line forward
    * unchanged (data dirs, stats, dvs, txn watermarks, partition
    * spec), commit as the next version — so a schema change is
    * itself history: time travel to the pre-ALTER version serves the
    * pre-ALTER schema. */
  private def commitSchemaChange(spark: SparkSession, dir: String,
                                 protocol: CommitProtocol)
                                (change: (StructType, Seq[Line]) => StructType): Int = {
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    // pre-schema manifests: derive the union once — the ALTER commit
    // then records it, upgrading the table in place like any commit
    val prior = ls.collectFirst { case SchemaEntry(s) => s }
      .getOrElse(schemaOf(spark, dir, prev))
    val next = asNullable(change(prior, ls))
    // a dropped column takes its mapping entry with it (the physical
    // field is gone from the recorded schema; a stale entry would
    // keep its old name reserved forever)
    val priorMap = colMapOf(ls)
    val keptMap = priorMap.filter { case (_, p) => next.fieldNames.contains(p) }
    val mapOps: Seq[String] =
      if (keptMap == priorMap) Seq.empty
      else if (keptMap.isEmpty) Seq("-colmap")
      else Seq(addOp(ColMapEntry(keptMap.toSeq.sortBy(_._1))))
    val newLines = SchemaEntry(next) +: {
      val rest = ls.filterNot(_.isInstanceOf[SchemaEntry])
      if (keptMap == priorMap) rest
      else rest.filterNot(_.isInstanceOf[ColMapEntry]) ++
        (if (keptMap.isEmpty) Seq.empty else Seq(ColMapEntry(keptMap.toSeq.sortBy(_._1))))
    }
    val v = prev + 1
    commitChild(spark, dir, v, prev, newLines,
      addOp(SchemaEntry(next)) +: mapOps, protocol)
    v
  }

  /** `ALTER TABLE … ADD COLUMNS`'s role: a METADATA-ONLY commit that
    * widens the recorded schema — no data file is touched, existing
    * files simply lack the new columns and the recorded-schema read
    * null-backfills them (exactly how an evolving APPEND already
    * behaves; this is the same union, declared ahead of data).
    * Columns land after the existing data columns and BEFORE the
    * partition columns, preserving the partitioned read order.
    *
    * Name-addressed parquet caveat (the trade Delta makes in its
    * pre-column-mapping mode, which this store follows): re-adding a
    * previously DROPPED name resurrects values still present in live
    * files — with the SAME type that is well-defined (the drop was
    * metadata-only too); with a DIFFERENT type the read fails on
    * those files. Add under a fresh name to start clean. */
  def addColumns(spark: SparkSession, dir: String, cols: Seq[StructField],
                 protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    require(cols.nonEmpty, "no columns to add")
    commitSchemaChange(spark, dir, protocol) { (prior, ls) =>
      val cmap = colMapOf(ls)
      val logicalLower = toLogicalSchema(prior, cmap)
        .fieldNames.map(_.toLowerCase).toSet
      cols.foreach { f =>
        require(!logicalLower.contains(f.name.toLowerCase),
          s"column '${f.name}' already exists")
        // the resurrect-collision guard: a renamed-away column's
        // PHYSICAL name is still live in every file — a new column
        // landing on it would serve the old bytes as its own
        require(!cmap.values.exists(_.equalsIgnoreCase(f.name)),
          s"'${f.name}' is the physical storage name of a renamed column — " +
            "add it under a different name")
      }
      require(cols.map(_.name.toLowerCase).distinct.length == cols.length,
        s"duplicate names in ${cols.map(_.name).mkString(",")}")
      val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
      val (dataF, partF) = prior.fields.partition(f => !partCols.contains(f.name))
      StructType(dataF ++ cols ++ partF)
    }
  }

  /** `ALTER TABLE … DROP COLUMN`'s role: a METADATA-ONLY commit that
    * narrows the recorded schema. The bytes stay in the files (every
    * version is immutable); the recorded-schema read simply stops
    * projecting them, and the pre-ALTER version still serves the
    * column under time travel. Refused for partition columns (the
    * layout is keyed on them) and for deletion-vector key columns
    * (the mask could no longer be evaluated). For ERASURE semantics
    * a metadata drop is not enough — rewrite via
    * `writeVersion(readLatest(dir).drop(col), dir)` and prune. */
  def dropColumns(spark: SparkSession, dir: String, names: Seq[String],
                  protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    require(names.nonEmpty, "no columns to drop")
    commitSchemaChange(spark, dir, protocol) { (prior, ls) =>
      val cmap = colMapOf(ls)
      val logical = toLogicalSchema(prior, cmap)
      // callers name LOGICAL columns; the schema line and every guard
      // below speak physical
      val resolved = names.map { n =>
        val l = logical.fields.map(_.name).find(_.equalsIgnoreCase(n)).getOrElse(
          throw new IllegalArgumentException(
            s"no column '$n' in ${logical.fieldNames.mkString(",")}"))
        (l, cmap.getOrElse(l, l))
      }
      val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
      val dvKeys = ls.collect {
        case DvEntry(k, _) => k
        case ScopedDvEntry(k, _, _) => k
      }.toSet
      // columns a CHECK constraint reads are load-bearing too: the
      // write-time validation could no longer evaluate the predicate
      val constraintRefs = ls.collect { case ConstraintEntry(cn, sql) =>
        cn -> spark.sessionState.sqlParser.parseExpression(sql).collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            a.nameParts.head.toLowerCase
        }.toSet
      }
      resolved.foreach { case (l, n) =>
        require(!partCols.contains(n), s"cannot drop partition column '$n'")
        require(!dvKeys.contains(n),
          s"cannot drop '$n': it keys a live deletion vector — compact or " +
            "overwrite to apply the mask physically first")
        // constraint predicates are LOGICAL sql — compare the logical name
        constraintRefs.find(_._2.contains(l.toLowerCase)).foreach { case (cn, _) =>
          throw new IllegalArgumentException(
            s"cannot drop '$l': CHECK constraint '$cn' reads it — DROP CONSTRAINT first")
        }
        // a GENERATED column's dependencies are load-bearing the same
        // way — unless the generated column drops in the SAME call
        // (dropping the generated column itself is always fine: its
        // expression leaves with it)
        generatedColumnsOf(prior).find { case (g, sql) =>
          !g.equalsIgnoreCase(n) &&
            !resolved.exists(_._2.equalsIgnoreCase(g)) &&
            constraintRefCols(spark, sql).contains(l.toLowerCase)
        }.foreach { case (g, _) =>
          throw new IllegalArgumentException(
            s"cannot drop '$l': GENERATED column '${cmap.map(_.swap).getOrElse(g, g)}' " +
              "is computed from it — drop the generated column first (or in the " +
              "same call)")
        }
        // this single-purpose commit cannot remove the constraint line
        // with the column; the atomic ALTER can (and does)
        require(!ls.exists { case NotNullEntry(c) => c.equalsIgnoreCase(n); case _ => false },
          s"cannot drop '$l': it carries NOT NULL — use alterTableAtomic " +
            "(SQL ALTER TABLE), which drops the constraint with the column")
        require(!ls.exists { case BloomColEntry(c, _) => c.equalsIgnoreCase(n); case _ => false },
          s"cannot drop '$l': it is the bloom-indexed column — drop_bloom first, " +
            "or use alterTableAtomic (SQL ALTER TABLE), which retires the index " +
            "with the column")
      }
      val dropSet = resolved.map(_._2).toSet
      val kept = prior.fields.filterNot(f => dropSet.contains(f.name))
      require(kept.nonEmpty, "cannot drop every column")
      StructType(kept)
    }
  }

  /** The enforced CHECK constraints of a version, as (name,
    * predicateSql) in manifest order. */
  def checkConstraints(spark: SparkSession, dir: String, v: Int): Seq[(String, String)] =
    lines(spark, dir, v).collect { case ConstraintEntry(n, s) => (n, s) }

  /** `ALTER TABLE … ADD CONSTRAINT name CHECK (expr)`'s role (Delta
    * CHECK constraints): validate that EVERY existing row satisfies
    * the predicate (one scan of the current masked state — a
    * constraint that the data already violates refuses, Delta's
    * contract), then commit the constraint as a METADATA-ONLY
    * version. From then on every write — library or SQL — validates
    * its new rows before committing ([[writeVersionCore]]'s
    * backstop), and the SQL catalog reports the constraint through
    * DSv2 `Table.constraints()` so Spark's analyzer also refuses
    * violating INSERTs plan-side. NULL predicate results PASS (SQL
    * CHECK semantics). */
  /** The manifest is line-based: a predicate containing a line break
    * would render as two manifest lines, the second parsing as a
    * phantom data dir — every later read of the table would fail. */
  private def requireOneLine(sql: String, name: String): Unit =
    require(sql.nonEmpty && !sql.exists(c => c == '\n' || c == '\r'),
      s"CHECK predicate of '$name' must be non-empty single-line SQL " +
        s"(it is embedded in the line-based manifest); got ${sql.length} chars " +
        "with a line break")

  def addCheckConstraint(spark: SparkSession, dir: String, name: String,
                         predicateSql: String,
                         protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"constraint name must be word-shaped (it is embedded in the manifest), got '$name'")
    requireOneLine(predicateSql, name)
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    require(!ls.exists { case ConstraintEntry(n, _) => n.equalsIgnoreCase(name); case _ => false },
      s"constraint '$name' already exists")
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    val violating = readVersion(spark, dir, prev)
      .filter(not(coalesce(expr(predicateSql), lit(true))))
    require(violating.isEmpty,
      s"cannot add CHECK constraint '$name' ($predicateSql): existing rows violate it " +
        s"— e.g. ${violating.head()}")
    val v = prev + 1
    val c = ConstraintEntry(name, predicateSql)
    commitChild(spark, dir, v, prev, ls :+ c, Seq(addOp(c)), protocol)
    v
  }

  /** `ALTER TABLE … DROP CONSTRAINT`'s role: metadata-only removal.
    * Returns the new version, or None when no such constraint exists
    * (the caller decides whether that is an error — IF EXISTS). */
  def dropCheckConstraint(spark: SparkSession, dir: String, name: String,
                          protocol: CommitProtocol = PutIfAbsentCommit): Option[Int] = {
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    if (!ls.exists { case ConstraintEntry(n, _) => n.equalsIgnoreCase(name); case _ => false }) None
    else {
      val v = prev + 1
      commitChild(spark, dir, v, prev,
        ls.filterNot {
          case ConstraintEntry(n, _) => n.equalsIgnoreCase(name)
          case _ => false
        },
        Seq(s"-constraint:$name"), protocol)
      Some(v)
    }
  }

  /** The changes of ONE SQL `ALTER TABLE` statement, to be applied as
    * ONE metadata-only manifest commit by [[alterTableAtomic]].
    * `dropChecks` carries (name, ifExists). */
  final case class AlterSpec(addCols: Seq[StructField] = Seq.empty,
                             dropCols: Seq[String] = Seq.empty,
                             addChecks: Seq[(String, String)] = Seq.empty,
                             dropChecks: Seq[(String, Boolean)] = Seq.empty,
                             setNotNull: Seq[String] = Seq.empty,
                             dropNotNull: Seq[String] = Seq.empty,
                             // ALTER COLUMN … TYPE: metadata-only widenings
                             // ([[legalWidening]]); (column, new type)
                             widenCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
                               Seq.empty,
                             // ALTER COLUMN … SET/DROP DEFAULT: the
                             // CURRENT_DEFAULT field-metadata update
                             // (None = drop); EXISTS_DEFAULT never moves
                             setDefaults: Seq[(String, Option[String])] = Seq.empty) {
    def isEmpty: Boolean =
      addCols.isEmpty && dropCols.isEmpty && addChecks.isEmpty &&
        dropChecks.isEmpty && setNotNull.isEmpty && dropNotNull.isEmpty &&
        widenCols.isEmpty && setDefaults.isEmpty
  }

  /** The column names a CHECK predicate reads (top-level attributes of
    * the parsed expression, lower-cased). */
  private def constraintRefCols(spark: SparkSession, sql: String): Set[String] =
    spark.sessionState.sqlParser.parseExpression(sql).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.head.toLowerCase
    }.toSet

  /** Rewrite a stored CHECK predicate's references from one LOGICAL
    * column name to another (the constraint-follows-rename seam):
    * parse, rename the attribute heads, re-render. The predicate text
    * is logical by contract, so a rename only ever touches it here. */
  private def renameInConstraintSql(spark: SparkSession, sql: String,
                                    from: String, to: String): String =
    spark.sessionState.sqlParser.parseExpression(sql).transform {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.head.equalsIgnoreCase(from) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
          to +: a.nameParts.tail)
    }.sql

  /** Apply one ALTER TABLE statement's changes — column adds/drops and
    * CHECK constraint adds/drops — as ONE manifest commit, with EVERY
    * refusal condition checked BEFORE anything commits. The per-change
    * commit shape ([[addColumns]] then [[dropColumns]] then constraint
    * changes) can refuse mid-sequence and leave the statement durably
    * HALF-APPLIED (columns added, constraint missing); a statement is
    * atomic or it is nothing. Returns the committed version, or None
    * for an empty spec. Semantics match the individual operations:
    * drops resolve against the PRE-alter schema, an added constraint
    * must hold on the existing rows (added columns read as null —
    * NULL passes, the SQL CHECK contract), and the usual guards apply
    * (partition / dv-key / constraint-referenced columns cannot be
    * dropped unless the referencing constraint is dropped in the SAME
    * statement). */
  def alterTableAtomic(spark: SparkSession, dir: String, alter: AlterSpec,
                       protocol: CommitProtocol = PutIfAbsentCommit): Option[Int] = {
    if (alter.isEmpty) return None
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    val prior = ls.collectFirst { case SchemaEntry(s) => s }
      .getOrElse(schemaOf(spark, dir, prev))
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    val dvKeys = ls.collect {
        case DvEntry(k, _) => k
        case ScopedDvEntry(k, _, _) => k
      }.toSet
    val existingChecks = ls.collect { case c: ConstraintEntry => c }
    // ── validate EVERYTHING first; commit once at the end ──
    // constraint drops: strict names must exist
    val dropCheckNames = alter.dropChecks.flatMap { case (n, ifExists) =>
      val found = existingChecks.exists(_.name.equalsIgnoreCase(n))
      if (found) Some(n)
      else if (ifExists) None
      else throw new IllegalArgumentException(
        s"no CHECK constraint '$n' on $dir (have: ${existingChecks.map(_.name).mkString(", ")})")
    }
    val remainingChecks = existingChecks.filterNot(c =>
      dropCheckNames.exists(_.equalsIgnoreCase(c.name)))
    // constraint adds: shape + uniqueness (vs survivors and each other)
    alter.addChecks.foreach { case (n, sql) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"constraint name must be word-shaped (it is embedded in the manifest), got '$n'")
      requireOneLine(sql, n)
      require(!remainingChecks.exists(_.name.equalsIgnoreCase(n)),
        s"constraint '$n' already exists")
    }
    require(alter.addChecks.map(_._1.toLowerCase).distinct.length == alter.addChecks.length,
      s"duplicate constraint names in ${alter.addChecks.map(_._1).mkString(",")}")
    // the column mapping: user-facing names in this spec are LOGICAL;
    // the schema line, stats, dv keys and notnull lines are PHYSICAL
    val cmap = colMapOf(ls)
    val priorLogical = toLogicalSchema(prior, cmap)
    // column adds: no collisions with the prior schema, the physical
    // image (the resurrect guard — see addColumns), or each other
    val priorLower = priorLogical.fieldNames.map(_.toLowerCase).toSet
    alter.addCols.foreach { f =>
      require(!priorLower.contains(f.name.toLowerCase),
        s"column '${f.name}' already exists")
      require(!cmap.values.exists(_.equalsIgnoreCase(f.name)),
        s"'${f.name}' is the physical storage name of a renamed column — " +
          "add it under a different name")
    }
    require(alter.addCols.map(_.name.toLowerCase).distinct.length == alter.addCols.length,
      s"duplicate names in ${alter.addCols.map(_.name).mkString(",")}")
    // column drops: resolve against the PRE-alter schema; the guards
    // consider the POST-alter constraint set (dropping a constraint
    // and the column it reads in one statement is legal)
    val resolvedDrops = alter.dropCols.map { n =>
      val l = priorLogical.fields.map(_.name).find(_.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$n' in ${priorLogical.fieldNames.mkString(",")}"))
      (l, cmap.getOrElse(l, l))
    }
    val finalChecks = remainingChecks ++
      alter.addChecks.map { case (n, sql) => ConstraintEntry(n, sql) }
    val checkRefs = finalChecks.map(c => c.name -> constraintRefCols(spark, c.predicateSql))
    resolvedDrops.foreach { case (l, n) =>
      require(!partCols.contains(n), s"cannot drop partition column '$n'")
      require(!dvKeys.contains(n),
        s"cannot drop '$n': it keys a live deletion vector — compact or " +
          "overwrite to apply the mask physically first")
      checkRefs.find(_._2.contains(l.toLowerCase)).foreach { case (cn, _) =>
        throw new IllegalArgumentException(
          s"cannot drop '$l': CHECK constraint '$cn' reads it — DROP CONSTRAINT first")
      }
      // a GENERATED column's dependencies are load-bearing the same
      // way — unless the generated column drops in the SAME statement
      generatedColumnsOf(prior).find { case (g, sql) =>
        !g.equalsIgnoreCase(n) &&
          !resolvedDrops.exists(_._2.equalsIgnoreCase(g)) &&
          constraintRefCols(spark, sql).contains(l.toLowerCase)
      }.foreach { case (g, _) =>
        throw new IllegalArgumentException(
          s"cannot drop '$l': GENERATED column '${cmap.map(_.swap).getOrElse(g, g)}' " +
            "is computed from it — drop the generated column first (or in the " +
            "same statement)")
      }
    }
    // type widenings: resolve (logical) names, require a legal
    // metadata-only promotion, and guard the columns whose machinery
    // is typed to the files — dv keys (the mask join and the DSv2 key
    // pull read the dv parquet under its written type) widen only
    // after the mask applies physically
    val widenByPhys: Map[String, org.apache.spark.sql.types.DataType] =
      alter.widenCols.map { case (n, to) =>
        val l = priorLogical.fields.map(_.name).find(_.equalsIgnoreCase(n)).getOrElse(
          throw new IllegalArgumentException(
            s"no column '$n' in ${priorLogical.fieldNames.mkString(",")}"))
        val phys = cmap.getOrElse(l, l)
        val from = prior(phys).dataType
        require(legalWidening(from, to),
          s"cannot change '$l' from $from to $to — metadata-only widenings are " +
            "byte/short/int up the integral ladder or to double (Spark's parquet " +
            "readers promote those natively); anything else rewrites: " +
            "REPLACE TABLE … AS SELECT")
        require(!partCols.contains(phys), s"cannot widen partition column '$l'")
        require(!dvKeys.contains(phys),
          s"cannot widen '$l': it keys a live deletion vector — compact or " +
            "overwrite to apply the mask physically first")
        // integral widenings keep the blooms valid (values hash as
        // longs either way); a double is no longer hashable
        require(to != org.apache.spark.sql.types.DoubleType || !ls.exists {
            case BloomColEntry(c, _) => c.equalsIgnoreCase(phys); case _ => false },
          s"cannot widen bloom-indexed '$l' to double — drop_bloom first")
        phys -> to
      }.toMap
    // final schema (PHYSICAL names): data columns minus drops plus
    // adds, widenings applied, partition columns last (the partitioned
    // read order)
    // SET/DROP DEFAULT rewrites only the CURRENT_DEFAULT metadata key
    // (future inserts); EXISTS_DEFAULT — what files pre-dating the
    // column read — stays pinned to its ADD-time value
    val defaultByPhys: Map[String, Option[String]] =
      alter.setDefaults.map { case (n, sql) =>
        val l = priorLogical.fields.map(_.name).find(_.equalsIgnoreCase(n)).getOrElse(
          throw new IllegalArgumentException(
            s"no column '$n' in ${priorLogical.fieldNames.mkString(",")}"))
        cmap.getOrElse(l, l) -> sql
      }.toMap
    def applyDefault(f: StructField): StructField =
      defaultByPhys.get(f.name) match {
        case None => f
        case Some(sqlOpt) =>
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata).remove("CURRENT_DEFAULT")
          sqlOpt.foreach(s => mb.putString("CURRENT_DEFAULT", s))
          f.copy(metadata = mb.build())
      }
    val dropSet = resolvedDrops.map(_._2).toSet
    val (dataF, partF) = prior.fields.partition(f => !partCols.contains(f.name))
    val keptData = dataF.filterNot(f => dropSet.contains(f.name))
      .map(f => widenByPhys.get(f.name).map(t => f.copy(dataType = t)).getOrElse(f))
      .map(applyDefault)
    val finalSchema = asNullable(StructType(keptData ++ alter.addCols ++ partF))
    require(finalSchema.fields.nonEmpty, "cannot drop every column")
    val finalMap = cmap.filter { case (_, p) => finalSchema.fieldNames.contains(p) }
    val finalLogical = toLogicalSchema(finalSchema, finalMap)
    // added constraints must resolve against the FINAL schema …
    val finalLower = finalLogical.fieldNames.map(_.toLowerCase).toSet
    alter.addChecks.foreach { case (n, sql) =>
      val unknown = constraintRefCols(spark, sql) -- finalLower
      require(unknown.isEmpty,
        s"CHECK constraint '$n' ($sql) references unknown column(s) ${unknown.mkString(",")}")
    }
    // … and hold on the EXISTING rows (added columns read as null;
    // NULL passes — the SQL CHECK contract)
    if (alter.addChecks.nonEmpty) {
      import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
      val base = alter.addCols.foldLeft(readVersion(spark, dir, prev)) { (df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType))
      }
      alter.addChecks.foreach { case (n, sql) =>
        val violating = base.filter(not(coalesce(expr(sql), lit(true))))
        require(violating.isEmpty,
          s"cannot add CHECK constraint '$n' ($sql): existing rows violate it " +
            s"— e.g. ${violating.head()}")
      }
    }
    // NOT NULL changes, against the final schema. SET validates the
    // existing rows — from manifest stats in the provable case (every
    // data dir's null count for the column is a recorded zero), one
    // masked scan otherwise; a SET on a column just added in the same
    // statement passes only on an empty table (existing rows would
    // null-backfill it). DROP NOT NULL on a nullable column is a
    // no-op, like Delta's.
    val existingNotNull = ls.collect { case n: NotNullEntry => n }
    // (logical, physical) pairs: the lines and the stats lookup speak
    // physical; the validation scan (readVersion) serves logical
    val resolvedSet = alter.setNotNull.map { n =>
      val l = finalLogical.fieldNames.find(_.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$n' in ${finalLogical.fieldNames.mkString(",")}"))
      (l, finalMap.getOrElse(l, l))
    }.filterNot { case (_, p) => existingNotNull.exists(_.col.equalsIgnoreCase(p)) }
    val resolvedDropNn = alter.dropNotNull.flatMap { n =>
      val p = finalMap.collectFirst {
        case (l, phys) if l.equalsIgnoreCase(n) => phys }.getOrElse(n)
      existingNotNull.map(_.col).find(_.equalsIgnoreCase(p))
    }
    require(resolvedSet.map(_._2).toSet.intersect(resolvedDropNn.toSet).isEmpty,
      "a column cannot be both SET and DROP NOT NULL in one statement")
    if (resolvedSet.nonEmpty) {
      val stats = ls.collect { case e: StatsEntry => e.name -> e }.toMap
      val dataDirs = ls.collect { case DataEntry(n) => n }
      def provablyNoNulls(c: String) = dataDirs.forall(d =>
        stats.get(d).exists(st =>
          st.rows == 0 || st.cols.get(c).exists(_.nulls.contains(0L))))
      val unproven = resolvedSet.filterNot { case (_, p) => provablyNoNulls(p) }
      if (unproven.nonEmpty) {
        import org.apache.spark.sql.functions.{col => fcol, lit}
        val base = alter.addCols.foldLeft(readVersion(spark, dir, prev)) { (df, f) =>
          df.withColumn(f.name, lit(null).cast(f.dataType))
        }
        unproven.foreach { case (l, _) =>
          require(base.filter(fcol(l).isNull).isEmpty,
            s"cannot SET NOT NULL on '$l': existing rows hold nulls — " +
              s"backfill them first (UPDATE … SET $l = … WHERE $l IS NULL)")
        }
      }
    }
    // ── the single commit ──
    // a dropped column takes its NOT NULL line with it, like Delta
    val droppedNn = existingNotNull.filter(n =>
      dropSet.exists(_.equalsIgnoreCase(n.col)) ||
        resolvedDropNn.exists(_.equalsIgnoreCase(n.col)))
    val mapShrank = finalMap != cmap
    // dropping a bloom-indexed column retires ITS index with it
    // (like a NOT NULL line): an orphaned declaration would make every
    // later write try to bloom a column its files no longer carry.
    // Other declared columns' indexes stay live.
    val droppedBloomCols = ls.collect {
      case BloomColEntry(c, _) if dropSet.exists(_.equalsIgnoreCase(c)) => c
    }
    // a dropped identity column takes its high-water mark with it (a
    // stale mark would collide with a later column of the same name)
    val droppedHwm = ls.collect {
      case h: HwmEntry if dropSet.exists(_.equalsIgnoreCase(h.col)) => h.col
    }
    val kept = ls.filterNot {
      case _: SchemaEntry => true
      case c: ConstraintEntry => dropCheckNames.exists(_.equalsIgnoreCase(c.name))
      case n: NotNullEntry => droppedNn.exists(_.col.equalsIgnoreCase(n.col))
      case h: HwmEntry => droppedHwm.exists(_.equalsIgnoreCase(h.col))
      case _: ColMapEntry => mapShrank // re-added below when non-empty
      case b: BloomColEntry => droppedBloomCols.exists(_.equalsIgnoreCase(b.col))
      case b: BloomEntry => droppedBloomCols.exists(_.equalsIgnoreCase(b.col))
      case _ => false
    }
    val mapLine =
      if (!mapShrank || finalMap.isEmpty) Seq.empty
      else Seq(ColMapEntry(finalMap.toSeq.sortBy(_._1)))
    val mapOps: Seq[String] =
      if (!mapShrank) Seq.empty
      else if (finalMap.isEmpty) Seq("-colmap")
      else Seq(addOp(ColMapEntry(finalMap.toSeq.sortBy(_._1))))
    val v = prev + 1
    commitChild(spark, dir, v, prev,
      SchemaEntry(finalSchema) +: (kept ++ mapLine ++
        alter.addChecks.map { case (n, sql) => ConstraintEntry(n, sql) } ++
        resolvedSet.map { case (_, p) => NotNullEntry(p) }),
      (addOp(SchemaEntry(finalSchema)) +:
        (dropCheckNames.map(n => s"-constraint:$n") ++
          droppedNn.map(n => s"-notnull:${n.col}") ++
          droppedHwm.map(c => s"-hwm:$c") ++ mapOps ++
          droppedBloomCols.map(c => s"-bloomcol:$c"))) ++
        alter.addChecks.map { case (n, sql) => addOp(ConstraintEntry(n, sql)) } ++
        resolvedSet.map { case (_, p) => addOp(NotNullEntry(p)) },
      protocol)
    Some(v)
  }

  /** FLOAT → DOUBLE widening — the ONE step on the type ladder that
    * cannot be metadata-only (a float's canonical decimal re-parsed
    * as double differs from the widened value in the last bits, which
    * would break the skipping contract) — served as a COPY-ON-WRITE
    * REWRITE: every float is exactly representable as a double, so
    * the cast preserves values bit-for-bit; the rewrite is an
    * OVERWRITE commit (its own version — time travel to the FLOAT
    * schema keeps working), deletion masks apply physically on the
    * way through, and the new files' footer harvest records EXACT
    * double stats. Deliberately a data job, priced like one. */
  def widenFloatToDoubleRewrite(spark: SparkSession, dir: String, col: String,
                                protocol: CommitProtocol = PutIfAbsentCommit): Int = {
    val prev = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"no versions at $dir"))
    val ls = lines(spark, dir, prev)
    val cmap = colMapOf(ls)
    val logical = ls.collectFirst { case SchemaEntry(s) => toLogicalSchema(s, cmap) }
      .getOrElse(throw new IllegalArgumentException(s"no recorded schema at $dir"))
    val l = logical.fieldNames.find(_.equalsIgnoreCase(col)).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$col' in ${logical.fieldNames.mkString(",")}"))
    require(logical(l).dataType == org.apache.spark.sql.types.FloatType,
      s"'$l' is ${logical(l).dataType}, not FLOAT — the metadata-only widenings " +
        "go through ALTER COLUMN … TYPE / alterTableAtomic")
    val partCols = ls.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    val df = readVersion(spark, dir, prev)
      .withColumn(l, org.apache.spark.sql.functions.col(l).cast("double"))
    if (partCols.isEmpty) writeVersion(df, dir, SaveMode.Overwrite, protocol)
    else writeVersionPartitioned(df, dir, partCols, SaveMode.Overwrite, protocol)
  }

  /** Delta `replaceWhere` / Spark SQL `INSERT INTO … REPLACE WHERE`'s
    * role: ONE atomic commit that removes every row matching
    * `predicateSql` and inserts `df` — the reload-a-slice primitive
    * (re-land one day of a date-partitioned table, re-score one
    * source's documents) that two commits (DELETE + append) cannot
    * give a concurrent reader, who must never observe the slice
    * half-gone or doubled.
    *
    * The inserted rows must THEMSELVES satisfy the predicate —
    * otherwise "replace where X" would also smuggle rows outside X
    * into the table (Delta's replaceWhere constraint check). Enforced
    * IN the write pass via raise_error: a mis-scoped reload refuses
    * before a byte is referenced, with no extra validation job.
    *
    * Two selection tiers, by predicate shape:
    *   - PARTITION-ONLY predicate on a partitioned chain: the exact
    *     file set comes from the manifest's partition values
    *     ([[partitionScopedFiles]]) — the replaced files DROP with
    *     zero data read; the commit is remove(files)+add(new dir).
    *     This is the 100 TB path: replacing one partition of a
    *     million-file table reads nothing outside the new data.
    *   - general predicate: one-sided dir-stats pruning selects the
    *     candidate dirs ([[planDataDirs]] — any dir that COULD hold a
    *     matching row); their NON-matching rows ride into the
    *     replacement dir (masked read: deleted rows do not
    *     resurrect), everything else carries verbatim through the
    *     file-granular commit. NULL predicate rows are kept, standard
    *     WHERE semantics. Conjuncts the pushdown translator cannot
    *     carry only widen the candidate set — never the semantics.
    *
    * CHECK constraints, GENERATED columns, NOT NULL, blooms, identity
    * marks, and the dv-snapshot conflict check all apply through
    * [[commitFileRewrite]], exactly as for any row-level rewrite; the
    * commit commutes with concurrent appends to untouched files and
    * surfaces (not retries) a stale snapshot. Streams over the table
    * see a non-append commit, as they must.
    *
    * Returns the committed version; None when the statement was a
    * complete no-op (no row matched AND `df` was empty). */
  def replaceWhere(df: DataFrame, dir: String, predicateSql: String,
                   protocol: CommitProtocol = PutIfAbsentCommit,
                   maxAttempts: Int = 16,
                   // non-empty = RECORD the change feed in the same commit
                   // (writeVersionWithChangeFeed's role for the replace):
                   // the diff is known AT WRITE TIME — pre-image rows are the
                   // predicate's matches, post-image rows are the insert — so
                   // a bulk reload is exactly the commit where deriving CDF
                   // later (O(both versions)) is most wasteful
                   keys: Seq[String] = Seq.empty): Option[Int] = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not, raise_error, when, col => fcol}
    val spark = df.sparkSession
    val v0 = latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"replaceWhere needs an existing table at $dir — write version 0 first"))
    val ls0 = lines(spark, dir, v0)
    val cmap = colMapOf(ls0)
    val physSchema = ls0.collectFirst { case SchemaEntry(s) => s }.getOrElse(
      throw new IllegalArgumentException(
        s"replaceWhere at $dir needs a recorded schema (pre-schema manifest)"))
    val logicalSchema = toLogicalSchema(physSchema, cmap)
    val partCols = ls0.collectFirst { case PartitionEntry(cs) => cs }.getOrElse(Seq.empty)
    val (fs, root) = fsFor(spark, dir)

    // resolve the predicate against the table's LOGICAL schema once —
    // a typo'd column refuses here, before any write
    val probe = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logicalSchema)
      .filter(expr(predicateSql))
    val resolvedCond = probe.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"could not resolve replaceWhere predicate '$predicateSql'"))
    def conjunctsOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjunctsOf(l) ++ conjunctsOf(r)
      case x => Seq(x)
    }
    val pushed = conjunctsOf(resolvedCond).flatMap(
      org.apache.spark.sql.execution.datasources.GraftFilterShim.translate(_))

    val partitionOnly = partCols.nonEmpty && {
      val refs = spark.sessionState.sqlParser.parseExpression(predicateSql).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.mkString(".")
      }
      refs.nonEmpty && refs.forall(n => partCols.exists(_.equalsIgnoreCase(n)))
    }

    val (removed: Map[String, Set[String]], survivors: Option[DataFrame]) =
      if (partitionOnly)
        (partitionScopedFiles(spark, dir, v0, predicateSql), None)
      else {
        val candNames = planDataDirs(spark, dir, v0, pushed)
        val stats = ls0.collect { case e: StatsEntry => e.name -> e }.toMap
        require(candNames.forall(n => stats.get(n).exists(_.files.nonEmpty)),
          s"replaceWhere at $dir needs manifest file lists for every candidate " +
            "dir — run backfillStats to upgrade pre-file-list manifests")
        val rm = candNames.map(n => n -> stats(n).files.map(_.name).toSet).toMap
        val surv =
          if (candNames.isEmpty) None
          else Some(readVersionDirs(spark, dir, v0,
              candNames.map(n => new Path(root, n).toString).toSet, applyDv = true)
            .filter(not(coalesce(expr(predicateSql), lit(false)))))
        (rm, surv)
      }

    // the shared entry prep runs FIRST — fill omitted GENERATED
    // columns and assign identity values, still in LOGICAL names — so
    // a predicate referencing a generated column the insert omitted
    // (a generated-partition reload, typically) guards against the
    // FILLED value instead of failing analysis
    val (filled, idBasis) = prepareWrite(df, dir, translate = false)
    // the inserted rows must satisfy the predicate — raise_error
    // fires inside the single write pass on the first violator. The
    // guard anchors on a column the prepared rows actually CARRY (a
    // df missing a generated column's DEPENDENCIES can still leave
    // the column absent)
    val guardCol = logicalSchema.fields
      .find(f => filled.columns.exists(_.equalsIgnoreCase(f.name))).map(_.name)
      .getOrElse(throw new IllegalArgumentException(
        s"replaceWhere at $dir: the insert shares no column with the table schema " +
          s"(${logicalSchema.fieldNames.mkString(", ")})"))
    val guarded = filled.withColumn(guardCol,
      when(coalesce(expr(predicateSql), lit(false)), fcol(guardCol))
        .otherwise(raise_error(lit(
          s"replaceWhere at $dir: an inserted row does not satisfy the " +
            s"predicate ($predicateSql); nothing was committed"))
          .cast(logicalSchema(guardCol).dataType)))
    val physNew = toPhysical(guarded, cmap).select(physSchema.fields.map(f =>
      fcol(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    val payload = survivors match {
      case None    => physNew
      case Some(s) =>
        toPhysical(s, cmap)
          .select(physSchema.fieldNames.map(fcol).toSeq: _*)
          .unionByName(physNew)
    }

    val staged = stageDataDir(spark, dir)
    val stagedPath = new Path(root, staged)
    val w = payload.write.mode(SaveMode.ErrorIfExists)
    (if (partCols.isEmpty) w else w.partitionBy(partCols: _*))
      .parquet(stagedPath.toString)

    // requested CDF capture: the classified diff of the SLICE — rows
    // matching the predicate at v0 (masked read: deleted rows were
    // never served, so they emit no delete) against the slice's NEW
    // content read back from the STAGED bytes (not a re-evaluation of
    // the insert plan, whose identity assignment is not deterministic
    // across jobs). Survivors don't match the predicate, so the
    // staged-side filter isolates exactly the inserted slice; untouched
    // rows appear on neither side and emit nothing. Invisible until
    // the manifest lands, like the data dir.
    val feedDir = if (keys.isEmpty) None else {
      keys.foreach(k => require(k.matches("[A-Za-z0-9_]+"),
        s"key column must be word-shaped (it is embedded in the manifest), got '$k'"))
      val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val chDir = f"v${v0 + 1}%08d_changes_$nonce"
      val stagedNew = toLogicalDf(
          spark.read.schema(physSchema).parquet(stagedPath.toString), cmap)
        .select(logicalSchema.fieldNames.map(fcol).toSeq: _*)
        .filter(coalesce(expr(predicateSql), lit(false)))
      diffFeedFrames(
        readVersion(spark, dir, v0).filter(expr(predicateSql)), stagedNew, keys)
        .write.mode(SaveMode.ErrorIfExists).parquet(new Path(root, chDir).toString)
      Some((keys, chDir))
    }

    val dvSnapshot = ls0.collect {
      case DvEntry(k, n)          => (k, n)
      case ScopedDvEntry(k, n, _) => (k, n)
      case PdvEntry(n)            => (PdvSnapshotKey, n)
    }
    try commitFileRewrite(spark, dir, removed, Some(staged), partCols,
      dvSnapshot, protocol, maxAttempts, identityBasis = idBasis,
      replaceConflict = Some((ls0.collect { case DataEntry(n) => n }.toSet,
        pushed, predicateSql)),
      changeFeed = feedDir)
    catch { case t: Throwable =>
      fs.delete(stagedPath, true)
      feedDir.foreach { case (_, nd) => fs.delete(new Path(root, nd), true) }
      throw t
    }
  }

  /** Render pushed-down overwrite filters as ONE predicate-SQL string
    * (what [[replaceWhere]] takes — the SQL seam's
    * `INSERT INTO … REPLACE WHERE` hands the store `sources.Filter`s).
    * None when a filter shape or literal the store cannot re-apply
    * exactly is present: the seam then refuses at ANALYSIS time
    * rather than mis-scope a replace. Rendered by hand — a filter
    * tree is tiny and closed, and the predicate must round-trip
    * through the SQL parser byte-faithfully. */
  private[graft] def filtersPredicateSql(
      filters: Seq[org.apache.spark.sql.sources.Filter]): Option[String] = {
    import org.apache.spark.sql.sources._
    // string literals re-parse under Spark's DEFAULT lexer
    // (escapedStringLiterals=false), which interprets backslash
    // escapes — a raw backslash must double or 'a\tb' round-trips to
    // a different string and the replace silently mis-scopes. Quote
    // doubling ('') is the lexer's other escape; backslashes double
    // FIRST (the quote escape introduces none).
    def str(s: String): String =
      "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
    // timestamp values render in UTC WITH an explicit offset: a bare
    // `TIMESTAMP '…'` literal re-reads under whatever
    // spark.sql.session.timeZone the re-parse runs in, shifting the
    // predicate when it differs from the writer's zone
    def ts(i: java.time.Instant): String =
      "TIMESTAMP '" + java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
        .withZone(java.time.ZoneOffset.UTC).format(i) + "+00:00'"
    def lit(v: Any): String = v match {
      case null                  => "NULL"
      case s: String             => str(s)
      case s: org.apache.spark.unsafe.types.UTF8String => str(s.toString)
      case d: java.sql.Date      => s"DATE '$d'"
      case d: java.time.LocalDate => s"DATE '$d'"
      case t: java.sql.Timestamp => ts(t.toInstant)
      case t: java.time.Instant  => ts(t)
      case b: Boolean            => b.toString
      case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
      case n @ (_: Float | _: Double) => s"CAST($n AS DOUBLE)"
      case n: java.math.BigDecimal => n.toPlainString
      case n: BigDecimal         => n.underlying.toPlainString
      case other => throw new IllegalArgumentException(
        s"literal ${other.getClass.getName} does not render to predicate SQL")
    }
    def col(a: String): String =
      if (a.contains(".") || a.contains("`")) throw new IllegalArgumentException(
        s"nested or backquoted attribute '$a' does not render to predicate SQL")
      else "`" + a + "`"
    def render(f: Filter): String = f match {
      case EqualTo(a, v)            => s"${col(a)} = ${lit(v)}"
      case EqualNullSafe(a, v)      => s"${col(a)} <=> ${lit(v)}"
      case GreaterThan(a, v)        => s"${col(a)} > ${lit(v)}"
      case GreaterThanOrEqual(a, v) => s"${col(a)} >= ${lit(v)}"
      case LessThan(a, v)           => s"${col(a)} < ${lit(v)}"
      case LessThanOrEqual(a, v)    => s"${col(a)} <= ${lit(v)}"
      case In(a, vs)                => s"${col(a)} IN (${vs.map(lit).mkString(", ")})"
      case IsNull(a)                => s"${col(a)} IS NULL"
      case IsNotNull(a)             => s"${col(a)} IS NOT NULL"
      case StringStartsWith(a, p)   =>
        // a prefix holding LIKE metacharacters (or a backslash, which
        // the SQL parser would re-interpret) cannot round-trip through
        // predicate text exactly — refuse rather than widen the scope
        if (p.exists(c => c == '%' || c == '_' || c == '\\'))
          throw new IllegalArgumentException(
            s"prefix '$p' holds LIKE metacharacters; it does not render to predicate SQL")
        s"${col(a)} LIKE ${lit(p + "%")}"
      case And(l, r)                => s"(${render(l)} AND ${render(r)})"
      case Or(l, r)                 => s"(${render(l)} OR ${render(r)})"
      case Not(c)                   => s"(NOT ${render(c)})"
      case other => throw new IllegalArgumentException(
        s"filter $other does not render to predicate SQL")
    }
    if (filters.isEmpty) None
    else try Some(filters.map(render).mkString("(", " AND ", ")"))
    catch { case _: IllegalArgumentException => None }
  }

  case class PruneStats(versionsDropped: Seq[Int], dirsDeleted: Seq[String],
                        dirsSkippedYoung: Seq[String] = Seq.empty)

  /** Delta `VACUUM`'s retention half for the versioned store: drop all
    * but the newest `keepLast` manifests, then delete every data dir
    * no SURVIVING manifest references. Append-chain dirs shared with
    * a kept version survive. Idempotent.
    *
    * Orphan dirs — nonce'd dirs NO manifest (kept or dropped) ever
    * referenced — are reclaimed only once older than `orphanMinAgeMs`
    * (Delta VACUUM's retention-window role): a young unreferenced dir
    * may be an IN-FLIGHT writer between its data write and manifest
    * commit, and reclaiming it would make that writer's version
    * unreadable the moment it commits. Dirs referenced by a DROPPED
    * manifest were committed history and are reclaimed regardless of
    * age. Crashed staging files in `_versions/` (both protocols'
    * prefixes) get the same age guard — a young one may be a commit
    * in flight. */
  /** `dryRun` reports exactly what a live call WOULD drop — versions,
    * dead dirs, young-orphan skips — while writing and deleting
    * NOTHING (not even the boundary checkpoint): the operator's
    * pre-flight for a retention policy change. */
  def pruneVersions(spark: SparkSession, dir: String, keepLast: Int,
                    orphanMinAgeMs: Long = 15 * 60 * 1000L,
                    dryRun: Boolean = false): PruneStats = {
    require(keepLast >= 1, "must keep at least one version")
    val (fs, root) = fsFor(spark, dir)
    // a never-written table (or bare root with no _versions) has
    // nothing to prune — listing it would throw FileNotFoundException,
    // contradicting the idempotent/safe-any-time contract
    if (!fs.exists(root) || !fs.exists(new Path(root, VDIR)))
      return PruneStats(Seq.empty, Seq.empty)
    val all = versions(spark, dir)
    val (drop, keep) = all.splitAt(math.max(0, all.length - keepLast))
    // the oldest KEPT version may be a delta that resolves through the
    // manifests about to be dropped — materialize its checkpoint
    // sidecar FIRST (derived data: safe to create any time, atomic via
    // the same put-if-absent primitive as every commit), so retention
    // keeps its exact keepLast contract without breaking resolution
    if (!dryRun && drop.nonEmpty) keep.headOption.foreach { b =>
      if (manifestParent(spark, dir, b).nonEmpty &&
          !fs.exists(checkpointPath(dir, b)))
        writeCheckpoint(spark, dir, b, lines(spark, dir, b), PutIfAbsentCommit)
    }
    // live names span BOTH dir kinds: a deletion-vector dir referenced
    // by a surviving manifest is load-bearing (reclaiming it would
    // resurrect deleted rows)
    def dirNames(v: Int) = lines(spark, dir, v).collect {
      case DataEntry(n) => n
      case DvEntry(_, n) => n
      case ScopedDvEntry(_, n, _) => n
      case PdvEntry(n) => n
      case ChangesEntry(_, _, _, n) => n // a recorded feed is live state too
    }
    val live = keep.flatMap(dirNames).toSet
    // names committed history once referenced — captured BEFORE the
    // manifests holding the references are deleted
    val droppedRefs = drop.flatMap(dirNames).toSet
    // newest-dropped first: a crash mid-prune then leaves the
    // surviving prefix a complete chain (a delta whose parent had
    // been deleted first would be unresolvable until the next prune)
    if (!dryRun) {
      drop.reverse.foreach { v =>
        fs.delete(manifestPath(dir, v), false)
        fs.delete(checkpointPath(dir, v), false)
      }
      evictManifestCache(spark, dir, drop)
    }
    val now = System.currentTimeMillis()
    val candidates = fs.listStatus(root)
      .filter(st => st.getPath.getName.matches("""v\d{8}_(data|dv|pdv|changes)(_[0-9a-f]{8})?""") &&
        !live.contains(st.getPath.getName))
    val (dead, young) = candidates.partition(st =>
      droppedRefs.contains(st.getPath.getName) ||
        now - st.getModificationTime >= orphanMinAgeMs)
    if (!dryRun) {
      // the reclaim is the one O(dead dirs) byte-touching pass of a
      // retention run: below the threshold the driver deletes
      // directly (no job for a handful of dirs); at or above it the
      // deletes dispatch as a Spark job — a 100 TB table's first
      // vacuum after a retention-policy change reclaims tens of
      // thousands of dirs, and a driver RPC loop over them is the
      // same wall the footer harvest already hit
      val minDist = spark.conf
        .getOption("spark.graft.vacuum.distributedDeleteMinDirs")
        .map(_.toInt).getOrElse(64)
      if (dead.length < math.max(1, minDist))
        dead.foreach(st => fs.delete(st.getPath, true))
      else {
        val sc = spark.sparkContext
        val bc = sc.broadcast(new Skipping.SerConf(sc.hadoopConfiguration))
        val paths = dead.map(_.getPath.toString).toSeq
        val slices = math.max(1, math.min(paths.length, sc.defaultParallelism * 4))
        val prevDesc = sc.getLocalProperty("spark.job.description")
        sc.setJobDescription(s"graft: distributed vacuum reclaim (${paths.length} dirs)")
        try sc.parallelize(paths, slices).foreach { p =>
          val pp = new Path(p)
          pp.getFileSystem(bc.value.value).delete(pp, true)
          ()
        } finally {
          sc.setJobDescription(prevDesc)
          bc.destroy()
        }
      }
      // staging files from commits that crashed between create and
      // publish are invisible to readers but never self-clean; both
      // protocols' staging prefixes are swept (`.tmp-` = RenameCommit,
      // `.put-` = PutIfAbsentCommit's local emulation)
      // the sidecar dirs stage through the same tmp+rename discipline —
      // their crashed leftovers sweep with the same age guard
      (new Path(root, VDIR) +: Seq(bloomsDirPath(root), statsDirPath(root))
          .filter(fs.exists(_)))
        .flatMap(fs.listStatus(_))
        .filter { st =>
          val n = st.getPath.getName
          (n.startsWith(".tmp-") || n.startsWith(".put-")) &&
            now - st.getModificationTime >= orphanMinAgeMs
        }
        .foreach(st => fs.delete(st.getPath, false))
      // bloom sidecars referenced by NO surviving manifest are dead
      // (a trim/re-declare orphaned them, or their versions were just
      // dropped). The age guard covers the one race: a concurrent
      // commit writes its sidecar BEFORE claiming its manifest, so a
      // young unreferenced sidecar may be a commit in flight. Only
      // LOCAL files are candidates — a cloned ref points into the
      // SOURCE's tree, which this listing never sees.
      val bloomsDir = bloomsDirPath(root)
      if (fs.exists(bloomsDir)) {
        val referenced = keep.iterator.flatMap(v =>
          lines(spark, dir, v).iterator.collect {
            case BloomEntry(_, _, _, Some(ref)) => ref
          }).toSet
        fs.listStatus(bloomsDir)
          .filter(st => !referenced.contains(
            fs.makeQualified(st.getPath).toUri.getPath) &&
            now - st.getModificationTime >= orphanMinAgeMs)
          .foreach(st => fs.delete(st.getPath, false))
      }
      // stats sidecars reclaim identically: a trim or overwrite
      // orphaned the old content-addressed file, or its versions were
      // just dropped; the age guard covers the commit-in-flight race
      val statsDir = statsDirPath(root)
      if (fs.exists(statsDir)) {
        val referenced = keep.iterator.flatMap(v =>
          lines(spark, dir, v).iterator.collect {
            case StatsEntry(_, _, _, _, Some(ref)) => ref
          }).toSet
        fs.listStatus(statsDir)
          .filter(st => !referenced.contains(
            fs.makeQualified(st.getPath).toUri.getPath) &&
            now - st.getModificationTime >= orphanMinAgeMs)
          .foreach(st => fs.delete(st.getPath, false))
      }
    }
    PruneStats(drop, dead.map(_.getPath.getName).toSeq,
      young.map(_.getPath.getName).toSeq)
  }
}

/** Delta TahoeFileIndex's role: a `FileIndex` whose every file status
  * is served from the MANIFEST's recorded file lists — the read plans
  * with ZERO filesystem metadata calls (no directory listing, no
  * per-file status), which at 10⁶ files on an object store is the
  * difference between a plan and a LIST storm. Consequences, both
  * spec-pinned:
  *
  *   - the manifest is the authority down to the FILE level: a stray
  *     file that somehow lands in a data dir is invisible to reads
  *     (dir-listing reads would serve it);
  *   - `listFiles` applies the manifest's per-dir stats to the PUSHED
  *     data filters, so ANY `.filter()` over a versioned read skips
  *     provably-empty dirs at execution planning — data skipping
  *     engages on plain reads, not just the explicit
  *     [[Versioned.readVersionSkipping]] API.
  *
  * File mtimes are reported as 0 (the manifest does not record them;
  * nothing on the scan path consumes them). */
private[ext] class ManifestFileIndex(tableDir: Path, schema: StructType,
                                     dirs: Seq[Versioned.StatsEntry],
                                     override val partitionSchema: StructType =
                                       StructType(Nil),
                                     // declared bloom columns (PHYSICAL — the pushed
                                     // filters here already are) + per-(col, dir) blobs
                                     bloomCols: Seq[String] = Seq.empty,
                                     blooms: Map[(String, String), Map[String, Array[Byte]]] =
                                       Map.empty)
  extends org.apache.spark.sql.execution.datasources.FileIndex {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.execution.datasources.{FileStatusWithMetadata, PartitionDirectory}

  private val perDir: Seq[(Versioned.StatsEntry, Seq[(Versioned.FileStats, FileStatusWithMetadata)])] =
    dirs.map { st =>
      val dirPath = new Path(tableDir, st.name)
      (st, st.files.map { f =>
        (f, FileStatusWithMetadata(new org.apache.hadoop.fs.FileStatus(
          f.bytes, false, 1, 128L * 1024 * 1024, 0L, new Path(dirPath, f.name)), Map.empty))
      })
    }

  override def rootPaths: Seq[Path] = Seq(tableDir)
  override def sizeInBytes: Long = perDir.iterator.flatMap(_._2).map(_._2.getLen).sum
  override def inputFiles: Array[String] =
    perDir.flatMap(_._2).map(_._2.getPath.toString).toArray
  override def refresh(): Unit = ()

  /** A file's partition values, rebuilt from its recorded min=max
    * stats (the partitioned harvest records each partition value as an
    * exact bound; all-null stats = the hive null partition). The key
    * form groups files; the row form is what Spark's reader appends
    * to every row of the group. */
  private def partKey(f: Versioned.FileStats): Seq[Option[String]] =
    partitionSchema.fields.map(pf => f.cols.get(pf.name).flatMap(_.min)).toSeq

  private def partRow(key: Seq[Option[String]]): InternalRow =
    InternalRow.fromSeq(partitionSchema.fields.zip(key).map {
      case (pf, Some(canon)) => Skipping.canonicalToCatalyst(canon, pf.dataType)
      case (_, None)         => null
    }.toSeq)

  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[PartitionDirectory] = {
    val pushed = dataFilters.flatMap(f =>
      org.apache.spark.sql.execution.datasources.GraftFilterShim.translate(f))
    // a predicate on the SOURCE of a generated partition column
    // derives a partition predicate (skipping-only, evaluated against
    // the recorded point stats — the original filters stay on the
    // scan, so a shape outside the proven set just derives nothing)
    val translated = pushed ++ Skipping.derivePartitionFilters(
      SparkSession.active, schema, partitionSchema.fieldNames.toSeq, pushed)
    // two-granularity prune, both one-sided: dir bounds first (cheap,
    // one check covering every file of the dir), then each surviving
    // dir's PER-FILE bounds — the level that still cuts when one
    // commit wrote thousands of files spanning the dir's full key
    // range. Files recorded before the per-file-stats format carry no
    // row count and are always read.
    val kept = perDir.filter { case (st, _) =>
      !translated.exists(f => Skipping.excludes(st.rows, st.cols, schema, f))
    }.flatMap { case (st, files) =>
      files.filter { case (fs, _) =>
        (fs.rows.isEmpty ||
          !translated.exists(f => Skipping.excludes(fs.rows.get, fs.cols, schema, f))) &&
        // third granularity: each declared column's per-file bloom
        // (point lookups on interleaved keys — bounds overlap, the
        // bloom still proves absence)
        bloomCols.forall(c =>
          blooms.get((c, st.name)).flatMap(_.get(fs.name)).forall(bits =>
            !translated.exists(f => Bloom.excludes(f, c, bits))))
      }
    }
    if (partitionSchema.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2)))
    else {
      // partitioned: regroup by recorded partition values, then
      // evaluate the pushed PartitionFilters EXACTLY against each
      // group's values (the PartitioningAwareFileIndex contract) —
      // partition pruning from manifest bytes, no directory listing
      val groups = kept.groupBy { case (fs, _) => partKey(fs) }.toSeq
        .sortBy(_._1.map(_.getOrElse("\u0000")).mkString("/"))
      val pruned = if (partitionFilters.isEmpty) groups
      else {
        import org.apache.spark.sql.catalyst.expressions._
        val predicate = partitionFilters.reduce(And)
        val bound = Predicate.createInterpreted(predicate.transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema.fields(i).dataType, nullable = true)
        })
        groups.filter { case (key, _) => bound.eval(partRow(key)) }
      }
      pruned.map { case (key, files) => PartitionDirectory(partRow(key), files.map(_._2)) }
    }
  }

  override def toString: String =
    s"ManifestFileIndex[$tableDir, ${dirs.length} dirs, ${perDir.map(_._2.length).sum} files" +
      (if (partitionSchema.isEmpty) "]" else s", partitioned by ${partitionSchema.fieldNames.mkString(",")}]")
}

/** The PARTITIONED chains' DSv2 serving index: a
  * [[org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex]]
  * whose partition spec, leaf files, and per-file statistics all come
  * from MANIFEST BYTES — Spark's own partition-discovery machinery
  * refuses this store's layout (sibling nonce'd roots each holding a
  * hive subtree read as CONFLICTING_DIRECTORY_STRUCTURES), and a
  * listing-based index would pay the metadata storm the manifest
  * exists to avoid. Plugged straight into Spark's public
  * `ParquetScanBuilder`, so the SQL tier gets the NATIVE partitioned
  * scan — PartitionFilters pruning, vectorized read, row-group
  * pushdown — planned with zero filesystem metadata calls, plus this
  * store's per-file stats skipping layered on the pruned groups
  * (one-sided as always: pushed filters are still evaluated by the
  * scan). */
private[graft] class ManifestPartitioningIndex(spark: SparkSession, tableDir: Path,
                                               fullSchema: StructType,
                                               partSchema: StructType,
                                               dirs: Seq[Versioned.StatsEntry],
                                               bloomCols: Seq[String] = Seq.empty,
                                               blooms: Map[(String, String), Map[String, Array[Byte]]] =
                                                 Map.empty)
  extends org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex(
    spark, Map.empty, Some(fullSchema),
    org.apache.spark.sql.execution.datasources.NoopCache) {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.execution.datasources.{PartitionDirectory, PartitionPath, PartitionSpec}

  // (absolute file path, status, per-file stats) from the manifest
  private val fileEntries: Seq[(Path, org.apache.hadoop.fs.FileStatus, Versioned.FileStats)] =
    dirs.flatMap { st =>
      val dirPath = new Path(tableDir, st.name)
      st.files.map { f =>
        val p = new Path(dirPath, f.name)
        (p, new org.apache.hadoop.fs.FileStatus(
          f.bytes, false, 1, 128L * 1024 * 1024, 0L, p), f)
      }
    }

  private val statsByPath: Map[Path, Versioned.FileStats] =
    fileEntries.map(e => e._1 -> e._3).toMap

  // blooms keyed by RESOLVED path (the manifest spelling of a cloned
  // chain's dir is an absolute path — a parent-NAME lookup would
  // silently miss and forfeit the pruning)
  private val bloomByPath: Map[(String, Path), Array[Byte]] =
    if (bloomCols.isEmpty) Map.empty
    else dirs.flatMap { st =>
      bloomCols.flatMap { c =>
        blooms.get((c, st.name)).toSeq.flatMap { m =>
          val dirPath = new Path(tableDir, st.name)
          st.files.flatMap(f =>
            m.get(f.name).map(b => (c, new Path(dirPath, f.name)) -> b))
        }
      }
    }.toMap

  private def partRow(f: Versioned.FileStats): InternalRow =
    InternalRow.fromSeq(partSchema.fields.map { pf =>
      f.cols.get(pf.name).flatMap(_.min) match {
        case Some(canon) => Skipping.canonicalToCatalyst(canon, pf.dataType)
        case None        => null
      }
    }.toSeq)

  override val partitionSpec: PartitionSpec = {
    // one PartitionPath per LEAF DIR (several commits may hold the
    // same partition value in distinct leaves — each is its own entry,
    // exactly as discovery would produce)
    val leaves = fileEntries.groupBy(_._1.getParent).toSeq
      .sortBy(_._1.toString)
      .map { case (leaf, files) => PartitionPath(partRow(files.head._3), leaf) }
    PartitionSpec(partSchema, leaves)
  }

  override val leafFiles: scala.collection.mutable.LinkedHashMap[Path, org.apache.hadoop.fs.FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, org.apache.hadoop.fs.FileStatus]
    fileEntries.foreach(e => m += (e._1 -> e._2))
    m
  }

  override val leafDirToChildrenFiles: Map[Path, Array[org.apache.hadoop.fs.FileStatus]] =
    fileEntries.groupBy(_._1.getParent)
      .map { case (d, fs) => d -> fs.map(_._2).toArray }

  override def rootPaths: Seq[Path] = Seq(tableDir)
  override def refresh(): Unit = ()

  /** The parent's allFiles() resolves children relative to ROOT paths
    * — this store's files live under nonce'd data dirs below the
    * root, so an unpartitioned (empty partition schema) listing would
    * come back empty. The manifest inventory IS the answer. */
  override def allFiles(): Seq[org.apache.hadoop.fs.FileStatus] =
    fileEntries.map(_._2)

  /** Parent handles exact partition pruning; the per-file stats prune
    * is layered on the survivors (same one-sided contract as
    * [[ManifestFileIndex]]). */
  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val pushed = dataFilters.flatMap(f =>
      org.apache.spark.sql.execution.datasources.GraftFilterShim.translate(f))
    // generated-partition derivation: a src-only WHERE prunes the
    // partitioned groups through each file's partition point stats
    val translated = pushed ++ Skipping.derivePartitionFilters(
      spark, fullSchema, partSchema.fieldNames.toSeq, pushed)
    if (translated.isEmpty) base
    else base.map { pd =>
      PartitionDirectory(pd.values, pd.files.filter { f =>
        val bloomKeeps = bloomCols.forall(c =>
          bloomByPath.get((c, f.getPath)).forall(bits =>
            !translated.exists(flt => Bloom.excludes(flt, c, bits))))
        bloomKeeps && (statsByPath.get(f.getPath) match {
          case Some(fs) if fs.rows.nonEmpty =>
            !translated.exists(flt =>
              Skipping.excludes(fs.rows.get, fs.cols, fullSchema, flt))
          case _ => true
        })
      })
    }.filter(_.files.nonEmpty)
  }

  override def toString: String =
    s"ManifestPartitioningIndex[$tableDir, ${dirs.length} dirs, ${fileEntries.length} files, " +
      s"partitioned by ${partSchema.fieldNames.mkString(",")}]"
}

/** Manifest-level data skipping: harvest parquet-footer statistics at
  * commit time, decide dir-level exclusion at plan time. Pure
  * metadata work — collection reads footers of the one new dir
  * (O(delta), never O(table)); evaluation reads nothing.
  *
  * Exclusion is deliberately one-sided: a dir is skipped only when
  * its stats PROVE the conjunction can match no row. Columns whose
  * type has no canonical stats domain, footers that omit statistics
  * (parquet-mr already drops stats it cannot trust, e.g. pre-1.8
  * binary orderings), NaN bounds, and dirs without a stats line all
  * evaluate to "cannot exclude" — the filters are re-applied to the
  * surviving scan, so skipping can never change a result. */
private[ext] object Skipping {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.functions.{col, lit}
  import graft.ext.Versioned.{ColStats, FileStats}
  import scala.jdk.CollectionConverters._

  // ───── partition-filter derivation from GENERATED columns ─────
  // Delta's optimization, re-derived for this store: when a PARTITION
  // column is `GENERATED ALWAYS AS (g(src))`, a pushed predicate on
  // src implies one on the partition column — src = v implies
  // part = g(v) for any deterministic g, and src ≥ v implies
  // part ≥ g(v) when g is MONOTONE non-decreasing (cast-to-date,
  // year, date_trunc, trunc, substring prefix). The derived filters
  // join the SKIPPING evaluation only (dir bounds, per-file bounds,
  // partition point stats) — they are never added to the re-applied
  // predicates, so a wrong derivation could only ever under-prune,
  // and the derivation itself refuses anything outside the proven
  // shapes. The commit-time value⇔expr validation is what makes the
  // implication sound: every stored row satisfies part = g(src).

  private final case class GenShape(src: String, monotone: Boolean)

  /** Structural match of a generation expression against the proven
    * shapes. Monotone set: identity, CAST(src AS DATE), year,
    * date_trunc, trunc, substring(src, 1, n). Equality-only set
    * (deterministic but not monotone): month/day/hour/… and other
    * casts. Anything else derives nothing. */
  private def genShape(spark: SparkSession, sql: String): Option[GenShape] = try {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    def attr(x: Expression): Option[String] = x match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 => Some(a.nameParts.head)
      case _ => None
    }
    spark.sessionState.sqlParser.parseExpression(sql) match {
      case a: UnresolvedAttribute => attr(a).map(GenShape(_, monotone = true))
      case c: Cast => attr(c.child).map(GenShape(_, monotone = c.dataType == DateType))
      case f: UnresolvedFunction =>
        (f.nameParts.last.toLowerCase, f.arguments) match {
          case ("year", Seq(x)) => attr(x).map(GenShape(_, monotone = true))
          case ("date_trunc", Seq(Literal(_, _), x)) => attr(x).map(GenShape(_, monotone = true))
          case ("trunc", Seq(x, Literal(_, _))) => attr(x).map(GenShape(_, monotone = true))
          case ("substring" | "substr", Seq(x, Literal(p, _), Literal(_, _)))
              if p == 1 => attr(x).map(GenShape(_, monotone = true))
          case ("month" | "day" | "dayofmonth" | "hour" | "quarter" | "dayofyear"
                | "weekofyear", Seq(x)) => attr(x).map(GenShape(_, monotone = false))
          case ("date_format", Seq(x, Literal(_, _))) =>
            attr(x).map(GenShape(_, monotone = false))
          case _ => None
        }
      case _ => None
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Evaluate g(v) on the driver — one single-row local plan; any
    * failure (type mismatch, overflow, null result) derives nothing. */
  private def evalGen(spark: SparkSession, sql: String, srcField: StructField,
                      target: DataType, v: Any): Option[Any] = try {
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(v)),
      StructType(Seq(StructField(srcField.name, srcField.dataType, nullable = true))))
    val r = df.select(org.apache.spark.sql.functions.expr(sql).cast(target)).head()
    if (r.isNullAt(0)) None else Some(r.get(0))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** The derived partition filters for one pushed-filter conjunction.
    * `schema` must speak the FILTERS' name space and carry the
    * GENERATION_EXPRESSION metadata (a renamed chain's physical seam
    * simply derives nothing — one-sided). */
  private[graft] def derivePartitionFilters(spark: SparkSession, schema: StructType,
                                            partCols: Seq[String],
                                            filters: Seq[Filter]): Seq[Filter] = {
    if (filters.isEmpty || partCols.isEmpty) return Seq.empty
    val gens = graft.ext.Versioned.generatedColumnsOf(schema)
      .filter { case (n, _) => partCols.exists(_.equalsIgnoreCase(n)) }
    if (gens.isEmpty) return Seq.empty
    def conjuncts(f: Filter): Seq[Filter] = f match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val flat = filters.flatMap(conjuncts)
    gens.flatMap { case (partName, sql) =>
      genShape(spark, sql).toSeq.flatMap { sh =>
        (schema.fieldNames.find(_.equalsIgnoreCase(sh.src)),
          schema.fieldNames.find(_.equalsIgnoreCase(partName))) match {
          case (Some(srcName), Some(pName)) =>
            val srcField = schema(srcName)
            val target = schema(pName).dataType
            def g(v: Any) = evalGen(spark, sql, srcField, target, v)
            def isSrc(a: String) = a.equalsIgnoreCase(srcName)
            flat.flatMap {
              case EqualTo(a, v) if isSrc(a) && v != null =>
                g(v).map(EqualTo(pName, _))
              case EqualNullSafe(a, v) if isSrc(a) && v != null =>
                g(v).map(EqualTo(pName, _))
              case In(a, vs) if isSrc(a) && vs.nonEmpty && vs.forall(_ != null) =>
                val gs = vs.toSeq.map(g)
                if (gs.forall(_.isDefined)) Seq(In(pName, gs.map(_.get).toArray))
                else Seq.empty
              case GreaterThan(a, v) if sh.monotone && isSrc(a) && v != null =>
                g(v).map(GreaterThanOrEqual(pName, _))
              case GreaterThanOrEqual(a, v) if sh.monotone && isSrc(a) && v != null =>
                g(v).map(GreaterThanOrEqual(pName, _))
              case LessThan(a, v) if sh.monotone && isSrc(a) && v != null =>
                g(v).map(LessThanOrEqual(pName, _))
              case LessThanOrEqual(a, v) if sh.monotone && isSrc(a) && v != null =>
                g(v).map(LessThanOrEqual(pName, _))
              case _ => Seq.empty
            }
          case _ => Seq.empty
        }
      }
    }
  }

  /** What the footer harvest needs to know about one file before
    * opening it — listing output, small and serializable, so the
    * harvest itself can run either on the driver or as Spark tasks. */
  private final case class HarvestSpec(path: String, bytes: Long, name: String,
                                       partVals: Seq[(String, Option[String])])

  /** Hadoop `Configuration` is not `Serializable`; this is the
    * standard write()/readFields() envelope so harvest tasks see the
    * driver's filesystem configuration. */
  private[ext] final class SerConf(@transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Read the footers of `specs`, sequentially on the driver below
    * `spark.graft.stats.distributedHarvestMinFiles` (default 64 —
    * per-commit O(delta) dirs stay a few in-process reads with no job
    * overhead), as a SPARK JOB at or above it: CONVERT and
    * backfillStats run this over a WHOLE table, and a 10⁶-footer
    * sweep is hours single-threaded on the driver but minutes as
    * tasks (Delta's CONVERT distributes exactly this step). Only the
    * small FileStats structs come back to the driver. Output is
    * name-sorted so both paths commit byte-identical stats lines. */
  private def harvestFileStats(spark: SparkSession, schema: StructType,
                               specs: Seq[HarvestSpec]): Seq[FileStats] = {
    val sorted = specs.sortBy(_.name)
    val minFiles = spark.conf.getOption("spark.graft.stats.distributedHarvestMinFiles")
      .map(_.toInt).getOrElse(64)
    if (sorted.length < math.max(1, minFiles)) {
      val conf = spark.sparkContext.hadoopConfiguration
      sorted.map(sp => fileStats(conf, new Path(sp.path), sp.bytes, sp.name,
        schema, sp.partVals))
    } else {
      val sc = spark.sparkContext
      val bc = sc.broadcast(new SerConf(sc.hadoopConfiguration))
      val slices = math.max(1, math.min(sorted.length, sc.defaultParallelism * 4))
      val prev = sc.getLocalProperty("spark.job.description")
      sc.setJobDescription(s"graft: distributed footer harvest (${sorted.length} files)")
      try {
        sc.parallelize(sorted, slices).map { sp =>
          fileStats(bc.value.value, new Path(sp.path), sp.bytes, sp.name,
            schema, sp.partVals)
        }.collect().toSeq.sortBy(_.name)
      } finally {
        sc.setJobDescription(prev)
        bc.destroy()
      }
    }
  }

  /** (rows, per-column stats, per-file stats) of one just-written data
    * dir, from its parquet footers. A column of unsupported type, or
    * with any untrusted footer, is recorded as fully-unknown (present
    * but no bounds) — distinguishing it from a column ABSENT from the
    * dir's files, which under the union schema reads as all-null and
    * is recorded by omission.
    *
    * Stats are computed at FILE granularity and aggregated up to the
    * dir: the per-file bounds are what lets a selective read prune
    * INSIDE a commit (one append at 100 TB is thousands of files —
    * dir-level min/max over them spans the full key range and prunes
    * nothing), the dir aggregate is what lets [[readVersionSkipping]]
    * and the DSv2 seam drop whole dirs without touching file lists.
    *
    * The driver only LISTS; footer reads dispatch through
    * [[harvestFileStats]] (driver below the file threshold, Spark
    * tasks at or above it). */
  def collectDirStats(spark: SparkSession, dataPath: Path,
                      dirSchema: StructType): (Long, Map[String, ColStats], Seq[FileStats]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dataPath.getFileSystem(conf)
    val specs = fs.listStatus(dataPath)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => HarvestSpec(st.getPath.toString, st.getLen,
        st.getPath.getName, Seq.empty)).toSeq
    aggregateDir(dirSchema, harvestFileStats(spark, dirSchema, specs))
  }

  /** The partitioned-dir variant: the data dir holds a hive-layout
    * subtree (`col=value/part-*.parquet`); files are recorded under
    * their RELATIVE subpaths, and each file's partition values —
    * parsed from its subpath, canonicalized into the stats domain —
    * become exact min=max bounds (a partition value IS a point
    * statistic), so one evaluator serves both pruning kinds. */
  def collectDirStatsPartitioned(spark: SparkSession, dataPath: Path,
                                 fullSchema: StructType, partSchema: StructType)
      : (Long, Map[String, ColStats], Seq[FileStats]) = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dataPath.getFileSystem(conf)
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
        else Seq.empty
      }
    val basePrefix = dataPath.toUri.getPath.stripSuffix("/") + "/"
    val specs = walk(dataPath).map { st =>
      val rel = st.getPath.toUri.getPath.stripPrefix(basePrefix)
      val segs = rel.split('/').dropRight(1)
        .flatMap { seg =>
          val i = seg.indexOf('=')
          if (i <= 0) None
          else Some(ExternalCatalogUtils.unescapePathName(seg.substring(0, i)) ->
            seg.substring(i + 1))
        }.toMap
      val partVals = partSchema.fields.map { f =>
        val raw = segs.getOrElse(f.name, throw new IllegalStateException(
          s"file $rel lacks a path value for partition column '${f.name}'"))
        val canon =
          if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) None
          else partValueToCanonical(ExternalCatalogUtils.unescapePathName(raw), f.dataType)
        (f.name, canon)
      }.toSeq
      HarvestSpec(st.getPath.toString, st.getLen, rel, partVals)
    }
    aggregateDir(fullSchema, harvestFileStats(spark, fullSchema, specs))
  }

  /** Hive partition-path string → the canonical stats domain of the
    * column type. Partitionable types are the exact-parse subset. */
  private def partValueToCanonical(s: String, dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(s.toLong.toString)
    case StringType  => Some(s)
    case DateType    => Some(java.time.LocalDate.parse(s).toEpochDay.toString)
    case BooleanType => Some(s.toBoolean.toString)
    case _           => None
  }

  /** Canonical stats-domain string → the Catalyst-internal value of
    * the partition column type (what a PartitionDirectory row holds). */
  private[ext] def canonicalToCatalyst(c: String, dt: DataType): Any = dt match {
    case ByteType    => c.toLong.toByte
    case ShortType   => c.toLong.toShort
    case IntegerType => c.toLong.toInt
    case LongType    => c.toLong
    case DateType    => c.toLong.toInt // canonical form is epoch days
    case StringType  => org.apache.spark.unsafe.types.UTF8String.fromString(c)
    case BooleanType => c.toBoolean
    case other => throw new IllegalStateException(s"unsupported partition type $other")
  }

  private[ext] def partitionableType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         DateType | BooleanType => true
    case _ => false
  }

  /** Footer scan of one file. `partVals` are canonical partition
    * values to overlay as exact bounds (None value = hive null
    * partition → all-null stats for that column). Runs on the driver
    * OR inside a harvest task — everything it touches is
    * serializable state of this object. */
  private def fileStats(conf: org.apache.hadoop.conf.Configuration,
                        file: Path, len: Long, name: String,
                        schema: StructType,
                        partVals: Seq[(String, Option[String])]): FileStats = {
    val supported = schema.fields.map(f => f.name -> f.dataType)
      .filter { case (_, dt) => comparableType(dt) }.toMap
    var fileRows = 0L
    // per column: (min, max, nulls, valueCount, trusted)
    val acc = scala.collection.mutable.Map.empty[String, (Option[String], Option[String], Long, Long, Boolean)]
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val footer = reader.getFooter
      for (block <- footer.getBlocks.asScala) {
        fileRows += block.getRowCount
        for (chunk <- block.getColumns.asScala) {
          val path = chunk.getPath
          if (path.size == 1) {
            val colName = path.iterator.next()
            supported.get(colName).foreach { dt =>
              val prior = acc.getOrElse(colName, (None, None, 0L, 0L, true))
              acc(colName) = mergeChunk(prior, chunk, dt)
            }
          }
        }
      }
    } finally reader.close()
    // EVERY schema field gets an entry (unknown for unsupported or
    // untrusted) — in [[excludes]] a column ABSENT from the map means
    // "not in this dir's write at all" (union-schema backfill reads
    // it as all-null), and a per-file map that omitted an
    // unsupported-type column would let that rule wrongly exclude
    // the file on a predicate over it
    val cols = schema.fields.map { f =>
      f.name -> (acc.get(f.name) match {
        // value counts must cover every row, else some chunk was
        // missing for this column and the bounds are partial
        case Some((mn, mx, nulls, vc, true)) if vc == fileRows =>
          ColStats(mn, mx, Some(nulls))
        case _ => ColStats(None, None, None)
      })
    }.toMap
    val partCols = partVals.map {
      case (c, Some(canon)) => c -> ColStats(Some(canon), Some(canon), Some(0L))
      case (c, None)        => c -> ColStats(None, None, Some(fileRows))
    }
    FileStats(name, len, Some(fileRows), cols ++ partCols)
  }

  private[ext] def aggregateDir(dirSchema: StructType, perFile: Seq[FileStats])
      : (Long, Map[String, ColStats], Seq[FileStats]) = {
    val supported = dirSchema.fields.map(f => f.name -> f.dataType)
      .filter { case (_, dt) => comparableType(dt) }.toMap
    val rows = perFile.flatMap(_.rows).sum
    // dir aggregate = fold of the per-file stats: bounds widen, null
    // counts add, and any file-level unknown poisons the dir entry
    // (same one-sided rule — unknown can only DISABLE skipping).
    // A trusted file entry always carries a null count; a trusted
    // ALL-NULL file carries the count with no bounds — so
    // `nulls.isDefined` is exactly the trusted flag here.
    val cols = dirSchema.fields.map { f =>
      val stat = supported.get(f.name) match {
        case None => ColStats(None, None, None)
        case Some(dt) =>
          val per = perFile.map(_.cols.get(f.name))
          if (per.exists(o => o.isEmpty || o.get.nulls.isEmpty)) ColStats(None, None, None)
          else {
            val cs = per.map(_.get)
            val nulls = Some(cs.map(_.nulls.get).sum)
            val withBounds = cs.filter(_.min.nonEmpty)
            if (withBounds.isEmpty) ColStats(None, None, nulls) // all-null dir
            else ColStats(
              Some(withBounds.map(_.min.get).reduce((a, b) => if (cmp(dt, a, b) <= 0) a else b)),
              Some(withBounds.map(_.max.get).reduce((a, b) => if (cmp(dt, a, b) >= 0) a else b)),
              nulls)
          }
      }
      f.name -> stat
    }.toMap
    (rows, cols, perFile)
  }

  private def mergeChunk(prior: (Option[String], Option[String], Long, Long, Boolean),
                         chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
                         dt: DataType): (Option[String], Option[String], Long, Long, Boolean) = {
    val (mn0, mx0, n0, vc0, ok0) = prior
    if (!ok0) prior
    else {
      val stats = chunk.getStatistics
      val vc = vc0 + chunk.getValueCount
      if (stats == null || !stats.isNumNullsSet) (None, None, 0L, vc, false)
      else {
        val nulls = n0 + stats.getNumNulls
        if (!stats.hasNonNullValue) {
          // a chunk of pure nulls contributes no bounds; all-null is
          // only provable when the null count covers the value count
          if (stats.getNumNulls == chunk.getValueCount) (mn0, mx0, nulls, vc, true)
          else (None, None, 0L, vc, false)
        } else {
          val ann = Option(chunk.getPrimitiveType).flatMap(t =>
            Option(t.getLogicalTypeAnnotation))
          (statToCanonical(stats.genericGetMin, dt, ann, isMax = false),
            statToCanonical(stats.genericGetMax, dt, ann, isMax = true)) match {
            case (Some(lo), Some(hi)) =>
              (Some(mn0.fold(lo)(m => if (cmp(dt, lo, m) < 0) lo else m)),
                Some(mx0.fold(hi)(m => if (cmp(dt, hi, m) > 0) hi else m)),
                nulls, vc, true)
            case _ => (None, None, 0L, vc, false)
          }
        }
      }
    }
  }

  private def comparableType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         FloatType | DoubleType | StringType | BooleanType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Footer stat value → canonical string in the comparison domain.
    * None (→ no skipping) for anything surprising, NaN above all:
    * parquet min/max are undefined in the presence of NaN.
    *
    * Timestamps: the canonical domain is MICROSECONDS (what
    * [[valueToCanonical]] emits for filter literals), but an INT64
    * footer bound is in whatever unit the file's logical-type
    * annotation declares — a dir written under
    * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MILLIS` carries
    * millis, and treating them as micros would let excludes() wrongly
    * prove a dir empty (one-sided-contract violation). Bounds are
    * normalized per the annotation: MICROS as-is, MILLIS ×1000
    * (exact), NANOS floor/ceil-divided so min stays ≤ true min and
    * max ≥ true max; a missing or non-timestamp annotation (e.g.
    * legacy INT96) records no bound. */
  private def statToCanonical(v: Any, dt: DataType,
                              ann: Option[org.apache.parquet.schema.LogicalTypeAnnotation],
                              isMax: Boolean): Option[String] = (v, dt) match {
    case (i: java.lang.Integer, ByteType | ShortType | IntegerType | DateType) =>
      Some(i.longValue.toString)
    case (l: java.lang.Long, LongType) => Some(l.toString)
    case (l: java.lang.Long, TimestampType | TimestampNTZType) =>
      import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit, TimestampLogicalTypeAnnotation}
      ann.collect { case t: TimestampLogicalTypeAnnotation => t.getUnit }.flatMap {
        case TimeUnit.MICROS => Some(l.longValue.toString)
        case TimeUnit.MILLIS => Some(Math.multiplyExact(l.longValue, 1000L).toString)
        case TimeUnit.NANOS  =>
          Some((if (isMax) Math.floorDiv(Math.addExact(l.longValue, 999L), 1000L)
                else Math.floorDiv(l.longValue, 1000L)).toString)
        case _ => None
      }
    case (f: java.lang.Float, FloatType) =>
      if (f.isNaN) None else Some(f.doubleValue.toString)
    case (d: java.lang.Double, DoubleType) =>
      if (d.isNaN) None else Some(d.toString)
    case (b: org.apache.parquet.io.api.Binary, StringType) =>
      Some(b.toStringUsingUTF8)
    case (b: java.lang.Boolean, BooleanType) => Some(b.toString)
    case _ => None
  }

  /** Filter literal → the same canonical domain. */
  private def valueToCanonical(v: Any, dt: DataType): Option[String] = (v, dt) match {
    case (null, _) => None
    case (n: Number, ByteType | ShortType | IntegerType | LongType) =>
      Some(n.longValue.toString)
    case (n: Number, FloatType | DoubleType) =>
      val d = n.doubleValue; if (d.isNaN) None else Some(d.toString)
    case (s: String, StringType) => Some(s)
    case (d: java.sql.Date, DateType) => Some(d.toLocalDate.toEpochDay.toString)
    case (d: java.time.LocalDate, DateType) => Some(d.toEpochDay.toString)
    case (t: java.sql.Timestamp, TimestampType | TimestampNTZType) =>
      Some((t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L).toString)
    case (t: java.time.Instant, TimestampType) =>
      Some((t.getEpochSecond * 1000000L + t.getNano / 1000L).toString)
    case (b: Boolean, BooleanType) => Some(b.toString)
    case _ => None
  }

  private def cmp(dt: DataType, a: String, b: String): Int = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType =>
      java.lang.Long.compare(a.toLong, b.toLong)
    case FloatType | DoubleType => java.lang.Double.compare(a.toDouble, b.toDouble)
    case StringType             =>
      // UTF-8 BINARY order — the order parquet's unsigned footer
      // bounds and Spark's UTF8String comparisons use. Java
      // String.compareTo is UTF-16 code-unit order, which DISAGREES
      // for supplementary-plane characters vs U+E000..U+FFFF: under
      // it a dir could be wrongly proven empty and rows silently
      // dropped (ExtSpec pins the emoji-vs-U+FFFF case)
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    case BooleanType            => java.lang.Boolean.compare(a.toBoolean, b.toBoolean)
    case other => throw new IllegalStateException(s"no canonical order for $other")
  }

  /** True iff `stats` PROVE no row of the dir can satisfy `f`. A
    * column with no entry at all is one the dir's files do not carry
    * — under the union schema it reads as all-null (the evolution
    * backfill), so value predicates and IsNotNull exclude the dir. */
  def excludes(rows: Long, cols: Map[String, ColStats],
               schema: StructType, f: org.apache.spark.sql.sources.Filter): Boolean = {
    def statsFor(attr: String): Option[(ColStats, DataType)] =
      schema.fields.find(_.name == attr).map(_.dataType).map { dt =>
        (cols.getOrElse(attr, ColStats(None, None, Some(rows))), dt)
      }
    def allNull(c: ColStats): Boolean = c.nulls.contains(rows)
    def outside(attr: String, v: Any)(test: (Int, Int) => Boolean): Boolean =
      statsFor(attr).exists { case (c, dt) =>
        if (allNull(c)) true // null never satisfies a value predicate
        else (for { lo <- c.min; hi <- c.max; cv <- valueToCanonical(v, dt) }
          yield test(cmp(dt, cv, lo), cmp(dt, cv, hi))).getOrElse(false)
      }
    f match {
      case EqualTo(a, v)            => outside(a, v)((l, h) => l < 0 || h > 0)
      case EqualNullSafe(a, v)      =>
        if (v == null) excludes(rows, cols, schema, IsNull(a))
        else excludes(rows, cols, schema, EqualTo(a, v))
      case GreaterThan(a, v)        => outside(a, v)((_, h) => h >= 0)
      case GreaterThanOrEqual(a, v) => outside(a, v)((_, h) => h > 0)
      case LessThan(a, v)           => outside(a, v)((l, _) => l <= 0)
      case LessThanOrEqual(a, v)    => outside(a, v)((l, _) => l < 0)
      case In(a, vs)                => vs.nonEmpty &&
        vs.forall(v => excludes(rows, cols, schema, EqualTo(a, v)))
      case IsNull(a)    => statsFor(a).exists(_._1.nulls.contains(0L))
      case IsNotNull(a) => statsFor(a).exists { case (c, _) => allNull(c) && rows > 0 }
      // prefix predicates (the optimizer's translation of
      // `LIKE 'p%'`): every matching string s satisfies
      // p <= s < succ(p) in UTF-8 BYTE order (the same order the
      // stats' canonical strings compare under), so a dir whose max
      // is below p, or whose min is at or above succ(p), is provably
      // empty — one-sided as always, a dir overlapping the range is
      // kept. succ(p) = p with its last non-0xFF byte incremented and
      // the tail dropped; an all-0xFF prefix has no upper bound.
      case StringStartsWith(a, p) if p != null && p.nonEmpty =>
        statsFor(a).exists { case (c, dt) =>
          dt == StringType && (allNull(c) ||
            (for { lo <- c.min; hi <- c.max } yield {
              val pb = org.apache.spark.unsafe.types.UTF8String.fromString(p)
              if (org.apache.spark.unsafe.types.UTF8String.fromString(hi)
                    .compareTo(pb) < 0) true
              else Skipping.prefixSuccessor(pb) match {
                case Some(succ) =>
                  org.apache.spark.unsafe.types.UTF8String.fromString(lo)
                    .compareTo(succ) >= 0
                case None => false
              }
            }).getOrElse(false))
        }
      case And(l, r) => excludes(rows, cols, schema, l) || excludes(rows, cols, schema, r)
      case Or(l, r)  => excludes(rows, cols, schema, l) && excludes(rows, cols, schema, r)
      case _ => false
    }
  }

  /** The smallest UTF8String strictly greater than EVERY string with
    * prefix `p` (byte order): increment the last non-0xFF byte, drop
    * the tail. None when every byte is 0xFF (no finite bound). */
  private[ext] def prefixSuccessor(p: org.apache.spark.unsafe.types.UTF8String)
      : Option[org.apache.spark.unsafe.types.UTF8String] = {
    val bytes = p.getBytes.clone()
    var i = bytes.length - 1
    while (i >= 0 && bytes(i) == 0xFF.toByte) i -= 1
    if (i < 0) None
    else {
      bytes(i) = (bytes(i) + 1).toByte
      Some(org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes, 0, i + 1))
    }
  }

  /** The exact-semantics half: every accepted filter re-applied to the
    * surviving scan as a Catalyst predicate (pushed into parquet by
    * the optimizer as usual). Unsupported shapes fail fast — the
    * caller asked for skipping semantics this module cannot honor. */
  def toColumn(f: org.apache.spark.sql.sources.Filter): Column = f match {
    case EqualTo(a, v)            => col(a) === lit(v)
    case EqualNullSafe(a, v)      => col(a) <=> lit(v)
    case StringStartsWith(a, p)   => col(a).startsWith(lit(p))
    case GreaterThan(a, v)        => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v)           => col(a) < lit(v)
    case LessThanOrEqual(a, v)    => col(a) <= lit(v)
    case In(a, vs)                => col(a).isin(vs.toIndexedSeq: _*)
    case IsNull(a)                => col(a).isNull
    case IsNotNull(a)             => col(a).isNotNull
    case And(l, r)                => toColumn(l) && toColumn(r)
    case Or(l, r)                 => toColumn(l) || toColumn(r)
    case other => throw new IllegalArgumentException(
      s"unsupported skipping filter: $other")
  }
}

/** JSON (de)serialization of one stats line's payload, via the Jackson
  * already on Spark's classpath — strings are escaped, so a stats line
  * stays a single manifest line whatever the column values contain. */
private[ext] object StatsJson {
  import com.fasterxml.jackson.databind.ObjectMapper
  import com.fasterxml.jackson.databind.node.ObjectNode
  import graft.ext.Versioned.{ColStats, FileStats}
  private val mapper = new ObjectMapper()

  private def renderCols(parent: ObjectNode, key: String,
                         cols: Map[String, ColStats]): Unit = {
    val cn = parent.putObject(key)
    cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
      val o = cn.putObject(name)
      c.min.foreach(o.put("min", _))
      c.max.foreach(o.put("max", _))
      c.nulls.foreach(o.put("nulls", _))
    }
  }

  private def parseCols(node: com.fasterxml.jackson.databind.JsonNode): Map[String, ColStats] = {
    val b = Map.newBuilder[String, ColStats]
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      val o = e.getValue
      b += e.getKey -> ColStats(
        Option(o.get("min")).map(_.asText()),
        Option(o.get("max")).map(_.asText()),
        Option(o.get("nulls")).map(_.asLong()))
    }
    b.result()
  }

  def render(rows: Long, cols: Map[String, ColStats],
             files: Seq[FileStats]): String = {
    val root = mapper.createObjectNode()
    root.put("rows", rows)
    renderCols(root, "cols", cols)
    val fn = root.putArray("files")
    files.foreach { f =>
      val o = fn.addObject(); o.put("n", f.name); o.put("b", f.bytes)
      f.rows.foreach(o.put("r", _))
      if (f.cols.nonEmpty) renderCols(o, "c", f.cols)
    }
    mapper.writeValueAsString(root)
  }

  def parse(json: String): (Long, Map[String, ColStats], Seq[FileStats]) = {
    val root = mapper.readTree(json)
    val rows = root.get("rows").asLong()
    val cols = Option(root.get("cols")).map(parseCols).getOrElse(Map.empty)
    // files absent = a stats line from before the file-list format
    // (readers fall back to directory listing for that dir); an entry
    // without "r" is from the per-DIR-stats format — always read
    val files = Option(root.get("files")).map { fn =>
      val b = Seq.newBuilder[FileStats]
      val it = fn.elements()
      while (it.hasNext) {
        val o = it.next()
        b += FileStats(o.get("n").asText(), o.get("b").asLong(),
          Option(o.get("r")).map(_.asLong()),
          Option(o.get("c")).map(parseCols).getOrElse(Map.empty))
      }
      b.result()
    }.getOrElse(Seq.empty)
    (rows, cols, files)
  }
}
