package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.schemas.YelpSchemas
import graft.silver.Silver
import graft.gold.{Gold, Upsert}

/** End-to-end bronze→silver→gold orchestration — the role the
  * reference delegates to Airflow (ref: mnt/airflow/dags/yelp_pipeline.py),
  * in-process and parameterized by (year, month) exactly like the
  * DAG's templated spark-submit args.
  *
  * Storage is plain partitioned Parquet with dynamic partition
  * overwrite set PER WRITE (not as session-global conf — that would
  * silently change overwrite semantics for unrelated jobs sharing the
  * session), reproducing the reference's incremental-monthly-load
  * semantics (SURVEY.md §2.1 S5–S9) without Delta.
  *
  * Incremental correctness (deliberate fixes of reference bugs —
  * its dims are rebuilt per month with run-local surrogate ids while
  * fact partitions accumulate, silently re-keying history):
  *  - dim_time uses the STABLE `yyyymmdd` date key and is rebuilt over
  *    current ∪ previously-seen dates;
  *  - bridge category ids are assigned once and extended, never
  *    reshuffled ([[Gold.buildBridgeBusinessCategoryStable]]).
  */
class Runner(spark: SparkSession, base: String) {

  private def bronze(table: String, yearMonth: Option[(Int, Int)]): DataFrame = {
    val schema = table match {
      case "business" => YelpSchemas.business
      case "review" => YelpSchemas.review
      case "user" => YelpSchemas.user
      case "checkin" => YelpSchemas.checkin
      case "tip" => YelpSchemas.tip
    }
    val path = yearMonth match {
      case Some((y, m)) => f"$base/bronze/$table/year=$y/month=$m%02d"
      case None => s"$base/bronze/$table"
    }
    spark.read.schema(schema).json(path)
  }

  private def writeMonthPartitioned(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("year", "month")
      .parquet(path)

  /** Stage 1 (ref: bronze_to_silver_on_minio.py:138-190). Business and
    * checkins are full loads; review/tip/user are month-scoped. */
  def bronzeToSilver(year: Int, month: Int): Unit = {
    val ym = Some((year, month))
    Silver.processBusiness(bronze("business", None))
      .write.mode(SaveMode.Overwrite).parquet(s"$base/silver/business")
    writeMonthPartitioned(Silver.processCheckins(bronze("checkin", None)),
      s"$base/silver/checkins")
    writeMonthPartitioned(Silver.processReviewsAndTips(bronze("review", ym)),
      s"$base/silver/reviews")
    writeMonthPartitioned(Silver.processReviewsAndTips(bronze("tip", ym)),
      s"$base/silver/tips")
    Silver.processUsers(bronze("user", ym))
      .write.mode(SaveMode.Overwrite).parquet(s"$base/silver/users")
  }

  private def goldIfExists(table: String): Option[DataFrame] =
    if (Files.exists(Paths.get(s"$base/gold/$table")))
      Some(spark.read.parquet(s"$base/gold/$table"))
    else None

  /** Stage 2 (ref: silver_to_gold_on_minio.py:147-223).
    * Divergences from the reference, all deliberate (SURVEY.md §7.5 +
    * the incremental fixes in the class doc): dim_time is cached (the
    * reference recomputes it per consumer), the month-scoped reads
    * prune on partition COLUMNS over the table root (a month with no
    * data yields an empty frame instead of a missing-path failure),
    * and `dim_user` (declared in its schema diagram, never built) is
    * materialized. */
  def silverToGold(year: Int, month: Int): Unit = {
    val business = spark.read.parquet(s"$base/silver/business")
    val users = spark.read.parquet(s"$base/silver/users")
    val reviews = spark.read.parquet(s"$base/silver/reviews")
      .filter(col("year") === year && col("month") === month)
    val checkins = spark.read.parquet(s"$base/silver/checkins")
      .filter(col("year") === year && col("month") === month)

    // localCheckpoint (eager): materializes the dim AND truncates its
    // plan, so the overwrite below doesn't see itself reading the same
    // path it writes ("Cannot overwrite a path that is also being read
    // from"), and the two fact builds reuse the materialized blocks
    val dimTime = Gold.buildDimTimeStable(reviews, checkins,
      goldIfExists("dim_time").map(_.select("date"))).localCheckpoint(true)
    dimTime.write.mode(SaveMode.Overwrite).parquet(s"$base/gold/dim_time")

    Upsert.upsertParquet(spark, s"$base/gold/dim_business",
      Gold.buildDimBusiness(business), Seq("business_id"))
    Upsert.upsertParquet(spark, s"$base/gold/dim_user",
      Gold.buildDimUser(users), Seq("user_id"))
    Upsert.upsertParquet(spark, s"$base/gold/bridge_business_category",
      Gold.buildBridgeBusinessCategoryStable(business,
        goldIfExists("bridge_business_category")),
      Seq("business_id", "category_id"))

    writeMonthPartitioned(Gold.buildFactReview(reviews, dimTime),
      s"$base/gold/fact_review")
    writeMonthPartitioned(Gold.buildFactCheckin(checkins, dimTime),
      s"$base/gold/fact_checkin")
    dimTime.unpersist()

    Seq("dim_time" -> false, "dim_business" -> false, "dim_user" -> false,
      "bridge_business_category" -> false,
      "fact_review" -> true, "fact_checkin" -> true)
      .foreach { case (t, partitioned) => registerGold(t, partitioned) }
  }

  /** Register a gold output in the catalog as an external parquet
    * table over its path — the reference's Hive-metastore role
    * (ref: mnt/hive-conf/hive-site.xml:35-41, so Trino can address gold
    * by NAME). With a plain session the entries live in the shared
    * in-memory external catalog (every session on this SparkContext —
    * `spark.newSession()` included — resolves `spark.table("gold_…")`,
    * gone on JVM exit); with [[Runner.hiveSession]] they persist in a
    * derby-backed Hive metastore and SURVIVE JVM restarts, matching
    * the reference's always-on metastore service. Re-registration per
    * run keeps the inferred schema current; partitioned facts get
    * partition recovery so month directories are visible through the
    * catalog. */
  def registerGold(table: String, partitioned: Boolean): Unit = {
    val name = s"gold_$table"
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.catalog.createTable(name, "parquet",
      Map("path" -> s"$base/gold/$table"))
    if (partitioned) spark.catalog.recoverPartitions(name)
  }

  def runMonth(year: Int, month: Int): Unit = {
    bronzeToSilver(year, month)
    silverToGold(year, month)
  }

  def gold(table: String): DataFrame = spark.read.parquet(s"$base/gold/$table")
}

object Runner {

  /** A SparkSession whose catalog PERSISTS across JVM restarts: Hive
    * support over an embedded derby metastore rooted under `base`
    * (ref: the reference's standalone Hive metastore + postgres,
    * mnt/hive-conf/hive-site.xml:35-41 — one self-contained directory
    * here instead of two services). Any table registered through
    * [[Runner#registerGold]] in one JVM resolves by name in the next
    * (asserted cross-JVM in PipelineSpec via forked processes).
    *
    * Derby allows ONE live connection per metastore directory, which
    * matches the reference's single-metastore-service topology; a
    * multi-writer deployment swaps the ConnectionURL for a networked
    * metastore db exactly as hive-site.xml would. */
  def hiveSession(base: String, master: String = "local[4]"): SparkSession = {
    // keep derby's log inside the warehouse root, not the process cwd
    System.setProperty("derby.system.home", base)
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
  }
}
