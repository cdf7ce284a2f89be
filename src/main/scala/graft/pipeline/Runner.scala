package graft.pipeline

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
  * Storage is plain partitioned Parquet with
  * `partitionOverwriteMode=dynamic`, reproducing the reference's
  * incremental-monthly-load semantics (SURVEY.md §2.1 S5–S9) without
  * Delta.
  */
class Runner(spark: SparkSession, base: String) {
  spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

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

  /** Stage 1 (ref: bronze_to_silver_on_minio.py:138-190). Business and
    * checkins are full loads; review/tip/user are month-scoped. */
  def bronzeToSilver(year: Int, month: Int): Unit = {
    val ym = Some((year, month))
    Silver.processBusiness(bronze("business", None))
      .write.mode(SaveMode.Overwrite).parquet(s"$base/silver/business")
    Silver.processCheckins(bronze("checkin", None))
      .write.mode(SaveMode.Overwrite).partitionBy("year", "month")
      .parquet(s"$base/silver/checkins")
    Silver.processReviewsAndTips(bronze("review", ym))
      .write.mode(SaveMode.Overwrite).partitionBy("year", "month")
      .parquet(s"$base/silver/reviews")
    Silver.processReviewsAndTips(bronze("tip", ym))
      .write.mode(SaveMode.Overwrite).partitionBy("year", "month")
      .parquet(s"$base/silver/tips")
    Silver.processUsers(bronze("user", ym))
      .write.mode(SaveMode.Overwrite).parquet(s"$base/silver/users")
  }

  /** Stage 2 (ref: silver_to_gold_on_minio.py:147-223).
    * Divergences from the reference, all observationally safe
    * (SURVEY.md §7.5): dim_time is cached (the reference recomputes it
    * per consumer), the checkins read prunes on the partition columns
    * (the reference filters `year(date)` post-scan), and `dim_user`
    * (declared in its schema diagram, never built) is materialized. */
  def silverToGold(year: Int, month: Int): Unit = {
    val business = spark.read.parquet(s"$base/silver/business")
    val users = spark.read.parquet(s"$base/silver/users")
    // Spark writes partition dirs unpadded (month=7), so read unpadded.
    val reviews = spark.read.parquet(s"$base/silver/reviews/year=$year/month=$month")
      .withColumn("year", lit(year)).withColumn("month", lit(month))
    val checkins = spark.read.parquet(s"$base/silver/checkins")
      .filter(col("year") === year && col("month") === month)

    val dimTime = Gold.buildDimTime(reviews, checkins).cache()
    dimTime.write.mode(SaveMode.Overwrite).parquet(s"$base/gold/dim_time")

    Upsert.upsertParquet(spark, s"$base/gold/dim_business",
      Gold.buildDimBusiness(business), Seq("business_id"))
    Upsert.upsertParquet(spark, s"$base/gold/dim_user",
      Gold.buildDimUser(users), Seq("user_id"))
    Upsert.upsertParquet(spark, s"$base/gold/bridge_business_category",
      Gold.buildBridgeBusinessCategory(business), Seq("business_id", "category_id"))

    Gold.buildFactReview(reviews, dimTime)
      .write.mode(SaveMode.Overwrite).partitionBy("year", "month")
      .parquet(s"$base/gold/fact_review")
    Gold.buildFactCheckin(checkins, dimTime)
      .write.mode(SaveMode.Overwrite).partitionBy("year", "month")
      .parquet(s"$base/gold/fact_checkin")
    dimTime.unpersist()
  }

  def runMonth(year: Int, month: Int): Unit = {
    bronzeToSilver(year, month)
    silverToGold(year, month)
  }

  def gold(table: String): DataFrame = spark.read.parquet(s"$base/gold/$table")
}
