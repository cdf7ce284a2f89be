package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's read-side workload — the seven Superset panels
  * served by Trino over the Gold tables (ref: assets/dashboard.jpg;
  * SURVEY.md §2.8) — re-expressed as Spark DataFrame queries, plus a
  * `spark.sql` registration path so the same SQL text runs in-engine.
  */
object Dashboard {

  def totalReviews(factReview: DataFrame): DataFrame =
    factReview.agg(count(lit(1)).as("total_reviews"))

  def totalCheckins(factCheckin: DataFrame): DataFrame =
    factCheckin.agg(sum(col("checkin_count")).as("total_checkins"))

  def totalBusinesses(dimBusiness: DataFrame): DataFrame =
    dimBusiness.agg(count(lit(1)).as("total_businesses"))

  def topBusinessesBy5Star(factReview: DataFrame, dimBusiness: DataFrame, k: Int = 10): DataFrame =
    factReview.filter(col("stars") === 5)
      .join(broadcast(dimBusiness.select("business_id", "name")), Seq("business_id"))
      .groupBy(col("name"))
      .agg(count(lit(1)).as("five_star_reviews"))
      .orderBy(col("five_star_reviews").desc, col("name"))
      .limit(k)

  def topRegionsByCheckins(factCheckin: DataFrame, dimBusiness: DataFrame): DataFrame =
    factCheckin
      .join(broadcast(dimBusiness.select("business_id", "city", "state")), Seq("business_id"))
      .groupBy(concat_ws(", ", col("city"), col("state")).as("region"))
      .agg(sum(col("checkin_count")).as("checkins"))
      .orderBy(col("checkins").desc, col("region"))

  def reviewsPerWeekday(factReview: DataFrame, dimTime: DataFrame): DataFrame =
    factReview
      .join(broadcast(dimTime.select("date_id", "weekday")), Seq("date_id"))
      .groupBy(col("weekday"))
      .agg(count(lit(1)).as("reviews"))
      .orderBy(col("weekday"))

  def popularCategoriesByCheckins(factCheckin: DataFrame, bridge: DataFrame): DataFrame =
    factCheckin
      .join(bridge.select("business_id", "category_name"), Seq("business_id"))
      .groupBy(col("category_name"))
      .agg(sum(col("checkin_count")).as("checkins"))
      .orderBy(col("checkins").desc, col("category_name"))

  /** Register gold tables as temp views so the panel queries are also
    * runnable as ANSI SQL via `spark.sql` (the Trino role, in-engine). */
  def registerViews(spark: SparkSession, gold: Map[String, DataFrame]): Unit =
    gold.foreach { case (name, df) => df.createOrReplaceTempView(name) }
}
