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

  /** All seven panels as ANSI SQL over CATALOG table names (the
    * `gold_*` entries Runner registers) — the exact serving shape the
    * reference hands Trino: any session on the warehouse runs these by
    * name, no DataFrame handles needed. */
  val panelSql: Map[String, String] = Map(
    "total_reviews" ->
      "SELECT COUNT(*) AS total_reviews FROM gold_fact_review",
    "total_checkins" ->
      "SELECT SUM(checkin_count) AS total_checkins FROM gold_fact_checkin",
    "total_businesses" ->
      "SELECT COUNT(*) AS total_businesses FROM gold_dim_business",
    "top_businesses_5star" ->
      """SELECT b.name, COUNT(*) AS five_star_reviews
        |FROM gold_fact_review f JOIN gold_dim_business b USING (business_id)
        |WHERE f.stars = 5
        |GROUP BY b.name ORDER BY five_star_reviews DESC, name LIMIT 10""".stripMargin,
    "top_regions_checkins" ->
      """SELECT concat_ws(', ', b.city, b.state) AS region,
        | SUM(c.checkin_count) AS checkins
        |FROM gold_fact_checkin c JOIN gold_dim_business b USING (business_id)
        |GROUP BY 1 ORDER BY checkins DESC, region""".stripMargin,
    "reviews_per_weekday" ->
      """SELECT t.weekday, COUNT(*) AS reviews
        |FROM gold_fact_review f JOIN gold_dim_time t USING (date_id)
        |GROUP BY t.weekday ORDER BY t.weekday""".stripMargin,
    "popular_categories_checkins" ->
      """SELECT g.category_name, SUM(c.checkin_count) AS checkins
        |FROM gold_fact_checkin c
        |JOIN gold_bridge_business_category g USING (business_id)
        |GROUP BY g.category_name ORDER BY checkins DESC, category_name""".stripMargin)
}
