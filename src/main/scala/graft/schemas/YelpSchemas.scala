package graft.schemas

import org.apache.spark.sql.types._

/** Explicit StructTypes for the five raw Yelp tables (FIXTURES.md §A).
  * The reference infers these per-run (ref: mnt/airflow/scripts/
  * bronze_to_silver_on_minio.py:141-151); we declare them so plans are
  * deterministic and schema inference never triggers an extra pass
  * over 100 TB of JSON (SURVEY.md §7.5).
  *
  * `attributes` is a struct of the known Yelp attribute vocabulary
  * subset we exercise. With an explicit schema Spark's JSON reader
  * silently DROPS attributes not declared here (declared-but-absent
  * fields read as null; undeclared fields are simply not read) —
  * extending coverage means adding the field to this struct.
  */
object YelpSchemas {

  val attributes: StructType = StructType(Seq(
    "BikeParking", "BusinessAcceptsCreditCards", "BusinessParking",
    "Alcohol", "NoiseLevel", "WiFi", "RestaurantsPriceRange2",
    "RestaurantsTakeOut", "RestaurantsDelivery", "OutdoorSeating",
    "GoodForKids", "HasTV", "Caters", "Ambience", "GoodForMeal")
    .map(StructField(_, StringType, nullable = true)))

  val hours: StructType = StructType(
    Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")
      .map(StructField(_, StringType, nullable = true)))

  val business: StructType = StructType(Seq(
    StructField("business_id", StringType),
    StructField("name", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("postal_code", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("stars", DoubleType),
    StructField("review_count", LongType),
    StructField("is_open", LongType),
    StructField("attributes", attributes),
    StructField("categories", StringType),
    StructField("hours", hours)))

  val review: StructType = StructType(Seq(
    StructField("review_id", StringType),
    StructField("user_id", StringType),
    StructField("business_id", StringType),
    StructField("stars", DoubleType),
    StructField("useful", LongType),
    StructField("funny", LongType),
    StructField("cool", LongType),
    StructField("text", StringType),
    StructField("date", StringType)))

  val user: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("name", StringType),
    StructField("review_count", LongType),
    StructField("yelping_since", StringType),
    StructField("useful", LongType),
    StructField("funny", LongType),
    StructField("cool", LongType),
    StructField("fans", LongType),
    StructField("average_stars", DoubleType),
    StructField("elite", StringType),
    StructField("friends", StringType)))

  val checkin: StructType = StructType(Seq(
    StructField("business_id", StringType),
    StructField("date", StringType)))

  val tip: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("business_id", StringType),
    StructField("text", StringType),
    StructField("date", StringType),
    StructField("compliment_count", LongType)))
}
