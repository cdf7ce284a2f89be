package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.Runner

/** Cross-JVM metastore persistence check, driven by PipelineSpec as
  * two FORKED processes over the same base dir (a genuine JVM restart,
  * which an in-process `newSession()` cannot simulate):
  *
  *   write <base>  — build a tiny gold_dim_time, register it through
  *                   Runner.registerGold in a derby-backed hive session
  *   read <base>   — a fresh JVM resolves `spark.table("gold_dim_time")`
  *                   by NAME from the same metastore and prints
  *                   `METASTORE_ROWS=<n>`
  */
object MetastoreCheck {
  def main(args: Array[String]): Unit = {
    val (mode, base) = (args(0), args(1))
    val spark = Runner.hiveSession(base)
    spark.sparkContext.setLogLevel("ERROR")
    mode match {
      case "write" =>
        spark.range(3)
          .select(col("id").cast("int").as("date_key"),
            date_add(lit("2021-01-01").cast("date"), col("id").cast("int")).as("date"))
          .write.mode("overwrite").parquet(s"$base/gold/dim_time")
        new Runner(spark, base).registerGold("dim_time", partitioned = false)
        println("METASTORE_WROTE=gold_dim_time")
      case "read" =>
        println(s"METASTORE_ROWS=${spark.table("gold_dim_time").count()}")
    }
    spark.stop()
  }
}
