package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev timing harness for a single catalog query: same session config
  * and noop-write methodology as [[graft.Bench]], N repetitions, all
  * timings printed — for iterating on one hotspot without paying a
  * full catalog pass.
  *
  * Usage: runMain graft.tools.TimeOne <queryName> [sfDir] [runs]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    // same default as Bench so numbers are comparable out of the box
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"TIMEONE $name runs=$runs times=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
