package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-Spark-job profile of a single catalog query: records every job
  * launched during one warm execution (start offset, duration, stage
  * count, total task count, description) so fixed per-job overhead —
  * the dominant cost of the multi-commit protocol meters — is visible
  * per call site. Dev-only; the bench contract is untouched.
  *
  * Usage: runMain graft.tools.ProfileOne <queryName> [sfDir]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    // warm pass (build-once lifecycle + JIT), matching Bench methodology
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    case class Job(id: Int, startNs: Long, desc: String, nTasks: Int,
                   var endNs: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the result stage's name is the callsite ("collect at Foo.scala:12")
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("")
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .map(d => s"$d | $site").getOrElse(site)
        val nTasks = e.stageInfos.map(_.numTasks).sum
        val j = Job(e.jobId, System.nanoTime(), desc, nTasks)
        jobs.put(e.jobId, j); order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.endNs = System.nanoTime()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // let the async listener bus drain
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    println(f"PROFILE $name wall=$wall%.3f s")
    var covered = 0.0
    val it = order.iterator()
    while (it.hasNext) {
      val j = jobs.get(it.next())
      val dur = if (j.endNs > 0) (j.endNs - j.startNs) / 1e9 else -1.0
      if (dur > 0) covered += dur
      val off = (j.startNs - t0) / 1e9
      println(f"  job ${j.id}%4d  +$off%7.3f  ${dur}%7.3f s  tasks=${j.nTasks}%4d  ${j.desc.take(140)}")
    }
    println(f"  jobs=${jobs.size()} job-covered=$covered%.3f s (gaps = driver-side work)")
    spark.stop()
  }
}
