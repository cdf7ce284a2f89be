package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Streaming surface: the windowed aggregation runs as a REAL stream
  * (parquet source → watermark → memory sink) and matches its own
  * batch execution; the stateful sessionizer matches the declarative
  * window-function sessionizer. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def normalizedEvents(sf: String) =
    Tables.eventsWithTs(spark, sf)
      .select($"event_id", $"event_ts", $"user_id", $"event_type", $"value")

  test("windowed counts: streaming run equals batch run") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val batchIn = normalizedEvents("/root/testdata/sf0.001")
    batchIn.write.mode("overwrite").parquet(dir)

    val q = Streams.windowedEventCounts(Streams.eventsStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_out")
      .orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
    val batch = Streams.windowedEventCounts(batchIn)
      .orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stream-static join and watermarked dedup run as a real stream") {
    val dir = Files.createTempDirectory("graft_stream2").toString
    val batchIn = normalizedEvents("/root/testdata/sf0.001")
    // duplicate every event to give the dedup something to drop
    batchIn.union(batchIn).write.mode("overwrite").parquet(dir)
    val dim = Seq(("click", 1.0), ("view", 0.1), ("purchase", 10.0))
      .toDF("t", "weight")

    val stream = Streams.enrichWithDim(
      Streams.dedupEvents(Streams.eventsStream(spark, dir)),
      dim, "event_type", "t")
      .groupBy($"weight").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("enriched_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("enriched_out")
      .orderBy("weight").as[(Double, Long)].collect()
    val batch = Streams.enrichWithDim(
      Streams.dedupEvents(batchIn.union(batchIn)), dim, "event_type", "t")
      .groupBy($"weight").agg(count(lit(1)).as("n"))
      .orderBy("weight").as[(Double, Long)].collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
    // dedup actually dropped the duplicates
    val total = streamed.map(_._2).sum
    val distinctIds = batchIn.filter($"event_type".isin("click", "view", "purchase"))
      .select($"event_id").distinct().count()
    assert(total == distinctIds)
  }

  test("stateful sessionizer equals declarative gap sessionizer") {
    val ev = normalizedEvents("/root/testdata/sf0.001")
    val typed = ev.select($"event_id", $"user_id",
      unix_micros($"event_ts").as("tsMicros"), $"value")
      .as[Streams.SessionEvent]
    implicit val s = spark
    val stateful = Streams.sessionizeStateful(typed, 30)
      .select($"user_id", $"session_no", $"startMicros", $"endMicros", $"n_events")
      .orderBy("user_id", "session_no")
      .as[(Long, Long, Long, Long, Long)].collect()
    val declarative = Streams.sessionsByGap(ev, 30)
      .select($"user_id", $"session_no",
        unix_micros($"session_start"), unix_micros($"session_end"), $"n_events")
      .orderBy("user_id", "session_no")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(stateful.nonEmpty)
    assert(stateful.toSeq == declarative.toSeq)
  }
}
