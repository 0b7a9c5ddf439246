package graft

import graft.streaming.Streams
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val streamDir: String = {
    // file-source streams read directories; stage the events parquet into one
    val d = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), d.resolve("part-0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("streaming windowed agg over file source matches the batch result") {
    val stream = Streams.eventsStream(spark, streamDir, s"$sfDir/events.parquet")
    val q = Streams.windowedAgg(stream)
      .writeStream.outputMode("update").format("memory").queryName("win_agg").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .groupBy("hour", "event_type") // memory sink in update mode may emit multiple rows per key; keep last
        .agg(max("n").as("n"), max("value_sum_micro").as("value_sum_micro"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val want = spark.read.parquet(s"$sfDir/events.parquet")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(floor(value * 1000000D) as bigint)")).as("value_sum_micro"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"stream/batch mismatch: ${got.size} vs ${want.size} groups")
    } finally q.stop()
  }

  test("sessionize with idle-state timeout runs and emits under AvailableNow") {
    // ProcessingTimeTimeout keeps a future batch pending, so this variant is
    // driven with Trigger.AvailableNow (terminates after draining) instead
    // of processAllAvailable (which would never quiesce)
    val stream = Streams.eventsStream(spark, streamDir, s"$sfDir/events.parquet")
      .as[Streams.Event]
    val q = Streams.sessionize(stream, idleTimeout = Some("10 minutes"))
      .writeStream.outputMode("update").format("memory").queryName("sessions_to")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(120000L)
      val got = spark.table("sessions_to")
        .groupBy("user_id").agg(max("n_events").as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = spark.read.parquet(s"$sfDir/events.parquet")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want, "timeout variant must still accumulate full sessions")
    } finally q.stop()
  }

  test("stateful sessionization accumulates per-user state across batches") {
    val stream = Streams.eventsStream(spark, streamDir, s"$sfDir/events.parquet")
      .as[Streams.Event]
    val q = Streams.sessionize(stream)
      .writeStream.outputMode("update").format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions")
        .groupBy("user_id").agg(max("n_events").as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = spark.read.parquet(s"$sfDir/events.parquet")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == want)
    } finally q.stop()
  }
}
