package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEventsParquet(): String = {
    val dir = Files.createTempDirectory("graftstream").toString
    val src = dir + "/in"
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), "click", 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), "view", 3.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), "view", 3.0) // exact dup
    ).toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.parquet(src)
    src
  }

  test("windowed aggregation with watermark over a file stream") {
    val src = writeEventsParquet()
    val schema = spark.read.parquet(src).schema
    val stream = Streams.readParquetStream(spark, src, schema)
    val agg = Streams.windowedAgg(stream, "ts", "10 minutes", "1 hour", None,
      Seq("event_type"), Seq("value" -> "Sum", "value" -> "Count"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT event_type, `Sum(value)` FROM win_out").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(out("click") === 3.0)
      assert(out("view") === 6.0) // two identical 3.0 view events
    } finally q.stop()
  }

  test("streaming dedup drops exact duplicates within the watermark") {
    val src = writeEventsParquet()
    val schema = spark.read.parquet(src).schema
    val stream = Streams.readParquetStream(spark, src, schema)
    val dedup = Streams.streamingDedup(stream, "ts", "1 hour", Seq("event_id"))
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM dedup_out").count() === 3)
    } finally q.stop()
  }

  test("stateful sessionizer emits gap-separated sessions") {
    val src = writeEventsParquet()
    val schema = spark.read.parquet(src).schema
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val stream = Streams.readParquetStream(spark, src, schema)
      .selectExpr("event_id AS user_id", "ts", "value").as[Streams.SessionEvent]
    val sessions = Streams.sessionize(stream, gapSeconds = 1800)
    // Trigger.Once: ProcessingTimeTimeout schedules perpetual empty
    // micro-batches, so processAllAvailable would never settle
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    try {
      q.awaitTermination(60000)
      // sessions only EMIT on gap/timeout; the one-batch assertion is
      // that the stateful query runs to completion and commits state
      assert(q.lastProgress != null)
    } finally q.stop()
  }
}
