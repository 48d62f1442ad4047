package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Late / out-of-order arrival semantics, one explicit spec per
  * streaming op family (windowed agg, rolling, upsert, dedup). Each
  * test drives REAL MemoryStream micro-batches and pins the
  * drop-vs-emit contract:
  *
  *  - windowedAgg: event-time semantics — a late row INSIDE the
  *    watermark horizon lands in its (already open) window; a row
  *    arriving after the watermark passed its window end is DROPPED
  *    and the finalized window row is never revised (append mode).
  *  - streamingRolling: arrival-order semantics — rows sort by event
  *    time only WITHIN a micro-batch; a late row in a later batch
  *    applies to the current ring state in arrival order (documented
  *    divergence from the batch operator, which globally sorts).
  *  - upsertStream: version-order semantics — arrival order is
  *    irrelevant; a late redelivery of an older (or tied) version
  *    never regresses the view.
  *  - streamingDedup: watermark-horizon semantics — an in-horizon
  *    duplicate is suppressed, an in-horizon new key emits, and a row
  *    older than the watermark is dropped wholesale, duplicate or not.
  *
  * The divergence table lives in NOTES.md (round-11 record).
  */
class StreamsLateDataSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowedAgg append: in-horizon late row emits into its window, " +
      "beyond-horizon row drops and the finalized window is never revised") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val agg = Streams.windowedAgg(in.toDF().toDF("id", "ts", "v"), "ts",
      watermark = "10 minutes", windowLen = "10 minutes", slide = None,
      keys = Nil, aggs = Seq("v" -> "Sum"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_win_out").start()
    try {
      // batch 1: two on-time rows in window [10:00, 10:10); wm ends at 09:57
      in.addData((1L, ts("2024-01-01 10:05:00"), 1.0),
                 (2L, ts("2024-01-01 10:07:00"), 2.0))
      q.processAllAvailable()
      // batch 2: 10:03 is LATE but inside the horizon (wm 09:57) → joins
      // its window; 10:25 advances wm to 10:15, past the window end, so
      // [10:00,10:10) finalizes with the late row INCLUDED
      in.addData((3L, ts("2024-01-01 10:03:00"), 4.0),
                 (4L, ts("2024-01-01 10:25:00"), 8.0))
      q.processAllAvailable()
      // batch 3: 10:04 is beyond the horizon (wm 10:15) → dropped; the
      // finalized window row must not be re-emitted or revised
      in.addData((5L, ts("2024-01-01 10:04:00"), 16.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window.start AS ws, `Sum(v)` AS s FROM late_win_out")
        .collect().map(r => (r.getTimestamp(0), r.getDouble(1)))
      val first = rows.filter(_._1 == ts("2024-01-01 10:00:00"))
      assert(first.toSeq === Seq((ts("2024-01-01 10:00:00"), 7.0)),
        s"window [10:00,10:10) must emit once with the in-horizon late row " +
          s"(1+2+4) and without the dropped 16.0; got ${rows.toSeq}")
    } finally q.stop()
  }

  test("streamingRolling: event-time order within a batch, arrival order " +
      "across batches (documented divergence from the batch sort)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Streams.RollEvent]
    val rolled = Streams.streamingRolling(in.toDS(), n = 2)
    val q = rolled.writeStream.outputMode("append")
      .format("memory").queryName("late_roll_out").start()
    try {
      // batch 1 arrives REVERSED: within-batch event-time sort applies
      // 10:00(v=1) before 10:02(v=3) → sums 1 then 4
      in.addData(Streams.RollEvent("g", ts("2024-01-01 10:02:00"), 2L, 3.0),
                 Streams.RollEvent("g", ts("2024-01-01 10:00:00"), 1L, 1.0))
      q.processAllAvailable()
      // batch 2: a LATE row (10:01) — cross-batch contract is ARRIVAL
      // order, so it applies against the current ring [3.0], giving
      // sum 8.0 — NOT the 6.0 a global event-time sort would produce
      in.addData(Streams.RollEvent("g", ts("2024-01-01 10:01:00"), 3L, 5.0))
      q.processAllAvailable()
      val sums = spark.sql("SELECT id, roll_sum FROM late_roll_out")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(sums === Map(1L -> 1.0, 2L -> 4.0, 3L -> 8.0))
    } finally q.stop()
  }

  test("upsertStream: late redelivery of an older or tied version never " +
      "regresses the view") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Long, Long)]
    val view = Streams.upsertStream(in.toDF().toDF("k", "v", "ver", "seq"),
      Seq("k"), "ver", "seq")
    val q = view.writeStream.outputMode("complete")
      .format("memory").queryName("late_upsert_out").start()
    try {
      in.addData((1L, "v5", 5L, 1L))
      q.processAllAvailable()
      // older version arrives late → ignored
      in.addData((1L, "v3-late", 3L, 2L))
      q.processAllAvailable()
      // SAME version redelivered later: ties break by SMALLEST tieCol,
      // so the original seq=1 row stays
      in.addData((1L, "v5-redelivery", 5L, 3L))
      q.processAllAvailable()
      val got = spark.sql("SELECT k, v, ver FROM late_upsert_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(got === Seq((1L, "v5", 5L)))
    } finally q.stop()
  }

  test("streamingDedup: in-horizon duplicate suppressed, beyond-horizon " +
      "row dropped wholesale even when it is NOT a duplicate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = Streams.streamingDedup(in.toDF().toDF("k", "ts", "tag"),
      "ts", watermark = "10 minutes", keys = Seq("k"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("late_dedup_out").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), "first"))
      q.processAllAvailable()
      // duplicate key+ts inside the horizon → suppressed; fresh key at
      // 10:30 emits and advances the watermark to 10:20
      in.addData((1L, ts("2024-01-01 10:00:00"), "dup"),
                 (2L, ts("2024-01-01 10:30:00"), "advancer"))
      q.processAllAvailable()
      // 10:05 is before the watermark (10:20): dropped as late data even
      // though key 3 was never seen before
      in.addData((3L, ts("2024-01-01 10:05:00"), "too-late-new-key"))
      q.processAllAvailable()
      val keys = spark.sql("SELECT k, tag FROM late_dedup_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(keys === Set((1L, "first"), (2L, "advancer")))
    } finally q.stop()
  }
}
