package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2FromEvents chains validity intervals per key, last row open") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 11L, ts("2024-01-01 11:00:00"), "b"),
      (1L, 12L, ts("2024-01-01 12:00:00"), "c"),
      (2L, 20L, ts("2024-01-01 09:00:00"), "x")
    ).toDF("k", "eid", "ts", "v").repartition(3)
    val h = SetOps.scd2FromEvents(events, Seq("k"), "ts", "eid")
    assert(h.columns.toSeq === Seq("k", "eid", "ts", "v", "valid_from", "valid_to", "is_current"))
    val rows = h.collect().map(r => (r.getLong(1),
      r.getTimestamp(4), Option(r.getTimestamp(5)), r.getBoolean(6))).sortBy(_._1)
    assert(rows.toSeq === Seq(
      (10L, ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 11:00:00")), false),
      (11L, ts("2024-01-01 11:00:00"), Some(ts("2024-01-01 12:00:00")), false),
      (12L, ts("2024-01-01 12:00:00"), None, true),
      (20L, ts("2024-01-01 09:00:00"), None, true)))
  }

  test("scd2FromEvents: duplicate versions chain deterministically by tie column") {
    val events = Seq(
      (1L, 2L, ts("2024-01-01 10:00:00"), "second"),
      (1L, 1L, ts("2024-01-01 10:00:00"), "first")
    ).toDF("k", "eid", "ts", "v")
    val rows = SetOps.scd2FromEvents(events, Seq("k"), "ts", "eid")
      .collect().map(r => (r.getLong(1), r.getBoolean(6))).sortBy(_._1)
    assert(rows.toSeq === Seq((1L, false), (2L, true)))
  }

  test("scd2Apply: closed rows untouched, open rows re-chain with updates, " +
      "new keys insert, idle keys stay open") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 11L, ts("2024-01-01 11:00:00"), "b"),
      (3L, 30L, ts("2024-01-01 08:00:00"), "idle")
    ).toDF("k", "eid", "ts", "v")
    val history = SetOps.scd2FromEvents(events, Seq("k"), "ts", "eid")
    val updates = Seq(
      (1L, 12L, ts("2024-01-01 12:00:00"), "c"),   // closes k=1's open row
      (2L, 20L, ts("2024-01-01 09:30:00"), "new")  // brand-new key
    ).toDF("k", "eid", "ts", "v")
    val applied = SetOps.scd2Apply(history, updates, Seq("k"), "ts", "eid")
    val rows = applied.collect().map(r => (r.getLong(1),
      Option(r.getTimestamp(5)), r.getBoolean(6))).sortBy(_._1)
    assert(rows.toSeq === Seq(
      (10L, Some(ts("2024-01-01 11:00:00")), false), // closed row untouched
      (11L, Some(ts("2024-01-01 12:00:00")), false), // was open, now closed
      (12L, None, true),
      (20L, None, true),
      (30L, None, true)))                            // idle key stays open
    // full rebuild from the complete log gives the identical history
    val rebuilt = SetOps.scd2FromEvents(SetOps.concat(events, updates),
      Seq("k"), "ts", "eid")
    val a = applied.collect().map(_.toSeq).toSet
    val b = rebuilt.collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("scd2Apply: LATE events (older than the open row) re-chain that key's " +
      "full history == rebuild; other keys' closed rows pass through") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "a"),
      (1L, 12L, ts("2024-01-01 12:00:00"), "c"),
      (2L, 20L, ts("2024-01-01 09:00:00"), "x"),
      (2L, 21L, ts("2024-01-01 10:30:00"), "y")
    ).toDF("k", "eid", "ts", "v")
    val history = SetOps.scd2FromEvents(events, Seq("k"), "ts", "eid")
    val updates = Seq(
      // LATE for k=1: lands strictly inside the closed chain
      (1L, 11L, ts("2024-01-01 11:00:00"), "b"),
      // normal forward update for k=2
      (2L, 22L, ts("2024-01-01 11:30:00"), "z")
    ).toDF("k", "eid", "ts", "v")
    val applied = SetOps.scd2Apply(history, updates, Seq("k"), "ts", "eid")
    val rebuilt = SetOps.scd2FromEvents(SetOps.concat(events, updates),
      Seq("k"), "ts", "eid")
    assert(applied.collect().map(_.toSeq).toSet === rebuilt.collect().map(_.toSeq).toSet)
    // the late event spliced correctly: 10 closes at 11, 11 at 12
    val k1 = applied.filter(col("k") === 1).collect()
      .map(r => (r.getLong(1), Option(r.getTimestamp(5)))).sortBy(_._1)
    assert(k1.toSeq === Seq(
      (10L, Some(ts("2024-01-01 11:00:00"))),
      (11L, Some(ts("2024-01-01 12:00:00"))),
      (12L, None)))
  }

  test("scd2Apply: update TYING the open row's version stays rebuild-equivalent " +
      "(tie column decides the chain on both paths)") {
    val events = Seq((1L, 10L, ts("2024-01-01 10:00:00"), "a"))
      .toDF("k", "eid", "ts", "v")
    val history = SetOps.scd2FromEvents(events, Seq("k"), "ts", "eid")
    // same version as the open row, smaller AND larger tie ids
    val updates = Seq(
      (1L, 5L, ts("2024-01-01 10:00:00"), "before"),
      (1L, 15L, ts("2024-01-01 10:00:00"), "after")
    ).toDF("k", "eid", "ts", "v")
    val applied = SetOps.scd2Apply(history, updates, Seq("k"), "ts", "eid")
    val rebuilt = SetOps.scd2FromEvents(SetOps.concat(events, updates),
      Seq("k"), "ts", "eid")
    assert(applied.collect().map(_.toSeq).toSet === rebuilt.collect().map(_.toSeq).toSet)
  }

  test("scd2FromEvents refuses reserved columns and missing keys") {
    val d = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("k", "eid", "ts")
    intercept[IllegalArgumentException] {
      SetOps.scd2FromEvents(d.withColumn("is_current", lit(true)), Seq("k"), "ts", "eid")
    }
    intercept[IllegalArgumentException] {
      SetOps.scd2FromEvents(d, Seq("missing"), "ts", "eid")
    }
  }
}
