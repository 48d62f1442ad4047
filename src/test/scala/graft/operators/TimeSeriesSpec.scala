package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("resample: gaps filled with zeros between each group's first and last bucket") {
    val h = 3600000L
    val df = Seq(
      ("a", ts(0L), 1.0), ("a", ts(10L), 2.0),      // bucket 0 ×2
      ("a", ts(3 * h + 5), 4.0),                    // bucket 3 (1,2 are gaps)
      ("b", ts(2 * h), 8.0)                         // single bucket: no gaps
    ).toDF("g", "ts", "v")
    val out = TimeSeries.resample(df, "ts", "g", stepMs = h, valueCol = "v")
      .orderBy("g", "bucket").as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("a", 0L, 2L, 3.0), ("a", 1L, 0L, 0.0), ("a", 2L, 0L, 0.0),
      ("a", 3L, 1L, 4.0), ("b", 2L, 1L, 8.0)))
  }

  test("resample: null timestamps dropped; absurd step fails loudly, not 10^10 rows") {
    val df = Seq(("a", ts(0L), 1.0), ("a", null.asInstanceOf[java.sql.Timestamp], 9.0),
      ("a", ts(86400000L * 30), 2.0)).toDF("g", "ts", "v")
    val out = TimeSeries.resample(df, "ts", "g", stepMs = 86400000L, valueCol = "v")
    assert(out.agg(sum("n")).as[Long].collect().head === 2L) // the null row never lands
    val ex = intercept[IllegalArgumentException](
      TimeSeries.resample(df, "ts", "g", stepMs = 1L, valueCol = "v",
        maxBucketsPerGroup = 1000L))
    assert(ex.getMessage.contains("coarser step"))
  }
}
