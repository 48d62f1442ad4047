package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-fixture generators. */
object Datasets {

  /** Spark-native analogue of the reference's `synthetic_order_data`
    * (tablite/datasets.py:9-84): the same 12-column order-like shape and
    * value domains — row number `#`, order id `1`, delivery datetime `2`
    * (2021-07-29 + 0..150 days, the reference's ordinal 738000..738150),
    * store id `3` (50000..51000), bit `4`, product id `5` (3000..30000),
    * `C{1-5}-{1-5}` code `6`, 3-letter category `7`, temperature group
    * `8` (None/0°/6°/21°), category `9` (ABC/XYZ/""), volume `10`
    * (uniform 0.01..2.5), units `11` (uniform 0.1..25 as string).
    *
    * Differences by design: generated DISTRIBUTED via `spark.range` (the
    * reference loops a Python RNG per page on the driver) and
    * DETERMINISTIC — values derive from `xxhash64(id, seed, salt)`, so
    * any slice of any size regenerates bit-identically on retry, which
    * `random.randint` cannot do. The reference's "None" in column 8 is
    * the literal string (faithfully kept); `""` in column 9 likewise.
    */
  def syntheticOrderData(spark: SparkSession, rows: Long, seed: Long = 42L): DataFrame = {
    def h(salt: Int): Column = pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(Long.MaxValue))
    def rint(salt: Int, lo: Long, hi: Long): Column = h(salt) % (hi - lo + 1) + lo
    def runi(salt: Int, lo: Double, hi: Double): Column =
      (h(salt) % 1000000L).cast("double") / 1000000.0 * (hi - lo) + lo
    def letter(salt: Int): Column = chr(h(salt) % 26 + 65)
    spark.range(rows).select(
      (col("id") + 1).as("#"),
      rint(1, 18778628504L, 2277772117504L).as("1"),
      date_add(to_date(lit("2021-07-29")), (h(2) % 151).cast("int"))
        .cast("timestamp").as("2"),
      rint(3, 50000L, 51000L).as("3"),
      rint(4, 0L, 1L).as("4"),
      rint(5, 3000L, 30000L).as("5"),
      concat(lit("C"), rint(6, 1L, 5L), lit("-"), rint(7, 1L, 5L)).as("6"),
      concat(letter(8), letter(9), letter(10)).as("7"),
      element_at(array(lit("None"), lit("0°"), lit("6°"), lit("21°")),
        (h(11) % 4 + 1).cast("int")).as("8"),
      element_at(array(lit("ABC"), lit("XYZ"), lit("")),
        (h(12) % 3 + 1).cast("int")).as("9"),
      runi(13, 0.01, 2.5).as("10"),
      runi(14, 0.1, 25.0).cast("string").as("11"))
  }

  /** Reference `date_range` (tablite/utils.py:401-409): timestamps in
    * `[start, stop)` stepping `stepSeconds` — exactly
    * `(stop-start) / step` values (floor). Spark's `sequence()` is
    * stop-INCLUSIVE, so the range is generated from an explicit count;
    * distributed via `spark.range` rather than a driver list.
    */
  def dateRange(
      spark: SparkSession,
      start: java.sql.Timestamp,
      stop: java.sql.Timestamp,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds: $stepSeconds")
    val n = math.max(0L, (stop.getTime - start.getTime) / (stepSeconds * 1000L))
    spark.range(n).select(
      timestamp_millis(lit(start.getTime) + col("id") * (stepSeconds * 1000L)).as("ts"))
  }
}
