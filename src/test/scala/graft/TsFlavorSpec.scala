package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver's generator has shipped `events.ts` in three different
  * parquet flavors across rounds: TIMESTAMP(NANOS) (read as long under
  * `nanosAsLong`), naive timestamp[us] (read as TIMESTAMP_NTZ), and
  * tz-aware timestamp[us] (TimestampType). Round 6 went red because only
  * the first flavor was normalized. This spec synthesizes all three
  * vintages and asserts (a) `SparkEntry.normalizeTs` lands every flavor
  * on identical microsecond TimestampType values, and (b) EVERY declared
  * query resolves its plan against each vintage — the data's vintage
  * must never again decide correctness.
  */
class TsFlavorSpec extends SparkSpec {

  private val srcDir = "/root/testdata/sf0.001"

  /** Every temporal column the driver's generator has shipped in
    * drifting flavors. events.ts gets the full three-way treatment; the
    * orders/lineitem date columns ride along so a nanos-vintage of THOSE
    * tables can't red a future round either.
    */
  private val temporalCols = Map(
    "events" -> "ts", "orders" -> "o_orderdate", "lineitem" -> "l_shipdate")

  /** Temp dir with every temporal column rewritten in the given flavor
    * and symlinks to the untouched sf0.001 tables.
    */
  private def flavorDir(flavor: String): String = {
    val tmp = Files.createTempDirectory(s"graft_tsflavor_$flavor")
    tmp.toFile.deleteOnExit()
    for ((table, tc) <- temporalCols) {
      val raw = spark.read.parquet(s"$srcDir/$table.parquet")
      // Canonical micros regardless of today's vintage on disk.
      val canon = SparkEntry.normalizeTs(raw, tc)
      val out = flavor match {
        case "long" => canon.withColumn(tc, unix_micros(col(tc)) * 1000L) // nanos
        case "tz"   => canon                                              // TimestampType
        case "ntz"  => canon.withColumn(tc, col(tc).cast("timestamp_ntz"))
        case "date" => canon.withColumn(tc, col(tc).cast("date"))         // day-granular drift
      }
      out.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$table.parquet")
    }
    val src = Paths.get(srcDir)
    Files.list(src).forEach { p: Path =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet") && !temporalCols.contains(n.stripSuffix(".parquet")))
        Files.createSymbolicLink(tmp.resolve(n), p)
    }
    tmp.toString
  }

  private lazy val dirs: Map[String, String] =
    Seq("long", "tz", "ntz", "date").map(f => f -> flavorDir(f)).toMap

  test("normalizeTs lands every vintage on TimestampType with the expected micros") {
    val canon = SparkEntry.normalizeTs(spark.read.parquet(s"$srcDir/events.parquet"))
    val expect = canon
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the date vintage is day-granular by nature: expect midnight-UTC
    val expectDate = canon
      .select(col("event_id"), unix_micros(date_trunc("DAY", col("ts"))).as("us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    for ((flavor, dir) <- dirs) {
      val df = SparkEntry.normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
      assert(df.schema("ts").dataType === TimestampType, s"flavor=$flavor")
      val got = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = if (flavor == "date") expectDate else expect
      assert(got.toSeq === want.toSeq, s"flavor=$flavor micros differ")
    }
  }

  test("every declared query resolves against every ts vintage") {
    for ((flavor, dir) <- dirs) {
      SparkEntry.queries.foreach { case (name, fn) =>
        val df: DataFrame =
          try fn(spark, dir)
          catch { case e: Throwable =>
            fail(s"$name failed to build plan on ts flavor '$flavor': ${e.getMessage}")
          }
        assert(df.schema.fields.nonEmpty, s"$name empty schema on flavor $flavor")
        // Plan-only enumeration never runs an action, so the dedup
        // pipelines' CacheScope persists (released on the caller's FIRST
        // action) stay registered — 4 flavors × every query accumulates
        // thousands of lazy CacheManager entries, each pinning its full
        // analyzed tree: every later (un)persist then walks all of them
        // via sameResult (quadratic driver time) and the pinned trees
        // eventually OOM the shared 8 g test JVM. Clear per query.
        spark.sharedState.cacheManager.clearCache()
      }
    }
  }

  test("the round-6 red queries execute on every ts vintage") {
    for ((flavor, dir) <- dirs; q <- Seq("q_time_of_day", "q_sessionize", "q_asof_sql")) {
      val n = SparkEntry.queries(q)(spark, dir).count()
      assert(n > 0, s"$q returned no rows on flavor $flavor")
    }
  }
}
