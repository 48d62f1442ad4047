package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Rank-based type guessing + locale-aware parsing — the reference's
  * ingest-quality differentiators (datatypes.py:452-517 `DataTypes.guess`,
  * nimlite/ranking.nim:16-99, locale numbers infertypes.nim:26-120,
  * multi-format datetimes datatypes.py:182-265).
  */
object TypeInference {

  /** Candidate order, most- to least-specific — first fully-parsing type
    * wins, mirroring the reference's probability-ordered Rank
    * (datatypes.py:453, ranking.nim:47-99).
    */
  val candidateOrder: Seq[String] = Seq("timestamp", "date", "boolean", "bigint", "double")

  /** Locale-tolerant numeric normalization: "1,000,000.5" (US) and
    * "1.000.000,5" (EU) and "1 000 000" all parse. Heuristic from the
    * Nim parser: the RIGHTMOST separator is the decimal point iff it
    * appears once and the other separator (or none) groups by 3s.
    */
  def normalizeNumber(c: Column): Column = {
    val s = trim(regexp_replace(c, "[\\s\\u00a0']", "")) // strip spaces/nbsp/apostrophes
    val lastDot = length(s) - locate(".", reverse(s))
    val lastComma = length(s) - locate(",", reverse(s))
    val hasDot = s.contains(".")
    val hasComma = s.contains(",")
    when(hasDot && hasComma,
      // both present: the later one is the decimal separator
      when(lastDot > lastComma,
        regexp_replace(s, ",", ""))                       // 1,000.5
        .otherwise(regexp_replace(regexp_replace(s, "\\.", ""), ",", ".")) // 1.000,5
    ).when(hasComma && !hasDot,
      // comma only: decimal iff not a 3-digit grouping pattern
      when(s.rlike("^[+-]?\\d{1,3}(,\\d{3})+$"), regexp_replace(s, ",", ""))
        .otherwise(regexp_replace(s, ",", "."))
    ).when(hasDot && !hasComma &&
        s.rlike("^[+-]?\\d{1,3}(\\.\\d{3}){2,}$"),
      // multiple 3-grouped dots = EU thousands; a single dot is decimal
      regexp_replace(s, "\\.", "")
    ).otherwise(s)
  }

  /** try-parse a string column as a locale-tolerant number. The native
    * kernel (plans.Kernels.LocaleNumberExpr) is a single string pass;
    * `normalizeNumber` above documents the same semantics as column ops.
    */
  def parseNumber(c: Column): Column = graft.plans.Kernels.localeNumber(c)

  /** Multi-format date/datetime sniffing (datatypes.py:182-265): coalesce
    * of try-parses over the reference's format table, ISO first.
    */
  private val dateFormats = Seq("yyyy-MM-dd", "yyyy/MM/dd", "yyyy.MM.dd", "yyyyMMdd",
    "dd-MM-yyyy", "dd/MM/yyyy", "dd.MM.yyyy", "MM/dd/yyyy")
  private val datetimeFormats = Seq(
    "yyyy-MM-dd HH:mm:ss.SSSSSS", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS", "dd/MM/yyyy HH:mm:ss", "yyyy/MM/dd HH:mm:ss")

  def parseDateMulti(c: Column): Column =
    coalesce(dateFormats.map(f => try_to_timestamp(c, lit(f)).cast("date")): _*)

  def parseTimestampMulti(c: Column): Column =
    coalesce(datetimeFormats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** `DataTypes.round` equivalent — round value to an arbitrary multiple
    * (datatypes.py:325-371).
    */
  def xround(c: Column, multiple: Double): Column =
    (round(c / lit(multiple)) * lit(multiple))

  /** time-of-day encoding: the reference's `time` type has no Spark
    * native type — microseconds-of-day LongType (SURVEY §1.2).
    */
  def timeOfDayMicros(ts: Column): Column =
    (unix_micros(ts) - unix_micros(date_trunc("DAY", ts)))

  /** Per-column best type by parse-success ranking over a sample:
    * a candidate wins if it parses EVERY non-null sampled value
    * (none-ish tokens count as null, datatypes.py:30), first in
    * `candidateOrder` wins — unlike Spark CSV inference, which falls to
    * string on first conflict.
    */
  def bestTypes(df: DataFrame, sampleRows: Int = 10000): Map[String, String] = {
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (stringCols.isEmpty) return Map.empty
    val sample = df.select(stringCols.map(col): _*).limit(sampleRows)
    val noneish = Seq("", "null", "NULL", "None", "#N/A", "N/A", "nan")
    val aggs = stringCols.flatMap { c =>
      val v = when(trim(col(c)).isin(noneish: _*), lit(null)).otherwise(trim(col(c)))
      Seq(
        count(v).as(s"$c|n"),
        count(parseNumber(v)).as(s"$c|double"),
        count(when(parseNumber(v) === parseNumber(v).try_cast("bigint").cast("double"), 1)).as(s"$c|bigint"),
        count(when(lower(v).isin("true", "false", "yes", "no", "0", "1"), 1)).as(s"$c|boolean"),
        count(parseDateMulti(v)).as(s"$c|date"),
        count(parseTimestampMulti(v)).as(s"$c|timestamp"))
    }
    val row = sample.agg(aggs.head, aggs.tail: _*).collect().head
    stringCols.map { c =>
      val n = row.getAs[Long](s"$c|n")
      val winner =
        if (n == 0) "string"
        else candidateOrder.find { cand =>
          row.getAs[Long](s"$c|$cand") == n &&
            // dates parse as timestamps too; prefer date when midnight-only
            (cand != "timestamp" || row.getAs[Long](s"$c|date") < n)
        }.getOrElse("string")
      c -> winner
    }.toMap
  }

  /** Cast every string column of `df` to its best-ranked type. */
  def applyBestTypes(df: DataFrame): DataFrame = {
    val types = bestTypes(df)
    val noneish = Seq("", "null", "NULL", "None", "#N/A", "N/A", "nan")
    df.select(df.columns.map { c =>
      types.get(c) match {
        case None | Some("string") => col(c)
        case Some(t) =>
          val v = when(trim(col(c)).isin(noneish: _*), lit(null)).otherwise(trim(col(c)))
          val castExpr = t match {
            case "double"    => parseNumber(v)
            case "bigint"    => parseNumber(v).try_cast("bigint")
            case "boolean"   => when(lower(v).isin("true", "yes", "1"), true)
                                  .when(lower(v).isin("false", "no", "0"), false)
            case "date"      => parseDateMulti(v)
            case "timestamp" => parseTimestampMulti(v)
          }
          castExpr.as(c)
      }
    }: _*)
  }
}
