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
  val candidateOrder: Seq[String] =
    Seq("timestamp", "date", "bigint", "decimal", "boolean", "double")

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
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS", "dd/MM/yyyy HH:mm:ss", "yyyy/MM/dd HH:mm:ss",
    // minute precision (f12.csv's "01/01/2012 00:00" — day first, like
    // the date table's year-last rule)
    "yyyy-MM-dd HH:mm", "dd/MM/yyyy HH:mm", "dd-MM-yyyy HH:mm", "dd.MM.yyyy HH:mm")

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
  private val noneish = Seq("", "null", "NULL", "None", "#N/A", "N/A", "nan")

  /** One profiling pass over a driver-side sample: per column the winning
    * type AND, for date/timestamp winners, the single format that parsed
    * every sampled value (so the distributed cast uses one formatter
    * instead of the 8/6-format coalesce chain). Driver-side on purpose:
    * the sample is bounded (10k rows), and a Spark aggregate with ~20
    * try-parse counters per column spent more time in codegen than the
    * reference spends reading the file. Number parsing reuses the
    * LocaleNumberExpr kernel so profile and cast can never disagree.
    */
  private def profileTypes(df: DataFrame, sampleRows: Int)
      : (Map[String, String], Map[String, Option[String]]) = {
    import java.time.format.DateTimeFormatter
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    if (stringCols.isEmpty) return (Map.empty, Map.empty)
    val rows = df.select(stringCols.map(qcol): _*).limit(sampleRows).collect()
    val noneSet = noneish.toSet
    val numberKernel = graft.plans.Kernels.LocaleNumberExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("0"))
    val boolWords = Set("true", "false", "yes", "no", "0", "1")

    def toJavaFmt(f: String) = DateTimeFormatter.ofPattern(f.replace("'T'", "'T'"))
    val dateFmts = dateFormats.map(f => f -> toJavaFmt(f))
    val tsFmts = datetimeFormats.map(f => f -> toJavaFmt(f))

    val winners = scala.collection.mutable.Map[String, String]()
    val formats = scala.collection.mutable.Map[String, Option[String]]()
    stringCols.zipWithIndex.foreach { case (c, ci) =>
      val values = rows.iterator.map(_.getString(ci))
        .filter(v => v != null && !noneSet.contains(v.trim)).map(_.trim).toSeq
      val n = values.length
      def all(p: String => Boolean): Boolean = n > 0 && values.forall(p)
      def parseNum(s: String): Option[Double] =
        Option(numberKernel.nullSafeEval(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)))
          .map(_.asInstanceOf[Double])
      // EXACT integer tests on the locale-normalized STRING, not a Double
      // round-trip: the reference's int is arbitrary-precision
      // (datatypes.py:15, ±10²³ in import_utils.py:82-84), and a Double
      // path both loses exactness above 2^53 and wrongly admits
      // scientific notation ("1e3" is a float to the reference's
      // rank, int() rejects it)
      def normOf(s: String): String = graft.plans.Kernels.localeNormEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      // ASCII digits ONLY: Char.isDigit / Long.parseLong are
      // Unicode-aware (accept e.g. Arabic-Indic "٣٤٥"), but the cast
      // path's rlike("^[+-]?[0-9]+$") is ASCII — profiling a non-ASCII
      // digit column as bigint would null it out wholesale at cast
      // time. Such columns stay string.
      def asciiDigit(c: Char): Boolean = c >= '0' && c <= '9'
      def isIntStr(s: String): Boolean = {
        val t = normOf(s)
        val body = t.dropWhile(c => c == '+' || c == '-')
        t.nonEmpty && (t.length - body.length) <= 1 &&
          body.nonEmpty && body.forall(asciiDigit)
      }
      def fitsLong(s: String): Boolean = {
        val t = normOf(s)
        t.forall(c => asciiDigit(c) || c == '+' || c == '-') &&
          (try { t.toLong; true } catch { case _: NumberFormatException => false })
      }
      def fitsDec38(s: String): Boolean = normOf(s).count(asciiDigit) <= 38
      def parsesWith(fmt: DateTimeFormatter, dateOnly: Boolean)(s: String): Boolean =
        try {
          if (dateOnly) { java.time.LocalDate.parse(s, fmt); true }
          else { java.time.LocalDateTime.parse(s, fmt); true }
        } catch { case _: Exception => false }

      val tsFmtWinner = tsFmts.collectFirst {
        case (f, jf) if all(parsesWith(jf, dateOnly = false)) => f }
      val dateFmtWinner = dateFmts.collectFirst {
        case (f, jf) if all(parsesWith(jf, dateOnly = true)) => f }
      // reference rank order: datetime > date > int > bool > float > str
      // (datatypes.py:453); mixed-format date/ts columns fall back to the
      // per-value coalesce chain (formats = None)
      val tsAny = all(v => tsFmts.exists { case (_, jf) => parsesWith(jf, dateOnly = false)(v) })
      val dateAny = all(v => dateFmts.exists { case (_, jf) => parsesWith(jf, dateOnly = true)(v) })
      val winner =
        if (n == 0) "string"
        else if (tsFmtWinner.isDefined || tsAny) "timestamp"
        else if (dateFmtWinner.isDefined || dateAny) "date"
        else if (all(v => isIntStr(v) && fitsLong(v))) "bigint"
        // integral but beyond int64 → the reference keeps arbitrary
        // precision; DecimalType(38,0) is the Spark-native corner route
        // (SURVEY §1.1) — 38 digits comfortably holds the ±10²³ range
        // the reference's own tests exercise
        else if (all(v => isIntStr(v) && fitsDec38(v))) "decimal"
        else if (all(v => boolWords.contains(v.toLowerCase))) "boolean"
        else if (all(v => parseNum(v).isDefined)) "double"
        else "string"
      winners(c) = winner
      formats(c) = winner match {
        case "timestamp" => tsFmtWinner
        case "date"      => dateFmtWinner
        case _           => None
      }
    }
    (winners.toMap, formats.toMap)
  }

  def bestTypes(df: DataFrame, sampleRows: Int = 10000): Map[String, String] =
    profileTypes(df, sampleRows)._1

  /** Backtick-quoted column ref — raw names can contain dots ("SOrg."
    * in the reference's sap.txt fixture), which unquoted `col` parses
    * as struct-field access.
    */
  def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")

  /** Cast every string column of `df` to its best-ranked type. */
  def applyBestTypes(df: DataFrame): DataFrame = {
    val (types, formats) = profileTypes(df, 10000)
    df.select(df.columns.map { c =>
      types.get(c) match {
        case None | Some("string") => qcol(c)
        case Some(t) =>
          val v = when(trim(qcol(c)).isin(noneish: _*), lit(null)).otherwise(trim(qcol(c)))
          // exact integer routes share the profiler's normalization
          // kernel (localeNorm) and cast the STRING — a Double hop
          // would corrupt int64 values above 2^53 and cannot represent
          // the decimal(38,0) range at all
          def normInt: Column = {
            val nrm = graft.plans.Kernels.localeNorm(v)
            when(nrm.rlike("^[+-]?[0-9]+$"), nrm)
          }
          val castExpr = t match {
            case "double"    => parseNumber(v)
            case "bigint"    =>
              // integral strings cast exactly; non-integral stragglers
              // outside the sample keep the old truncate-through-double
              // behavior
              coalesce(normInt.try_cast("bigint"), parseNumber(v).try_cast("bigint"))
            case "decimal"   => {
              // straggler fallbacks, in order: (1) plain decimals of ANY
              // magnitude truncate at the STRING level (integer part of
              // the normalized string — no double hop, so a >int64
              // straggler like "1e19+.5" keeps its exact digits);
              // (2) scientific/other parseables truncate through the
              // bigint cast like the bigint route (double→decimal
              // directly would ROUND 1.5→2, diverging)
              val nrm = graft.plans.Kernels.localeNorm(v)
              val intPart = regexp_extract(nrm, "^([+-]?[0-9]+)\\.[0-9]+$", 1)
              coalesce(normInt.try_cast("decimal(38,0)"),
                when(intPart =!= "", intPart).try_cast("decimal(38,0)"),
                parseNumber(v).try_cast("bigint").cast("decimal(38,0)"))
            }
            case "boolean"   => when(lower(v).isin("true", "yes", "1"), true)
                                  .when(lower(v).isin("false", "no", "0"), false)
            case "date"      => formats(c)
              .map(f => try_to_timestamp(v, lit(f)).cast("date"))
              .getOrElse(parseDateMulti(v))
            case "timestamp" => formats(c)
              .map(f => try_to_timestamp(v, lit(f)))
              .getOrElse(parseTimestampMulti(v))
          }
          castExpr.as(c)
      }
    }: _*)
  }
}
