package graft.operators

import graft.functions.TypeInference
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `column_select` — typed projection/cast with a reject channel
  * (tablite/core.py:704-733, nimlite casters.nim/sliceconv.nim): each
  * column gets a desired type + allow_empty + optional rename; a row with
  * ANY failing cell goes whole to the reject table with a reason column.
  *
  * Spark shape: one pass computing all try-casts, a row-validity
  * predicate, and two filters over the same plan — strict schemas + a
  * reject channel instead of tablite's mixed-type object columns
  * (SURVEY §1.2 mapping decision).
  */
object ColumnSelect {

  final case class ColSpec(
      column: String,
      castTo: String, // bool|int|float|str|date|time|datetime (reference names)
      allowEmpty: Boolean = true,
      rename: Option[String] = None)

  private def sparkType(t: String): String = t match {
    case "bool"     => "boolean"
    case "int"      => "bigint"
    case "float"    => "double"
    case "str"      => "string"
    case "date"     => "date"
    case "datetime" => "timestamp"
    case "time"     => "bigint" // µs-of-day encoding (SURVEY §1.2)
    case other      => other
  }

  /** The cast matrix (casters.nim:1-242): locale numbers for str→num,
    * multi-format sniffing for str→date/datetime, bool words for
    * str→bool; NULL = cast failure. The numeric↔temporal corner follows
    * the reference's epoch-seconds bridge (pinned by
    * tests/test_column_select.py:384-1063 and `CastConformanceSpec`):
    * bool/int/float → date/time/datetime interpret the value as epoch
    * seconds; date/datetime → bool/int/float produce epoch seconds
    * (truthiness = nonzero). `time` stays µs-of-day LongType
    * (SURVEY §1.2) — 1 second = 1,000,000.
    */
  def tryCastTo(c: Column, from: DataType, to: String): Column = (from, to) match {
    case (StringType, "int")      => TypeInference.parseNumber(c).cast("bigint")
    case (StringType, "float")    => TypeInference.parseNumber(c)
    case (StringType, "bool")     =>
      when(lower(trim(c)).isin("true", "yes", "1"), true)
        .when(lower(trim(c)).isin("false", "no", "0"), false)
    case (StringType, "date")     => TypeInference.parseDateMulti(c)
    case (StringType, "datetime") => TypeInference.parseTimestampMulti(c)
    case (StringType, "time")     =>
      TypeInference.timeOfDayMicros(try_to_timestamp(concat(lit("1970-01-01 "), trim(c))))
    case (TimestampType, "time")  => TypeInference.timeOfDayMicros(c)
    case (TimestampType, "date")  => c.cast("date")
    case (TimestampType, "bool")  => unix_micros(c) =!= 0L
    case (TimestampType, "int")   => (unix_micros(c).cast("double") / 1e6).cast("bigint")
    case (TimestampType, "float") => unix_micros(c).cast("double") / 1e6
    case (DateType, "bool")       => unix_date(c) =!= 0
    case (DateType, "int")        => unix_date(c).cast("bigint") * 86400L
    case (DateType, "float")      => unix_date(c).cast("double") * 86400.0
    // Python capitalization ("True"/"False") and None→"" pinned by the
    // reference's str-target vectors (test_column_select.py:392,453)
    case (BooleanType, "str")     => coalesce(initcap(c.cast("string")), lit(""))
    case (_, "str")               => coalesce(c.cast("string"), lit(""))
    case (BooleanType, "int")     => c.cast("bigint")
    case (BooleanType, "float")   => c.cast("double")
    case (BooleanType, "date")    => timestamp_seconds(c.cast("int")).cast("date")
    case (BooleanType, "datetime") => timestamp_seconds(c.cast("int"))
    case (BooleanType, "time")    => c.cast("bigint") * 1000000L
    case (_: NumericType, "bool") => c =!= 0
    case (_: NumericType, "date")     => timestamp_seconds(c).cast("date")
    case (_: NumericType, "datetime") => timestamp_seconds(c)
    case (_: NumericType, "time") =>
      pmod((c.cast("double") * 1e6).cast("bigint"), lit(86400000000L))
    case (_, t)                   => try_cast_safe(c, sparkType(t))
  }

  private def try_cast_safe(c: Column, t: String): Column =
    c.try_cast(t)

  /** Run the typed projection. Returns (pass, fail); fail carries the
    * ORIGINAL columns + a `reject_reason` naming the first failing column.
    */
  def columnSelect(df: DataFrame, specs: Seq[ColSpec]): (DataFrame, DataFrame) = {
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val casted = specs.map { sp =>
      val from = byName(sp.column)
      sp -> tryCastTo(col(sp.column), from, sp.castTo)
    }
    val validPerCol = casted.map { case (sp, cc) =>
      val srcNull =
        if (byName(sp.column) == StringType)
          col(sp.column).isNull || trim(col(sp.column)) === ""
        else col(sp.column).isNull
      val ok = when(srcNull, lit(sp.allowEmpty)).otherwise(cc.isNotNull)
      (sp, ok)
    }
    val allValid = validPerCol.map(_._2).reduce(_ && _)

    val pass = df.filter(allValid).select(casted.map { case (sp, cc) =>
      cc.as(sp.rename.getOrElse(sp.column))
    }: _*)
    val reason = validPerCol.foldRight(lit(null).cast("string")) { case ((sp, ok), rest) =>
      when(!ok, lit(s"Cannot cast ${sp.column} to ${sp.castTo}")).otherwise(rest)
    }
    val fail = df.filter(!allValid).withColumn("reject_reason", reason)
    (pass, fail)
  }
}
