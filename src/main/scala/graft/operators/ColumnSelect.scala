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
    * str→bool; NULL = cast failure.
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
    case (_, "str")               => c.cast("string")
    case (BooleanType, "int")     => c.cast("bigint")
    case (BooleanType, "float")   => c.cast("double")
    case (_: NumericType, "bool") => c =!= 0
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
