package graft.operators

import graft.SparkSpec
import graft.functions.TypeInference
import org.apache.spark.sql.functions._

/** Golden vectors from the reference's tests/test_datatype.py:45-160
  * (`test_datatype_inference`): locale numbers and multi-format dates.
  * The strict `DataTypes.infer(x, int)` rejection of "1.0" is an
  * inference-API behavior (ranking prefers float); `column_select`'s
  * lenient "1.0"→1 is pinned in `CastConformanceSpec` instead.
  */
class DatatypeConformanceSpec extends SparkSpec {
  import spark.implicits._

  private def num(s: String): Option[Double] =
    Seq(s).toDF("s").select(TypeInference.parseNumber(col("s")))
      .collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("non-ASCII digit columns stay string (profiler must not outrun the ASCII cast path)") {
    // Character.isDigit/Long.parseLong accept Unicode digits, but the
    // cast route is ASCII rlike — profiling these as bigint would null
    // the whole column at cast time (silent data loss)
    val df = Seq("٣٤٥", "٦٧", "１２３").toDF("v")
    assert(TypeInference.bestTypes(df)("v") === "string")
    val out = TypeInference.applyBestTypes(df).as[String].collect()
    assert(out.toSet === Set("٣٤٥", "٦٧", "１２３")) // data survives untouched
  }

  test("decimal(38,0) stragglers truncate like the bigint route, not null") {
    // 10k-row profile sample sees only >int64 integral strings → column
    // profiles decimal(38,0); the "1.5" straggler beyond the sample must
    // truncate through the number parser (bigint-route consistency), not
    // silently null
    val big = spark.range(10000)
      .select(concat(lit("9999999999999999999"), (col("id") % 10).cast("string")).as("v"))
    val df = big.union(Seq("1.5", "10000000000000000000.5").toDF("v"))
    val out = TypeInference.applyBestTypes(df)
    assert(out.schema.head.dataType.typeName.startsWith("decimal"), out.schema.toString)
    val got = out.collect().map(r => Option(r.get(0)).map(_.toString)).toSeq
    assert(got.count(_.isEmpty) === 0, "straggler was nulled")
    assert(got.contains(Some("1"))) // 1.5 truncated like the bigint route
    // a >int64 NON-integral straggler (the plausible case for a decimal
    // column) truncates at the string level — a bigint or double hop
    // would null or corrupt it
    assert(got.contains(Some("10000000000000000000")))
  }

  test("float vectors: US/EU/scientific groupings (test_datatype.py:68-82)") {
    assert(num("2932,500") === Some(2932.5))   // EU decimal comma
    assert(num("2,932.500") === Some(2932.5))  // US grouping
    assert(num("2932.500") === Some(2932.5))
    assert(num("-2932.500") === Some(-2932.5))
    assert(num("2.932,500") === Some(2932.5))  // EU grouping + decimal
    assert(num("2.932e5") === Some(2.932e5))
    assert(num("-2.932e5") === Some(-2.932e5))
    assert(num("10e5") === Some(10e5))
    assert(num("-10e5") === Some(-10e5))
    assert(num("-10e-5") === Some(-10e-5))
    assert(num("1") === Some(1.0))
    assert(num("1.0") === Some(1.0))
  }

  test("int vectors incl. thousand separators (test_datatype.py:46-57)") {
    assert(num("1,000,028") === Some(1000028.0))
    assert(num("1000028") === Some(1000028.0))
    assert(num("0") === Some(0.0))
    assert(num("-1") === Some(-1.0))
  }

  test("corrupted strings parse to null, not garbage (test_datatype.py:84-88)") {
    assert(num("100126495100211788-1") === None)
    assert(num("abc") === None)
    assert(num("") === None)
  }

  test("bool word casing (test_datatype.py:90-96) through column_select") {
    val df = Seq("true", "True", "TRUE", "false", "False", "FALSE").toDF("s")
    val (pass, fail) = ColumnSelect.columnSelect(df,
      Seq(ColumnSelect.ColSpec("s", "bool", allowEmpty = false)))
    assert(fail.count() === 0)
    assert(pass.collect().map(_.getBoolean(0)).toSeq ===
      Seq(true, true, true, false, false, false))
  }

  private def dt(s: String): Option[String] =
    Seq(s).toDF("s").select(TypeInference.parseDateMulti(col("s")).cast("string"))
      .collect().headOption.flatMap(r => Option(r.getString(0)))

  test("date vectors: minus/dot/slash, year-first and day-first (test_datatype.py:101-117)") {
    assert(dt("1990-01-01") === Some("1990-01-01"))
    assert(dt("2003-09-25") === Some("2003-09-25"))
    assert(dt("25-09-2003") === Some("2003-09-25")) // year last = day first
    assert(dt("10-09-2003") === Some("2003-09-10")) // NOT US month-day
    assert(dt("1990.01.01") === Some("1990-01-01"))
    assert(dt("2003.09.25") === Some("2003-09-25"))
    assert(dt("25.09.2003") === Some("2003-09-25"))
    assert(dt("10.09.2003") === Some("2003-09-10"))
    assert(dt("1990/01/01") === Some("1990-01-01"))
    assert(dt("2003/09/25") === Some("2003-09-25"))
    assert(dt("25/09/2003") === Some("2003-09-25"))
    assert(dt("10/09/2003") === Some("2003-09-10"))
    assert(dt("20030925") === Some("2003-09-25"))   // compact ISO
    assert(dt("not a date") === None)
  }
}
