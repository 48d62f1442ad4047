package graft.sources

import graft.SparkSpec
import graft.functions.TypeInference
import graft.operators.ColumnSelect
import graft.operators.ColumnSelect.ColSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def writeTemp(content: String, suffix: String = ".csv"): String = {
    val f = Files.createTempFile("graft", suffix)
    Files.writeString(f, content)
    f.toString
  }

  test("readCsv: header + typed columns via rank-based guessing") {
    val p = writeTemp("a,b,c\n1,2.5,x\n2,3.5,y\n")
    val df = Readers.readCsv(spark, p)
    assert(df.columns.toSeq === Seq("a", "b", "c"))
    assert(df.schema("a").dataType.simpleString === "bigint")
    assert(df.schema("b").dataType.simpleString === "double")
    assert(df.schema("c").dataType.simpleString === "string")
    assert(df.count() === 2)
  }

  test("readCsv: header_row_index skips preamble lines") {
    val p = writeTemp("junk line\nmore junk\na,b\n1,2\n3,4\n")
    val df = Readers.readCsv(spark, p, Readers.CsvOptions(headerRowIndex = 2))
    assert(df.columns.toSeq === Seq("a", "b"))
    assert(df.count() === 2)
  }

  test("readCsv: start/limit windows the data rows") {
    val p = writeTemp("a\n1\n2\n3\n4\n5\n")
    val df = Readers.readCsv(spark, p, Readers.CsvOptions(start = 1, limit = 2))
    assert(df.select("a").as[Long].collect().sorted === Array(2L, 3L))
  }

  test("readCsv: skip_empty ANY drops rows with any null") {
    val p = writeTemp("a,b\n1,2\n,3\n4,\n5,6\n")
    val any = Readers.readCsv(spark, p, Readers.CsvOptions(skipEmpty = "ANY", guessDatatypes = false))
    assert(any.count() === 2)
    val all = Readers.readCsv(spark, p, Readers.CsvOptions(skipEmpty = "ALL", guessDatatypes = false))
    assert(all.count() === 4)
  }

  test("delimiter sniffing picks the consistent separator") {
    assert(Readers.sniffDelimiter(Seq("a;b;c", "1;2;3")) === ";")
    assert(Readers.sniffDelimiter(Seq("a\tb", "1\t2")) === "\t")
    assert(Readers.sniffDelimiter(Seq("a,b,c", "1,2,3")) === ",")
  }

  test("csv write/read roundtrip preserves content") {
    val dir = Files.createTempDirectory("graftcsv").toString + "/out"
    val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "s", "v")
    Writers.toCsv(df, dir)
    val back = Readers.readCsv(spark, dir)
    assert(back.count() === 2)
    assert(back.orderBy("id").select("v").as[Double].collect() === Array(1.5, 2.5))
  }

  test("csv roundtrip survives quotes, delimiters, and doubled quotes in values") {
    val dir = Files.createTempDirectory("graftcsvq").toString + "/out"
    val vals = Seq((1L, """say "hi", ok"""), (2L, """a""b"""), (3L, "plain"))
    val df = vals.toDF("id", "s")
    Writers.toCsv(df, dir)
    val back = Readers.readCsv(spark, dir, Readers.CsvOptions(guessDatatypes = false))
      .collect().map(r => r.getString(0).toLong -> r.getString(1)).toMap
    vals.foreach { case (id, s) => assert(back(id) === s, s"id $id") }
  }

  test("toSql emits CREATE + INSERT with escaping") {
    val sql = Writers.toSql(Seq((1, "o'brien")).toDF("id", "name"), "t")
    assert(sql.contains("CREATE TABLE t (id INTEGER, name TEXT);"))
    assert(sql.contains("INSERT INTO t VALUES (1, 'o''brien');"))
  }

  test("columnar json roundtrip via readColumnarJson") {
    val json = Writers.toColumnarJson(Seq((1L, "a"), (2L, "b")).toDF("n", "s"))
    assert(json.contains("\"total_rows\": 2"))
    val p = writeTemp(json, ".json")
    val back = Readers.readColumnarJson(spark, p)
    assert(back.count() === 2)
    assert(back.columns.sorted === Array("n", "s"))
  }

  test("columnar json refuses envelopes over the driver-side byte cap") {
    val json = Writers.toColumnarJson(Seq((1L, "a"), (2L, "b")).toDF("n", "s"))
    val p = writeTemp(json, ".json")
    val e = intercept[IllegalArgumentException](
      Readers.readColumnarJson(spark, p, maxBytes = 8))
    assert(e.getMessage.contains("driver-side"), e.getMessage)
    // explicit raise still works
    assert(Readers.readColumnarJson(spark, p, maxBytes = 1 << 20).count() === 2)
  }

  test("jsonl roundtrip: distributed write/read, types and tricky strings survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec").toString
    try {
      val df = Seq(
        (1L, 1.5, "plain", true),
        (2L, -0.25, "line\nbreak \"quoted\" \t tab", false),
        (3L, 0.0, "unicode ✓ Ωmega", true)
      ).toDF("id", "x", "s", "b").repartition(3)
      Writers.toJsonl(df, s"$dir/t.jsonl")
      val back = Readers.readJsonl(spark, s"$dir/t.jsonl", df.schema)
      assert(back.count() === 3)
      val rows = back.orderBy("id").collect().map(_.toSeq)
      assert(rows === df.orderBy("id").collect().map(_.toSeq))
      // schemaless read infers (long, double, string, boolean)
      val inferred = Readers.readJsonl(spark, s"$dir/t.jsonl")
      assert(inferred.schema("id").dataType.typeName === "long")
      assert(inferred.schema("x").dataType.typeName === "double")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("orc roundtrip: native write/read through Tab dispatch, types and tricky strings survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_spec").toString
    try {
      val df = Seq(
        (1L, 1.5, "plain", true),
        (2L, -0.25, "line\nbreak \"quoted\" \t tab", false),
        (3L, 0.0, "unicode ✓ Ωmega", true)
      ).toDF("id", "x", "s", "b").repartition(3)
      Writers.toOrc(df, s"$dir/t.orc")
      val back = graft.Tab.fromFile(spark, s"$dir/t.orc").df
      assert(back.count() === 3)
      assert(back.orderBy("id").collect().map(_.toSeq) ===
        df.orderBy("id").collect().map(_.toSeq))
      // schema is self-describing — no inference pass, exact types back
      // (files read back nullable, like parquet — compare names/types)
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test(".json dispatch sniffs envelope vs JSONL; .jsonl goes distributed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_sniff").toString
    try {
      val df = Seq((1L, "a"), (2L, "b")).toDF("n", "s")
      // columnar envelope under .json → driver-side codec path
      val envPath = s"$dir/env.json"
      java.nio.file.Files.write(java.nio.file.Paths.get(envPath),
        Writers.toColumnarJson(df).getBytes("UTF-8"))
      assert(graft.Tab.fromFile(spark, envPath).df.count() === 2)
      // JSONL content under .json → sniffed to the distributed reader
      Writers.toJsonl(df, s"$dir/lines.json")
      assert(graft.Tab.fromFile(spark, s"$dir/lines.json").df.count() === 2)
      // explicit .jsonl extension
      Writers.toJsonl(df, s"$dir/lines.jsonl")
      val t = graft.Tab.fromFile(spark, s"$dir/lines.jsonl").df
      assert(t.orderBy("n").collect().map(_.getString(1)).toSeq === Seq("a", "b"))
      // the sniff is structural, not a fixed prefix: a PRETTY-PRINTED
      // envelope (first line is bare '{' — impossible in JSONL) and a
      // key-reordered compact envelope both still route to the codec
      val pretty = "{\n  \"columns\": {\"n\": [1, 2], \"s\": [\"a\", \"b\"]},\n  \"total_rows\": 2\n}"
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/pretty.json"),
        pretty.getBytes("UTF-8"))
      assert(graft.Tab.fromFile(spark, s"$dir/pretty.json").df.count() === 2)
      val reordered = """{"total_rows": 2, "columns": {"n": [1, 2], "s": ["a", "b"]}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/reordered.json"),
        reordered.getBytes("UTF-8"))
      assert(graft.Tab.fromFile(spark, s"$dir/reordered.json").df.count() === 2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("gzipped JSONL dispatches and decompresses; other .gz formats error clearly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_gz").toString
    try {
      val gzPath = s"$dir/lines.jsonl.gz"
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(gzPath))
      out.write("{\"n\": 1, \"s\": \"a\"}\n{\"n\": 2, \"s\": \"b\"}\n".getBytes("UTF-8"))
      out.close()
      val t = graft.Tab.fromFile(spark, gzPath).df
      assert(t.orderBy("n").collect().map(_.getString(1)).toSeq === Seq("a", "b"))
      // distributed gzip write → read roundtrip (codec from part-file
      // extension, no dispatch involvement)
      val df = Seq((1L, "x"), (2L, "y")).toDF("n", "s")
      Writers.toJsonl(df, s"$dir/comp.jsonl", compression = Some("gzip"))
      assert(new java.io.File(s"$dir/comp.jsonl").listFiles()
        .exists(_.getName.endsWith(".json.gz")))
      assert(Readers.readJsonl(spark, s"$dir/comp.jsonl", df.schema)
        .orderBy("n").collect().map(_.getString(1)).toSeq === Seq("x", "y"))
      // a .csv.gz would feed gzip bytes to the encoding sniff — refuse;
      // same for ANY other compression suffix (.zst would need a codec
      // the deploy may not have — better a clear error than garbage)
      for (bad <- Seq("t.csv.gz", "t.jsonl.zst", "t.tsv.bz2")) {
        val err = intercept[IllegalArgumentException](
          graft.Tab.fromFile(spark, s"$dir/$bad"))
        assert(err.getMessage.contains("decompress"), err.getMessage)
      }
      // a COMPRESSED columnar envelope refuses too: the driver-side
      // byte cap would measure compressed bytes against a decompressed
      // driver materialization
      val envGz = s"$dir/env.json.gz"
      val out2 = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(envGz))
      out2.write("""{"columns": {"n": [1]}, "total_rows": 1}""".getBytes("UTF-8"))
      out2.close()
      val envErr = intercept[IllegalArgumentException](
        graft.Tab.fromFile(spark, envGz))
      assert(envErr.getMessage.contains("envelope"), envErr.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("readJsonl keepCorrupt surfaces malformed lines in _corrupt_record") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_corrupt").toString
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/t.jsonl"),
        "{\"id\": 1, \"s\": \"ok\"}\n{\"id\": 2, \"s\": TRUNC".getBytes("UTF-8"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
      // default: the corrupt line degrades silently — fields parsed
      // before the error survive, the rest go null (Spark's PERMISSIVE
      // contract when the schema lacks the audit column)
      val plain = Readers.readJsonl(spark, s"$dir/t.jsonl", schema)
      assert(plain.count() === 2 && plain.filter(col("s").isNull).count() === 1)
      // keepCorrupt: the raw line is preserved for auditing/quarantine
      val audited = Readers.readJsonl(spark, s"$dir/t.jsonl", schema, keepCorrupt = true)
      assert(audited.columns.contains("_corrupt_record"))
      val bad = audited.filter(col("_corrupt_record").isNotNull).collect()
      assert(bad.length === 1 && bad(0).getAs[String]("_corrupt_record").contains("TRUNC"))
      assert(audited.filter(col("_corrupt_record").isNull)
        .select("id").collect().map(_.getLong(0)).toSeq === Seq(1L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("toAscii includes dtype subheader and elision") {
    val ascii = Writers.toAscii(spark.range(20).toDF("i"))
    assert(ascii.contains("bigint"))
    assert(ascii.contains("(20 rows total)"))
  }

  test("syntheticOrderData: reference shape, deterministic, domain-bounded") {
    val df = Datasets.syntheticOrderData(spark, 500L)
    assert(df.columns.toSeq === Seq("#", "1", "2", "3", "4", "5", "6", "7", "8", "9", "10", "11"))
    assert(df.count() === 500L)
    // deterministic regeneration (the point of hash-based generation)
    val again = Datasets.syntheticOrderData(spark, 500L)
    assert(df.exceptAll(again).isEmpty && again.exceptAll(df).isEmpty)
    val row = df.selectExpr(
      "min(`4`) >= 0 AND max(`4`) <= 1",
      "min(`3`) >= 50000 AND max(`3`) <= 51000",
      "bool_and(`6` rlike '^C[1-5]-[1-5]$')",
      "bool_and(`7` rlike '^[A-Z]{3}$')",
      "bool_and(`8` IN ('None', '0°', '6°', '21°'))",
      "bool_and(`9` IN ('ABC', 'XYZ', ''))",
      "min(`10`) >= 0.01 AND max(`10`) <= 2.5",
      "count(DISTINCT `2`) BETWEEN 100 AND 151").collect().head
    (0 until 8).foreach(i => assert(row.getBoolean(i), s"domain check $i"))
  }

  test("readHtml scrapes th/td rows; toHtml roundtrips through it") {
    val dir = Files.createTempDirectory("grafthtml")
    // reference-style table (all <th>, like tablite's own to_html)
    val p1 = dir.resolve("ref.html")
    Files.writeString(p1,
      "<table><tr><th>a</th><th>b</th></tr><tr><th>1</th><th>x &amp; y</th></tr>" +
        "<tr><th>2</th><th>z</th></tr></table>")
    val df1 = Readers.readHtml(spark, p1.toString)
    assert(df1.columns.toSeq === Seq("a", "b"))
    assert(df1.schema.fields.head.dataType.simpleString === "bigint")
    assert(df1.orderBy("a").collect().map(_.getString(1)).toSeq === Seq("x & y", "z"))
    // roundtrip through our own writer (skip its dtype subheader row)
    val src = Seq((1L, "p"), (2L, "q")).toDF("id", "s")
    val p2 = dir.resolve("out.html")
    Files.writeString(p2, Writers.toHtml(src))
    val back = Readers.readHtml(spark, p2.toString, skipDataRows = 1)
    assert(back.columns.toSeq === Seq("id", "s"))
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "p"), (2L, "q")))
  }

  test("dateRange: [start, stop) with (stop-start)/step values, like the reference") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val out = Datasets.dateRange(spark, ts("2024-01-01 00:00:00"),
      ts("2024-01-01 01:00:00"), stepSeconds = 25 * 60) // 60/25 → 2 values
    val got = out.collect().map(_.getTimestamp(0).toString)
    assert(got === Array("2024-01-01 00:00:00.0", "2024-01-01 00:25:00.0"))
    assert(Datasets.dateRange(spark, ts("2024-01-01 00:00:00"),
      ts("2024-01-01 00:00:00"), 60).count() === 0)
  }
}

class TypeInferenceSpec extends SparkSpec {
  import spark.implicits._

  test("locale number parsing: US/EU/space groupings") {
    val cases = Seq(
      "1,000,000.5" -> 1000000.5, "1.000.000,5" -> 1000000.5,
      "1 000 000" -> 1000000.0, "12,5" -> 12.5, "1,000" -> 1000.0,
      "-3.25" -> -3.25, "42" -> 42.0)
    val got = cases.map(_._1).toDF("s")
      .select(TypeInference.parseNumber($"s").as("v")).as[Double].collect()
    assert(got === cases.map(_._2).toArray)
  }

  test("multi-format date sniffing") {
    val got = Seq("2024-01-31", "31/01/2024", "31.01.2024", "20240131").toDF("s")
      .select(TypeInference.parseDateMulti($"s").cast("string").as("d")).as[String].collect()
    assert(got.forall(_ == "2024-01-31"))
  }

  test("xround rounds to arbitrary multiples") {
    val got = Seq(1234.0, 1567.0).toDF("v")
      .select(TypeInference.xround($"v", 500.0).as("r")).as[Double].collect()
    assert(got === Array(1000.0, 1500.0))
  }

  test("bestTypes ranks candidates like the reference (first full parse wins)") {
    val df = Seq(
      ("1", "1.5", "true", "2024-01-01", "hello"),
      ("2", "2,5", "false", "2024-02-01", "3")
    ).toDF("i", "f", "b", "d", "s")
    val t = TypeInference.bestTypes(df)
    assert(t("i") === "bigint")
    assert(t("f") === "double")
    assert(t("b") === "boolean")
    assert(t("d") === "date")
    assert(t("s") === "string")
  }

  test("integers beyond int64 guess decimal(38,0) and roundtrip exactly") {
    // the reference's int is arbitrary precision (datatypes.py:15; the
    // import_utils.py:82-84 docstring exercises ±10²³). A Double hop
    // would be lossy above 2^53, so the profile AND the cast must stay
    // on the normalized string. Also pins the exact-int64 edge: the old
    // double-roundtrip check silently corrupted 2^53+1 by one.
    val df = Seq(
      ("100000000000000000000000", "9007199254740993", "1e3"),
      ("-99999999999999999999999", "9223372036854775807", "2e3")
    ).toDF("big", "edge", "sci")
    val t = TypeInference.bestTypes(df)
    assert(t("big") === "decimal")
    assert(t("edge") === "bigint")
    // scientific notation is a FLOAT to the reference's rank (int()
    // rejects it) — the exact-string check must not admit it
    assert(t("sci") === "double")
    val out = TypeInference.applyBestTypes(df)
    assert(out.schema("big").dataType === org.apache.spark.sql.types.DecimalType(38, 0))
    assert(out.schema("edge").dataType.typeName === "long")
    val rows = out.orderBy($"edge").collect()
    assert(rows.map(_.getDecimal(0).toBigInteger.toString).sorted ===
      Array("-99999999999999999999999", "100000000000000000000000").sorted)
    assert(rows.map(_.getLong(1)) === Array(9007199254740993L, 9223372036854775807L))
  }

  test("applyBestTypes: single-format column casts with one formatter, mixed falls back") {
    val df = Seq(
      ("2024-01-31", "2024-01-31"),
      ("2024-02-29", "29/02/2024")  // mixed formats in col `m`
    ).toDF("u", "m")
    val out = TypeInference.applyBestTypes(df)
    assert(out.schema("u").dataType.typeName === "date")
    assert(out.schema("m").dataType.typeName === "date")
    val rows = out.select($"u".cast("string"), $"m".cast("string")).collect()
    assert(rows.map(_.getString(1)).sorted === Array("2024-01-31", "2024-02-29"))
    // the uniform column's plan carries exactly ONE parse attempt; the
    // mixed column needs the multi-format coalesce chain (analyzed plan:
    // the optimizer constant-folds this literal input away entirely)
    val plan = TypeInference.applyBestTypes(df).queryExecution.analyzed.toString
    val parses = "to_timestamp".r.findAllIn(plan).size
    assert(parses > 1 && parses <= 1 + dateFormatChainLength, plan)
  }

  private def dateFormatChainLength: Int = 8 // TypeInference.dateFormats.size

  test("columnSelect splits pass/fail with reject reasons") {
    val df = Seq(("1", "2.5"), ("x", "3.5"), ("3", "bad")).toDF("a", "b")
    val (pass, fail) = ColumnSelect.columnSelect(df, Seq(
      ColSpec("a", "int", allowEmpty = false),
      ColSpec("b", "float", allowEmpty = false, rename = Some("bb"))))
    assert(pass.columns.toSeq === Seq("a", "bb"))
    assert(pass.count() === 1)
    val reasons = fail.orderBy("a").select("reject_reason").as[String].collect()
    assert(reasons === Array("Cannot cast b to float", "Cannot cast a to int"))
  }

  test("columnSelect allow_empty admits nulls, rejects when false") {
    val df = Seq(Some("1"), None, Some("nope")).map(v => Tuple1(v.orNull)).toDF("a")
    val (passTolerant, _) = ColumnSelect.columnSelect(df, Seq(ColSpec("a", "int")))
    assert(passTolerant.count() === 2)
    val (passStrict, failStrict) = ColumnSelect.columnSelect(df,
      Seq(ColSpec("a", "int", allowEmpty = false)))
    assert(passStrict.count() === 1)
    assert(failStrict.count() === 2)
  }
}
