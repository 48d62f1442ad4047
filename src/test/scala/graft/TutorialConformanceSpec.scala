package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port of the reference's tutorial workflows
  * (tests/test_new_tutorial.py, 497 LoC — its de-facto integration
  * suite) over the `Tab` facade: the basics chain (construct / import /
  * extend / append / repeat / stack / slice / delete / save+reload),
  * the excel-order sort goldens, the groupby-count logic, the
  * join-logic golden multisets and the first-match lookup chain.
  *
  * Documented divergence: tablite columns hold MIXED Python types (the
  * tutorial sorts a column holding ints AND the string "100"); Spark
  * columns are single-typed, so those cells become one string column
  * here and the golden order is re-derived under the same excel rule
  * (type-ranked, nulls last) applied to the typed frame. Everything
  * else pins the reference's own expected values.
  */
class TutorialConformanceSpec extends SparkSpec {

  private def tmpDir(): String = Files.createTempDirectory("tut").toString

  /** The tutorial's book1.csv shape (test_new_tutorial.py:28-55): 45
    * rows, column a = 1..45, b..f a doubling geometric series.
    */
  private def book1Csv(path: String): Unit = {
    val sb = new StringBuilder("a,b,c,d,e,f\n")
    (1 to 45).foreach { n =>
      val base = math.pow(2.0, (n - 1).toDouble) / 33.0
      sb.append(n).append(',')
        .append((2 to 6).map(k => (k * base).toString).mkString(","))
        .append('\n')
    }
    Files.write(java.nio.file.Paths.get(path), sb.toString.getBytes("UTF-8"))
    ()
  }

  test("the basics: construct two ways, import, extend, append, repeat, stack") {
    import spark.implicits._
    // two construction orders produce the same table (t == t2)
    val t = Seq((1, "a"), (2, "b"), (3, "c")).toDF("A", "B")
    val t2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, "a"), Row(2, "b"), Row(3, "c"))),
      StructType(Seq(StructField("A", IntegerType), StructField("B", StringType))))
    assert(Tab(t) === Tab(t2))

    val dir = tmpDir()
    val csv = s"$dir/book1.csv"
    book1Csv(csv)
    // from_file + get_headers (test_new_tutorial.py:28-61)
    val t3 = Tab.fromFile(spark, csv,
      graft.sources.Readers.CsvOptions(guessDatatypes = false))
    assert(t3.columns == Seq("a", "b", "c", "d", "e", "f"))
    assert(t3.rows == 45)
    val (_, headerRows) = graft.sources.Readers.getHeaders(spark, csv)
    assert(headerRows.head == Seq("a", "b", "c", "d", "e", "f"))

    // extend with a new column (t["C"] = [4, 5, 6] — positional zip)
    val tc = Tab(t.withColumn("C", col("A") + 3))
    assert(tc.df.orderBy("A").select("C").as[Int].collect().toSeq == Seq(4, 5, 6))

    // append: + and += (45 -> 90 -> 135), repeat *1000
    val t5 = Tab(t3.df) + Tab(t3.df)
    assert(t5.rows == 90)
    val t5b = t5 + Tab(t3.df)
    assert(t5b.rows == 135)
    assert((t5b * 1000).rows == 135000)

    // stack pads the missing column with nulls (py:163-181)
    val t6 = tc.stack(Tab(t2))
    assert(t6.rows == 6)
    assert(t6.df.filter(col("C").isNull).count() == 3)
    assert(t6.columns == Seq("A", "B", "C"))

    // per-column comparison loop (py:183-196): A and B agree, C is new
    assert(Tab(tc.df.select("A", "B")) === Tab(t2))
  }

  test("the basics: type guess, multi-criteria slice, delete, clear, save+reload") {
    import spark.implicits._
    val dir = tmpDir()
    val csv = s"$dir/book1.csv"
    book1Csv(csv)
    // DataTypes.guess analogue: the typed import path
    val typed = Tab.fromFile(spark, csv)
    assert(typed.types("a") == "bigint")
    assert(typed.types("b") == "double")

    // t3["a", "b", "d", 5:25:5] (py:198-210): column subset + stepped
    // row slice over the table order
    val sliced = typed.select("a", "b", "d").slice(Seq("a"), 5, 25, 5)
    assert(sliced.df.orderBy("a").select("a").as[Long].collect().toSeq ==
      Seq(6L, 11L, 16L, 21L))

    // del t3_slice[1:3] (py:212-221): drop row numbers 1-2 of the slice
    val afterDel = {
      val keep = sliced.sortIndex(Seq("a" -> false)).df
        .filter(!col("sort_index").between(1, 2)).drop("sort_index")
      Tab(keep)
    }
    assert(afterDel.df.orderBy("a").select("a").as[Long].collect().toSeq ==
      Seq(6L, 21L))

    // clear (py:223-226)
    assert(Tab(afterDel.df.limit(0)).rows == 0)

    // SAVE: native-format persist + reload identity (py:228-241; the
    // reference saves .tpz — both container paths are pinned here)
    val t5 = typed + typed
    t5.save(s"$dir/myfile.parquet")
    assert(Tab.load(spark, s"$dir/myfile.parquet") === t5)
    t5.toTpz(s"$dir/myfile.tpz")
    val reloaded = Tab.fromFile(spark, s"$dir/myfile.tpz")
    assert(reloaded.rows == 90)
    assert(reloaded.df.select(sum(col("a").cast("long"))).head.getLong(0) ==
      2L * (1 to 45).sum)
  }

  test("sort: excel-order golden (test_sort, py:244-265)") {
    // A=[1,None,8,3,4,6,5,7,9] B=[10,"100",1,1,1,1,10,10,10] C=[0,1,0,1,0,1,0,1,0]
    // B carries tablite's mixed int/str cells -> one string column here;
    // lexical order on the stringified values ("1" < "10" < "100")
    // happens to agree with the tutorial's golden grouping, so the full
    // 9-row golden is preserved verbatim, None last (excel rule).
    val rows = Seq[(java.lang.Long, String, Int)](
      (1L, "10", 0), (null, "100", 1), (8L, "1", 0), (3L, "1", 1), (4L, "1", 0),
      (6L, "1", 1), (5L, "10", 0), (7L, "10", 1), (9L, "10", 0))
    import spark.implicits._
    val table = Tab(rows.toDF("A", "B", "C"))
    val order = Seq("B" -> false, "C" -> false, "A" -> false)
    assert(!table.isSorted(order))
    val sorted = table.sorted(order)
    val got = sorted.df.collect().map(r =>
      (Option(r.get(0)).map(_.toString).orNull, r.getString(1), r.getInt(2)))
    val expected = Seq(
      ("4", "1", 0), ("8", "1", 0), ("3", "1", 1), ("6", "1", 1),
      ("1", "10", 0), ("5", "10", 0), ("9", "10", 0), ("7", "10", 1),
      (null, "100", 1))
    assert(got.toSeq == expected)
    // sorted_table["A","B", 4:8] (py:262)
    val sl = sorted.select("A", "B").slice(Seq("B", "A"), 0, Int.MaxValue, 1)
    assert(sorted.isSorted(order))
  }

  test("sort at scale keeps multiset + excel grouping (test_sort_parallel, py:268-314)") {
    // n copies of the 9-row pattern (scaled to 90k — the tutorial's 1M/27
    // is a single-node pytest budget; the ORDER property is size-free)
    val n = 10000
    import spark.implicits._
    val base = Seq[(java.lang.Long, String, Int)](
      (1L, "10", 0), (null, "100", 1), (8L, "1", 0), (3L, "1", 1), (4L, "1", 0),
      (6L, "1", 1), (5L, "10", 0), (7L, "10", 1), (9L, "10", 0))
    val table = Tab(spark.range(n).as[Long].flatMap(_ => base).toDF("A", "B", "C"))
    val sorted = table.sorted(Seq("B" -> false, "C" -> false, "A" -> false))
    assert(sorted.rows == 9L * n)
    // multiset preserved
    assert(Tab(sorted.df) === table)
    // distinct rows in sorted order = the 9-row golden
    val distinctInOrder = sorted.sortIndex(Seq("B" -> false, "C" -> false, "A" -> false))
      .df.groupBy("A", "B", "C").agg(min("sort_index").as("first"))
      .orderBy("first").collect()
      .map(r => (Option(r.get(0)).map(_.toString).orNull, r.getString(1), r.getInt(2)))
    assert(distinctInOrder.toSeq == Seq(
      ("4", "1", 0), ("8", "1", 0), ("3", "1", 1), ("6", "1", 1),
      ("1", "10", 0), ("5", "10", 0), ("9", "10", 0), ("7", "10", 1),
      (null, "100", 1)))
  }

  test("groupby count over (C, B) keys (test_group_by_logic, py:317-333)") {
    val n = 1000
    import spark.implicits._
    val base = Seq[(java.lang.Long, String, Int)](
      (1L, "10", 0), (null, "100", 1), (8L, "1", 0), (3L, "1", 1), (4L, "1", 0),
      (6L, "1", 1), (5L, "10", 0), (7L, "10", 1), (9L, "10", 0))
    val table = Tab(spark.range(n).as[Long].flatMap(_ => base).toDF("A", "B", "C"))
    val grp = table.groupby(Seq("C", "B"), Seq("A" -> "Count"))
    val got = grp.df.collect().map(r =>
      ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    // pattern per repetition: C=0 -> B=1 x2 (A=8,4), B=10 x3 (1,5,9);
    // C=1 -> B=1 x2 (3,6), B=10 x1 (7), B=100 x1 (the A=None row —
    // tablite's Count counts rows, None included)
    assert(got == Map(
      (0, "1") -> 2L * n, (0, "10") -> 3L * n,
      (1, "1") -> 2L * n, (1, "10") -> 1L * n, (1, "100") -> 1L * n))
  }

  test("lookup: theta first-match + unix sort (do_lookup_logic, py:437-478)") {
    import spark.implicits._
    val friends = Tab(Seq(
      ("Alice", "Downtown-1"), ("Betty", "Downtown-2"), ("Charlie", "Hillside View"),
      ("Dorethy", "Hillside Crescent"), ("Edward", "Downtown-2"), ("Fred", "Chicago"))
      .toDF("name", "stop"))
    // deterministic bustable (the tutorial uses random.seed(11); the
    // workflow — time-threshold theta criteria, first-match semantics,
    // unmatched rows padded null, then a unix-mode sort — is the
    // conformance target, pinned on fixed departures)
    val bus = Tab(Seq(
      ("21:05", "Downtown-1", 1), ("21:15", "Downtown-1", 3),
      ("21:51", "Downtown-2", 1), ("22:10", "Downtown-2", 2),
      ("22:19", "Hillside View", 2), ("23:54", "Hillside Crescent", 1),
      ("21:08", "Hillside Crescent", 2), ("23:12", "Stadium", 3))
      .toDF("time", "stop", "route"))
    // lookup(bustable, (time(21,10) <= time), (stop == stop))
    val crit = (lit("21:10") <= col("r.time")) && (col("l.stop") === col("r.stop"))
    val looked = friends.lookup(bus, crit, rightOrder = "time")
    val sortedT = looked.sorted(Seq("time" -> true, "name" -> false), sortMode = "unix")
    val got = sortedT.df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    // first match per friend = earliest departure >= 21:10 at their stop;
    // Fred (Chicago) unmatched -> null-padded and sorted LAST, exactly
    // like the tutorial's expected list (time desc, name asc)
    assert(got.toSeq == Seq(
      ("Dorethy", "Hillside Crescent", "23:54", "Hillside Crescent"),
      ("Charlie", "Hillside View", "22:19", "Hillside View"),
      ("Betty", "Downtown-2", "21:51", "Downtown-2"),
      ("Edward", "Downtown-2", "21:51", "Downtown-2"),
      ("Alice", "Downtown-1", "21:15", "Downtown-1"),
      ("Fred", "Chicago", null, null)))
  }

  test("join logic goldens live in JoinsSpec (py:340-434) — cross-reference") {
    // the left/inner/outer golden multisets of test_join_logic are
    // pinned in JoinsSpec ("tutorial join-logic golden multisets");
    // here only the dispatcher surface is re-exercised through Tab
    import spark.implicits._
    val numbers = Tab(Seq[(java.lang.Integer, String)](
      (1, "black"), (2, "blue"), (3, "white"), (4, "white"), (null, "blue"))
      .toDF("number", "colour"))
    val letters = Tab(Seq[(String, String)](
      ("a", "blue"), ("b", "white"), ("c", "orange"), ("d", "white"), (null, "blue"))
      .toDF("letter", "color"))
    val inner = numbers.join(letters, Seq("colour"), Seq("color"), "inner",
      leftColumns = Some(Seq("number")), rightColumns = Some(Seq("letter")))
    assert(inner.rows == 8)
    val outer = numbers.join(letters, Seq("colour"), Seq("color"), "outer",
      leftColumns = Some(Seq("number")), rightColumns = Some(Seq("letter")))
    assert(outer.rows == 10)
    assert(outer.df.filter(col("number").isNull && col("letter") === "c").count() == 1)
  }
}
