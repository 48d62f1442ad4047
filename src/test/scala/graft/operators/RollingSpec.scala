package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingSpec extends SparkSpec {
  import spark.implicits._

  test("keyed rolling matches hand-computed windows; head windows are short") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 3L, 5.0), ("a", 4L, 7.0),
      ("b", 1L, 10.0)
    ).toDF("g", "i", "v")
    val out = Rolling.rolling(df, Seq("v"), "i", n = 3, partitionCols = Seq("g"))
      .orderBy("g", "i")
      .select("g", "i", "v_roll_sum", "v_roll_avg", "v_roll_min", "v_roll_max")
      .collect()
    val a = out.filter(_.getString(0) == "a").map(r =>
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(a.toSeq === Seq(
      (1L, 1.0, 1.0, 1.0, 1.0),
      (2L, 4.0, 2.0, 1.0, 3.0),
      (3L, 9.0, 3.0, 1.0, 5.0),
      (4L, 15.0, 5.0, 3.0, 7.0)))
    val b = out.filter(_.getString(0) == "b").head
    assert(b.getDouble(2) === 10.0 && b.getDouble(5) === 10.0)
  }

  test("nulls are ignored; an all-null window yields null") {
    val df = Seq(
      (1L, Some(2.0)), (2L, None), (3L, None), (4L, None), (5L, Some(8.0))
    ).toDF("i", "v")
    val out = Rolling.rolling(df, Seq("v"), "i", n = 2)
      .orderBy("i").select("i", "v_roll_sum", "v_roll_avg").collect()
    assert(out(1).getDouble(1) === 2.0) // window {2.0, null}
    assert(out(2).isNullAt(1) && out(2).isNullAt(2)) // {null, null}
    assert(out(4).getDouble(1) === 8.0 && out(4).getDouble(2) === 8.0)
  }

  test("boundary carry equals the global window on every partitioning") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(500)(i =>
      (i.toLong, if (i % 23 == 0) None else Some(rnd.nextInt(100).toDouble)))
    val df = rows.toDF("i", "v")
    val expected = Rolling.rolling(df, Seq("v"), "i", n = 7)
      .orderBy("i").collect().map(_.toSeq)
    for (parts <- Seq(2, 5, 13)) {
      val carried = Rolling.boundaryCarry(
        df.repartition(parts).withColumn("v", col("v").cast("double")),
        Seq("v"), Seq(col("i")), n = 7)
        .orderBy("i").collect().map(_.toSeq)
      assert(carried.length === expected.length)
      carried.zip(expected).foreach { case (c, e) => assert(c === e, s"parts=$parts") }
    }
  }

  test("boundary carry crosses partitions: windows at partition heads see prior rows") {
    // values 0..99 in order, n=10: every full window's sum is fixed —
    // any partition-boundary leak breaks the head rows of partition 2+
    val df = spark.range(100).toDF("i").withColumn("v", col("i").cast("double"))
    val out = Rolling.boundaryCarry(df.repartition(8), Seq("v"), Seq(col("i")), n = 10)
      .orderBy("i").select("i", "v_roll_sum").collect()
    out.foreach { r =>
      val i = r.getLong(0)
      val lo = math.max(0L, i - 9)
      val exp = (lo to i).sum.toDouble
      assert(r.getDouble(1) === exp, s"row $i")
    }
  }

  test("non-numeric value column is rejected") {
    val df = Seq((1L, "x")).toDF("i", "v")
    val ex = intercept[IllegalArgumentException](
      Rolling.rolling(df, Seq("v"), "i", n = 3))
    assert(ex.getMessage.contains("numeric"))
  }
}
