package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("minMax: [0,1] per group, constant group → null, nulls pass through") {
    val df = Seq(("a", 0.0), ("a", 5.0), ("a", 10.0),
      ("b", 7.0), ("b", 7.0)).toDF("g", "x")
      .unionByName(Seq(("a", null.asInstanceOf[java.lang.Double]))
        .toDF("g", "x"))
    val out = Normalize.minMax(df, "x", Seq("g"), "s")
      .select("g", "x", "s").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out === Set(
      ("a", Some(0.0), Some(0.0)), ("a", Some(5.0), Some(0.5)),
      ("a", Some(10.0), Some(1.0)),
      ("b", Some(7.0), None), ("b", Some(7.0), None), // constant group
      ("a", None, None)))
  }

  test("zscore: hand-computed per group; single-row group → null") {
    // group a: [2, 4, 6] → mean 4, stddev_samp 2 → z = [-1, 0, 1]
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0), ("b", 9.0)).toDF("g", "x")
    val out = Normalize.zscore(df, "x", Seq("g"), "z")
      .select("g", "x", "z").collect()
      .map(r => (r.getString(0), r.getDouble(1), Option(r.get(2)))).toSet
    assert(out === Set(("a", 2.0, Some(-1.0)), ("a", 4.0, Some(0.0)),
      ("a", 6.0, Some(1.0)), ("b", 9.0, None)))
  }

  test("quantileBin: equi-depth buckets, ties to the lower bin, nulls stay null") {
    // 1..8, 4 bins → cuts at p .25/.5/.75 of sorted values = 2.75/4.5/6.25
    val df = (1 to 8).map(_.toDouble).toDF("x")
      .unionByName(Seq(null.asInstanceOf[java.lang.Double]).toDF("x"))
    val out = Normalize.quantileBin(df, "x", nBins = 4)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(out === Set(
      (Some(1.0), Some(0L)), (Some(2.0), Some(0L)),
      (Some(3.0), Some(1L)), (Some(4.0), Some(1L)),
      (Some(5.0), Some(2L)), (Some(6.0), Some(2L)),
      (Some(7.0), Some(3L)), (Some(8.0), Some(3L)),
      (None, None)))
    // a constant column degenerates to one bin, never throws
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    assert(Normalize.quantileBin(const, "x", 4).select("bin")
      .as[Long].collect().toSet === Set(0L))
  }

  test("targetEncode: shrinkage toward global mean, null category → global") {
    // cats: a → targets [0, 10] (n=2, mean 5); b → [20] (n=1, mean 20)
    // global mean = 10; smoothing 2:
    //   a: (2*5 + 2*10)/4 = 7.5     b: (1*20 + 2*10)/3 = 40/3
    val df = Seq(("a", 0.0), ("a", 10.0), ("b", 20.0)).toDF("c", "t")
      .unionByName(Seq((null.asInstanceOf[String], 10.0)).toDF("c", "t"))
    val out = Normalize.targetEncode(df, "c", "t", smoothing = 2.0)
      .select("c", "target_enc").collect()
      .map(r => (Option(r.getString(0)), r.getDouble(1))).toSet
    assert(out === Set(
      (Some("a"), 7.5), (Some("b"), 40.0 / 3), (None, 10.0)))
    // rare categories shrink MORE: with huge smoothing everything ≈ global
    val flat = Normalize.targetEncode(df, "c", "t", smoothing = 1e9)
      .select("target_enc").as[Double].collect()
    assert(flat.forall(v => math.abs(v - 10.0) < 1e-6))
  }

  test("oneHot: sorted deterministic columns, null row all zeros, cardinality guard") {
    val df = Seq((1L, "en"), (2L, "de"), (3L, null.asInstanceOf[String]),
      (4L, "en")).toDF("id", "lang")
    val out = Normalize.oneHot(df, "lang")
    assert(out.columns.toSeq === Seq("id", "lang", "lang_de", "lang_en"))
    val rows = out.orderBy("id").select("lang_de", "lang_en")
      .as[(Long, Long)].collect().toSeq
    assert(rows === Seq((0L, 1L), (1L, 0L), (0L, 0L), (0L, 1L)))
    val wide = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("id", "lang")
    val ex = intercept[IllegalArgumentException](Normalize.oneHot(wide, "lang"))
    assert(ex.getMessage.contains("low-cardinality"))
  }
}
