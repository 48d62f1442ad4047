package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxTopKSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct values fit the capacity, any partitioning") {
    val words = (0 until 1000).map(i => s"w${i % 20}") // 20 distinct, skewed by id order
    for (parts <- Seq(1, 7)) {
      val out = words.toDF("w").repartition(parts)
        .select(explode(ApproxTopK.approxTopK(col("w"), k = 5, capacity = 64)
          .as("t")).as("e"))
        .select(col("e.value"), col("e.count"), col("e.err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.length === 5)
      assert(out.forall(_._3 === 0L), s"no evictions → zero error: ${out.mkString(",")}")
      assert(out.forall(_._2 === 50L)) // 1000/20
      // count ties break to value ASC
      assert(out.map(_._1).toSeq === Seq("w0", "w1", "w10", "w11", "w12"))
    }
  }

  test("heavy hitters survive under eviction pressure with bounded error") {
    // 3 heavy values (10000 each) + 5000 singletons, capacity 64
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle(
      (0 until 30000).map(i => s"heavy${i % 3}") ++ (0 until 5000).map(i => s"rare$i")
    ).toDF("w")
    val out = data.repartition(5)
      .select(explode(ApproxTopK.approxTopK(col("w"), k = 3, capacity = 64).as("t")).as("e"))
      .select(col("e.value"), col("e.count"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet === Set("heavy0", "heavy1", "heavy2"))
    out.foreach { case (v, c, e) =>
      assert(c >= 10000L, s"$v count $c must not undercount")
      assert(c - e <= 10000L, s"$v lower bound $c-$e must not exceed truth")
    }
  }

  test("guarantee: any value with true count > N/capacity is reported") {
    val data = ((0 until 2000).map(_ => "big") ++ (0 until 3000).map(i => s"x$i")).toDF("w")
    val out = data.repartition(3)
      .select(explode(ApproxTopK.approxTopK(col("w"), k = 10, capacity = 50).as("t")).as("e"))
      .select(col("e.value")).as[String].collect()
    assert(out.contains("big")) // 2000 > 5000/50
  }
}
