package graft

import org.apache.spark.sql.functions._

/** One-off phase attribution for q_containment_dedup at a scale dir —
  * times each stage of the containmentPairs/containmentDedup pipeline
  * with an isolated action so the slow phase is identified, not guessed.
  * Usage: Test/runMain graft.ProfileContainment /tmp/graft_sf1
  */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = GraftSession.builder("local[16]")
      .config("spark.sql.shuffle.partitions", "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.plans.Kernels

    def tm[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val truncated = docs0.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        substring(col("text"), 1, 250).as("text"))
    val docs = graft.operators.SetOps.concat(docs0, truncated)
    val threshold = 0.8

    val sh = tm("shingleFrame persist+count") {
      val f = docs.select(col("doc_id").as("id"),
        array_distinct(Kernels.wordShingles(col("text"), 3)).as("sh"))
        .withColumn("sz", size(col("sh"))).filter(col("sz") > 0).persist()
      println(s"[prof]   sh rows=${f.count()}")
      f
    }
    val posting = sh.select(col("id"), col("sz"), explode(col("sh")).as("s0"))
      .select(col("id"), col("sz"), xxhash64(col("s0")).as("shingle"))
    val dfTab = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("shingle"))
    val ranked = tm("ranked persist+count") {
      val f = posting.join(dfTab, Seq("shingle"))
        .withColumn("rn", row_number().over(w))
        .select(col("id"), col("sz"), col("rn"), col("shingle")).persist()
      println(s"[prof]   ranked rows=${f.count()}")
      f
    }
    val prefixA = ranked.filter(col("rn") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)).cast("int") + 1)
      .select(col("id").as("id_a"), col("sz").as("sz_a"),
        col("rn").as("rn_a"), col("shingle"))
    val fullB = ranked.select(col("id").as("id_b"), col("sz").as("sz_b"),
      col("rn").as("rn_b"), col("shingle"))
    val cand = tm("cand join+distinct persist+count") {
      val f = prefixA.join(fullB, Seq("shingle"))
        .filter(col("id_a") =!= col("id_b") &&
          col("sz_b") >= lit(threshold) * col("sz_a") - lit(1e-9) &&
          lit(1) + least(col("sz_a") - col("rn_a"), col("sz_b") - col("rn_b"))
            >= lit(threshold) * col("sz_a") - lit(1e-9))
        .select(col("id_a"), col("id_b")).distinct().persist()
      println(s"[prof]   cand rows=${f.count()}")
      f
    }
    val pairs = tm("verify join (array_intersect) persist+count") {
      val f = cand
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a"),
          col("sz").as("sz_a")), Seq("id_a"))
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            col("sz_a").cast("double")).as("containment"))
        .filter(col("containment") >= threshold).persist()
      println(s"[prof]   pairs rows=${f.count()}")
      f
    }
    tm("dedup drops (sizes joins + left_anti) count") {
      val sizes = docs.select(col("doc_id").as("__id"),
        size(array_distinct(Kernels.wordShingles(col("text"), 3))).as("__sz"))
      val drops = pairs
        .join(sizes.select(col("__id").as("id_a"), col("__sz").as("sz_a2")), Seq("id_a"))
        .join(sizes.select(col("__id").as("id_b"), col("__sz").as("sz_b2")), Seq("id_b"))
        .filter(col("sz_a2") < col("sz_b2") ||
          (col("sz_a2") === col("sz_b2") && col("id_a") > col("id_b")))
        .select(col("id_a").as("__drop")).distinct()
      println(s"[prof]   survivors=${docs.join(drops, docs("doc_id") === col("__drop"), "left_anti").count()}")
    }
    spark.stop()
  }
}
