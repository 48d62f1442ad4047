package graft

/** One-off: quantify logical/physical tree size and driver-side cost of
  * the multiply-referencing dedup pipelines — the r14 optimization lead
  * (every action renders the full plan for the SQL-execution event, and
  * every downstream Dataset construction re-analyzes the duplicated
  * tree, so exponential logical duplication is driver CPU even when
  * persists bound execution).
  * Usage: Test/runMain graft.ProfilePlanSize <sfDir> <query...>
  */
object ProfilePlanSize {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_minhash_pairs", "q_dedup_incremental", "q_dedup_stream_batch",
        "q_containment", "q_ssjoin_exact")
    val spark = GraftSession.builder("local[16]")
      .config("spark.sql.shuffle.partitions", "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def nodes(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Long = {
      var n = 1L
      p.children.foreach(c => n += nodes(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]]))
      n
    }
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nAnalyzed = nodes(df.queryExecution.analyzed)
      val tWalk = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val s = df.queryExecution.analyzed.treeString
      val tRender = (System.nanoTime() - t2) / 1e9
      println(f"[plansize] $name build=$tBuild%.2f s analyzedNodes=$nAnalyzed walk=$tWalk%.2f s renderLen=${s.length} render=$tRender%.2f s")
      val t3 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[plansize] $name action=${(System.nanoTime() - t3) / 1e9}%.2f s")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
