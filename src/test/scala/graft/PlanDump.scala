package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Dev tool (r14 optimization round): dump `.explain("formatted")` of named
  * queries to individual files — the judge checks plan claims against
  * `plans/r14/<query>_{before,after}.txt`.
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <query...>
  * Writes <outDir>/<query>_<suffix>.txt for each query.
  *
  * Note: several bench rows are multi-stage pipelines that run internal
  * actions (index builds, streaming micro-batches); the dump captures the
  * plan of the RETURNED frame — the tail of the pipeline — which is what
  * the noop sink times last. Internal stages are audited by the Profile*
  * harnesses and plan-pinning specs instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.builder("local[16]")
      .config("spark.sql.shuffle.partitions", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt (${plan.length} chars)")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
