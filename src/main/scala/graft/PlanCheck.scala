package graft

import org.apache.spark.sql.functions._

/** Dev tool: dump formatted physical plans for the flagship queries to
  * audit pushdown / broadcast / shuffle shape.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q_join_inner", "q_filter_pass", "q_match", "q_knn")
    println("==== entry ====")
    SparkEntry.entry(spark).explain("formatted")
    names.foreach { n =>
      println(s"==== $n ====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
